package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 pipeline-hygiene gates: the checks an LLM training-data
  * pipeline runs around its dedup/split machinery rather than inside it.
  *
  *  - q238 SPLIT LEAKAGE AUDIT: documents are split 90/10 into
  *    train/val by a deterministic LCG on doc_id, then every val doc
  *    that has a near-duplicate in train is reported — the benchmark-
  *    contamination check every eval pipeline must run before trusting
  *    a held-out score. Candidates come from the q47 MinHash LSH band
  *    keys (an equi-join between the splits — the exact blocking shape
  *    a 100 TB pipeline groups on, probe side = the 10% val split);
  *    candidates are refined by exact token Jaccard >= 0.8 (the q46
  *    threshold, via the codegen'd token_jaccard kernel), and each
  *    leaked val doc reports its best-matching train doc.
  *
  * Scale shape: no all-pairs anywhere — the candidate join is keyed on
  * (band index, band signature); LSH bucket sizes are the pipeline's
  * own dedup-bucket telemetry (q197). The val side is 10% of the
  * corpus by construction, and the exact Jaccard refine runs only on
  * banded candidates.
  *
  * Reference scope: the reference (PalNilsson/ask-duckdb) has no
  * dedup/split machinery; this family is part of the
  * training-data-pipeline mandate.
  */
object Round7Pipeline {

  // deterministic 90/10 split: LCG on doc_id, val when residue == 7
  private val lcgVal =
    "((doc_id * 1103515245 + 12345) % 2147483648) % 10 = 7"

  // the q47 8-function MinHash signature over rolling-131 token hashes
  private val sig = "transform(sequence(0, 7), i -> " +
    "array_min(transform(th, h -> ((2*i + 1) * h + 7919 * i) " +
    "% 1000000007)))"

  private val duckMh = (lo: Int, hi: Int) =>
    s"array_to_string(list_transform(range($lo, $hi), i -> " +
      "list_min(list_transform(th, h -> ((2*i + 1) * h + 7919 * i) " +
      "% 1000000007))), '-')"

  val queries: Seq[Q] = Seq(
    Q(
      "q238_split_leakage_audit",
      s"""WITH base AS MATERIALIZED (
         |  SELECT doc_id, $lcgVal AS is_val,
         |    list_distinct(string_split(text, ' ')) AS tk,
         |    ${Dedup.duckTokenHashes} AS th
         |  FROM documents),
         |sg AS MATERIALIZED (
         |  SELECT doc_id, is_val, tk,
         |    ${duckMh(0, 4)} AS band0,
         |    ${duckMh(4, 8)} AS band1
         |  FROM base),
         |sides AS MATERIALIZED (
         |  SELECT doc_id, is_val, u.bi,
         |    CASE WHEN u.bi = 0 THEN band0 ELSE band1 END AS bkey
         |  FROM sg, LATERAL (SELECT unnest([0, 1]) AS bi) u),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT v.doc_id AS val_doc, t.doc_id AS train_doc
         |  FROM sides v JOIN sides t ON v.bi = t.bi AND v.bkey = t.bkey
         |  WHERE v.is_val AND NOT t.is_val),
         |scored AS MATERIALIZED (
         |  SELECT c.val_doc, c.train_doc,
         |    CAST(FLOOR(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.tk, b.tk)))
         |      * 1000000 + 0.5) AS BIGINT) AS jac6
         |  FROM cand c
         |  JOIN sg a ON a.doc_id = c.val_doc
         |  JOIN sg b ON b.doc_id = c.train_doc
         |  WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.8),
         |best AS (SELECT val_doc, train_doc, jac6 FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY val_doc
         |    ORDER BY jac6 DESC, train_doc ASC) AS rn FROM scored)
         |  WHERE rn = 1),
         |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_val FROM base
         |  WHERE is_val),
         |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_leaked FROM best)
         |SELECT b.val_doc, b.train_doc, b.jac6, v.n_val, l.n_leaked
         |FROM best b, nv v, nl l
         |ORDER BY b.val_doc""".stripMargin) { (s, dir) =>
      graft.functions.TokenJaccard.register(s)
      val base = Tables.table(s, dir, "documents")
        .select(col("doc_id"), expr(lcgVal).as("is_val"),
          array_distinct(split(col("text"), " ")).as("tk"),
          expr(Dedup.sparkTokenHashes).as("th"))
        .withColumn("mh", expr(sig))
        .select(col("doc_id"), col("is_val"), col("tk"),
          array_join(slice(col("mh"), 1, 4), "-").as("band0"),
          array_join(slice(col("mh"), 5, 4), "-").as("band1"))
      val sides = base
        .select(col("doc_id"), col("is_val"),
          posexplode(array(col("band0"), col("band1")))
            .as(Seq("bi", "bkey")))
      // candidate ids only ride the band join; token payloads re-attach
      // AFTER the distinct so the shuffle carries fixed-width keys
      val cand = sides.filter(col("is_val"))
        .select(col("doc_id").as("val_doc"), col("bi"), col("bkey"))
        .join(sides.filter(!col("is_val"))
          .select(col("doc_id").as("train_doc"), col("bi"), col("bkey")),
          Seq("bi", "bkey"))
        .select(col("val_doc"), col("train_doc")).distinct()
      val jac = expr("token_jaccard(tk_a, tk_b)")
      val scored = cand
        .join(base.select(col("doc_id").as("val_doc"),
          col("tk").as("tk_a")), Seq("val_doc"))
        .join(base.select(col("doc_id").as("train_doc"),
          col("tk").as("tk_b")), Seq("train_doc"))
        .filter(jac >= 0.8)
        .select(col("val_doc"), col("train_doc"),
          expr("CAST(FLOOR(token_jaccard(tk_a, tk_b) * 1000000 + 0.5) " +
            "AS BIGINT)").as("jac6"))
      val wv = Window.partitionBy(col("val_doc"))
        .orderBy(col("jac6").desc, col("train_doc").asc)
      val best = scored.withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .select(col("val_doc"), col("train_doc"), col("jac6"))
      val nVal = base.filter(col("is_val"))
        .agg(count(lit(1)).cast("bigint").as("n_val"))
      val nLeaked = best
        .agg(count(lit(1)).cast("bigint").as("n_leaked"))
      best.crossJoin(broadcast(nVal)).crossJoin(broadcast(nLeaked))
        .orderBy(col("val_doc"))
    }
  )
}
