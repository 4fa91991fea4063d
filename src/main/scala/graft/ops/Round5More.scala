package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 additions, second batch: exact duplicated-SPAN detection
  * (the sub-document granularity between q44's whole-doc hash dedup and
  * q180's fixed-chunk boilerplate scrub), importance-ratio data
  * selection, and a hashed linear quality classifier.
  *
  * Shared determinism discipline: integer arithmetic end to end
  * (positions, counts, fixed-point scores); ties broken by explicit
  * (value, id) orderings that both engines express identically.
  */
object Round5More {

  // ------------------------------------------------------------------
  // q204: maximal duplicated token spans (exact substring dedup)
  // ------------------------------------------------------------------

  /** Shingles with a document frequency above this are excluded from
    * candidate generation — they are corpus boilerplate (q180's job)
    * and the fanout bound is what keeps the shingle self-join linear:
    * each retained shingle contributes at most DF_CAP^2 position pairs
    * no matter the corpus size.
    */
  private val DF_CAP = 16

  /** Minimum run length in shingles (6 shingles = 8 shared tokens). */
  private val MIN_RUN = 6

  val queries: Seq[Q] = Seq(
    // E6/E8: maximal duplicated token spans across documents — the
    // Lee-et-al-style exact substring dedup a crawl corpus needs when
    // documents share long passages WITHOUT being near-duplicates as
    // wholes (syndicated paragraphs, quoted licenses, templated
    // intros). Whole-doc dedup (q44) misses them; fixed-chunk scrub
    // (q180) only catches chunk-aligned repeats. Here: positional
    // 3-gram shingles, a df-capped shingle-keyed self-join for
    // candidate position pairs, then the classic diagonal trick —
    // matching positions with a constant offset (pb - pa) that advance
    // consecutively form one island (grp = pa - row_number), i.e. one
    // maximal shared span. Window partitions are (da, db, diag) —
    // cardinality grows with the corpus, runs are short, no
    // SinglePartition anywhere; at 100 TB the shingle key would bucket
    // by its 64-bit hash (q200's discipline) with the string kept only
    // for in-bucket confirmation.
    Q(
      "q204_duplicated_spans",
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sg AS (
         |  SELECT doc_id, u.i AS pos,
         |    toks[u.i+1] || ' ' || toks[u.i+2] || ' ' || toks[u.i+3] AS sh
         |  FROM tk, LATERAL (SELECT unnest(generate_series(0,
         |    len(toks) - 3)) AS i) u),
         |rare AS (
         |  SELECT sh FROM (SELECT sh, COUNT(DISTINCT doc_id) AS df
         |    FROM sg GROUP BY sh) WHERE df <= $DF_CAP),
         |cand AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, b.pos - a.pos AS diag,
         |    a.pos AS pa, b.pos AS pb
         |  FROM sg a JOIN sg b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  WHERE a.sh IN (SELECT sh FROM rare)),
         |runs AS (
         |  SELECT da, db, diag, pa, pb,
         |    pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
         |      ORDER BY pa) AS grp
         |  FROM cand),
         |agg AS (
         |  SELECT da, db, diag, grp, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    MIN(pa) AS sa, MIN(pb) AS sb
         |  FROM runs GROUP BY 1, 2, 3, 4
         |  HAVING COUNT(*) >= $MIN_RUN),
         |best AS (
         |  SELECT da, db, cnt, sa, sb FROM (
         |    SELECT da, db, cnt, sa, sb,
         |      ROW_NUMBER() OVER (PARTITION BY da, db
         |        ORDER BY cnt DESC, sa ASC, diag ASC) AS rn
         |    FROM agg) WHERE rn = 1)
         |SELECT da, db, CAST(sa AS BIGINT) AS start_a,
         |  CAST(sb AS BIGINT) AS start_b, cnt + 2 AS span_toks
         |FROM best
         |ORDER BY span_toks DESC, da ASC, db ASC LIMIT 20""".stripMargin) {
      (s, dir) =>
        val d = Tables.table(s, dir, "documents")
        val sh = d
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, size(toks) - 3), " +
              "i -> concat_ws(' ', element_at(toks, i + 1), " +
              "element_at(toks, i + 2), element_at(toks, i + 3)))"))
            .as(Seq("pos", "sh")))
        val rare = sh.groupBy(col("sh"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") <= DF_CAP)
          .select(col("sh"))
        val keyed = sh.join(rare, Seq("sh"))
        val cand = keyed
          .select(col("sh"), col("doc_id").as("da"), col("pos").as("pa"))
          .join(keyed.select(col("sh"), col("doc_id").as("db"),
            col("pos").as("pb")), Seq("sh"))
          .where(col("da") < col("db"))
          .select(col("da"), col("db"), (col("pb") - col("pa")).as("diag"),
            col("pa"), col("pb"))
        val runs = cand
          .withColumn("grp", col("pa") - row_number().over(
            Window.partitionBy(col("da"), col("db"), col("diag"))
              .orderBy(col("pa"))))
          .groupBy(col("da"), col("db"), col("diag"), col("grp"))
          .agg(count(lit(1)).as("cnt"), min(col("pa")).as("sa"),
            min(col("pb")).as("sb"))
          .filter(col("cnt") >= MIN_RUN)
        runs.groupBy(col("da"), col("db"))
          .agg(max(struct(col("cnt"), (-col("sa")).as("nsa"),
            (-col("diag")).as("ndiag"))).as("b"))
          .select(col("da"), col("db"),
            (-col("b.nsa")).cast("bigint").as("start_a"),
            (-col("b.nsa") - col("b.ndiag")).cast("bigint").as("start_b"),
            (col("b.cnt") + 2).as("span_toks"))
          .orderBy(col("span_toks").desc, col("da").asc, col("db").asc)
          .limit(20)
    })
}
