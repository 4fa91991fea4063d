package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-preparation text ops beyond q126-q150: a statistical bigram
  * language model used as a fluency/perplexity-proxy quality filter, and
  * sliding-window document chunking with overlap (the context-length
  * splitter that feeds embedding and pre-training pipelines).
  *
  * Scale shape: the bigram "model" is just two partial-agg count tables
  * keyed by (w1, w2) and w1 — scoring is equi-joins on those keys, the
  * vocabulary size is one broadcast scalar. Nothing is quadratic and no
  * state leaves the shuffle. Chunking is a generator over per-row
  * arithmetic — embarrassingly parallel, no shuffle at all until the
  * caller aggregates.
  */
object CorpusOps {

  val queries: Seq[Q] = Seq(
    // Bigram LM scoring with add-one smoothing: p(w2|w1) =
    // (c(w1,w2)+1)/(c(w1)+V); a document's score is its mean bigram
    // log-probability, and the 10 lowest-scoring documents are the
    // disfluent tail a quality filter would drop. ln() is rounded to 6
    // before the DECIMAL sum (q144's cross-engine log discipline: libm
    // vs Math.log may differ in the last ulp; partial-agg double sums
    // are order-dependent).
    Q(
      "q156_bigram_lm_score",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
        |  FROM toks, LATERAL (
        |    SELECT unnest(generate_series(1, len(t) - 1)) AS i) u),
        |cnt2 AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM big GROUP BY w1, w2),
        |cnt1 AS (
        |  SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM big GROUP BY w1),
        |vocab AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vs
        |  FROM (SELECT unnest(t) AS tok FROM toks)),
        |scored AS (
        |  SELECT b.doc_id,
        |    CAST(ROUND(LN((c.c2 + 1.0) / (o.c1 + v.vs)), 6)
        |      AS DECIMAL(18,9)) AS lp
        |  FROM big b
        |  JOIN cnt2 c ON c.w1 = b.w1 AND c.w2 = b.w2
        |  JOIN cnt1 o ON o.w = b.w1
        |  CROSS JOIN vocab v)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_lp
        |FROM scored GROUP BY doc_id
        |ORDER BY avg_lp, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      // explode materializes the bigram pairs below the generator, so the
      // zip_with runs once per document, not once per downstream column
      val big = toks
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), " +
            "(a, b) -> struct(a AS w1, b AS w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val cnt2 = big.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
      val cnt1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        .select(col("w1").as("w"), col("c1"))
      val vocab = toks.select(explode(col("t")).as("tok"))
        .agg(count_distinct(col("tok")).as("vs"))
      big
        .join(cnt2, Seq("w1", "w2"))
        .join(cnt1, col("w") === col("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          round(log((col("c2") + 1.0) / (col("c1") + col("vs"))), 6)
            .cast("decimal(18,9)").as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("lp")).cast("double") / count(lit(1)), 6)
            .as("avg_lp"))
        .orderBy(col("avg_lp"), col("doc_id"))
        .limit(10)
    },

    // Sliding-window chunking: 40-token chunks on a 30-token stride
    // (10-token overlap), the context-length splitter for embedding /
    // pre-training ingestion. Chunk starts are a per-row integer
    // sequence — FLOOR over double division because integer-div syntax
    // differs between the dialects (`div` vs `//`).
    Q(
      "q157_chunk_overlap",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 8),
        |c AS (
        |  SELECT doc_id, toks, u.k AS chunk_idx, u.k * 30 AS st
        |  FROM t, LATERAL (
        |    SELECT unnest(generate_series(0,
        |      CAST(FLOOR((len(toks) - 1) / 30.0) AS BIGINT))) AS k) u)
        |SELECT doc_id, chunk_idx,
        |  CAST(LEAST(40, len(toks) - st) AS BIGINT) AS n_toks,
        |  toks[st + 1] AS first_tok,
        |  toks[st + LEAST(40, len(toks) - st)] AS last_tok
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val t = Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 8)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      t.select(col("doc_id"), col("toks"),
          explode(expr("sequence(CAST(0 AS BIGINT), " +
            "CAST(FLOOR((size(toks) - 1) / 30.0) AS BIGINT))"))
            .as("chunk_idx"))
        .withColumn("st", col("chunk_idx") * 30)
        .withColumn("n_toks",
          least(lit(40L), size(col("toks")).cast("long") - col("st")))
        .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
          element_at(col("toks"), (col("st") + 1).cast("int"))
            .as("first_tok"),
          element_at(col("toks"), (col("st") + col("n_toks")).cast("int"))
            .as("last_tok"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    // each doc draws u from a deterministic integer LCG (the house
    // substitute for rand() — reproducible across engines, runs, and
    // partition layouts) and gets key -ln(u)/w; the k smallest keys ARE
    // a weighted sample without replacement. Scale shape: one map pass +
    // TakeOrderedAndProject top-k — per-partition heaps, no global sort,
    // no sequential reservoir. The +1 offset keeps u > 0; keys are
    // ranked on their ROUNDED value (6 dp) with doc_id tie-break so
    // cross-engine ln() last-ulp noise can't flip the order.
    Q(
      "q165_weighted_sample_aes",
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS w,
        |    (((doc_id * 1103515245 + 12345) % 2147483648) + 1)
        |      / 2147483649.0 AS u
        |  FROM documents)
        |SELECT doc_id, ROUND(w, 6) AS weight,
        |  ROUND(-LN(u) / w, 6) AS expkey
        |FROM q
        |ORDER BY expkey ASC, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val w = size(array_distinct(toks)).cast("double") / size(toks)
      val u = (((col("doc_id") * 1103515245L + 12345L) % 2147483648L) + 1L) /
        lit(2147483649.0)
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), round(w, 6).as("weight"),
          round(-log(u) / w, 6).as("expkey"))
        .orderBy(col("expkey").asc, col("doc_id"))
        .limit(10)
    },

    // Fuzzy entity matching (blocked edit-distance join): every distinct
    // part name gets a deterministic one-character-deletion typo; typos
    // are matched back to the clean catalog by levenshtein <= 1, but ONLY
    // within blocks sharing the stable second token. Blocking is THE
    // scale move in entity resolution — the edit-distance verify runs per
    // block (equi-join on the blocking key), never all-pairs; at 100 TB
    // the blocking key is a phonetic/token signature and the clean
    // catalog side broadcasts.
    Q(
      "q167_fuzzy_entity_match",
      """WITH clean AS (SELECT DISTINCT p_name FROM part),
        |dirty AS (
        |  SELECT p_name AS orig,
        |    substr(p_name, 1, 2) || substr(p_name, 4) AS typo,
        |    split_part(p_name, ' ', 2) AS blk
        |  FROM clean),
        |cand AS (
        |  SELECT d.typo, d.orig, c.p_name AS matched,
        |    CAST(levenshtein(d.typo, c.p_name) AS BIGINT) AS dist
        |  FROM dirty d JOIN clean c ON split_part(c.p_name, ' ', 2) = d.blk)
        |SELECT typo, matched, dist, matched = orig AS is_true_match
        |FROM cand WHERE dist <= 1
        |ORDER BY typo, matched""".stripMargin) { (s, dir) =>
      val clean = Tables.table(s, dir, "part")
        .select(col("p_name")).distinct()
      val dirty = clean.select(col("p_name").as("orig"),
        concat(substring(col("p_name"), 1, 2),
          expr("substr(p_name, 4)")).as("typo"),
        split_part(col("p_name"), lit(" "), lit(2)).as("blk"))
      val cand = dirty.join(
        clean.select(col("p_name").as("matched"),
          split_part(col("p_name"), lit(" "), lit(2)).as("cblk")),
        col("cblk") === col("blk"))
        .select(col("typo"), col("orig"), col("matched"),
          levenshtein(col("typo"), col("matched")).cast("long").as("dist"))
      cand.filter(col("dist") <= 1)
        .select(col("typo"), col("matched"), col("dist"),
          (col("matched") === col("orig")).as("is_true_match"))
        .orderBy(col("typo"), col("matched"))
    })
}
