package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 gates: the third TRAINED-model family (a multinomial Naive
  * Bayes language classifier — counting is the training) and a
  * Matryoshka-style two-stage ANN serving path (prefix-dims coarse scan,
  * full-dims rerank).
  *
  * Scale shape:
  *  - q218: the trained NB "model" is two count tables — (lang, tok)
  *    likelihood counts and per-lang totals — produced by partial-agg
  *    shuffles keyed on the token; model size is O(vocab × langs), which
  *    Heaps' law keeps sublinear in the corpus, so scoring broadcasts the
  *    counts and stays a map-side join however large the test split is.
  *    All training arithmetic is exact BIGINT counting; only the log
  *    scoring rounds (q156's cross-engine discipline: round(ln, 6) into
  *    DECIMAL sums, order-independent and replayed exactly by DuckDB).
  *  - q219: stage 1 scores ONLY the first 16 of 64 dims (4× less compute
  *    and — with a prefix-truncated stored column — 4× less IO) and keeps
  *    top-C via TakeOrderedAndProject (per-partition heaps, no global
  *    sort); stage 2 reranks the C survivors with the full vector. The
  *    recall flag joins against the global exact top-10, so the gate
  *    measures what the truncation loses. All dots are 1e6 fixed-point
  *    BIGINTs — exact in both engines.
  *
  * Reference scope: the reference (PalNilsson/ask-duckdb) has neither a
  * trained classifier nor a vector index; both gates are part of the
  * training-data-pipeline mandate (language ID at corpus scale; ANN
  * serving over an embedding column).
  */
object Round6Ops {

  private val C = 64 // q219 stage-1 candidate count
  private val PRE = 16 // q219 prefix dims (of 64)

  val queries: Seq[Q] = Seq(
    // E8/E13: TRAINED language classifier — multinomial NB with add-one
    // smoothing, trained on the doc_id%5!=0 split (labels = the lang
    // column), evaluated on the %5==0 split as a confusion matrix.
    // p(tok|lang) = (c(tok,lang)+1)/(tot_lang+V); score(doc,lang) =
    // ln prior + Σ ln p(tok|lang); argmax ties break to the
    // lexicographically first lang. Every ln is round(·,6) into
    // DECIMAL(18,9) BEFORE the sum, so both engines rank identical exact
    // decimals — no float-order drift can flip a near-tie argmax.
    Q(
      "q218_nb_lang_classifier",
      """WITH train AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |test AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE doc_id % 5 = 0),
        |ttok AS (SELECT lang, unnest(t) AS tok FROM train),
        |cnt AS (
        |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ttok GROUP BY lang, tok),
        |tot AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ttok GROUP BY lang),
        |vocab AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vs FROM ttok),
        |prior AS (
        |  SELECT lang,
        |    CAST(ROUND(LN(CAST(COUNT(*) AS DOUBLE) /
        |      (SELECT COUNT(*) FROM train)), 6) AS DECIMAL(18,9)) AS plp
        |  FROM train GROUP BY lang),
        |stok AS (SELECT doc_id, unnest(t) AS tok FROM test),
        |scored AS (
        |  SELECT s.doc_id, o.lang,
        |    CAST(ROUND(LN((COALESCE(c.c, 0) + 1.0) / (o.n + v.vs)), 6)
        |      AS DECIMAL(18,9)) AS lp
        |  FROM stok s
        |  CROSS JOIN tot o
        |  CROSS JOIN vocab v
        |  LEFT JOIN cnt c ON c.lang = o.lang AND c.tok = s.tok),
        |docscore AS (
        |  SELECT sc.doc_id, sc.lang, p.plp + SUM(sc.lp) AS score
        |  FROM scored sc JOIN prior p ON p.lang = sc.lang
        |  GROUP BY sc.doc_id, sc.lang, p.plp),
        |pred AS (
        |  SELECT doc_id, lang AS pred_lang FROM (
        |    SELECT doc_id, lang,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, lang ASC) AS rn
        |    FROM docscore) WHERE rn = 1)
        |SELECT t.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        |FROM test t JOIN pred p ON p.doc_id = t.doc_id
        |GROUP BY t.lang, p.pred_lang
        |ORDER BY t.lang, p.pred_lang""".stripMargin) { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), " ").as("t"))
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val test = docs.filter(col("doc_id") % 5 === 0)
      val ttok = train.select(col("lang"), explode(col("t")).as("tok"))
      val cnt = ttok.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val tot = ttok.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val vocab = ttok.agg(count_distinct(col("tok")).as("vs"))
      val nTrain = train.agg(count(lit(1)).as("ntr"))
      val prior = train.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
        .crossJoin(broadcast(nTrain))
        .select(col("lang"),
          round(log(col("nd").cast("double") / col("ntr")), 6)
            .cast("decimal(18,9)").as("plp"))
      val stok = test.select(col("doc_id"), explode(col("t")).as("tok"))
      // model tables are vocab-sized (Heaps-bounded) — broadcast them so
      // scoring is a map stage over the test tokens, shuffling only the
      // (doc_id, lang) partial sums
      val scored = stok
        .crossJoin(broadcast(tot.select(col("lang"), col("n"))))
        .crossJoin(broadcast(vocab))
        .join(broadcast(cnt), Seq("lang", "tok"), "left")
        .select(col("doc_id"), col("lang"),
          round(log((coalesce(col("c"), lit(0L)) + 1.0) /
            (col("n") + col("vs"))), 6)
            .cast("decimal(18,9)").as("lp"))
      val docscore = scored
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("lp")).as("slp"))
        .join(broadcast(prior), Seq("lang"))
        .select(col("doc_id"), col("lang"),
          (col("plp") + col("slp")).as("score"))
      val pred = docscore
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("lang").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang").as("pred_lang"))
      test.select(col("doc_id"), col("lang"))
        .join(pred, Seq("doc_id"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    },

    // E7: Matryoshka-style adaptive retrieval — coarse scan scores only
    // the first PRE dims (the prefix a matryoshka-trained embedding
    // front-loads), keeps top-C candidates, reranks them with the full
    // vector; in_exact flags each final hit against the global exact
    // top-10 so the gate reports what prefix truncation lost.
    Q(
      "q219_matryoshka_rerank",
      s"""WITH qv AS (
         |  SELECT ${Pq.duckScaled("embedding")} AS qs
         |  FROM embeddings WHERE vec_id = 0),
         |sv AS (
         |  SELECT vec_id, ${Pq.duckScaled("embedding")} AS sv
         |  FROM embeddings WHERE vec_id <> 0),
         |coarse AS (
         |  SELECT v.vec_id, v.sv,
         |    ${Pq.duckIntDot(s"list_slice(v.sv, 1, $PRE)",
                 s"list_slice(q.qs, 1, $PRE)")} AS pre
         |  FROM sv v, qv q
         |  ORDER BY pre DESC, v.vec_id ASC LIMIT $C),
         |rer AS (
         |  SELECT c.vec_id, c.pre,
         |    ${Pq.duckIntDot("c.sv", "q.qs")} AS full_dot
         |  FROM coarse c, qv q),
         |tope AS (
         |  SELECT v.vec_id, ${Pq.duckIntDot("v.sv", "q.qs")} AS d
         |  FROM sv v, qv q
         |  ORDER BY d DESC, v.vec_id ASC LIMIT 10)
         |SELECT r.vec_id, r.pre, r.full_dot,
         |  CAST(CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
         |    AS in_exact
         |FROM (SELECT * FROM rer ORDER BY full_dot DESC, vec_id ASC
         |  LIMIT 10) r
         |LEFT JOIN tope t ON r.vec_id = t.vec_id
         |ORDER BY r.full_dot DESC, r.vec_id ASC""".stripMargin) { (s, dir) =>
      val e = Tables.table(s, dir, "embeddings")
      val q0 = e.filter(col("vec_id") === 0)
        .select(expr(KMeans.scaleExpr("embedding")).as("qs"))
      val sv = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(KMeans.scaleExpr("embedding")).as("sv"))
        .crossJoin(broadcast(q0))
      // stage 1: prefix-dims scan → top-C via per-partition heaps
      val coarse = sv
        .withColumn("pre", expr(Pq.intDot(s"slice(sv, 1, $PRE)",
          s"slice(qs, 1, $PRE)")))
        .orderBy(col("pre").desc, col("vec_id").asc)
        .limit(C)
      // stage 2: rerank the C survivors with the full vector
      val rer = coarse
        .withColumn("full_dot", expr(Pq.intDot("sv", "qs")))
        .select(col("vec_id"), col("pre"), col("full_dot"))
        .orderBy(col("full_dot").desc, col("vec_id").asc)
        .limit(10)
      val tope = sv
        .select(col("vec_id"), expr(Pq.intDot("sv", "qs")).as("d"))
        .orderBy(col("d").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), lit(1).as("hit"))
      rer.join(broadcast(tope), Seq("vec_id"), "left")
        .select(col("vec_id"), col("pre"), col("full_dot"),
          coalesce(col("hit"), lit(0)).as("in_exact"))
        .orderBy(col("full_dot").desc, col("vec_id").asc)
    }
  )
}
