package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash

/** Text-analysis operators over `documents` (SURVEY.md §2.3 E8 + the
  * training-data-pipeline mandate): token statistics, quality scoring,
  * language-ID heuristic, and document fingerprinting (rolling hash).
  *
  * All per-document — embarrassingly parallel, no shuffle except the final
  * presentation sort; at 100 TB these run as a single map stage over the
  * corpus. Scoring arithmetic is integer/rational only (no transcendental
  * functions) so Spark and DuckDB produce bit-identical doubles.
  */
object TextOps {

  /** Shared stopword list (these appear in the synthetic vocabulary). */
  private val stopwords = Seq("the", "a", "of", "and")
  private def stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  val queries: Seq[Q] = Seq(
    // E8: token counting — whitespace tokenization, distinct counts,
    // average token length.
    Q(
      "q40_token_stats",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  ROUND(CAST(list_sum(list_transform(string_split(text, ' '),
        |      t -> len(t))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 6) AS avg_token_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          round(
            expr("aggregate(transform(split(text, ' '), t -> length(t)), " +
              "0L, (a, x) -> a + x)").cast("double") / size(toks), 6)
            .as("avg_token_len"))
        .orderBy(col("doc_id"))
    },

    // E8: quality scoring — stopword ratio, char length, type-token ratio;
    // purely rational arithmetic, identical in both engines.
    Q(
      "q41_quality_score",
      s"""SELECT doc_id, lang,
         |  ROUND(CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ($stopSqlList))) AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS stop_ratio,
         |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS type_token_ratio,
         |  ROUND(1.0 - CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ($stopSqlList))) AS DOUBLE)
         |      / len(string_split(text, ' ')) * 0.5
         |    + LEAST(n_chars, 400) / 1000.0, 6) AS quality
         |FROM documents
         |WHERE n_chars >= 100
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val stopList = stopwords.map(w => s"'$w'").mkString(", ")
      val nStop = size(expr(
        s"filter(split(text, ' '), t -> t IN ($stopList))")).cast("double")
      val stopRatio = nStop / size(toks)
      Tables.table(s, dir, "documents")
        .filter(col("n_chars") >= 100)
        .select(col("doc_id"), col("lang"),
          round(stopRatio, 6).as("stop_ratio"),
          round(size(array_distinct(toks)).cast("double") / size(toks), 6)
            .as("type_token_ratio"),
          round(lit(1.0) - stopRatio * 0.5 +
            least(col("n_chars"), lit(400)) / 1000.0, 6).as("quality"))
        .orderBy(col("doc_id"))
    },

    // E8: language-ID heuristic — charset check (CJK) then
    // stopword-marker matching, identical CASE in both engines. The
    // synthetic corpus is English-vocabulary for every lang label, so the
    // interesting output is the confusion matrix against the label.
    Q(
      "q42_lang_id",
      """SELECT lang AS lang_label,
        |  CASE
        |    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |    WHEN text LIKE '% der %' OR text LIKE '% und %' THEN 'de'
        |    WHEN text LIKE '% le %' OR text LIKE '% une %' THEN 'fr'
        |    WHEN text LIKE '% el %' OR text LIKE '% los %' THEN 'es'
        |    ELSE 'en'
        |  END AS lang_pred,
        |  COUNT(*) AS n
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val pred = when(col("text").rlike("[一-鿿]"), "zh")
        .when(col("text").like("% der %") || col("text").like("% und %"), "de")
        .when(col("text").like("% le %") || col("text").like("% une %"), "fr")
        .when(col("text").like("% el %") || col("text").like("% los %"), "es")
        .otherwise("en")
      Tables.table(s, dir, "documents")
        .groupBy(col("lang").as("lang_label"), pred.as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_label"), col("lang_pred"))
    },

    // E8: token 3-gram shingles → corpus-wide heavy hitters. The shingle
    // generation is the front half of every MinHash/Jaccard pipeline
    // (q46/q47) surfaced as its own operator; explode + count + top-k.
    Q(
      "q79_ngram_topk",
      """SELECT shingle, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(range(len(string_split(text, ' ')) - 2),
        |    i -> string_split(text, ' ')[i+1] || ' ' ||
        |         string_split(text, ' ')[i+2] || ' ' ||
        |         string_split(text, ' ')[i+3])) AS shingle
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3)
        |GROUP BY shingle
        |ORDER BY n DESC, shingle ASC
        |LIMIT 20""".stripMargin) { (s, dir) =>
      // guard: Spark's sequence(0, n) is DESCENDING for n < 0, so short
      // docs are filtered out instead of relying on an empty sequence.
      // The token array is materialized in the projection BELOW the
      // generator (Generate doesn't collapse into its child), so the
      // lambda's three accesses hit a bound attribute instead of
      // re-splitting the text (measured 3.6s → ~1s at sf0.1).
      val shingles =
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', element_at(toks, i + 1), " +
          "element_at(toks, i + 2), element_at(toks, i + 3)))"
      Tables.table(s, dir, "documents")
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(explode(expr(shingles)).as("shingle"))
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle").asc)
        .limit(20)
    },

    // E8: document fingerprinting — polynomial rolling hash over the full
    // character stream (content-defined identity, mod 1e9+7), plus a
    // 1-function MinHash (min over per-token rolling hashes). Pure integer
    // folds → identical in both engines, and mergeable at 100 TB.
    Q(
      "q43_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS doc_hash,
        |  list_min(list_transform(string_split(text, ' '),
        |    t -> list_reduce(
        |      list_prepend(CAST(7 AS BIGINT),
        |        list_transform(string_split(t, ''),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |      (a, b) -> (a * 131 + b) % 1000000007))) AS min_token_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          TextHash.charFold(col("text"), 0L, 31L).as("doc_hash"),
          array_min(TextHash.tokenHashesPos(col("text")))
            .as("min_token_hash"))
        .orderBy(col("doc_id"))
    })
}
