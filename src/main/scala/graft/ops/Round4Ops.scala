package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 training-pipeline additions: PII scrubbing, inverted-index
  * construction, rendezvous (consistent) shard assignment, and a
  * Heaps'-law vocabulary-growth profile. All four are corpus operations a
  * 100 TB pre-training pipeline runs routinely; none needs more than map
  * stages, partial-agg group-bys, and one tiny window.
  */
object Round4Ops {

  // Both engines run RE-based scrubbing; these patterns stay inside the
  // common Java-regex / RE2 subset (no lookaround, no backrefs).
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  // Distinct 3-gram shingles — same fragments the q46/q171 family uses.
  // Spark side expects a `toks` column (split text), DuckDB side inlines.
  private[ops] val sparkShingles =
    "array_distinct(transform(sequence(0, size(toks) - 3), " +
      "i -> concat_ws(' ', element_at(toks, i + 1), " +
      "element_at(toks, i + 2), element_at(toks, i + 3))))"
  private[ops] val duckShingles =
    "list_distinct(list_transform(range(len(string_split(text, ' ')) - 2), " +
      "i -> string_split(text, ' ')[i+1] || ' ' || " +
      "string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]))"

  val queries: Seq[Q] = Seq(
    // E8/pipeline: PII redaction. The synthetic corpus carries no PII, so
    // the query PLANTS deterministic emails/IPs on a doc_id schedule (both
    // engines construct the identical string), then scrubs with anchored
    // character-class regexes and reports per-doc redaction counts plus an
    // md5 of the scrubbed text — the redaction kernel is verified
    // bit-exact, not just counted. Scale shape: pure map stage (regex per
    // row), zero shuffles beyond the presentation sort; at 100 TB this
    // runs at scan speed and the md5 column doubles as the content hash
    // exact dedup wants downstream.
    Q(
      "q176_pii_scrub",
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    concat(text,
         |      CASE WHEN doc_id % 7 = 0
         |        THEN concat(' contact user', CAST(doc_id AS VARCHAR),
         |                    '@example.com now') ELSE '' END,
         |      CASE WHEN doc_id % 11 = 0
         |        THEN concat(' from 10.0.', CAST(doc_id % 256 AS VARCHAR),
         |                    '.7 net') ELSE '' END) AS t
         |  FROM documents),
         |scrubbed AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(t, '$emailRe')) AS n_email,
         |    len(regexp_extract_all(t, '$ipRe')) AS n_ip,
         |    regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'),
         |      '$ipRe', '<IP>', 'g') AS clean
         |  FROM planted)
         |SELECT doc_id, n_email, n_ip, md5(clean) AS clean_md5
         |FROM scrubbed
         |WHERE n_email + n_ip > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .withColumn("t", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".7 net"))).otherwise(lit(""))))
        .withColumn("n_email", regexp_count(col("t"), lit(emailRe)))
        .withColumn("n_ip", regexp_count(col("t"), lit(ipRe)))
        .withColumn("clean", regexp_replace(
          regexp_replace(col("t"), emailRe, "<EMAIL>"), ipRe, "<IP>"))
        .filter(col("n_email") + col("n_ip") > 0)
        .select(col("doc_id"), col("n_email"), col("n_ip"),
          md5(col("clean")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },

    // E8/retrieval: inverted-index construction — term → sorted posting
    // list of containing docs. Terms are 3-gram shingles (the corpus
    // vocabulary is 31 words, so word-level postings are all stopword-
    // class; the shingle space is ~30k terms with a real df tail). The
    // gate projects the rare-term slice (2 <= df <= 4) so output stays
    // bounded while the full index build is exercised. Scale shape: one
    // explode + one partial-agg groupBy on the term; posting lists are
    // collect_list + sort_array per term, so memory is bounded by the
    // largest df — at 100 TB stopword-class terms are excluded FIRST
    // (here by the df ceiling) precisely because their posting lists are
    // the unbounded ones. The postings column is stringified (driver
    // compare cannot sort array cells).
    Q(
      "q177_inverted_index",
      s"""WITH ex AS (
         |  SELECT doc_id, unnest($duckShingles) AS term
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3)
         |SELECT term, COUNT(*) AS df,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
         |FROM ex
         |GROUP BY term
         |HAVING COUNT(*) BETWEEN 2 AND 4
         |ORDER BY term""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(sparkShingles)).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          array_join(sort_array(collect_list(col("doc_id"))), ",")
            .as("postings"))
        .filter(col("df").between(2, 4))
        .orderBy(col("term"))
    },

    // Pipeline/layout: rendezvous (highest-random-weight) shard
    // assignment. The per-(doc, shard) weight is a squared LCG mod the
    // Mersenne prime 2^31-1: u = (doc*A + s*B) mod p, w = u² mod p —
    // the square is essential, since a weight LINEAR in s has its argmax
    // at the largest non-wrapping s (every doc would "move to the new
    // shard"); squaring breaks the linearity and spreads the argmax
    // uniformly (verified ~1/9 movement in Round4OpsSpec). The final
    // 16w + s keeps weights provably distinct within a doc (u² can
    // collide only when u₁ ≡ −u₂ mod p; the appended shard index breaks
    // any such tie deterministically), so the argmax is unambiguous in
    // both engines. The query assigns each doc under 8 shards AND under
    // 9, then reports per-shard counts with how many docs move — the
    // rendezvous property (a doc moves only TO the new shard, ~1/9 of
    // each shard) is the whole point vs mod-N hashing, where adding a
    // shard remaps ~8/9 of the corpus. Scale shape: one 9-way explode +
    // one partial-agg groupBy per doc + one tiny groupBy; resharding
    // decisions for a 100 TB corpus come out of a scan, no global state.
    Q(
      "q178_rendezvous_shard",
      """WITH w AS (
        |  SELECT doc_id, s,
        |    ((doc_id * 2654435761 + s * 40503) % 2147483647)
        |      * ((doc_id * 2654435761 + s * 40503) % 2147483647)
        |      % 2147483647 * 16 + s AS wt
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(0, 8)) AS s) sh),
        |assign AS (
        |  SELECT doc_id,
        |    arg_max(s, CASE WHEN s < 8 THEN wt ELSE -1 END) AS shard8,
        |    arg_max(s, wt) AS shard9
        |  FROM w GROUP BY doc_id)
        |SELECT shard8, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved_to_new
        |FROM assign
        |GROUP BY shard8
        |ORDER BY shard8""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(expr("sequence(0, 8)")).as("s"))
        .withColumn("u",
          (col("doc_id") * 2654435761L + col("s") * 40503L) % 2147483647L)
        .withColumn("wt", col("u") * col("u") % 2147483647L * 16 + col("s"))
        .groupBy(col("doc_id"))
        .agg(
          expr("max_by(s, CASE WHEN s < 8 THEN wt ELSE -1L END)").as("shard8"),
          expr("max_by(s, wt)").as("shard9"))
        .groupBy(col("shard8"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard9") =!= col("shard8"), 1).otherwise(0))
            .as("n_moved_to_new"))
        .orderBy(col("shard8"))
    },

    // Corpus analysis: Heaps'-law vocabulary growth — distinct shingle-
    // vocabulary size as the corpus grows decile by decile (deciles over
    // the doc_id range via integer arithmetic — `(doc_id * 10) // n` —
    // so the profile is deterministic and both engines bucket
    // identically; a double division would hit the DuckDB-rounds/
    // Spark-truncates CAST divergence). A term's first decile is
    // min(decile); cumulative vocabulary is a 10-row running sum.
    // Sublinear growth here is exactly what keeps prefix/LSH blocking
    // bucket sizes bounded as a real corpus scales — this query is the
    // measurement behind that design assumption. Scale shape: explode +
    // two partial-agg group-bys + a 10-row window; the window input is
    // O(deciles), never O(corpus).
    Q(
      "q179_heaps_law",
      s"""WITH m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
         |ex AS (
         |  SELECT CAST(LEAST((doc_id * 10) // m.n, 9) AS INT) AS decile,
         |    unnest($duckShingles) AS term
         |  FROM documents, m
         |  WHERE len(string_split(text, ' ')) >= 3),
         |fb AS (SELECT term, MIN(decile) AS first_decile FROM ex GROUP BY term),
         |nt AS (SELECT first_decile, COUNT(*) AS new_terms
         |       FROM fb GROUP BY first_decile)
         |SELECT first_decile AS decile, new_terms,
         |  CAST(SUM(new_terms) OVER (ORDER BY first_decile) AS BIGINT)
         |    AS cum_vocab
         |FROM nt
         |ORDER BY decile""".stripMargin) { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
      val n = docs.agg(max(col("doc_id")).as("mx"))
        .select((col("mx") + 1).as("n"))
      val ex = docs.crossJoin(broadcast(n))
        .select(least(expr("(doc_id * 10) div n"), lit(9)).cast("int")
          .as("decile"),
          split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("decile"), explode(expr(sparkShingles)).as("term"))
      import org.apache.spark.sql.expressions.Window
      ex.groupBy(col("term")).agg(min(col("decile")).as("first_decile"))
        .groupBy(col("first_decile")).agg(count(lit(1)).as("new_terms"))
        .select(col("first_decile").as("decile"), col("new_terms"),
          sum(col("new_terms"))
            .over(Window.orderBy(col("first_decile"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long").as("cum_vocab"))
        .orderBy(col("decile"))
    })
}
