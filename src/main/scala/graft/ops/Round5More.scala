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

  /** Shared CTE chain computing maximal duplicated runs: (da, db, diag,
    * grp) -> (cnt, sa, sb). Used by q204 (report) and q206 (apply).
    */
  private val spanCtes: String =
    s"""tk AS (
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
       |  HAVING COUNT(*) >= $MIN_RUN)""".stripMargin

  /** Spark side of `spanCtes`: all maximal duplicated runs of at least
    * MIN_RUN shingles, as (da, db, diag, cnt, sa, sb).
    *
    * Every shuffle through candidate generation is keyed on the 64-bit
    * xxhash64 of the shingle, never the 3-token string itself — the
    * string rides along as payload and exact string equality is
    * re-verified where it matters (the df groupBy keys on (hsh, sh);
    * the self-join keys on hsh with a post-join `sh = shb` filter), so
    * the result set is bit-identical to the string-keyed original:
    * a hash collision only costs a discarded candidate pair, never a
    * wrong one. The single explicit repartition(hsh) is the ONLY
    * exchange of shingle rows — the df aggregation, the rare semi-join
    * and both self-join sides all reuse it (hsh partitioning satisfies
    * every downstream clustering), so the tokenize+posexplode pass runs
    * once instead of three times.
    */
  private def spanRuns(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sg = d
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', element_at(toks, i + 1), " +
          "element_at(toks, i + 2), element_at(toks, i + 3)))"))
        .as(Seq("pos", "sh")))
      .withColumn("hsh", xxhash64(col("sh")))
      .repartition(col("hsh"))
    val rare = sg.groupBy(col("hsh"), col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= DF_CAP)
      .select(col("hsh"), col("sh"))
    val keyed = sg.join(rare, Seq("hsh", "sh"))
    keyed
      .select(col("hsh"), col("sh"), col("doc_id").as("da"),
        col("pos").as("pa"))
      .join(keyed.select(col("hsh"), col("sh").as("shb"),
        col("doc_id").as("db"), col("pos").as("pb")), Seq("hsh"))
      .where(col("sh") === col("shb") && col("da") < col("db"))
      .select(col("da"), col("db"), (col("pb") - col("pa")).as("diag"),
        col("pa"), col("pb"))
      .withColumn("grp", col("pa") - row_number().over(
        Window.partitionBy(col("da"), col("db"), col("diag"))
          .orderBy(col("pa"))))
      .groupBy(col("da"), col("db"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("cnt"), min(col("pa")).as("sa"),
        min(col("pb")).as("sb"))
      .filter(col("cnt") >= MIN_RUN)
  }

  // ------------------------------------------------------------------
  // q205: hashed importance-ratio data selection (DSIR-shaped)
  // ------------------------------------------------------------------

  /** Feature-hash buckets. At 100 TB this stays 4096 (or 10^5) — the
    * whole point of hashed importance weights is that the model size is
    * INDEPENDENT of the corpus: two bucket-count scans + one broadcast
    * array, never a vocabulary join.
    */
  private val BUCKETS = 4096

  /** Repo-standard token hash (q43's min-token-hash convention: seed 7,
    * mult 131, mod 1e9+7), reduced to a feature bucket.
    */
  private def sparkBucket(t: String): String =
    // codegen kernel (graft.functions.CharFold) — identical fold
    s"(char_fold($t, 7, 131) % $BUCKETS)"

  private def duckBucket(t: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($t, ''), " +
      "c -> CAST(unicode(c) AS BIGINT))), " +
      s"(a, b) -> (a * 131 + b) % 1000000007) % $BUCKETS"

  private val TGT = "src0"

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
      s"""WITH $spanCtes,
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
        spanRuns(Tables.table(s, dir, "documents"))
          .groupBy(col("da"), col("db"))
          .agg(max(struct(col("cnt"), (-col("sa")).as("nsa"),
            (-col("diag")).as("ndiag"))).as("b"))
          .select(col("da"), col("db"),
            (-col("b.nsa")).cast("bigint").as("start_a"),
            (-col("b.nsa") - col("b.ndiag")).cast("bigint").as("start_b"),
            (col("b.cnt") + 2).as("span_toks"))
          .orderBy(col("span_toks").desc, col("da").asc, col("db").asc)
          .limit(20)
    },

    // E6: span scrub APPLY — q204's find composed into the corpus
    // rewrite, completing find -> apply for sub-document dedup the way
    // q141 did for whole documents and q180 for fixed chunks. Policy:
    // every duplicated run keeps the EARLIER document's copy (da) and
    // the covered token positions are removed from the later one (db);
    // a fully-covered document rewrites to the empty string. The
    // rebuilt text is md5-verified (q180's discipline: the oracle must
    // reproduce the exact reassembled bytes, not just the counts).
    // Scale shape: span positions explode to at most sum-of-span-
    // lengths rows (bounded by the df-cap), the scrub is a left-anti
    // join on (doc_id, pos), and reassembly is q180's ordered
    // collect_list per document — partition key doc_id throughout.
    Q(
      "q206_span_scrub_apply",
      s"""WITH $spanCtes,
         |rem AS (
         |  SELECT DISTINCT db AS doc_id, u.pos
         |  FROM agg, LATERAL (SELECT unnest(generate_series(sb,
         |    sb + cnt + 1)) AS pos) u),
         |aff AS (SELECT DISTINCT doc_id FROM rem),
         |ptk AS (
         |  SELECT t.doc_id, u.i - 1 AS pos, t.toks[u.i] AS tok
         |  FROM tk t, LATERAL (SELECT unnest(generate_series(1,
         |    len(t.toks))) AS i) u
         |  WHERE t.doc_id IN (SELECT doc_id FROM aff)),
         |kept AS (
         |  SELECT p.doc_id, p.pos, p.tok
         |  FROM ptk p LEFT JOIN rem r
         |    ON p.doc_id = r.doc_id AND p.pos = r.pos
         |  WHERE r.doc_id IS NULL),
         |reb AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY pos) AS nt
         |  FROM kept GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_before,
         |  CAST(len(t.toks) AS BIGINT) - COALESCE(r.n_kept, 0)
         |    AS n_removed,
         |  md5(COALESCE(r.nt, '')) AS new_md5
         |FROM aff a
         |JOIN tk t ON a.doc_id = t.doc_id
         |LEFT JOIN reb r ON a.doc_id = r.doc_id
         |ORDER BY a.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
      val rem = spanRuns(d)
        .select(col("db").as("doc_id"),
          explode(expr("sequence(sb, sb + cnt + 1)")).as("pos"))
        .distinct()
      val aff = rem.select(col("doc_id")).distinct()
      val tkd = d
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .join(aff, Seq("doc_id"))
      val kept = tkd
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .join(rem, Seq("doc_id", "pos"), "left_anti")
      val reb = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          expr("concat_ws(' ', transform(array_sort(" +
            "collect_list(struct(pos, tok))), p -> p.tok))").as("nt"))
      tkd
        .select(col("doc_id"), size(col("toks")).cast("bigint")
          .as("n_before"))
        .join(reb, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_before"),
          (col("n_before") - coalesce(col("n_kept"), lit(0L)))
            .as("n_removed"),
          md5(coalesce(col("nt"), lit(""))).as("new_md5"))
        .orderBy(col("doc_id"))
    },

    // E8/pipeline: hashed importance-ratio data selection — the
    // DSIR-shaped "make the crawl look like the target domain" sampler
    // (Xie et al. 2023's public recipe, integerized). The target slice
    // (source = src0) and the raw rest are reduced to hashed-unigram
    // bucket counts; each bucket's importance weight is the integer
    // ratio ((tgt+1)*1e6) div (raw+1) (add-one smoothed, fixed-point —
    // the log-sum of the paper is replaced by a ratio-sum so both
    // engines stay in exact BIGINT arithmetic); each candidate
    // document scores the SUM of its tokens' bucket weights per token.
    // Scale shape: two bucket-count aggregations over a FIXED 4096-row
    // key space, one broadcast weight array, then a pure map stage —
    // the corpus is scanned twice and shuffled never (bucket counts
    // partial-aggregate to 4096 rows). Top-20 by per-token importance
    // via TakeOrderedAndProject.
    Q(
      "q205_importance_ratio",
      s"""WITH tok AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |cnt AS (
         |  SELECT ${duckBucket("t")} AS h,
         |    CAST(SUM(CASE WHEN source = '$TGT' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tgt,
         |    CAST(SUM(CASE WHEN source <> '$TGT' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS raw
         |  FROM tok GROUP BY 1),
         |wt AS (
         |  SELECT u.h, ((COALESCE(c.tgt, 0) + 1) * 1000000)
         |    // (COALESCE(c.raw, 0) + 1) AS w
         |  FROM (SELECT unnest(generate_series(0, ${BUCKETS - 1})) AS h) u
         |  LEFT JOIN cnt c ON u.h = c.h),
         |wa AS (SELECT list(w ORDER BY h) AS warr FROM wt),
         |scored AS (
         |  SELECT d.doc_id, d.source,
         |    len(string_split(d.text, ' ')) AS n_toks,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(d.text, ' '),
         |        t -> warr[CAST(${duckBucket("t")} AS BIGINT) + 1])),
         |      (a, b) -> a + b) AS score
         |  FROM documents d, wa
         |  WHERE d.source <> '$TGT')
         |SELECT doc_id, source, n_toks, score // n_toks AS imp_per_tok
         |FROM scored
         |ORDER BY imp_per_tok DESC, doc_id ASC LIMIT 20""".stripMargin) {
      (s, dir) =>
        val d = Tables.table(s, dir, "documents")
        val cnt = d
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .select(col("source"), expr(sparkBucket("t")).as("h"))
          .groupBy(col("h"))
          .agg(
            sum(when(col("source") === TGT, 1L).otherwise(0L)).as("tgt"),
            sum(when(col("source") =!= TGT, 1L).otherwise(0L)).as("raw"))
        val warr = s.range(BUCKETS).select(col("id").as("h"))
          .join(cnt, Seq("h"), "left")
          .select(col("h"), expr(
            "((coalesce(tgt, 0L) + 1) * 1000000) div " +
              "(coalesce(raw, 0L) + 1)").as("w"))
          .agg(expr("transform(array_sort(collect_list(struct(h, w))), " +
            "p -> p.w)").as("warr"))
        d.filter(col("source") =!= TGT)
          .crossJoin(broadcast(warr))
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("bigint").as("n_toks"),
            expr("aggregate(transform(split(text, ' '), " +
              s"t -> element_at(warr, CAST((${sparkBucket("t")}) AS INT) " +
              "+ 1)), 0L, (a, b) -> a + b)").as("score"))
          .select(col("doc_id"), col("source"), col("n_toks"),
            expr("score div n_toks").as("imp_per_tok"))
          .orderBy(col("imp_per_tok").desc, col("doc_id").asc)
          .limit(20)
    })
}
