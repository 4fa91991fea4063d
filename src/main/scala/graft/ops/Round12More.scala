package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash

/** Round-12 stateful/composed pipeline shapes (the round-11 verdict's
  * "next round" items 7-8):
  *
  *  - q279 STREAMING DATASET CARD: q269's incremental card maintained
  *    from a MICRO-BATCH stream (q263's lifecycle) — per-batch histogram
  *    and fingerprint deltas folded into persisted state through a
  *    batchId-KEYED idempotent sink (each batch owns a b<id> subdir it
  *    OVERWRITES, so a crash-replayed batch rewrites its own delta
  *    instead of double-counting). The oracle is the static full
  *    recompute: hash equality proves fold-of-stream == rebuild
  *    (split-invariance by additivity).
  *  - q280 COMPOSED ASSEMBLY RING: round 11's corpus-assembly surface as
  *    ONE plan — decontaminate (q266) → repetition-filter (q267) →
  *    exact-dedup keep-first (q44/q268's winner rule) → temperature mix
  *    (q185) → concat-split pack (q264) — with per-stage
  *    Dataset.observe counters (q255) riding the single action. The
  *    oracle recomputes every stage cardinality, so the gate proves the
  *    observed pipeline metrics are the true ones AND that the five
  *    operators compose without re-reading the corpus per stage.
  *
  * Reference scope: PalNilsson/ask-duckdb keeps no state and composes
  * nothing (query_llm.py:419-506); these shapes come from the 100 TB mandate.
  */
object Round12More {

  private val M = 1000000007L
  private val WAVES = 4
  private[ops] val TMIX = 32L // q280: temperature-mix target (docs)

  // ---------------- q279: streaming card state ----------------

  /** Write the 4 deterministic arrival waves for the card stream:
    * primary slice doc_id % 4 == w plus the doc_id % 7 == w re-crawl
    * redelivery (Round11More's arrival model, carrying ntk for the
    * histogram), one parquet file per wave with strictly increasing
    * mtimes so the file stream processes them in wave order.
    */
  private def writeCardWaves(
      s: SparkSession, dir: String, src: String): Unit = {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("ntk"),
        md5(col("text")).as("h"))
    (0 until WAVES).foreach { w =>
      val stage = s"$src/_stage$w"
      docs.filter(col("doc_id") % WAVES === w)
        .unionByName(docs.filter(col("doc_id") % 7 === w))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = ArtifactStore.listEntries(stage)
        .find(_.endsWith(".parquet")).get
      val dst = f"$src/w$w%02d.parquet"
      ArtifactStore.move(s"$stage/$part", dst)
      ArtifactStore.setMtime(dst, 1000000000000L + w * 60000L)
      Round10More.rmTree(stage)
    }
  }

  /** Batch-id subdirs of `root` PRIOR to `batchId` (zero-padded names:
    * lexicographic == numeric). Replay safety depends on reading only
    * these: a crash-replayed batch must see exactly the state the
    * original attempt saw.
    */
  private[ops] def priorBatchDirs(root: String, batchId: Long): Seq[String] =
    ArtifactStore.listEntries(root)
      .filter(n => n.startsWith("b") && n < f"b$batchId%04d")
      .map(n => s"$root/$n").sorted

  /** Fold one micro-batch into the card state. IDEMPOTENT by layout:
    * the batch writes ONLY b<id> subdirs with mode=overwrite, derived
    * only from the batch content and PRIOR batches' state — replaying a
    * batch (crash recovery) rewrites the identical delta. Cross-batch
    * dedup: redelivered doc_ids are dropped against the prior seen
    * state; within-batch duplicates via dropDuplicates. The histogram
    * delta is additive (source, ntk) counts; the fingerprint delta is
    * the batch's NEW distinct (source, h) pairs.
    */
  private[ops] def foldCardBatch(
      s: SparkSession, root: String, batch: DataFrame,
      batchId: Long): Unit = {
    val priorSeen = priorBatchDirs(s"$root/seen", batchId)
    val uniq = batch.dropDuplicates("doc_id")
    val fresh0 =
      if (priorSeen.isEmpty) uniq
      else uniq.join(s.read.parquet(priorSeen: _*), Seq("doc_id"),
        "left_anti")
    // pinned: one execution feeds all three delta writes
    val fresh = fresh0.localCheckpoint(true)
    fresh.select(col("doc_id"))
      .write.mode("overwrite").parquet(f"$root/seen/b$batchId%04d")
    fresh.groupBy(col("source"), col("ntk"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .write.mode("overwrite").parquet(f"$root/hist/b$batchId%04d")
    val priorFps = priorBatchDirs(s"$root/fps", batchId)
    val fpDelta = fresh.select(col("source"), col("h")).distinct()
    (if (priorFps.isEmpty) fpDelta
     else fpDelta.join(s.read.parquet(priorFps: _*), Seq("source", "h"),
       "left_anti"))
      .write.mode("overwrite").parquet(f"$root/fps/b$batchId%04d")
    fresh.unpersist()
    ()
  }

  private val builtCards = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  /** Run the card-stream fold for `dir` and return the state root —
    * built once per (session, dir), the buildDedupStore discipline
    * (replay idempotence, proven in the spec, makes reuse safe).
    */
  private[ops] def buildCardState(s: SparkSession, dir: String): String =
    builtCards
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => buildCardStateFresh(s, dir))

  private def buildCardStateFresh(s: SparkSession, dir: String): String = {
    val src = Round6Ops.scratchDir(
      s"graft_cardwaves_${VecIndex.dirDigest(dir)}")
    val root = Round6Ops.scratchDir(
      s"graft_cardstate_${VecIndex.dirDigest(dir)}")
    writeCardWaves(s, dir, src)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ntk",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.StringType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) foldCardBatch(s, root, batch, batchId)
      }
      .start()
    Round6Ops.drainTo(q, s"$root/hist")
    root
  }

  val queries: Seq[Q] = Seq(
    // E12×governance: the streaming dataset card. The card is DERIVED
    // FROM STATE ONLY (batch-keyed histogram + fingerprint deltas);
    // the oracle recomputes the same card from the static corpus in one
    // pass — additivity makes the fold split-invariant, so the hash
    // compare proves the stream fold lost and double-counted nothing
    // (the redelivered doc_id % 7 slices make the dedup-before-count
    // stage demonstrably active). Exact percentiles come from the
    // merged histogram's cumulative counts (q269's order-statistic
    // argument: token lengths are small integers, the histogram IS the
    // order statistic).
    Q(
      "q279_stream_dataset_card",
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntk,
         |    md5(text) AS h
         |  FROM documents),
         |base AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(ntk) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_uniq
         |  FROM d GROUP BY source),
         |rk AS (
         |  SELECT source, ntk, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY ntk) AS rn
         |  FROM d),
         |pct AS (
         |  SELECT r.source,
         |    CAST(MAX(CASE WHEN r.rn = (b.n_docs + 1) // 2
         |      THEN r.ntk END) AS BIGINT) AS p50_ntk,
         |    CAST(MAX(CASE WHEN r.rn = (9 * b.n_docs + 9) // 10
         |      THEN r.ntk END) AS BIGINT) AS p90_ntk
         |  FROM rk r JOIN base b ON b.source = r.source
         |  GROUP BY r.source)
         |SELECT b.source, b.n_docs, b.n_tokens, b.n_uniq,
         |  p.p50_ntk, p.p90_ntk
         |FROM base b JOIN pct p ON p.source = b.source
         |ORDER BY b.source""".stripMargin) { (s, dir) =>
      val root = buildCardState(s, dir)
      val hist = s.read.parquet(s"$root/hist/b*")
        .groupBy(col("source"), col("ntk"))
        .agg(sum(col("cnt")).cast("bigint").as("cnt"))
      val tots = hist.groupBy(col("source"))
        .agg(sum(col("cnt")).cast("bigint").as("n_docs"),
          sum(col("ntk") * col("cnt")).cast("bigint").as("n_tokens"))
      val uniq = s.read.parquet(s"$root/fps/b*").groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_uniq"))
      val wcum = Window.partitionBy(col("source")).orderBy(col("ntk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(wcum))
        .join(broadcast(tots.select(col("source"), col("n_docs"))),
          Seq("source"))
      val pct = cum.groupBy(col("source"))
        .agg(
          min(when(col("cum") >= expr("(n_docs + 1) div 2"),
            col("ntk"))).cast("bigint").as("p50_ntk"),
          min(when(col("cum") >= expr("(9 * n_docs + 9) div 10"),
            col("ntk"))).cast("bigint").as("p90_ntk"))
      tots.join(broadcast(uniq), Seq("source"))
        .join(broadcast(pct), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_uniq"), col("p50_ntk"), col("p90_ntk"))
        .orderBy(col("source"))
    },

    // Pipeline: the composed corpus-assembly ring, ONE plan end to end.
    // Stage counts are collected with Dataset.observe (q255) riding the
    // single noop action; the oracle recomputes every stage, so the
    // gate proves the observed counters are the true cardinalities AND
    // that each stage's semantics survive composition (each stage here
    // reconciles with its standalone gate: 1↔q266, 2↔q267, 3↔q44's
    // winner rule, 4↔q185, 5-6↔q264). The input stream carries q184-
    // style re-crawl shadows (doc_id % 25 re-enters as doc_id + 1e6
    // with the same payload — this corpus has ZERO natural exact dups
    // at the gate SF), so the dedup stage is demonstrably ACTIVE. The
    // mix quota (TMIX = 32) bounds the pack input by construction, so
    // the pack's prefix-sum window reads <= 32 rows — corpus-size-
    // independent by design.
    Q(
      "q280_assembly_ring",
      s"""WITH din AS (
         |  SELECT doc_id, source, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, source, lang, text FROM documents
         |  WHERE doc_id % 25 = 0),
         |d0 AS MATERIALIZED (
         |  SELECT doc_id, source, lang, text,
         |    ${Round11Ops.duckPosTokenHashes} AS th,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntk,
         |    md5(text) AS h,
         |    ((doc_id % ${Round11Ops.BMOD}) * ${Round11Ops.BMULT})
         |      % ${Round11Ops.BMOD} AS badm
         |  FROM din),
         |bthr AS (
         |  SELECT LEAST(${Round11Ops.BMOD}, (${Round11Ops.BMOD}
         |    * ${Round11Ops.BENCH_N}
         |    + GREATEST(CAST(COUNT(*) AS BIGINT), 1) - 1)
         |    // GREATEST(CAST(COUNT(*) AS BIGINT), 1)) AS t
         |  FROM documents),
         |bg AS MATERIALIZED (
         |  SELECT DISTINCT unnest(
         |    ${Round11Ops.duckShingles(Round11Ops.DECON_W)}) AS g
         |  FROM d0
         |  WHERE badm < (SELECT t FROM bthr)
         |    AND len(th) >= ${Round11Ops.DECON_W}),
         |tr AS MATERIALIZED (
         |  SELECT * FROM d0 WHERE badm >= (SELECT t FROM bthr)),
         |contam AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM (SELECT doc_id,
         |          unnest(${Round11Ops.duckShingles(Round11Ops.DECON_W)})
         |            AS g
         |        FROM tr WHERE len(th) >= ${Round11Ops.DECON_W}) t
         |  JOIN bg b ON b.g = t.g),
         |s1 AS MATERIALIZED (
         |  SELECT * FROM tr
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |rep AS (
         |  SELECT doc_id,
         |    (1000000 * MAX(c) * 2) // MAX(ntk) AS top2,
         |    (1000000 * SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 2)
         |      // MAX(ntk) AS dup2
         |  FROM (SELECT doc_id, ntk, b, COUNT(*) AS c
         |        FROM (SELECT doc_id, ntk,
         |                unnest(${Round11Ops.duckBigramHashes()}) AS b
         |              FROM s1 WHERE len(th) >= 2)
         |        GROUP BY doc_id, ntk, b)
         |  GROUP BY doc_id),
         |s2 AS MATERIALIZED (
         |  SELECT s1.* FROM s1 JOIN rep r ON r.doc_id = s1.doc_id
         |  WHERE r.top2 <= ${Round11Ops.TOP2_THRESH}
         |    AND r.dup2 <= ${Round11Ops.DUP2_THRESH}),
         |s3 AS MATERIALIZED (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY h
         |      ORDER BY doc_id) AS dk FROM s2) WHERE dk = 1),
         |cntl AS (SELECT lang, COUNT(*) AS n FROM s3 GROUP BY lang),
         |tot AS (SELECT SUM(sqrt(n)) AS sw FROM cntl),
         |qf AS (
         |  SELECT lang, n, sqrt(n) / t.sw * $TMIX AS qf,
         |    CAST(floor(sqrt(n) / t.sw * $TMIX) AS BIGINT) AS fl
         |  FROM cntl, tot t),
         |lr AS (
         |  SELECT lang, fl,
         |    ROW_NUMBER() OVER (ORDER BY qf - fl DESC, lang ASC) AS rk,
         |    (SELECT $TMIX - SUM(fl) FROM qf) AS leftover
         |  FROM qf),
         |quota AS (
         |  SELECT lang, fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |    AS quota
         |  FROM lr),
         |keyed AS (
         |  SELECT s3.*, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY (doc_id * 2654435761) % 2147483647, doc_id) AS rn
         |  FROM s3),
         |s4 AS MATERIALIZED (
         |  SELECT k.* FROM keyed k
         |  JOIN quota q ON q.lang = k.lang AND k.rn <= q.quota),
         |c AS (
         |  SELECT doc_id, ntk,
         |    CAST(COALESCE(SUM(ntk + 1) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS st
         |  FROM s4),
         |pk AS (
         |  SELECT CAST(COALESCE(SUM(ntk + 1), 0) AS BIGINT) AS t,
         |    CAST(COALESCE(SUM(CASE WHEN st // ${Round11Ops.SEQ_LEN} <>
         |      (st + ntk - 1) // ${Round11Ops.SEQ_LEN} THEN 1 ELSE 0
         |      END), 0) AS BIGINT) AS spl
         |  FROM c)
         |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COALESCE(SUM(ntk), 0) AS BIGINT) AS n_tokens FROM d0
         |UNION ALL SELECT 1, 'decon_kept', COUNT(*),
         |  CAST(COALESCE(SUM(ntk), 0) AS BIGINT) FROM s1
         |UNION ALL SELECT 2, 'repetition_kept', COUNT(*),
         |  CAST(COALESCE(SUM(ntk), 0) AS BIGINT) FROM s2
         |UNION ALL SELECT 3, 'dedup_kept', COUNT(*),
         |  CAST(COALESCE(SUM(ntk), 0) AS BIGINT) FROM s3
         |UNION ALL SELECT 4, 'mix_selected', COUNT(*),
         |  CAST(COALESCE(SUM(ntk), 0) AS BIGINT) FROM s4
         |UNION ALL SELECT 5, 'packed_seqs',
         |  (t + ${Round11Ops.SEQ_LEN - 1}) // ${Round11Ops.SEQ_LEN}, t
         |FROM pk
         |UNION ALL SELECT 6, 'split_docs', spl, 0 FROM pk
         |ORDER BY stage""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.Observation
      val docs = Tables.table(s, dir, "documents")
      val n = math.max(docs.count(), 1L)
      val thr = math.min(Round11Ops.BMOD,
        (Round11Ops.BMOD * Round11Ops.BENCH_N + n - 1) / n)
      val badm = ((col("doc_id") % Round11Ops.BMOD) * Round11Ops.BMULT) %
        Round11Ops.BMOD
      val metrics = Seq(
        count(lit(1)).cast("bigint").as("n_docs"),
        coalesce(sum(col("ntk")), lit(0L)).cast("bigint").as("n_tokens"))
      val o0 = Observation("raw")
      val o1 = Observation("decon_kept")
      val o2 = Observation("repetition_kept")
      val o3 = Observation("dedup_kept")
      val o4 = Observation("mix_selected")
      val o5 = Observation("pack")
      val din = docs.select(col("doc_id"), col("source"), col("lang"),
          col("text"))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            col("lang"), col("text")))
      val d0 = din
        .withColumn("th", TextHash.tokenHashesPos(col("text")))
        .withColumn("ntk",
          size(split(col("text"), " ")).cast("bigint"))
        .withColumn("h", md5(col("text")))
        .observe(o0, metrics.head, metrics(1))
      // stage 1: decontaminate (q266's broadcast bench shingles)
      val bg = d0.filter(badm < thr &&
          size(col("th")) >= Round11Ops.DECON_W)
        .select(explode(array_distinct(TextHash.posGrams(col("th"),
          Round11Ops.DECON_W))).as("g"))
        .distinct()
      val tr = d0.filter(badm >= thr)
      val contam = tr.filter(size(col("th")) >= Round11Ops.DECON_W)
        .select(col("doc_id"),
          explode(array_distinct(TextHash.posGrams(col("th"),
            Round11Ops.DECON_W))).as("g"))
        .join(broadcast(bg), Seq("g"), "leftsemi")
        .select(col("doc_id")).distinct()
      val s1 = tr.join(contam, Seq("doc_id"), "left_anti")
        .observe(o1, metrics.head, metrics(1))
      // stage 2: Gopher repetition filter (q267's pass rule)
      val rep = s1.filter(size(col("th")) >= 2)
        .select(col("doc_id"), col("ntk"),
          explode(TextHash.posGrams(col("th"), 2)).as("b"))
        .groupBy(col("doc_id"), col("ntk"), col("b"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(expr("(1000000 * MAX(c) * 2) div MAX(ntk)").as("top2"),
          expr("(1000000 * SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 2)" +
            " div MAX(ntk)").as("dup2"))
        .filter(col("top2") <= Round11Ops.TOP2_THRESH &&
          col("dup2") <= Round11Ops.DUP2_THRESH)
        .select(col("doc_id"))
      val s2 = s1.join(rep, Seq("doc_id"), "leftsemi")
        .observe(o2, metrics.head, metrics(1))
      // stage 3: exact-dedup keep-first (q44/q268's winner rule)
      val s3 = s2.withColumn("dk", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("doc_id"))))
        .filter(col("dk") === 1).drop("dk")
        .observe(o3, metrics.head, metrics(1))
      // stage 4: temperature mix (q185's sqrt-quota, largest remainder)
      val cntl = s3.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val swt = cntl.agg(sum(sqrt(col("n"))).as("sw"))
      val qf = cntl.crossJoin(broadcast(swt))
        .withColumn("qf", sqrt(col("n")) / col("sw") * TMIX)
        .withColumn("fl", floor(col("qf")).cast("long"))
      val lo = qf.agg((lit(TMIX) - sum(col("fl"))).as("leftover"))
      val quota = qf.crossJoin(broadcast(lo))
        .withColumn("rk", row_number().over(
          Window.orderBy((col("qf") - col("fl")).desc, col("lang").asc)))
        .select(col("lang"),
          (col("fl") + when(col("rk") <= col("leftover"), 1).otherwise(0))
            .as("quota"))
      val s4 = s3.withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(pmod(col("doc_id") * 2654435761L, lit(2147483647L)),
              col("doc_id"))))
        .join(broadcast(quota), Seq("lang"))
        .filter(col("rn") <= col("quota"))
        .observe(o4, metrics.head, metrics(1))
      // stage 5: concat-split pack (q264) — the mix quota bounds this
      // to <= TMIX rows, so the prefix-sum window is tiny by
      // construction (not by corpus size)
      val c = s4
        .withColumn("st", coalesce(sum(col("ntk") + 1).over(
          Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .observe(o5,
          coalesce(sum(col("ntk") + 1), lit(0L)).cast("bigint").as("t"),
          coalesce(sum(when(
            expr(s"st div ${Round11Ops.SEQ_LEN}") =!=
              expr(s"(st + ntk - 1) div ${Round11Ops.SEQ_LEN}"), 1L)
            .otherwise(0L)), lit(0L)).cast("bigint").as("spl"))
      c.write.mode("overwrite").format("noop").save() // the one action
      val L = Round11Ops.SEQ_LEN
      val t = o5.get("t").asInstanceOf[Long]
      val spl = o5.get("spl").asInstanceOf[Long]
      val rows = Seq(
        (0L, "raw", o0.get("n_docs").asInstanceOf[Long],
          o0.get("n_tokens").asInstanceOf[Long]),
        (1L, "decon_kept", o1.get("n_docs").asInstanceOf[Long],
          o1.get("n_tokens").asInstanceOf[Long]),
        (2L, "repetition_kept", o2.get("n_docs").asInstanceOf[Long],
          o2.get("n_tokens").asInstanceOf[Long]),
        (3L, "dedup_kept", o3.get("n_docs").asInstanceOf[Long],
          o3.get("n_tokens").asInstanceOf[Long]),
        (4L, "mix_selected", o4.get("n_docs").asInstanceOf[Long],
          o4.get("n_tokens").asInstanceOf[Long]),
        (5L, "packed_seqs", (t + L - 1) / L, t),
        (6L, "split_docs", spl, 0L))
      import s.implicits._
      rows.toDF("stage", "name", "n_docs", "n_tokens")
        .orderBy(col("stage"))
    })
}
