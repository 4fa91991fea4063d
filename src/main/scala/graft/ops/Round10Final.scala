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
  *
  * Reference scope: PalNilsson/ask-duckdb has no index tiers; 100 TB
  * training-data mandate (serving-infrastructure family).
  */
object Round10Final {

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
    })
}
