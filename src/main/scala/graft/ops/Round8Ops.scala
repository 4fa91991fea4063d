package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8: graph serving over STORED PQ codes — the HNSW+PQ
  * composition (round-7 verdict task 6), the one serving shape of the
  * quantized-index family not yet demonstrated.
  *
  * q233's beam search ranked hop frontiers with full fixed-point
  * vectors; a production graph index over a 100 TB corpus cannot
  * afford the raw vectors on the serve path — it ranks the beam by
  * ASYMMETRIC DISTANCE (ADC) over the M-byte stored codes (q207's
  * discipline inside the hop loop) and touches true vectors only for
  * the final exact refine of top-C (q230's discipline). Both persisted
  * artifact families compose unchanged: the kNN-graph edges
  * (Round7Final, bucket-partitioned) supply the hops, the VecIndex
  * codes supply the ranking payload, and the broadcast PQ codebooks
  * turn each rank into a bounded integer-dot map stage.
  *
  * Scale shape: per hop, the candidate set is ≤ beam·DEG rows joined
  * broadcast against the code table; ADC is exact BIGINT arithmetic
  * (hash-identical across engines); the raw-vector table is read for
  * exactly PQC rows at the end. The exact top-10 referee (`in_exact`)
  * stays the measurement harness.
  *
  * Reference scope: the reference (PalNilsson/ask-duckdb) has no
  * vector index; this family is part of the training-data-pipeline
  * mandate.
  */
object Round8Ops {

  private val PQC = 16 // exact-refine width after the ADC-ranked beam

  /** The unrolled ADC-ranked hop chain: `fq<i>` is hop i's beam —
    * ranked by stored-code ADC, NOT the exact dot — and `v<i+1>g` the
    * expanded visited set (same expansion as Round7Final.hopChainSql).
    */
  private def adcHopChain: String =
    (1 to Round7Final.HOPS).map { i =>
      val p = i - 1
      val prev = if (p == 0) "v0" else s"v${p}g"
      s"""fq$p AS (SELECT f.vec_id FROM $prev f
         |  JOIN adcall a ON a.vec_id = f.vec_id
         |  ORDER BY a.adc DESC, f.vec_id ASC
         |  LIMIT ${Round7Final.BEAM}),
         |v${i}g AS MATERIALIZED (
         |  SELECT vec_id FROM $prev
         |  UNION
         |  SELECT e.dst AS vec_id FROM fq$p f
         |  JOIN edges e ON e.src = f.vec_id WHERE e.dst <> 0)"""
        .stripMargin
    }.mkString(",\n")

  val queries: Seq[Q] = Seq(
    // E7: HNSW+PQ — beam search over the persisted graph with hop
    // frontiers ranked by ADC over the stored codes; exact refine only
    // of the ADC top-PQC. Output: the served top-10 with its ADC and
    // exact scores plus the exact-referee membership flag.
    Q(
      "q241_graph_pq_serve",
      s"""WITH ${Round7Final.graphPrefixSql},
         |${Pq.pqChains},
         |${Pq.pqCodeEncs("embeddings", "_g")},
         |${Pq.duckCodesCte("codesg", "hard", "_g")},
         |qvq AS (SELECT iv AS qs FROM ivc WHERE vec_id = 0),
         |adcall AS MATERIALIZED (
         |  SELECT v.vec_id, ${Pq.duckAdcFromCodes} AS adc
         |  FROM codesg v
         |  ${Pq.duckAdcJoins}, qvq q),
         |$adcHopChain,
         |cand AS (
         |  SELECT a.vec_id, a.adc FROM v${Round7Final.HOPS}g s
         |  JOIN adcall a ON a.vec_id = s.vec_id
         |  ORDER BY a.adc DESC, a.vec_id ASC LIMIT $PQC),
         |ref AS (
         |  SELECT c.vec_id, c.adc,
         |    ${Pq.duckIntDot("i.iv", "q.qiv")} AS exact
         |  FROM cand c JOIN ivc i ON i.vec_id = c.vec_id, qv q)
         |SELECT r.vec_id, r.adc, r.exact,
         |  CAST(CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
         |    AS in_exact
         |FROM (SELECT * FROM ref ORDER BY exact DESC, vec_id ASC
         |  LIMIT 10) r
         |LEFT JOIN tope t ON r.vec_id = t.vec_id
         |ORDER BY r.exact DESC, r.vec_id ASC""".stripMargin) { (s, dir) =>
      graft.functions.ArrayDot.register(s)
      val e = Tables.table(s, dir, "embeddings")
      val (ivc, edges, hard) = Round7Final.graphArtifacts(s, dir)
      val cb = KMeans.codebook(s, e, KMeans.servingK(e), VecIndex.CITERS)
      val idx = VecIndex.artifacts(s, dir, "full", e)
      val codes = VecIndex.readCodes(s, idx)
      val cbRow = s.read.parquet(s"$idx/pq")
      val q0 = e.filter(col("vec_id") === 0)
        .select(expr(KMeans.scaleExpr("embedding")).as("qs"))
      def pin(df: DataFrame): DataFrame = {
        val cp = df.localCheckpoint(true)
        s.createDataFrame(cp.rdd, cp.schema)
      }
      // IVF-probed entry points — q233's v0 (min vec_id per probed cell)
      val wq = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdot").desc, col("cid").asc)
      val probes = e.filter(col("vec_id") === 0).crossJoin(broadcast(cb))
        .withColumn("cdot", expr(KMeans.dotFold("embedding", "cs")))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= Round7Final.NPROBE).select(col("cid"))
      val entries = hard
        .join(broadcast(probes), col("acell") === col("cid"))
        .filter(col("vec_id") =!= 0)
        .groupBy(col("acell")).agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id")).distinct()
      // ADC of a bounded visited frame: broadcast ids into the code
      // table, resolve codewords from the broadcast PQ codebooks —
      // never touches the raw vectors
      def adcOf(v: DataFrame): DataFrame =
        codes.join(broadcast(v), Seq("vec_id"))
          .crossJoin(broadcast(cbRow)).crossJoin(broadcast(q0))
          .withColumn("adc", expr(Pq.adcFromCodes))
          .select(col("vec_id"), col("adc"))
      def topBAdc(v: DataFrame): DataFrame =
        adcOf(v).orderBy(col("adc").desc, col("vec_id").asc)
          .limit(Round7Final.BEAM).select(col("vec_id"))
      var visited = pin(entries)
      for (_ <- 1 to Round7Final.HOPS) {
        // bounded ADC-ranked frontier collected to the driver (the
        // coordinator-resident frontier of a graph-ANN server):
        // local-relation broadcast + static bucket pruning of the
        // partitioned edges scan
        val frQ = topBAdc(visited)
        val frRows = frQ.collect()
        val frDf = s.createDataFrame(
            java.util.Arrays.asList(frRows: _*), frQ.schema)
          .withColumnRenamed("vec_id", "src")
        val buckets = frRows.map(_.getLong(0) % Round7Final.SRCB)
          .distinct.toSeq
        val nbrs = edges.filter(col("sb").isin(buckets: _*))
          .join(broadcast(frDf), Seq("src"))
          .select(col("dst").as("vec_id"))
          .filter(col("vec_id") =!= 0)
        visited = pin(visited.union(nbrs).distinct())
      }
      // exact refine of the ADC top-PQC only — the raw-vector read is
      // PQC rows, not the visited set, not the corpus
      val cand = adcOf(visited)
        .orderBy(col("adc").desc, col("vec_id").asc).limit(PQC)
      val qivd = ivc.filter(col("vec_id") === 0).head.getSeq[Double](1)
      val qdot = call_function("array_dot", col("ivd"), typedlit(qivd))
      val ref = ivc.join(broadcast(cand), Seq("vec_id"))
        .select(col("vec_id"), col("adc"), qdot.cast("bigint").as("exact"))
      val tope = ivc.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), qdot.cast("bigint").as("exact"))
        .orderBy(col("exact").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(1).as("hit"))
      ref.orderBy(col("exact").desc, col("vec_id").asc).limit(10)
        .join(broadcast(tope), Seq("vec_id"), "left")
        .select(col("vec_id"), col("adc"), col("exact"),
          coalesce(col("hit"), lit(0)).cast("int").as("in_exact"))
        .orderBy(col("exact").desc, col("vec_id").asc)
    }
  )
}
