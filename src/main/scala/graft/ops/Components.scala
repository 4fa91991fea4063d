package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list `(a, b)`, labeling
  * every vertex with the minimum vertex id of its component — the step
  * that turns q114's pairwise near-dup output into per-document cluster
  * ids.
  *
  * Two strategies behind a size switch:
  *
  *   - edge sets that fit one task (the common case: near-dup edges are
  *     orders of magnitude fewer than documents) run single-task
  *     union-find behind a repartition(1) boundary — upstream edge
  *     generation stays fully parallel;
  *   - larger edge sets run the alternating LARGE-STAR / SMALL-STAR
  *     contraction of Kiveris et al. ("Connected Components in
  *     MapReduce and Beyond", SoCC 2014): each round rewires every
  *     node's larger neighbors (large-star), then its smaller ones
  *     (small-star), onto the neighborhood minimum. Components contract
  *     to min-rooted stars in O(log² n) rounds REGARDLESS of graph
  *     diameter — the previous min-label-propagation loop was
  *     O(diameter) (information travels one edge per round however
  *     aggressively label chains are pointer-jumped), which measured 37
  *     rounds ≈ 13 s of per-round fixed job cost on the sf0.1 near-dup
  *     graph (diameter ~35); star contraction closes the same graph in
  *     a handful of rounds, and the edge set SHRINKS as it converges,
  *     so late rounds are cheap as well as few.
  *
  * Every contraction round BOTH localCheckpoints (truncating the logical
  * plan, which otherwise doubles per iteration) AND rebuilds the frame
  * from the checkpointed RDD — localCheckpoint alone keeps Catalyst's
  * size statistics, whose BigInt join-size products compound
  * exponentially across checkpointed iterations and eventually stall
  * planning.
  */
object Components {

  /** Default switch point: below this many edges, single-task union-find
    * (a few hundred MB of longs — trivially one task); above it, the
    * contraction loop.
    */
  val SingleTaskMaxEdges: Long = 2000000L

  /** Hard cap on contraction rounds. Alternating star rounds contract
    * any component in O(log² n) — 64 covers any representable vertex
    * set. Hitting the cap therefore means the loop is NOT converging
    * (e.g. a non-deterministic edge source re-sampling per action) and
    * must fail loud with diagnostics instead of spinning shuffles
    * forever.
    */
  val MaxContractRounds: Int = 64

  /** Telemetry: per-round edge-set-change counts of the most recent
    * contract() call on this JVM (head = round 1). Written once per call
    * (single harness thread); tests assert convergence behavior on it.
    */
  @volatile private[graft] var lastContractRounds: Seq[Long] = Seq.empty

  /** Label every vertex of `pairs` (columns a, b) with its component's
    * min vertex id. Returns (doc_id, component). `maxSingleTaskEdges` is
    * exposed so tests can force the contraction path.
    */
  def label(
      spark: SparkSession,
      pairs: DataFrame,
      maxSingleTaskEdges: Long = SingleTaskMaxEdges,
      maxRounds: Int = MaxContractRounds): DataFrame = {
    import spark.implicits._
    // materialize the (expensive) candidate join once: the count that
    // picks the strategy and the labeling both read the checkpoint
    val cp = pairs.toDF("a", "b").localCheckpoint(true)
    val edges = spark.createDataFrame(cp.rdd, cp.schema)
    if (edges.count() <= maxSingleTaskEdges)
      edges.as[(Long, Long)]
        .repartition(1)
        .mapPartitions(UnionFind.components)
        .toDF("doc_id", "component")
    else contract(spark, edges, maxRounds)
  }

  private def fresh(spark: SparkSession, df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    spark.createDataFrame(cp.rdd, cp.schema)
  }

  private def contract(
      spark: SparkSession, edges: DataFrame, maxRounds: Int): DataFrame = {
    // the vertex universe — needed at the end because star contraction
    // drops self-loops and isolated vertices along the way
    val nodes = fresh(spark,
      edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node"))).distinct())
    // canonical undirected edge set, self-loops dropped
    var e = fresh(spark,
      edges.select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    var changed = 1L
    val rounds = Seq.newBuilder[Long]
    var round = 0
    while (changed > 0) {
      round += 1
      if (round > maxRounds) {
        lastContractRounds = rounds.result()
        throw new IllegalStateException(
          s"Components.contract did not converge after $maxRounds rounds " +
            s"(last round still changed $changed edges; per-round counts: " +
            s"${lastContractRounds.mkString(", ")}) — is the edge input " +
            "deterministic across actions?")
      }
      // LARGE-STAR: every node n connects its LARGER neighbors to the
      // min of its closed neighborhood — long chains gain skip edges
      val sym = e.select(col("u").as("n"), col("v").as("w"))
        .union(e.select(col("v").as("n"), col("u").as("w")))
      val mins = sym.groupBy(col("n")).agg(min(col("w")).as("mw"))
        .select(col("n"), least(col("n"), col("mw")).as("m"))
      // e1 is consumed twice below but NOT checkpointed: the two
      // consumers share its shuffle via exchange reuse, and e2's
      // checkpoint resets lineage/stats once per round
      val e1 = sym.filter(col("w") > col("n"))
        .join(mins, Seq("n"))
        .select(col("m").as("u"), col("w").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // SMALL-STAR: every node v rewires its SMALLER neighbors (and
      // itself) onto their min — star trees flatten toward the root.
      // In canonical (u < v) form, v's smaller neighborhood is exactly
      // the edges that arrive at v.
      val minsS = e1.groupBy(col("v")).agg(min(col("u")).as("m"))
      val e2 = fresh(spark,
        e1.join(minsS, Seq("v"))
          .select(col("u").as("x"), col("m"))
          .union(minsS.select(col("v").as("x"), col("m")))
          .filter(col("x") =!= col("m"))
          .select(least(col("x"), col("m")).as("u"),
            greatest(col("x"), col("m")).as("v"))
          .distinct())
      // fixpoint = the round rewired nothing: same canonical edge set.
      // One full-outer join counts the symmetric difference — zero
      // exactly at the fixpoint, a faithful progress count before it.
      changed = e2.withColumn("r", lit(1))
        .join(e.withColumn("l", lit(1)), Seq("u", "v"), "full_outer")
        .filter(col("r").isNull || col("l").isNull).count()
      rounds += changed
      e = e2
    }
    lastContractRounds = rounds.result()
    // at the fixpoint every component is a single star rooted at its
    // min: each non-root points to the root along its one edge; roots
    // and isolated vertices label themselves. The left-join below
    // RELIES on v being unique in e — assert it and fail loud (like
    // the round-cap path) rather than silently emit duplicate doc_ids
    // if a non-star fixpoint ever slipped through the equality check.
    val Array(nv, ndv) = e.agg(
      count(col("v")), countDistinct(col("v"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(nv == ndv,
      s"contract fixpoint is not a star union: $nv edges but only " +
        s"$ndv distinct v — labeling join would duplicate doc_ids")
    nodes
      .join(e.select(col("v").as("node"), col("u").as("root")),
        Seq("node"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("root"), col("node")).as("component"))
  }
}
