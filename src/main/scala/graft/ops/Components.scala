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
  *   - larger edge sets run a distributed min-label contraction loop:
  *     per round every node takes the min label over itself and its
  *     neighbors' labels (one shuffle join on the edge set), then jumps
  *     to its current label's label (pointer doubling), giving O(log n)
  *     rounds on chain-shaped worst cases instead of O(diameter).
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

  /** Hard cap on contraction rounds. Min-label + pointer doubling halves
    * the label-chain depth per round, so convergence needs <= ~log2(n)
    * rounds — 64 covers any representable vertex set. Hitting the cap
    * therefore means the loop is NOT converging (e.g. a non-deterministic
    * edge source re-sampling per action) and must fail loud with
    * diagnostics instead of spinning shuffles forever.
    */
  val MaxContractRounds: Int = 64

  /** Telemetry: per-round changed-label counts of the most recent
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
    // symmetric closure + self-loops: every vertex appears as src
    val sym = fresh(spark,
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .union(edges.select(col("a").as("src"), col("a").as("dst")))
        .union(edges.select(col("b").as("src"), col("b").as("dst")))
        .distinct())
    var labels = sym.groupBy(col("src")).agg(min(col("dst")).as("label"))
      .withColumnRenamed("src", "node")
    var changed = 1L
    val rounds = Seq.newBuilder[Long]
    var round = 0
    while (changed > 0) {
      round += 1
      if (round > maxRounds) {
        lastContractRounds = rounds.result()
        throw new IllegalStateException(
          s"Components.contract did not converge after $maxRounds rounds " +
            s"(last round still changed $changed labels; per-round counts: " +
            s"${lastContractRounds.mkString(", ")}) — is the edge input " +
            "deterministic across actions?")
      }
      // min over neighbors' labels (self-loop ⇒ every node is its own
      // neighbor, so the inner join keeps all nodes)
      val viaNbr = sym
        .join(labels.withColumnRenamed("node", "n2"), col("dst") === col("n2"))
        .groupBy(col("src")).agg(min(col("label")).as("nl"))
      val stepped = labels
        .join(viaNbr, col("node") === col("src"))
        .select(col("node"), least(col("label"), col("nl")).as("l1"),
          col("label").as("l0"))
      // pointer doubling: follow the new label to ITS label (labels stay
      // within the component, so the min only tightens)
      val jumped = stepped
        .join(labels.select(col("node").as("jn"), col("label").as("jl")),
          col("l1") === col("jn"), "left")
        .select(col("node"),
          least(col("l1"), coalesce(col("jl"), col("l1"))).as("label"),
          col("l0"))
      val materialized = fresh(spark, jumped)
      changed = materialized.filter(col("label") < col("l0")).count()
      rounds += changed
      labels = materialized.select(col("node"), col("label"))
    }
    lastContractRounds = rounds.result()
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }
}
