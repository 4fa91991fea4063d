package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 gate invariants that the DuckDB oracle alone cannot express:
  * the ANN bucket-boundedness CONTRACT (q197's skew must stay under the
  * documented bound — the assertion the round-4 verdict asked for), the
  * commit-protocol state-equality proof (conflicted and replayed commits
  * change nothing), and the hash-path collision check.
  */
class Round5OpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def available: Boolean =
    new java.io.File(dir, "embeddings.parquet").exists()

  test("q197: both ANN blocking paths stay bucket-bounded") {
    assume(available, s"$dir absent — skipping")
    val rows = graft.SparkEntry.queries("q197_ann_bucket_stats")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq("centroid", "hyperplane"))
    rows.foreach { case (path, nItems, nBuckets, maxBucket, skewX100) =>
      assert(nBuckets > 1, s"$path: blocking collapsed to one bucket")
      assert(maxBucket < nItems,
        s"$path: one bucket holds the whole corpus")
      // the boundedness contract: max bucket <= 20x the mean bucket.
      // A degenerate codebook (all vectors to one centroid) or a
      // collapsed signature (all sign bits equal) lands far above this.
      assert(skewX100 < 2000,
        s"$path: max/mean bucket skew ${skewX100 / 100.0} >= 20")
    }
  }

  test("q201: the corpus-scaled signature stays bucket-bounded and " +
    "sizes itself to ~64-item buckets") {
    assume(available, s"$dir absent — skipping")
    val r = graft.SparkEntry.queries("q201_scaled_sig_stats")(spark, dir)
      .collect().head
    val (bits, nItems, nBuckets, skewX100) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7))
    assert(bits == Round5Ops.sigBits(nItems).toLong)
    assert(nBuckets > 1 && skewX100 < 2000,
      s"scaled signature degenerated: $nBuckets buckets, skew $skewX100")
    // the width formula's contract: expected bucket population <= 64
    assert(nItems <= (64L << bits),
      "signature width under-scaled for the corpus")
  }

  test("q198: conflicted and replayed commits provably leave the table " +
    "state unchanged") {
    assume(available, s"$dir absent — skipping")
    val rows = graft.SparkEntry.queries(
      "q198_merge_commit_protocol")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val events = rows.map(_._3).toSeq
    assert(events == Seq("committed", "committed", "conflict_detected",
      "committed", "skipped_idempotent"))
    // the stale writer's rejected commit changed nothing
    assert(rows(2).copy(_1 = 0L, _2 = "", _3 = "") ==
      rows(1).copy(_1 = 0L, _2 = "", _3 = ""),
      "conflict_detected mutated the table state")
    // the replayed batch changed nothing
    assert(rows(4).copy(_1 = 0L, _2 = "", _3 = "") ==
      rows(3).copy(_1 = 0L, _2 = "", _3 = ""),
      "idempotent replay mutated the table state")
    // versions advance only on real commits
    assert(rows.map(_._4).toSeq == Seq(1L, 2L, 2L, 3L, 3L))
  }

  test("q199: stateful-streaming throughput stays above the floor") {
    assume(available, s"$dir absent — skipping")
    val events = graft.Tables.table(spark, dir, "events").count()
    val t0 = System.nanoTime()
    val r = graft.SparkEntry.queries("q199_stream_throughput")(spark, dir)
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(1) == events, "pipeline dropped events")
    // non-regression floor, deliberately generous (sf0.001 wall time is
    // dominated by micro-batch bootstrap): catches a 100x throughput
    // regression (e.g. state store thrash, per-row commit), never flakes
    // on scheduler noise. SCALE.md records the real rows/s at sf1.
    val rowsPerSec = events / sec
    assert(rowsPerSec > 25,
      f"transformWithState throughput $rowsPerSec%.0f rows/s < 25 floor")
  }

  test("q200: 64-bit content digests are collision-free on the corpus") {
    assume(available, s"$dir absent — skipping")
    val r = graft.SparkEntry.queries("q200_dedup_hash_path")(spark, dir)
      .collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(3) == 0L,
      "64-bit md5 prefix collided — widen the dedup digest")
  }
}
