package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-13 verdict's staleness gap, closed and locked: the
  * vector/graph artifact memos must re-validate on EVERY call, so an
  * in-session rewrite of the embeddings table rebuilds the served
  * index instead of serving stale — WITHOUT any test hook dropping the
  * in-JVM memo (that is exactly the path a long-lived session takes).
  */
class VecIndexStalenessSpec extends AnyFunSuite {

  private val src = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def available: Boolean =
    new java.io.File(src, "embeddings.parquet").exists()

  /** Copy the sf0.001 tables into a fresh scratch data dir the test
    * may rewrite (never touch /root/testdata itself).
    */
  private def cloneCorpus(): String = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_stale_").toString
    graft.Tables.names.foreach { n =>
      val from = java.nio.file.Paths.get(src, s"$n.parquet")
      if (java.nio.file.Files.isRegularFile(from))
        java.nio.file.Files.copy(from,
          java.nio.file.Paths.get(scratch, s"$n.parquet"))
      else {
        // partitioned table dir: copy files one level deep
        val dst = java.nio.file.Paths.get(scratch, s"$n.parquet")
        java.nio.file.Files.createDirectories(dst)
        java.nio.file.Files.list(from).forEach { f =>
          if (java.nio.file.Files.isRegularFile(f))
            java.nio.file.Files.copy(f, dst.resolve(f.getFileName))
        }
      }
    }
    scratch
  }

  /** Re-point the session catalog at `dir` with a FRESH file listing
    * (temp views snapshot their file index at registration; after an
    * on-disk rewrite a session re-resolves the catalog — this test is
    * about the ARTIFACT memo layer, not view staleness).
    */
  private def repoint(dir: String): Unit = {
    graft.Tables.registerAll(spark, src)
    graft.Tables.registerAll(spark, dir)
  }

  test("in-session embeddings rewrite rebuilds the IVF-PQ index, the " +
    "residual index, and the kNN graph — no memo drop, no fresh JVM") {
    assume(available, s"$src absent — skipping")
    val scratch = cloneCorpus()
    try {
      repoint(scratch)
      val e1 = graft.Tables.table(spark, scratch, "embeddings")
      val root = VecIndex.artifacts(spark, scratch, "full", e1)
      VecIndex.residArtifacts(spark, scratch, e1)
      Round7Final.graphArtifacts(spark, scratch)
      val (b1, g1) = (VecIndex.builds, Round7Final.graphBuilds)
      // unchanged corpus: every tier serves, none rebuilds
      VecIndex.artifacts(spark, scratch, "full", e1)
      VecIndex.residArtifacts(spark, scratch, e1)
      Round7Final.graphArtifacts(spark, scratch)
      assert(VecIndex.builds == b1 && Round7Final.graphBuilds == g1,
        "unchanged corpus was rebuilt instead of served")
      // REWRITE the embeddings table in-session: drop the odd half
      graft.Tables.load(spark, src, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .write.mode("overwrite")
        .parquet(s"$scratch/embeddings.parquet")
      repoint(scratch)
      val e2 = graft.Tables.table(spark, scratch, "embeddings")
      val root2 = VecIndex.artifacts(spark, scratch, "full", e2)
      assert(root2 == root, "artifact root must stay deterministic")
      assert(VecIndex.builds == b1 + 1,
        "in-session embeddings rewrite served a STALE IVF-PQ index")
      VecIndex.residArtifacts(spark, scratch, e2)
      assert(VecIndex.builds == b1 + 2,
        "in-session embeddings rewrite served a STALE residual index")
      Round7Final.graphArtifacts(spark, scratch)
      assert(Round7Final.graphBuilds == g1 + 1,
        "in-session embeddings rewrite served a STALE kNN graph")
      // and the rebuilt index really is the new corpus: codes cover
      // exactly the surviving vec_ids
      val n2 = e2.count()
      assert(VecIndex.readCodes(spark, root2)
        .select(col("vec_id")).distinct().count() == n2)
    } finally {
      val d = VecIndex.dirDigest(scratch)
      Seq(s"graft_vecidx_${d}_full", s"graft_vecidx_${d}_resid",
        s"graft_knngraph_$d").foreach(n =>
        ArtifactStore.deleteRecursive(ArtifactStore.root(n)))
      ArtifactStore.deleteRecursive(scratch)
      graft.Tables.registerAll(spark, src)
    }
  }
}
