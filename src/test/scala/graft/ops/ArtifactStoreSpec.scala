package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The Hadoop-FS artifact seam: marker round-trip, recursive table
  * signatures (partitioned layouts included), loud failure on missing
  * tables, and the re-entrant cross-process build lock.
  */
class ArtifactStoreSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_as_").toString

  test("marker round-trip: markerOk only after writeMarker with the " +
    "exact content; atomic variant replaces") {
    val root = tmp()
    try {
      assert(!ArtifactStore.markerOk(root, "v1"))
      ArtifactStore.writeMarker(root, "v1")
      assert(ArtifactStore.markerOk(root, "v1"))
      assert(!ArtifactStore.markerOk(root, "v2"))
      ArtifactStore.writeStringAtomic(
        ArtifactStore.markerPath(root), "v2")
      assert(ArtifactStore.markerOk(root, "v2"))
      assert(ArtifactStore.readString(
        ArtifactStore.markerPath(root)) == "v2")
    } finally ArtifactStore.deleteRecursive(root)
  }

  test("tableFileSig walks partition subdirectories (a rewrite of a " +
    "nested part file moves the signature) and fails loudly on a " +
    "missing table") {
    val dir = tmp()
    try {
      val t = java.nio.file.Paths.get(dir, "docs.parquet", "p=1")
      java.nio.file.Files.createDirectories(t)
      java.nio.file.Files.writeString(t.resolve("part-0"), "aa")
      val s1 = ArtifactStore.tableFileSig(dir, "docs")
      assert(s1.contains("p=1/part-0"),
        s"nested part file missing from signature: $s1")
      java.nio.file.Files.writeString(t.resolve("part-0"), "aaa")
      assert(ArtifactStore.tableFileSig(dir, "docs") != s1,
        "nested rewrite did not move the signature")
      intercept[IllegalArgumentException] {
        ArtifactStore.tableFileSig(dir, "absent")
      }
    } finally ArtifactStore.deleteRecursive(dir)
  }

  test("writeStringAtomic: a reader racing the publish sees old or " +
    "new content, never a missing file or a torn write") {
    val root = tmp()
    val path = s"$root/ptr.json"
    try {
      val bodies = Seq("A" * 64, "B" * 4096) // different lengths: a torn
      // write or a partial temp file would surface as a mixed read
      ArtifactStore.writeStringAtomic(path, bodies(0))
      @volatile var failure: Option[String] = None
      @volatile var done = false
      val reader = new Thread(() => {
        while (!done && failure.isEmpty) {
          try {
            val got = ArtifactStore.readString(path)
            if (!bodies.contains(got))
              failure = Some(s"torn read: ${got.take(20)}... " +
                s"len=${got.length}")
          } catch {
            case e: java.io.FileNotFoundException =>
              failure = Some(s"missing-file window: $e")
          }
        }
      })
      reader.start()
      for (i <- 1 to 200)
        ArtifactStore.writeStringAtomic(path, bodies(i % 2))
      done = true
      reader.join()
      assert(failure.isEmpty, failure.getOrElse(""))
      assert(ArtifactStore.readString(path) == bodies(0))
    } finally ArtifactStore.deleteRecursive(root)
  }

  test("gcScratch: prior-run tempRoot scratch is collected, this " +
    "JVM's own and deterministic digest roots survive includeOwn=false") {
    // a leftover from a "previous run": the exact name shape tempRoot
    // mints, but not registered by this JVM
    val leftover = ArtifactStore.root("graft_gcspec_deadbeef-001")
    ArtifactStore.mkdirs(leftover)
    // a deterministic marker-gated root: must never match the sweep
    val digestRoot = ArtifactStore.root("graft_gcspec_0123456789abcdef")
    ArtifactStore.mkdirs(digestRoot)
    val own = ArtifactStore.tempRoot("graft_gcspec")
    try {
      // scoped to this spec's prefix: the suite pool runs in parallel,
      // and an unscoped sweep here could collect a sibling suite's
      // live scratch (the mains call the unscoped gcScratch, alone in
      // their JVM)
      val deleted = ArtifactStore.gcScratchScoped(
        includeOwn = false, prefix = "graft_gcspec")
      assert(deleted.contains(leftover), s"leftover survived: $deleted")
      assert(!ArtifactStore.exists(leftover))
      assert(ArtifactStore.exists(own), "own live scratch was collected")
      assert(ArtifactStore.exists(digestRoot),
        "deterministic digest root was collected")
      // teardown semantics: includeOwn sweeps this JVM's scratch too
      val deleted2 = ArtifactStore.gcScratchScoped(
        includeOwn = true, prefix = "graft_gcspec")
      assert(deleted2.contains(own))
      assert(!ArtifactStore.exists(own))
      assert(ArtifactStore.exists(digestRoot))
    } finally {
      ArtifactStore.deleteRecursive(digestRoot)
      ArtifactStore.deleteRecursive(leftover)
    }
  }

  test("withBuildLock is re-entrant in-thread, serializes across " +
    "threads, and leaves the lock file behind the root") {
    val root = tmp()
    try {
      // re-entrant: nested acquisition of the same root must not throw
      val v = ArtifactStore.withBuildLock(root) {
        ArtifactStore.withBuildLock(root)(41) + 1
      }
      assert(v == 42)
      // two threads: the section runs strictly serialized
      val order = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val ts = (0 until 2).map { i =>
        new Thread(() => ArtifactStore.withBuildLock(root) {
          order.add(s"in$i"); Thread.sleep(50); order.add(s"out$i")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val seq = scala.jdk.CollectionConverters
        .ListHasAsScala(order).asScala.toList
      assert(Set(List("in0", "out0", "in1", "out1"),
        List("in1", "out1", "in0", "out0")).contains(seq),
        s"interleaved build sections: $seq")
      assert(ArtifactStore.exists(s"$root/_build.lock"))
    } finally ArtifactStore.deleteRecursive(root)
  }
}
