package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted vector-index ARTIFACT lifecycle (SURVEY.md §2.3 E7): the
  * one place that builds the three on-disk artifacts a served IVF-PQ
  * index consists of —
  *
  *   `<root>/coarse` — the coarse codebook ([[KMeans.servingK]] cells,
  *                     corpus-derived k = max(4, floor(sqrt(n))/2)),
  *   `<root>/pq`     — the M per-subspace PQ codebooks (one row),
  *   `<root>/codes`  — the encoded corpus (vec_id, cid, c0..c{M-1}).
  *
  * Build is MEMOIZED per (dir, tag) per JVM, the KMeans.codebook
  * discipline applied to the whole artifact set: the first execution
  * pays the build, every later execution (q224's repeated Bench passes,
  * q225's ingest, q227's delete/compact) reads the files — so the
  * benchmark numbers of the serving gates measure what a serving
  * cluster actually pays (the round-6 verdict's "isolate serve-time"
  * task). The artifact path is DETERMINISTIC (derived from the data
  * dir, not createTempDirectory), and every build step writes with
  * overwrite — re-runs and fresh JVMs converge on identical files
  * instead of accumulating O(corpus) parquet per sweep (round-6
  * advice). The artifact content is fully deterministic in the corpus,
  * so cross-JVM rebuild-over-overwrite is safe.
  *
  * Consumers: q224 (build → serve), q225 (ingest into `codes` without
  * retraining), q227 (tombstone + compaction of `codes`).
  */
object VecIndex {

  private[ops] val CITERS = 2 // coarse Lloyd iterations (q74's geometry)

  // (data dir, corpus tag) -> built artifact root. Plain map under the
  // object lock: builds are rare, values are small strings, and the
  // deterministic path makes a lost entry merely a re-build.
  private val built =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** Artifact root for the corpus `e` drawn from `dir` (`tag`
    * distinguishes sliced corpora, e.g. q225's base split). Builds the
    * three artifacts at most once per JVM, then returns the path.
    */
  private[ops] def artifacts(
      s: SparkSession, dir: String, tag: String, e: DataFrame): String =
    built.synchronized {
      built.getOrElseUpdate((dir, tag), {
        val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          s"graft_vecidx_${Integer.toHexString(dir.hashCode)}_$tag")
          .toString
        KMeans.codebook(s, e, KMeans.servingK(e), CITERS)
          .write.mode("overwrite").parquet(s"$p/coarse")
        Pq.trainPq(s, e).write.mode("overwrite").parquet(s"$p/pq")
        Pq.pqEncode(
            KMeans.assign(e, s.read.parquet(s"$p/coarse")),
            s.read.parquet(s"$p/pq"))
          .write.mode("overwrite").parquet(s"$p/codes")
        p
      })
    }
}
