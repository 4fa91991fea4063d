package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 release governance: the manifest-to-manifest diff.
  *
  *  - q290 RELEASE DIFF AUDIT: two releases of the dedup-survivor
  *    corpus — the base release (everything except a small
  *    deterministic delta wave) and the next release (base + delta) —
  *    compared SHARD BY SHARD through their q276-style manifests
  *    (row count + order-independent fingerprint per shard). The diff
  *    is what an incremental-release consumer actually verifies: which
  *    of the 32 shards changed, and whether every changed shard is
  *    explained by delta-sourced rows. The delta is a Knuth-hash
  *    admission band targeting 16 docs (q248's corpus-size-independent
  *    discipline), so most shards are byte-identical across releases —
  *    the diff is sparse at every SF, like a real incremental release.
  *
  * Reference scope: PalNilsson/ask-duckdb ships no releases
  * (README.md:1-65); 100 TB training-data mandate.
  */
object Round12Release {

  private val M = 1000000007L
  private val NSH = 32L // release shards
  private val DELTA_N = 16L // expected delta-wave size (docs)

  val queries: Seq[Q] = Seq(
    // Release hand-off: per-shard manifest diff. Survivors follow
    // q276's winner rule (min doc_id per md5) COMPUTED PER RELEASE —
    // a delta doc can displace a base winner, and the diff shows both
    // sides honestly. fpsum folds each doc's rolling text hash
    // order-independently (mod-M sum, q276's kernel), so shard
    // fingerprints are stable under any task order; `changed` compares
    // rows AND fingerprint. The report is driven from the full 0..31
    // shard spine: an untouched shard reports changed = 0 with its
    // identical numbers on both sides — that row IS the verification
    // the consumer skips re-downloading it. Everything after the two
    // scans is 32-row frames riding broadcasts.
    Q(
      "q290_release_diff_audit",
      s"""WITH bthr AS (
         |  SELECT LEAST(${Round11Ops.BMOD}, (${Round11Ops.BMOD}
         |    * $DELTA_N + GREATEST(CAST(COUNT(*) AS BIGINT), 1) - 1)
         |    // GREATEST(CAST(COUNT(*) AS BIGINT), 1)) AS t
         |  FROM documents),
         |fp AS MATERIALIZED (
         |  SELECT doc_id, md5(text) AS h,
         |    ${Round10More.duckHash("text")} AS tf,
         |    CASE WHEN ((doc_id % ${Round11Ops.BMOD})
         |      * ${Round11Ops.BMULT}) % ${Round11Ops.BMOD}
         |      < (SELECT t FROM bthr) THEN 1 ELSE 0 END AS isd
         |  FROM documents),
         |bw AS (SELECT h, MIN(doc_id) AS doc_id FROM fp WHERE isd = 0
         |  GROUP BY h),
         |nw AS (SELECT h, MIN(doc_id) AS doc_id FROM fp GROUP BY h),
         |bm AS (
         |  SELECT f.doc_id % $NSH AS shard,
         |    CAST(COUNT(*) AS BIGINT) AS base_rows,
         |    CAST(SUM(f.tf) % $M AS BIGINT) AS base_fp
         |  FROM fp f JOIN bw ON bw.h = f.h AND bw.doc_id = f.doc_id
         |  GROUP BY 1),
         |nm AS (
         |  SELECT f.doc_id % $NSH AS shard,
         |    CAST(COUNT(*) AS BIGINT) AS new_rows,
         |    CAST(SUM(f.tf) % $M AS BIGINT) AS new_fp,
         |    CAST(SUM(f.isd) AS BIGINT) AS n_delta
         |  FROM fp f JOIN nw ON nw.h = f.h AND nw.doc_id = f.doc_id
         |  GROUP BY 1),
         |spine AS (SELECT unnest(range($NSH)) AS shard)
         |SELECT s.shard, COALESCE(b.base_rows, 0) AS base_rows,
         |  COALESCE(n.new_rows, 0) AS new_rows,
         |  COALESCE(b.base_fp, 0) AS base_fp,
         |  COALESCE(n.new_fp, 0) AS new_fp,
         |  CAST(CASE WHEN COALESCE(b.base_rows, 0)
         |      <> COALESCE(n.new_rows, 0)
         |    OR COALESCE(b.base_fp, 0) <> COALESCE(n.new_fp, 0)
         |    THEN 1 ELSE 0 END AS BIGINT) AS changed,
         |  COALESCE(n.n_delta, 0) AS n_delta
         |FROM spine s
         |LEFT JOIN bm b ON b.shard = s.shard
         |LEFT JOIN nm n ON n.shard = s.shard
         |ORDER BY s.shard""".stripMargin) { (s, dir) =>
      val n = math.max(Tables.table(s, dir, "documents").count(), 1L)
      val thr = math.min(Round11Ops.BMOD,
        (Round11Ops.BMOD * DELTA_N + n - 1) / n)
      val fp = Tables.table(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"),
          expr(Round10More.sparkHash("text")).as("tf"),
          when(((col("doc_id") % Round11Ops.BMOD) * Round11Ops.BMULT) %
            Round11Ops.BMOD < thr, 1L).otherwise(0L).as("isd"))
      def manifest(rel: org.apache.spark.sql.DataFrame) = {
        val win = rel.groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"))
        rel.join(win, Seq("h", "doc_id"), "leftsemi")
          .groupBy((col("doc_id") % NSH).as("shard"))
      }
      val bm = manifest(fp.filter(col("isd") === 0))
        .agg(count(lit(1)).cast("bigint").as("base_rows"),
          (sum(col("tf")) % M).cast("bigint").as("base_fp"))
      val nm = manifest(fp)
        .agg(count(lit(1)).cast("bigint").as("new_rows"),
          (sum(col("tf")) % M).cast("bigint").as("new_fp"),
          sum(col("isd")).cast("bigint").as("n_delta"))
      import s.implicits._
      val spine = (0L until NSH).toDF("shard")
      spine.join(broadcast(bm), Seq("shard"), "left")
        .join(broadcast(nm), Seq("shard"), "left")
        .select(col("shard"),
          coalesce(col("base_rows"), lit(0L)).as("base_rows"),
          coalesce(col("new_rows"), lit(0L)).as("new_rows"),
          coalesce(col("base_fp"), lit(0L)).as("base_fp"),
          coalesce(col("new_fp"), lit(0L)).as("new_fp"),
          when(coalesce(col("base_rows"), lit(0L)) =!=
            coalesce(col("new_rows"), lit(0L)) ||
            coalesce(col("base_fp"), lit(0L)) =!=
              coalesce(col("new_fp"), lit(0L)), 1L).otherwise(0L)
            .cast("bigint").as("changed"),
          coalesce(col("n_delta"), lit(0L)).as("n_delta"))
        .orderBy(col("shard"))
    })
}
