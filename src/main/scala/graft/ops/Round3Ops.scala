package graft.ops

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Round-3 gate additions: harness coverage for code paths that until now
  * were only unit-tested — the distributed connected-components contraction
  * loop (the 100 TB branch of Components.label) and the analyzer-level
  * fuzzy identifier repair running inside a real extension-enabled session.
  */
object Round3Ops {

  // One extension-enabled session per harness session, built lazily on the
  // SAME SparkContext (sessions are cheap; contexts are not) and cached
  // weakly so repeated gate runs don't pile up session state. getOrCreate
  // only applies withExtensions when it CREATES, so the default/active
  // slots are cleared for the build and restored right after — including
  // the None case: getOrCreate SETS the JVM-global default/active to the
  // new session, so when no session occupied a slot beforehand the slot
  // must be cleared back, or later vanilla getOrCreate callers would
  // silently inherit the fuzzy-resolution analyzer rule. The swap itself
  // is guarded by the map's monitor; concurrent getOrCreate callers
  // OUTSIDE this object could still race the global slots (JVM-global
  // state has no narrower lock) — the harness drives queries single-
  // threaded, which is the assumption this relies on.
  private val extSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  private[ops] def extensionSession(parent: SparkSession): SparkSession =
    extSessions.synchronized {
      Option(extSessions.get(parent)).getOrElse {
        val active = SparkSession.getActiveSession
        val default = SparkSession.getDefaultSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        val ext =
          try SparkSession.builder()
            .withExtensions(new graft.plans.GraftExtensions)
            .getOrCreate()
          finally {
            default match {
              case Some(d) => SparkSession.setDefaultSession(d)
              case None    => SparkSession.clearDefaultSession()
            }
            active match {
              case Some(a) => SparkSession.setActiveSession(a)
              case None    => SparkSession.clearActiveSession()
            }
          }
        extSessions.put(parent, ext)
        ext
      }
    }

  val queries: Seq[Q] = Seq(
    // Same answer as q141, but Components.label is FORCED onto the
    // distributed min-label contraction loop (maxSingleTaskEdges = 0) —
    // the branch a 100 TB edge set takes. q141 gates the small-edge-set
    // single-task branch; this row puts the pointer-doubling loop, its
    // per-round localCheckpoint + stats reset, and its convergence under
    // the same DuckDB oracle.
    Q(
      "q174_components_contraction",
      PipelineOps.dedupApplyOracle) { (s, dir) =>
      PipelineOps.dedupApply(s, dir, maxSingleTaskEdges = 0L)
    },

    // e2e gate for the analyzer extension (plans/FuzzyResolveColumns):
    // a typo'd column ('o_orderpriorty', 'o_ordstatus') goes through
    // spark.sql ON A SESSION WITH GraftExtensions INSTALLED and must
    // resolve to the intended columns — the oracle is the corrected
    // query. This exercises injectResolutionRule inside the analyzer's
    // fixed point in the harness path, not just in a unit spec.
    Q(
      "q175_fuzzy_resolve_sql",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val ext = extensionSession(s)
      Tables.table(ext, dir, "orders") // register views on the ext session
      ext.sql(
        """SELECT o_orderpriorty AS o_orderpriority, COUNT(*) AS n
          |FROM orders
          |WHERE o_ordstatus = 'O'
          |GROUP BY o_orderpriorty
          |ORDER BY o_orderpriorty""".stripMargin)
    })
}
