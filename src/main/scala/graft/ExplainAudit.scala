package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audit: prints the formatted plan for the scale-critical
  * queries and greps for the properties a 100 TB deployment depends on —
  * parquet filter pushdown + column pruning, broadcast vs shuffle join
  * choice, TakeOrderedAndProject for top-k, and whole-stage codegen spans.
  *
  * Run: sbt "runMain graft.ExplainAudit [queryName ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_filter_predicates",
        "q04_sort_limit_offset", "q10_join_inner_broadcast",
        "q15_join_fact_fact", "q16_regional_volume", "q26_topk_heavy_hitters",
        "q28_json_filter", "q50_knn_bruteforce", "q59_custom_expr_dot")
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      def count(p: SparkPlan, pred: String => Boolean): Int = {
        var n = 0
        p.foreach(node => if (pred(node.nodeName)) n += 1)
        n
      }
      val txt = plan.toString
      println(s"-- audit: broadcastJoins=${count(plan, _.contains("BroadcastHashJoin"))}" +
        s" sortMergeJoins=${count(plan, _.contains("SortMergeJoin"))}" +
        s" topK=${count(plan, _.contains("TakeOrderedAndProject"))}" +
        s" wholeStageCodegen=${txt.split("WholeStageCodegen").length - 1}" +
        s" pushedFilters=${if (txt.contains("PushedFilters: [")) "yes" else "n/a"}")
    }
    spark.stop()
  }
}
