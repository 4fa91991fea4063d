package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The analyzer-injected fuzzy resolver: typo'd columns resolve to the
  * closest real column; garbage still fails analysis.
  */
class FuzzyResolveSpec extends AnyFunSuite {

  // a dedicated session carrying the extension (shares the SparkContext
  // with any session other suites created)
  lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // keep other suites' view of the world intact
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  def fixture(): Unit = {
    import spark.implicits._
    Seq(("alpha", "online", 8), ("beta", "offline", 16))
      .toDF("queue", "status", "corecount")
      .createOrReplaceTempView("fuzzy_queuedata")
  }

  test("typo'd identifiers resolve through the analyzer rule") {
    fixture()
    val rows = spark.sql(
      "SELECT queue, corecont FROM fuzzy_queuedata WHERE statu = 'online'")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("alpha"))
    assert(rows.head.getInt(1) == 8)
  }

  test("hopeless identifiers still fail analysis") {
    fixture()
    intercept[AnalysisException] {
      spark.sql("SELECT completely_wrong FROM fuzzy_queuedata").collect()
    }
  }

  test("exact columns are untouched (rule only fires on unresolved)") {
    fixture()
    val rows = spark.sql(
      "SELECT status FROM fuzzy_queuedata ORDER BY status").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("offline", "online"))
  }
}
