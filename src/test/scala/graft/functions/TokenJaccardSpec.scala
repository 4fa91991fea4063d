package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** TokenJaccard must compute exactly
  * |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)|
  * — checked against a plain Scala Set reference on arbitrary token
  * lists (the Spark-side equivalence to the composed built-ins is pinned
  * by the q46/q114 DuckDB oracle compare).
  */
object TokenJaccardSpec extends Properties("TokenJaccard") {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def eval(a: Seq[String], b: Seq[String]): Double = {
    val expr = TokenJaccard(null, null) // children unused by nullSafeEval
    def arr(xs: Seq[String]): ArrayData =
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    expr.nullSafeEval(arr(a), arr(b)).asInstanceOf[Double]
  }

  private def reference(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else sa.intersect(sb).size.toDouble / union
  }

  private val toks = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "ee", "f", ""))

  property("matches the set-algebra reference") =
    forAll(toks, toks) { (a, b) => eval(a, b) == reference(a, b) }

  property("symmetric and bounded") =
    forAll(toks, toks) { (a, b) =>
      val j = eval(a, b)
      j == eval(b, a) && j >= 0.0 && j <= 1.0
    }

  property("identical non-empty sets give 1.0") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr)) { a => eval(a, a) == 1.0 }
}
