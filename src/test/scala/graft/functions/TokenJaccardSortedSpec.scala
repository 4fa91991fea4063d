package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** TokenJaccardSorted must agree EXACTLY with TokenJaccard on its
  * contract inputs (sorted duplicate-free arrays) — the merge kernel is
  * a cost optimization, never a semantic change. Sortedness uses
  * Spark's binary string order (UTF8String.compareTo), the same order
  * array_sort produces under the default binary collation.
  */
object TokenJaccardSortedSpec extends Properties("TokenJaccardSorted") {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def arr(xs: Seq[String]): ArrayData =
    ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)

  private def sortedDistinct(xs: Seq[String]): Seq[String] =
    xs.map(UTF8String.fromString).distinct.sorted
      .map(_.toString)

  private def evalSorted(a: Seq[String], b: Seq[String]): Double =
    TokenJaccardSorted(null, null)
      .nullSafeEval(arr(a), arr(b)).asInstanceOf[Double]

  private def evalHash(a: Seq[String], b: Seq[String]): Double =
    TokenJaccard(null, null)
      .nullSafeEval(arr(a), arr(b)).asInstanceOf[Double]

  private val toks =
    Gen.listOf(Gen.oneOf("a", "b", "c", "d", "ee", "f", "", "Z", "é"))

  property("agrees with TokenJaccard on sorted-distinct inputs") =
    forAll(toks, toks) { (a, b) =>
      val (sa, sb) = (sortedDistinct(a), sortedDistinct(b))
      evalSorted(sa, sb) == evalHash(sa, sb)
    }

  property("symmetric and bounded") =
    forAll(toks, toks) { (a, b) =>
      val (sa, sb) = (sortedDistinct(a), sortedDistinct(b))
      val j = evalSorted(sa, sb)
      j == evalSorted(sb, sa) && j >= 0.0 && j <= 1.0
    }

  property("identical non-empty sorted sets give 1.0") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr)) { a =>
      val sa = sortedDistinct(a)
      sa.isEmpty || evalSorted(sa, sa) == 1.0
    }
}
