package graft.repair

import scala.collection.mutable

/** Port of Python difflib's `SequenceMatcher.ratio()` (Ratcliff-Obershelp):
  * ratio = 2*M / (len(a)+len(b)) where M is the total size of the matching
  * blocks found by recursively taking the longest matching substring.
  *
  * The reference relies on `difflib.get_close_matches(tok, columns, n=1,
  * cutoff=0.86)` for fuzzy identifier repair (query_llm.py:252-264); this
  * port reproduces the ratio for the short identifier strings involved
  * (difflib's autojunk heuristic only activates for sequences >200 chars,
  * never the case for identifiers, so it is intentionally omitted —
  * SURVEY.md §7.4 trap #7).
  */
object SequenceMatcher {

  private def findLongestMatch(
      a: String, b: String, b2j: Map[Char, Seq[Int]],
      alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo
    var bestj = blo
    var bestsize = 0
    var j2len = mutable.Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = mutable.Map.empty[Int, Int]
      b2j.getOrElse(a(i), Nil).foreach { j =>
        if (j >= blo && j < bhi) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len(j) = k
          if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
        }
      }
      j2len = newj2len
      i += 1
    }
    (besti, bestj, bestsize)
  }

  /** Total matched characters across all matching blocks. */
  def matchingTotal(a: String, b: String): Int = {
    val b2j: Map[Char, Seq[Int]] =
      b.zipWithIndex.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSeq }
    var total = 0
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = findLongestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        if (alo < i && blo < j) queue.push((alo, i, blo, j))
        if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
      }
    }
    total
  }

  def ratio(a: String, b: String): Double = {
    val len = a.length + b.length
    if (len == 0) 1.0
    else 2.0 * matchingTotal(a, b) / len
  }

  /** difflib.get_close_matches(word, possibilities, n=1, cutoff): best
    * match at or above the cutoff, ties resolved by first-listed (difflib
    * keeps the earlier entry on equal ratios).
    */
  def closestMatch(
      word: String,
      possibilities: Seq[String],
      cutoff: Double = 0.86): Option[String] = {
    var best: Option[(String, Double)] = None
    possibilities.foreach { p =>
      val r = ratio(word, p)
      if (r >= cutoff && best.forall(_._2 < r)) best = Some((p, r))
    }
    best.map(_._1)
  }
}
