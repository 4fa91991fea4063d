package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.UnionFind

/** Property tests for the q114 connected-components core: the union-find
  * labeling must equal a naive fixpoint transitive closure on arbitrary
  * small graphs, regardless of edge order.
  */
object UnionFindSpec extends Properties("UnionFind") {

  /** Reference implementation: iterate min-label over adjacency to fixpoint. */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var label = verts.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      for (v <- verts) {
        val m = (adj.getOrElse(v, Nil).map(label) :+ label(v)).min
        if (m < label(v)) { label += v -> m; changed = true }
      }
    }
    label
  }

  private val edgeGen = Gen.listOf(
    for { a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) } yield (a, b))

  property("labels equal the naive transitive-closure fixpoint") =
    forAll(edgeGen) { edges =>
      UnionFind.components(edges.iterator).toMap == naive(edges)
    }

  property("edge order does not change the labeling") =
    forAll(edgeGen) { edges =>
      UnionFind.components(edges.iterator).toSeq ==
        UnionFind.components(edges.reverse.iterator).toSeq
    }

  property("chain collapses to min; disjoint cliques stay separate") = {
    val chain = (1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cliques = Seq((20L, 21L), (21L, 22L), (30L, 31L))
    UnionFind.components(chain.iterator).toMap.values.toSet == Set(1L) &&
      UnionFind.components(cliques.iterator).toMap ==
        Map(20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)
  }
}
