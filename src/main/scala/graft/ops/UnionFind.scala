package graft.ops

/** Min-root union-find with path compression — the single-task core of
  * q114's connected components (see DepthOps). Kept as a pure function so
  * the labeling can be property-tested against a naive transitive closure.
  */
object UnionFind {

  /** Label every vertex appearing in `edges` with the minimum vertex id
    * of its connected component. Output is sorted by vertex id.
    */
  def components(edges: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { // min id becomes the root
        if (rx < ry) parent(ry) = rx else parent(rx) = ry
      }
    }
    parent.keysIterator.map(k => (k, find(k))).toSeq.sortBy(_._1).iterator
  }
}
