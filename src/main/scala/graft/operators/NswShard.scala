package graft.operators

import scala.collection.mutable

/**
 * Executor-side core of [[Ann.nswTopK]]: builds one single-layer
 * navigable-small-world graph over a shard's vectors and beam-searches a
 * probe through it (the flat predecessor of HNSW — Malkov et al.; the
 * search loop below is the standard SEARCH-LAYER with a bounded result
 * beam). Pure JVM code running inside `mapPartitions` — no Spark types,
 * no driver round-trips; the shard never leaves its task.
 *
 * Determinism contract (what makes the declared query reproducible):
 * vectors are inserted in caller-sorted order, the entry point is node 0,
 * and every similarity tie breaks on the smaller node index.
 */
private[operators] object NswShard {

  /** Build the shard graph over `items` and return the probe's local
    * top-k as (id, cosine) rows, best first. */
  def searchTopK(
      items: Array[(Long, Array[Double])],
      probe: Array[Double],
      k: Int, m: Int, ef: Int): Seq[(Long, Double)] = {
    val n     = items.length
    val vecs  = items.map(_._2)
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))

    def cos(q: Array[Double], qn: Double, i: Int): Double = {
      if (qn == 0.0 || norms(i) == 0.0) return 0.0
      val v = vecs(i)
      var s = 0.0
      var j = 0
      val d = math.min(q.length, v.length)
      while (j < d) { s += q(j) * v(j); j += 1 }
      s / (qn * norms(i))
    }

    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])

    /** Standard NSW beam search for `q` over nodes [0, bound): returns up
      * to `width` node indices, best-similarity first (ties → smaller id). */
    def beam(q: Array[Double], qn: Double, bound: Int, width: Int): Array[Int] = {
      if (bound <= 0) return Array.empty
      val simCache = mutable.HashMap.empty[Int, Double]
      def s(i: Int): Double = simCache.getOrElseUpdate(i, cos(q, qn, i))
      val visited = new java.util.BitSet(bound)
      // frontier dequeues the BEST open candidate (max sim, then min id)
      val frontier = mutable.PriorityQueue(0)(Ordering.by[Int, (Double, Int)](i => (s(i), -i)))
      // results dequeues the WORST retained node (min sim, then max id)
      val results = mutable.PriorityQueue(0)(Ordering.by[Int, (Double, Int)](i => (-s(i), i)))
      visited.set(0)
      var done = false
      while (!done && frontier.nonEmpty) {
        val c = frontier.dequeue()
        if (results.size >= width && s(c) < s(results.head)) done = true
        else adj(c).foreach { nb =>
          if (nb < bound && !visited.get(nb)) {
            visited.set(nb)
            if (results.size < width || s(nb) > s(results.head)) {
              frontier.enqueue(nb)
              results.enqueue(nb)
              if (results.size > width) results.dequeue()
            }
          }
        }
      }
      results.toArray.sortBy(i => (-s(i), i))
    }

    // --- construction: connect each node to its m nearest among the
    // already-inserted; bidirectional edges, degree capped at 2m ---------
    var i = 1
    while (i < n) {
      val qn = norms(i)
      val near = beam(vecs(i), qn, bound = i, width = math.max(ef, m)).take(m)
      near.foreach { nb =>
        adj(i) += nb
        adj(nb) += i
        if (adj(nb).length > 2 * m) {
          // prune the weakest edge of the over-full node (ties → larger id)
          // SYMMETRICALLY — removing it from only one side would leave a
          // dangling reverse edge, and a node all of whose neighbors pruned
          // it that way becomes unreachable (nothing points TO it). Skip
          // candidates this edge is the last edge OF, so no node is
          // orphaned; if every neighbor hangs by this edge, keep them all.
          val vn = norms(nb)
          val cands = adj(nb).sortBy(e => (cos(vecs(nb), vn, e), -e))
          cands.find(e => adj(e).length > 1).foreach { drop =>
            adj(nb)   -= drop
            adj(drop) -= nb
          }
        }
      }
      i += 1
    }

    val qn = math.sqrt(probe.map(x => x * x).sum)
    beam(probe, qn, bound = n, width = math.max(ef, k))
      .take(k)
      .map(idx => (items(idx)._1, cos(probe, qn, idx)))
      .toSeq
  }
}
