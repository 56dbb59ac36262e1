package graft.operators

/**
 * Measurement bridge for the NSW shard-size scaling experiment
 * (`Probe --nsw-scaling`; VERDICT r14 task 7): [[NswShard]] is
 * `private[operators]` by design, so the single-threaded build/search
 * timings the experiment needs — free of Spark job-launch overhead,
 * which at ~100 ms/job would swamp a millisecond-scale beam search and
 * bias the growth curve SUBlinear — are taken here, inside the package.
 *
 * The question it answers: [[Ann.nswTopK]] builds single-layer
 * navigable-small-world graphs per shard and bounds shard size
 * (`maxShardRows`), arguing that the hierarchy of HNSW (layered entry
 * points) is unnecessary because per-shard n is capped. That argument
 * needs a NUMBER: if per-probe beam-search cost grows superlinearly in
 * shard n, the cap is load-bearing and the bound must be kept (or the
 * hierarchy built); if it grows ~log-linearly, the cap is a latency
 * knob, not a correctness-of-scale one. The committed result lives next
 * to the claim in BASELINE.md.
 */
object NswScalingProbe {

  /** Build one shard graph of `n` Gaussian vectors and time `nProbes`
    * beam searches over the PREBUILT graph (the serving path — build
    * cost is reported separately). Probes are small perturbations of
    * corpus members (the planted-cluster regime every recall spec uses).
    * Returns (buildSec, searchMsMedian, searchMsP90, meanDegree); the
    * per-probe wall-clock is the cost measure (single-threaded, no job
    * launch in the loop), mean degree sanity-checks that the graphs
    * being compared have the same edge budget per node. */
  def measure(n: Int, dim: Int, m: Int, ef: Int,
      nProbes: Int, seed: Int): (Double, Double, Double, Double) = {
    val rnd   = new scala.util.Random(seed)
    val vecs  = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    val t0    = System.nanoTime()
    val adj   = NswShard.buildAdj(vecs, norms, m, ef)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val items = Array.tabulate(n)(i => (i.toLong, vecs(i)))
    val adjArr: Array[Array[Int]] = adj.map(_.toArray)
    val warm = NswShard.searchPrebuilt(items, adjArr, vecs(0), 10, ef)
    require(warm.nonEmpty, "empty search result on a non-empty shard")
    val times = (0 until nProbes).map { p =>
      val base  = vecs(rnd.nextInt(n))
      val probe = base.map(x => x + 0.01 * rnd.nextGaussian())
      val s0 = System.nanoTime()
      val r  = NswShard.searchPrebuilt(items, adjArr, probe, 10, ef)
      val ms = (System.nanoTime() - s0) / 1e6
      require(r.nonEmpty)
      ms
    }.sorted
    val med = times(times.length / 2)
    val p90 = times(math.min(times.length - 1, (times.length * 9) / 10))
    val meanDeg = adjArr.iterator.map(_.length).sum.toDouble / n
    (buildSec, med, p90, meanDeg)
  }
}
