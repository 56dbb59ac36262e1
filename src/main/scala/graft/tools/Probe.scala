package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch probe for data/typing questions; not part of the library API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs  = Tables.documents(spark, dir)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val shingled = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingled.count")(shingled.count())

    val banded = shingled
      .withColumn("sig", Dedup.minhashSignature(col("sh")))
      .select(col("id"), explode(Dedup.bandHashes(col("sig"), 64, 16)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
    time("banded.count")(banded.count())

    val a = banded.select(col("band"), col("h"), col("id").as("da"))
    val b = banded.select(col("band"), col("h"), col("id").as("db"))
    val pairs = a.join(b, Seq("band", "h")).where(col("da") < col("db"))
      .select("da", "db").dropDuplicates("da", "db")
    time("pairs.count")(pairs.count())

    val cands = Dedup.lshCandidates(docs, "doc_id", "text")
    time("lshCandidates.count")(cands.count())

    val verified = Dedup.verifiedPairs(cands, 0.8)
    time("verified.count")(verified.count())

    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)
    time("minhashLshPairs.count")(full.count())

    val drop = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)
      .select(col("db").as("doc_id")).distinct()
    time("dedup_keep (anti)")(
      docs.join(drop, Seq("doc_id"), "left_anti").agg(count(lit(1))).collect())

    spark.stop()
  }
}
