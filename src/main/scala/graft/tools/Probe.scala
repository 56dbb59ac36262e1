package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for data/typing questions; not part of the library API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    val ev2 = ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    ev2.show(3, truncate = false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select(col("doc_id"), substring(col("text"), 1, 120).as("head"), col("lang"), col("n_chars"))
      .show(5, truncate = false)
    spark.stop()
  }
}
