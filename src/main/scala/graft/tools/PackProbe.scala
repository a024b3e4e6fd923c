package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the packSequences two-pass pid alignment under a
  * Verify-like session (AQE on). */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        coalesce(graft.analysis.Analyzer.docLenCol(col("text")).cast("long"), lit(0L))
          .as("n_tokens"))
    val sorted = d.repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions("doc_id").localCheckpoint()
    println("rdd partitions: " + sorted.rdd.getNumPartitions)
    val tot = sorted.groupBy(spark_partition_id().as("pid")).agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    println("totByPid: " + tot.mkString(", "))
    val pass2 = sorted.as[(Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val rows = it.toArray
      Iterator.single((pid, rows.length, rows.map(_._2).sum, rows.headOption.map(_._1).getOrElse(-1L)))
    }.collect().sortBy(_._1)
    println("pass2 pids: " + pass2.mkString(", "))
    spark.stop()
  }
}
