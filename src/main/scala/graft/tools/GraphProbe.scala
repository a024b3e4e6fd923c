package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val edges = TextPipeline.simhashEdges(docs, 8).localCheckpoint()
    println(s"[graph] undirected edges=${edges.count()}")
    val comp = TextPipeline.dedupGroupsFromPairs(docs, edges)
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("n"))
    println("[graph] top component sizes:")
    sizes.orderBy(desc("n")).limit(10).collect().foreach(r => println(s"[graph]   comp=${r.getLong(0)} n=${r.getLong(1)}"))
    val hist = sizes.groupBy("n").agg(count(lit(1)).as("cnt")).orderBy("n")
    hist.collect().foreach(r => println(s"[graph] size=${r.getLong(0)} count=${r.getLong(1)}"))
    // degree distribution of the CC input
    val deg = edges.select(col("a")).union(edges.select(col("b")))
      .groupBy("a").agg(count(lit(1)).as("d"))
    println("[graph] max degrees:")
    deg.orderBy(desc("d")).limit(5).collect().foreach(r => println(s"[graph]   node=${r.getLong(0)} deg=${r.getLong(1)}"))
    spark.stop()
  }
}
