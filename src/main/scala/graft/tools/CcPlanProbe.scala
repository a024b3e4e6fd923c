package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.pipeline.TextPipeline

/** Dump the AQE-finalized physical plan of ONE CC propagation round at
  * sf0.1 — is the tiny comp frame broadcast, or does every round pay
  * shuffle exchanges? */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val pairs = TextPipeline.simhashEdges(docs, 8).localCheckpoint()
    val p2 = pairs.select("a", "b")
    val edges = p2.union(p2.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()

    var comp = edges.groupBy("a").agg(min("b").as("nb"))
      .select(col("a").as("doc_id"), least(col("a"), col("nb")).as("comp"))
      .localCheckpoint()

    val nbrMin = edges
      .join(comp.select(col("doc_id").as("b"), col("comp").as("bc")), Seq("b"))
      .groupBy(col("a").as("doc_id")).agg(min("bc").as("nbc"))
    val s1 = comp.join(nbrMin, Seq("doc_id"), "left")
      .select(col("doc_id"), col("comp").as("old"),
        least(col("comp"), coalesce(col("nbc"), col("comp"))).as("c1"))
    val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
    val round = s1.join(s1.select(col("doc_id").as("cid"), col("c1").as("cc")),
        col("c1") === col("cid"), "left")
      .select(col("doc_id"), col("old"), c2.as("comp"))

    round.foreach(_ => ()) // execute so AQE finalizes
    println("=== executed plan (one CC round) ===")
    println(round.queryExecution.executedPlan.toString.take(8000))
    println("=== edges stats: " + edges.queryExecution.optimizedPlan.stats)
    println("=== comp  stats: " + comp.queryExecution.optimizedPlan.stats)
    spark.stop()
  }
}
