package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: symmetric edge doubling via union(flip) — two evaluations of
  * the pair DAG above its last exchange — vs explode(array(fwd, rev))
  * — one evaluation, narrow row doubling. Times the localCheckpoint
  * materialization (the shape dedupGroupsFromPairs pays); parity =
  * count + sum over both columns. */
object EdgeFlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()

    def viaUnion(pairsIn: DataFrame): DataFrame = {
      val pairs = pairsIn.select("a", "b")
      pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
    }
    def viaExplode(pairsIn: DataFrame): DataFrame =
      pairsIn.select(explode(array(
          struct(col("a").as("a"), col("b").as("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))

    def run(tag: String, mk: () => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val e = mk().localCheckpoint()
      val w = (System.nanoTime() - t0) / 1e9
      val r = e.agg(count(lit(1)), sum(col("a") + col("b"))).collect()(0)
      (w, r.getLong(0), r.getLong(1))
    }

    for (rep <- 1 to 3) {
      for ((src, mkPairs) <- Seq(
          "simhash" -> (() => TextPipeline.simhashEdges(docs, 8)),
          "jaccard" -> (() => TextPipeline.ngramJaccardPairs(docs, 0.8)))) {
        val (wU, nU, sU) = run("union", () => viaUnion(mkPairs()))
        val (wE, nE, sE) = run("explode", () => viaExplode(mkPairs()))
        println(f"[edgeflip] rep=$rep $src%-8s union=$wU%6.2f s  explode=$wE%6.2f s  parity=${nU == nE && sU == sE} (n=$nU sum=$sU)")
      }
    }
    spark.stop()
  }
}
