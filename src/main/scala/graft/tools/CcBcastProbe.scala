package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: CC loop as committed (SMJ rounds) vs size-gated broadcast-hint
  * rounds. Parity = sum of final labels over edge-incident nodes. */
object CcBcastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val simPairs = TextPipeline.simhashEdges(docs, 8).localCheckpoint()
    val jacPairs = TextPipeline.ngramJaccardPairs(docs, 0.6).localCheckpoint()

    def runLoop(pairsIn: DataFrame, bcast: Boolean): (Long, Double, Int) = {
      val pairs = pairsIn.select("a", "b")
      val edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      def maybeB(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
      def propagate(comp: DataFrame): DataFrame = {
        val nbrMin = edges
          .join(maybeB(comp.select(col("doc_id").as("b"), col("comp").as("bc"))), Seq("b"))
          .groupBy(col("a").as("doc_id"))
          .agg(min("bc").as("nbc"))
        val s1 = comp
          .join(maybeB(nbrMin), Seq("doc_id"), "left")
          .select(col("doc_id"), col("comp").as("old"),
            least(col("comp"), coalesce(col("nbc"), col("comp"))).as("c1"))
        val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
        s1.join(maybeB(s1.select(col("doc_id").as("cid"), col("c1").as("cc"))),
            col("c1") === col("cid"), "left")
          .select(col("doc_id"), col("old"), c2.as("comp"))
      }
      val t0 = System.nanoTime()
      var comp = edges.groupBy("a").agg(min("b").as("nb"))
        .select(col("a").as("doc_id"), least(col("a"), col("nb")).as("comp"))
      var changed = 1L
      var iters = 0
      while (changed > 0 && iters < 32) {
        val obs = org.apache.spark.sql.Observation()
        val next = propagate(comp)
          .select(col("doc_id"), col("comp"), (col("old") =!= col("comp")).as("chg"))
          .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("nchg"))
          .localCheckpoint()
        changed =
          try {
            val row = scala.concurrent.Await.result(obs.future,
              scala.concurrent.duration.Duration(30, "s"))
            if (row.isNullAt(0)) 0L else row.getLong(0)
          } catch {
            case _: java.util.concurrent.TimeoutException =>
              next.where(col("chg")).count()
          }
        comp = next.select("doc_id", "comp")
        iters += 1
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val s = comp.agg(sum(col("comp"))).collect()(0).getLong(0)
      (s, wall, iters)
    }

    for (rep <- 1 to 3) {
      for ((tag, pairs) <- Seq("simhash" -> simPairs, "jaccard" -> jacPairs)) {
        val (sA, wA, iA) = runLoop(pairs, bcast = false)
        val (sB, wB, iB) = runLoop(pairs, bcast = true)
        println(f"[ccbcast] rep=$rep $tag%-8s smj=$wA%6.2f s ($iA rounds)  bcast=$wB%6.2f s ($iB rounds)  parity=${sA == sB} ($sA)")
      }
    }
    spark.stop()
  }
}
