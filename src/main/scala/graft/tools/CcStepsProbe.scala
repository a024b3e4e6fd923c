package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: broadcast-gated CC rounds at 1, 2 or 3 propagation steps per
  * materialized action. Convergence check per ACTION compares each
  * node's label before/after the composed steps (labels are monotone
  * decreasing, so initial≠final iff any step changed the node).
  * Parity = sum of final labels. */
object CcStepsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val simPairs = TextPipeline.simhashEdges(docs, 8).localCheckpoint()

    val p2 = simPairs.select("a", "b")
    val edges = p2.union(p2.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()

    // one broadcast-gated propagation step: (doc_id, comp) -> (doc_id, comp)
    def step(comp: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(broadcast(comp.select(col("doc_id").as("b"), col("comp").as("bc"))), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min("bc").as("nbc"))
      val s1 = comp
        .join(broadcast(nbrMin), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("comp"), coalesce(col("nbc"), col("comp"))).as("c1"))
      val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
      s1.join(broadcast(s1.select(col("doc_id").as("cid"), col("c1").as("cc"))),
          col("c1") === col("cid"), "left")
        .select(col("doc_id"), c2.as("comp"))
    }

    def runLoop(steps: Int): (Long, Double, Int) = {
      val t0 = System.nanoTime()
      var comp = edges.groupBy("a").agg(min("b").as("nb"))
        .select(col("a").as("doc_id"), least(col("a"), col("nb")).as("comp"))
      var changed = 1L
      var iters = 0
      while (changed > 0 && iters < 32) {
        val before = comp.select(col("doc_id"), col("comp").as("old"))
        var cur = comp
        for (_ <- 1 to steps) cur = step(cur)
        val obs = org.apache.spark.sql.Observation()
        val next = cur.join(broadcast(before), Seq("doc_id"))
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
      (comp.agg(sum(col("comp"))).collect()(0).getLong(0), wall, iters)
    }

    for (rep <- 1 to 3) {
      val res = Seq(1, 2, 3).map(s => s -> runLoop(s))
      val parity = res.map(_._2._1).distinct.size == 1
      val msg = res.map { case (s, (_, w, it)) => f"s$s=$w%5.2f s/$it%d acts" }.mkString("  ")
      println(f"[ccsteps] rep=$rep $msg parity=$parity (${res.head._2._1})")
    }
    spark.stop()
  }
}
