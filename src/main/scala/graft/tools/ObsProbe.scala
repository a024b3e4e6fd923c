package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe: does an Observation fire on localCheckpoint()?
  * (The CC loop folds its convergence count into the checkpoint job
  * iff it does — getOrEmpty gives the safe fallback either way.) */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, i % 7 == 0)).toDF("id", "chg")
    val obs = Observation()
    val ck = df.observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("n"))
      .localCheckpoint()
    println("rows=" + ck.count())
    println("observed=" + scala.concurrent.Await.result(obs.future, scala.concurrent.duration.Duration(10, "s")))
    spark.stop()
  }
}
