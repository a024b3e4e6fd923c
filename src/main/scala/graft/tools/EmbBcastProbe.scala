package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: embedCosinePairs bucket self-join as committed vs
  * checkpoint-withB + broadcast probe side. */
object EmbBcastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = TextPipeline.embeddings(spark, "/root/testdata/sf0.1").localCheckpoint()
    val tau = 0.4; val nPlanes = 8

    def variant(ckptBcast: Boolean): DataFrame = {
      val withB0 = emb.join(TextPipeline.vectorBuckets(emb, nPlanes), "vec_id")
        .select("vec_id", "bucket", "embedding")
      val withB = if (ckptBcast) withB0.localCheckpoint() else withB0
      val y = if (ckptBcast) broadcast(withB.as("y")) else withB.as("y")
      val pairs = withB.as("x").join(y,
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      val dot = aggregate(
        zip_with(col("x.embedding"), col("y.embedding"),
          (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      def norm(c: org.apache.spark.sql.Column) = sqrt(aggregate(
        transform(c, a => a.cast("double") * a.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      pairs
        .withColumn("sim", round(
          dot / (norm(col("x.embedding")) * norm(col("y.embedding"))), 3))
        .where(col("sim") >= tau)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), col("sim"))
    }

    def time(df: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val r = d.agg(count(lit(1)), sum(col("a") + col("b"))).collect()(0)
      (w, r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    for (rep <- 1 to 3) {
      val (wA, nA, sA) = time(variant(false))
      val (wB, nB, sB) = time(variant(true))
      println(f"[embbcast] rep=$rep cur=$wA%6.2f s  ckpt+bcast=$wB%6.2f s  parity=${nA == nB && sA == sB} (n=$nA)")
    }
    spark.stop()
  }
}
