package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.pipeline.TextPipeline
/** A/B probe for the n-gram Jaccard pair path: current 3×-recompute
  * shape vs localCheckpointed shingle arrays (and a window-df variant). */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, dir).localCheckpoint()
    val tau = 0.8
    def verify(cand: DataFrame, arrs: DataFrame): DataFrame =
      cand
        .join(arrs.select(col("doc_id").as("a"), col("sids").as("sa"), col("sz").as("sza")), "a")
        .join(arrs.select(col("doc_id").as("b"), col("sids").as("sb"), col("sz").as("szb")), "b")
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("jaccard", col("i").cast("double") / (col("sza") + col("szb") - col("i")).cast("double"))
        .where(col("jaccard") >= tau)
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"[jacprobe] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    for (rep <- 1 to 3) {
      t("ckpt") {
        val arrs = TextPipeline.shingleArrays(docs).localCheckpoint()
        val cand = TextPipeline.prefixCandidates(arrs, tau)
        verify(cand, arrs).count()
      }
      t("current") { TextPipeline.ngramJaccardPairs(docs, tau).count() }
    }
    spark.stop()
  }
}
