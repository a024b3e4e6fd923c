package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, IndexConfig}
import graft.pipeline.TextPipeline
/** Phase timing of the bench's index_build entry (fromText at a scale
  * dir, shardSizeDocs=1024, then postings/termStats materialization). */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[buildprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val docs = TextPipeline.documents(spark, dir)
      var idx: graft.build.InvertedIndex = null
      t("fromText(plan)") { idx = IndexBuilder.fromText(
        spark, docs, "doc_id", "text", untokenized = Seq("lang", "source"),
        IndexConfig(shardSizeDocs = 1024)) }
      t("docs.count") { idx.docs.count() }
      t("postings.count") { idx.postings.count() }
      t("postings.count2") { idx.postings.count() }
      t("termStats.count") { idx.termStats.count() }
      idx.cache()
      t("cached.post.count") { idx.postings.count() }
      t("cached.ts.count") { idx.termStats.count() }
      idx.unpersist()
    }
    spark.stop()
  }
}
