package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.build.IndexConfig
import graft.pipeline.TextPipeline
import graft.streaming.StreamingIndexer
/** Phase timing of the bm25_after_update pipeline (append + update +
  * compact + load + query) — optimization-round evidence. */
object UpdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[updprobe] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (rep <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("graft_updprobe").toString
      val docs = TextPipeline.documents(spark, dir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      t("append") { StreamingIndexer.append(spark, root, docs, "doc_id", "text",
        cfg = IndexConfig(shardSizeDocs = 1024)) }
      val old = docs.where(col("doc_id") % 10 === 7)
      t("update") { StreamingIndexer.updateDocuments(spark, root,
        old.select(col("doc_id")),
        old.select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" graftupdated")).as("text")),
        "doc_id", "text") }
      t("compact") { StreamingIndexer.compact(spark, root) }
      var idx: graft.build.InvertedIndex = null
      t("loadMerged") { idx = StreamingIndexer.loadMerged(spark, root) }
      t("cache+count") { idx.cache(); idx.postings.count() }
      t("query") { new graft.query.Searcher(spark, idx)
        .topK(Seq("graftupdated", "spark"), 10).foreach(_ => ()) }
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    spark.stop()
  }
}
