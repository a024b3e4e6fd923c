package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IndexBuilder, IndexConfig}

/** Diagnostic: time the individual build phases at a given
  * parallelism. Usage: runMain graft.tools.PhaseProbe <cpus> <files> */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_CODEC", "snappy"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }
    import spark.implicits._
    val corpus = CodeCorpus.generate(spark, n)
    t("corpus_gen_count")(corpus.count())
    t("corpus_gen_count2")(corpus.count())
    val keyed = corpus.toDF().withColumn("docKey",
      concat_ws("", col("repo"), lit("/"), col("path"), lit("@"), col("commit")))
    t("assign_docids") {
      IndexBuilder.assignDocIds(keyed, Seq("docKey"), cpus).count()
    }
    val withIds = IndexBuilder.assignDocIds(keyed, Seq("docKey"), cpus)
    val tokenized = withIds.select(col("docId"), col("content"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.analysis.Analyzer.tokenize(text).map { case (tm, p) => (id, tm, p) }
      }
    t("tokenize_count")(tokenized.count())
    t("full_build") {
      val idx = IndexBuilder.fromCodeDocs(spark, corpus, IndexConfig(shardSizeDocs = 1L << 16))
      idx.postings.count()
    }
    val cfg = IndexConfig(shardSizeDocs = 1L << 16, docIdsFromInputOrder = true)
    val idx2 = IndexBuilder.fromCodeDocs(spark, corpus, cfg)
    val out = java.nio.file.Files.createTempDirectory("probe").toString
    t("write_docs")(idx2.docs.write.mode("overwrite").parquet(out + "/docs"))
    t("write_postings")(idx2.postings.write.mode("overwrite").parquet(out + "/postings"))
    t("lineage_docs")(spark.read.parquet(out + "/docs")
      .groupBy(org.apache.spark.sql.functions.input_file_name()).count().collect().length)
    t("read_postings_agg")(spark.read.parquet(out + "/postings")
      .groupBy("field", "term").count().count())
    t("full_write") {
      val o2 = java.nio.file.Files.createTempDirectory("probe2").toString
      graft.table.IndexTables.write(spark, idx2, o2)
    }
    spark.stop()
  }
}
