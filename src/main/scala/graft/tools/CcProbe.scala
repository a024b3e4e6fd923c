package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.TextPipeline

/** Measures the dedup-group pipeline split the production way: pair
  * generation materialized ONCE (the upstream dedup stage), then
  * connected components priced separately over the persisted pair
  * table. Usage: CcProbe [sfDir] — prints one JSON line. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = TextPipeline.documents(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_cc").toString
    val tPairs = time {
      TextPipeline.simhashPairs(docs, 8).write.mode("overwrite")
        .option("compression", "snappy").parquet(out)
    }
    val pairs = spark.read.parquet(out)
    val tCc = time {
      TextPipeline.dedupGroupsFromPairs(docs, pairs).foreach(_ => ())
    }
    val tInline = time {
      TextPipeline.dedupGroups(docs, 8).foreach(_ => ())
    }
    println(f"""{"pairs_write_sec":$tPairs%.2f,"cc_only_sec":$tCc%.2f,"inline_sec":$tInline%.2f,"sf":"$sfDir"}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.stop()
  }
}
