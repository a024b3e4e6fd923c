package graft.tools

import org.apache.spark.sql.SparkSession

/** Throughput probe for the streaming dedup operators: feeds
  * MemoryStream micro-batches of synthetic docs (10% exact dups, 10%
  * near-dups of earlier docs) through `StreamingDedup.nearDupEdges`
  * (or `firstSeen` with mode=exact) into a memory sink, reports
  * docs/s per batch and cumulative.
  *
  * Usage: StreamDedupProbe <cpus> <batches> <docsPerBatch> [exact]
  */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nBatches = args(1).toInt
    val perBatch = args(2).toInt
    val exact = args.length > 3 && args(3) == "exact"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-dedup-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, nBatches, perBatch, exact)
    finally spark.stop()
  }

  private def run(spark: SparkSession, nBatches: Int, perBatch: Int,
      exact: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def mix(z: Long): Long = CodeCorpus.mix(z)
    /** ~50-token doc from a 4k-word vocabulary; 10% exact dup of an
      * earlier id, 10% near-dup (one token swapped). */
    def doc(id: Long): (Long, String) = {
      val r = mix(id) & 0x7FFFFFFF
      val seedId =
        if (id > 100 && r % 10 == 0) id - 1 - (r % 50) // exact dup
        else if (id > 100 && r % 10 == 1) id - 1 - (r % 50) // near dup
        else id
      val words = (0 until 50).map { t =>
        s"w${(mix(seedId * 131L + t) & 0x7FFFFFFF) % 4096}"
      }.toArray
      if (seedId != id && r % 10 == 1) // near dup: swap one token
        words(25) = s"w${(mix(id) & 0x7FFFFFFF) % 4096}x"
      (id, words.mkString(" "))
    }

    val input = MemoryStream[(Long, String)]
    val plan =
      if (exact) graft.streaming.StreamingDedup.firstSeen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      else graft.streaming.StreamingDedup.nearDupEdges(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = plan.writeStream.format("memory")
      .queryName("probe_out").outputMode("append").start()
    try {
      var id = 0L
      val t00 = System.nanoTime()
      (1 to nBatches).foreach { b =>
        val batch = (0 until perBatch).map { _ => id += 1; doc(id) }
        val t0 = System.nanoTime()
        input.addData(batch)
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"batch":$b,"docs":$perBatch,"sec":$sec%.2f,"docs_per_sec":${perBatch / sec}%.0f}""")
      }
      val total = (System.nanoTime() - t00) / 1e9
      val out = spark.sql("SELECT count(*) FROM probe_out").head().getLong(0)
      val mode = if (exact) "exact" else "neardup"
      println(f"""{"mode":"$mode","total_docs":${nBatches.toLong * perBatch},"total_sec":$total%.2f,"docs_per_sec":${nBatches.toLong * perBatch / total}%.0f,"out_rows":$out}""")
    } finally q.stop()
  }
}
