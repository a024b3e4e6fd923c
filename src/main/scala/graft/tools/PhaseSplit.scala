package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IndexBuilder, IndexConfig}
import graft.table.{IndexTables, TableFormat}

/** One timed BUILD PHASE at one parallelism, in a fresh JVM — the
  * scaling campaign's unit of measurement. The full build pipelines
  * its stages inside Spark jobs, so per-phase cost is measured by
  * running nested prefixes of the DAG and differencing:
  *
  *   scan      — parquet scan of the corpus (content column realized)
  *   map       — scan + tokenize + doc-local agg + partial blob encode
  *   postings  — map + encoded-blob shuffle + concat merge
  *   postwrite — postings + committed parquet snapshot write
  *   docswrite — docs-table pipeline (scan + sha256 + dl + write)
  *   full      — complete IndexTables.write build (= ScalingBench one)
  *
  * Usage: PhaseSplit <cpus> <numFiles> <phase>
  * Prints one JSON line {"phase":…,"cpus":…,"sec":…}.
  */
object PhaseSplit {

  // honors GRAFT_EXECUTORS (local-cluster separate-JVM mode) exactly
  // like the campaign — see BenchSessions
  private def session(cpus: Int): SparkSession =
    BenchSessions.build(s"graft-phase-$cpus", cpus)

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val numFiles = args(1).toLong
    val phase = args(2)
    val spark = session(cpus)
    import spark.implicits._
    val cfg = IndexConfig(shardSizeDocs = 1L << 16,
      docIdsFromInputOrder = true, storeContent = false)

    val corpusPath = s"/tmp/graft_corpus_$numFiles"
    if (!Files.exists(Paths.get(corpusPath, "_SUCCESS")))
      CodeCorpus.generate(spark, numFiles).write.mode("overwrite")
        .option("compression", "snappy").parquet(corpusPath)

    // untimed warmup (JIT + codegen on the same operators)
    IndexBuilder.fromCodeDocs(spark,
      spark.read.parquet(corpusPath).limit(30000).as[graft.model.CodeDoc], cfg)
      .postings.write.mode("overwrite")
      .parquet(Files.createTempDirectory("graft_phwarm").toString)

    def fileRows(): Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration()
      val s = Files.list(Paths.get(corpusPath))
      val files = try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq finally s.close()
      files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n = try r.getRecordCount finally r.close()
        (Paths.get(f).getFileName.toString, n)
      }
    }

    def withIds = IndexBuilder.tableWithIds(spark, corpusPath, fileRows())
    def slim = withIds.select("docId", "content", "path", "lang")
    def partials = IndexBuilder.segmentPartials(
      spark, slim, Seq("content"), Seq("path", "lang"), cfg.shardSizeDocs)

    // Task-metric attribution: per timed rep, aggregate executor
    // run/CPU/GC time across all tasks. Decomposes a scaling residual
    // into NAMED causes: (wall×cores − runTime) = scheduling/skew gap,
    // gcTime = shared-young-gen stalls, and runTime inflation at
    // higher thread counts with flat GC = per-thread slowdown from
    // shared cache/memory (the work itself got slower, not the
    // schedule).
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    // shuffle + serde decomposition — the terms that DIFFER between
    // one shared heap (local[n]) and separate executor JVMs
    // (local-cluster): remote fetch replaces in-process file reads,
    // and task dispatch/results cross a real serialization boundary
    val fetchWaitMs = new java.util.concurrent.atomic.AtomicLong
    val remoteBytes = new java.util.concurrent.atomic.AtomicLong
    val localBytes = new java.util.concurrent.atomic.AtomicLong
    val shufWriteNs = new java.util.concurrent.atomic.AtomicLong
    val shufWriteBytes = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val resSerMs = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          gcMs.addAndGet(m.jvmGCTime)
          fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          remoteBytes.addAndGet(m.shuffleReadMetrics.remoteBytesRead)
          localBytes.addAndGet(m.shuffleReadMetrics.localBytesRead)
          shufWriteNs.addAndGet(m.shuffleWriteMetrics.writeTime)
          shufWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          deserMs.addAndGet(m.executorDeserializeTime)
          resSerMs.addAndGet(m.resultSerializationTime)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          ()
        }
      }
    })

    // GRAFT_PHASE_REPS > 1 repeats the timed phase inside ONE JVM
    // (write phases get a fresh output dir per rep): separates host
    // noise waves (visible as inter-rep spread) from JVM cold-start.
    val reps = sys.env.getOrElse("GRAFT_PHASE_REPS", "1").toInt
    for (_ <- 1 to reps) {
      runMs.set(0L); cpuNs.set(0L); gcMs.set(0L)
      fetchWaitMs.set(0L); remoteBytes.set(0L); localBytes.set(0L)
      shufWriteNs.set(0L); shufWriteBytes.set(0L)
      deserMs.set(0L); resSerMs.set(0L); spillBytes.set(0L)
      val out = Files.createTempDirectory("graft_phase").toString
      val t0 = System.nanoTime()
      phase match {
        case "scan" =>
          spark.read.parquet(corpusPath)
            .select(length(col("content"))).foreach(_ => ())
        case "map" =>
          partials.foreach(_ => ())
        case "postings" => // default merge (sort-based)
          IndexBuilder.mergeSegmentRows(partials, cfg).foreach(_ => ())
        case "postings_agg" => // hash-agg merge, kept for comparison
          IndexBuilder.mergeSegmentRowsAgg(partials, cfg).foreach(_ => ())
        case "postwrite" =>
          TableFormat.write(spark,
            IndexBuilder.mergeSegmentRows(partials, cfg), out, "postings")
        case "docswrite" =>
          TableFormat.write(spark, withIds.drop("content"), out, "docs")
        case "full" =>
          IndexTables.write(spark,
            IndexBuilder.fromParquetTable(spark, corpusPath, cfg), out)
        case other => sys.error(s"unknown phase $other")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async and the bus is not publicly
      // flushable — poll until the counters stop moving (bounded), so
      // stragglers land in THIS rep's totals, not the next one's
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        val cur = runMs.get + cpuNs.get + gcMs.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        Thread.sleep(100)
        waited += 100
      }
      val mode = sys.env.get("GRAFT_EXECUTORS").map(k => s"${k}jvm").getOrElse("local")
      println(f"""{"phase":"$phase","mode":"$mode","cpus":$cpus,"files":$numFiles,"sec":$sec%.2f,""" +
        f""""task_run_s":${runMs.get / 1e3}%.2f,"task_cpu_s":${cpuNs.get / 1e9}%.2f,""" +
        f""""task_gc_s":${gcMs.get / 1e3}%.2f,"slots_s":${sec * cpus}%.2f,""" +
        f""""fetch_wait_s":${fetchWaitMs.get / 1e3}%.2f,""" +
        f""""shuf_remote_mb":${remoteBytes.get / 1e6}%.1f,"shuf_local_mb":${localBytes.get / 1e6}%.1f,""" +
        f""""shuf_write_s":${shufWriteNs.get / 1e9}%.2f,"shuf_write_mb":${shufWriteBytes.get / 1e6}%.1f,""" +
        f""""deser_s":${deserMs.get / 1e3}%.2f,"res_ser_s":${resSerMs.get / 1e3}%.2f,""" +
        f""""spill_mb":${spillBytes.get / 1e6}%.1f}""")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
    spark.stop()
  }
}
