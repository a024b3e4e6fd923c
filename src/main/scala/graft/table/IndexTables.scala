package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{IndexConfig, InvertedIndex}
import graft.model.CorpusStats

/** Persisted index = four committed tables under one root:
  * docs, postings, termStats, plus stats.json. Each table is a
  * manifest-gated stage → a killed build resumes by skipping committed
  * stages (north rule: resumable DAG of checkpointed snapshots).
  */
object IndexTables {

  /** Write all index tables; stages already committed are skipped.
    * termStats/stats derive from the WRITTEN postings/docs (no
    * recompute of the build pipeline).
    *
    * The two stage CHAINS are independent — (docs → stats.json) and
    * (postings → termStats) — so they are submitted as concurrent
    * Spark jobs from two driver threads: the scheduler interleaves
    * their tasks across idle cores and the per-stage driver tails
    * (job setup, footer lineage, commit) overlap with the other
    * chain's real work instead of serializing after it. Dependency
    * order WITHIN each chain is preserved, so crash-resume semantics
    * are unchanged (each stage is still manifest-gated).
    * Returns total rows written. */
  def write(spark: SparkSession, idx: InvertedIndex, root: String): Long = {
    // env-gated stage timing (GRAFT_WRITE_TIMING=1): attributes the
    // full-build wall between the two chains' stages on stderr
    val wt0 = System.nanoTime()
    def logT(tag: String): Unit =
      if (sys.env.contains("GRAFT_WRITE_TIMING"))
        System.err.println(f"[write] $tag%-14s at ${(System.nanoTime() - wt0) / 1e9}%6.2f s")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fDocs = pool.submit(new java.util.concurrent.Callable[TableFormat.Manifest] {
        def call(): TableFormat.Manifest = {
          val statsPath = Paths.get(root, "stats.json")
          val needStats = !Files.exists(statsPath)
          // corpus stats ride the docs WRITE job as observed metrics —
          // no second scan of the docs table (at corpus scale that
          // second pass re-reads the whole table just for (N, avgdl)).
          // Resume path (docs already committed → no write job runs)
          // falls back to a dl-column-pruned scan of the stored table.
          val obs =
            if (needStats && !TableFormat.isCommitted(root, "docs"))
              Some(org.apache.spark.sql.Observation())
            else None
          val docsDf = obs match {
            case Some(o) => idx.docs.observe(o,
              count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
            case None => idx.docs
          }
          val m = TableFormat.write(spark, docsDf, root, "docs")
          logT("docs")
          if (needStats) {
            // observed metrics can overcount under speculative/retried
            // tasks (accumulator semantics); the manifest rowCount from
            // the committed parquet footers is EXACT — trust the
            // observation only when its count matches, else rescan
            val observed = obs.map { o =>
              val row = o.get
              (row("n").asInstanceOf[Long],
                Option(row("avgdl")).map(_.asInstanceOf[Double]).getOrElse(0.0))
            }.filter(_._1 == m.rowCount)
            val (n, avgdl) = observed.getOrElse {
              val r = TableFormat.read(spark, root, "docs")
                .agg(count(lit(1)), avg(col("dl").cast("double"))).collect()(0)
              (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
            }
            val tmp = Paths.get(root, "_tmp_stats.json")
            Files.writeString(tmp,
              s"""{"numDocs":$n,"avgDocLen":$avgdl,""" +
                s""""shardSizeDocs":${idx.config.shardSizeDocs},""" +
                s""""analyzer":"${idx.config.analyzer.name}"}""")
            Files.move(tmp, statsPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          logT("stats.json")
          m
        }
      })
      val fPost = pool.submit(new java.util.concurrent.Callable[(TableFormat.Manifest, TableFormat.Manifest)] {
        def call(): (TableFormat.Manifest, TableFormat.Manifest) = {
          val mPost = TableFormat.write(spark, idx.postings, root, "postings")
          logT("postings")
          val mStats = if (TableFormat.isCommitted(root, "termStats")) {
            TableFormat.readManifest(root, "termStats")
          } else {
            val postings = TableFormat.read(spark, root, "postings")
            val ts = postings.groupBy("field", "term").agg(
              sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))
            TableFormat.write(spark, ts, root, "termStats")
          }
          logT("termStats")
          (mPost, mStats)
        }
      })
      val mDocs = fDocs.get()
      val (mPost, mStats) = fPost.get()
      mDocs.rowCount + mPost.rowCount + mStats.rowCount
    } finally pool.shutdown()
  }

  /** Parse ONLY stats.json — (stats, config) without touching any
    * table data. Lets callers tokenize/validate a query against the
    * snapshot's analyzer before paying the table load. */
  def loadStatsAndConfig(root: String): (CorpusStats, IndexConfig) = {
    val txt = Files.readString(Paths.get(root, "stats.json"))
    val num = "\"numDocs\":([0-9]+)".r.findFirstMatchIn(txt).get.group(1).toLong
    val avg = "\"avgDocLen\":([0-9.Ee+-]+)".r.findFirstMatchIn(txt).get.group(1).toDouble
    val shard = "\"shardSizeDocs\":([0-9]+)".r.findFirstMatchIn(txt).get.group(1).toLong
    // the analyzer the index was BUILT with is part of the snapshot:
    // a reader tokenizing queries with a different analyzer gets
    // silently wrong/empty matches (pre-round-4 snapshots carry no
    // field → standard, the only analyzer that existed then)
    val analyzer = "\"analyzer\":\"([^\"]+)\"".r.findFirstMatchIn(txt)
      .map(m => graft.analysis.TextAnalyzers.byName(m.group(1)))
      .getOrElse(graft.analysis.Analyzer)
    (CorpusStats(num, avg), IndexConfig(shardSizeDocs = shard, analyzer = analyzer))
  }

  def load(spark: SparkSession, root: String): InvertedIndex = {
    val (stats, cfg) = loadStatsAndConfig(root)
    InvertedIndex(
      TableFormat.read(spark, root, "docs"),
      TableFormat.read(spark, root, "postings"),
      TableFormat.read(spark, root, "termStats"),
      stats,
      cfg)
  }
}
