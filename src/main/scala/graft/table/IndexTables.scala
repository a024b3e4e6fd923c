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
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fDocs = pool.submit(new java.util.concurrent.Callable[TableFormat.Manifest] {
        def call(): TableFormat.Manifest = {
          val m = TableFormat.write(spark, idx.docs, root, "docs")
          val statsPath = Paths.get(root, "stats.json")
          if (!Files.exists(statsPath)) {
            val docs = TableFormat.read(spark, root, "docs")
            val r = docs.agg(count(lit(1)), avg(col("dl").cast("double"))).collect()(0)
            val tmp = Paths.get(root, "_tmp_stats.json")
            Files.writeString(tmp,
              s"""{"numDocs":${r.getLong(0)},"avgDocLen":${if (r.isNullAt(1)) 0.0 else r.getDouble(1)},""" +
                s""""shardSizeDocs":${idx.config.shardSizeDocs}}""")
            Files.move(tmp, statsPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          m
        }
      })
      val fPost = pool.submit(new java.util.concurrent.Callable[(TableFormat.Manifest, TableFormat.Manifest)] {
        def call(): (TableFormat.Manifest, TableFormat.Manifest) = {
          val mPost = TableFormat.write(spark, idx.postings, root, "postings")
          val mStats = if (TableFormat.isCommitted(root, "termStats")) {
            TableFormat.readManifest(root, "termStats")
          } else {
            val postings = TableFormat.read(spark, root, "postings")
            val ts = postings.groupBy("field", "term").agg(
              sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))
            TableFormat.write(spark, ts, root, "termStats")
          }
          (mPost, mStats)
        }
      })
      val mDocs = fDocs.get()
      val (mPost, mStats) = fPost.get()
      mDocs.rowCount + mPost.rowCount + mStats.rowCount
    } finally pool.shutdown()
  }

  def load(spark: SparkSession, root: String): InvertedIndex = {
    val txt = Files.readString(Paths.get(root, "stats.json"))
    val num = "\"numDocs\":([0-9]+)".r.findFirstMatchIn(txt).get.group(1).toLong
    val avg = "\"avgDocLen\":([0-9.Ee+-]+)".r.findFirstMatchIn(txt).get.group(1).toDouble
    val shard = "\"shardSizeDocs\":([0-9]+)".r.findFirstMatchIn(txt).get.group(1).toLong
    InvertedIndex(
      TableFormat.read(spark, root, "docs"),
      TableFormat.read(spark, root, "postings"),
      TableFormat.read(spark, root, "termStats"),
      CorpusStats(num, avg),
      IndexConfig(shardSizeDocs = shard))
  }
}
