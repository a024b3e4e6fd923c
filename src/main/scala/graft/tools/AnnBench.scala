package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** ANN-at-scale probe: brute-force cosine top-k vs the persisted IVF
  * layout (`TextPipeline.ivfWrite`/`ivfQuery`) on a deterministic
  * clustered synthetic corpus. Prints one JSON line per measurement:
  * generation/build seconds, then per-query-path p50/p95 over reps
  * plus recall@k against the brute-force truth.
  *
  * Usage: AnnBench <cpus> <nVecs> <dim> <nClusters> <nProbe,...> <reps>
  *
  * The synthetic vectors have REAL cluster structure (100 latent
  * centers + 15% noise): without it, nearest neighbors scatter
  * uniformly across IVF cells and every nProbe measurement collapses
  * to the recall of random cell overlap — structure is what makes the
  * recall/probe tradeoff mean something.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val dim = args(2).toInt
    val nClusters = args(3).toInt
    val probes = args(4).split(",").map(_.toInt).toSeq
    val reps = if (args.length > 5) args(5).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, n, dim, nClusters, probes, reps)
    finally spark.stop()
  }

  /** 100 latent centers; vector(id) = center(id mod 100) + 0.15·noise.
    * All integer-hash arithmetic inside codegen'd exprs — generation
    * is a narrow range scan, layout fixed at 128 files so every later
    * read scans with full parallelism regardless of the generating
    * session's core count. */
  private def genPath(spark: SparkSession, n: Long, dim: Int): String = {
    val path = s"/tmp/graft_vecs_${n}_$dim"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, 128).select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), j ->
          cast((pmod(pmod(id, 100) * 7919 + j * 104729, 1997) / 1997.0 - 0.5)
             + 0.15 * (pmod(id * 31 + j * 7, 997) / 997.0 - 0.5) as float))""")
          .as("embedding"))
        .write.mode("overwrite").option("compression", "snappy").parquet(path)
      println(f"""{"phase":"gen","n":$n,"dim":$dim,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    path
  }

  private def run(spark: SparkSession, n: Long, dim: Int,
      nClusters: Int, probes: Seq[Int], reps: Int): Unit = {
    val vecsPath = genPath(spark, n, dim)
    val emb = spark.read.parquet(vecsPath)
    val ivfRoot = s"/tmp/graft_ivf_${n}_${dim}_$nClusters"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(ivfRoot, "vectors", "_SUCCESS"))) {
      val t0 = System.nanoTime()
      TextPipeline.ivfWrite(emb, ivfRoot, nClusters, nIter = 3)
      println(f"""{"phase":"ivf_build","nClusters":$nClusters,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val queryId = 123457L
    val q = emb.where(col("vec_id") === queryId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val k = 10

    def timed(name: String, recallOf: => Set[Long])(body: () => Array[Long]): Unit = {
      var last: Array[Long] = body() // warm + result for recall
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); last = body(); (System.nanoTime() - t0) / 1e6
      }.sorted
      val p50 = times(times.length / 2)
      val p95 = times((times.length * 95) / 100 min (times.length - 1))
      val truth = recallOf
      val rec =
        if (truth.isEmpty) 1.0
        else last.count(truth).toDouble / truth.size
      println(f"""{"query":"$name","p50":$p50%.1f,"p95":$p95%.1f,"recall":$rec%.3f}""")
    }

    // brute-force truth: exact top-k over the flat layout
    val truth = TextPipeline.cosineTopKVec(emb, q, k, excludeId = Some(queryId))
      .collect().map(_.getLong(0))
    val truthSet = truth.toSet
    timed("brute", truthSet) { () =>
      TextPipeline.cosineTopKVec(emb, q, k, excludeId = Some(queryId))
        .collect().map(_.getLong(0))
    }
    probes.foreach { p =>
      timed(s"ivf_p$p", truthSet) { () =>
        TextPipeline.ivfQuery(spark, ivfRoot, q, k, nProbe = p,
          excludeId = Some(queryId)).collect().map(_.getLong(0))
      }
    }
  }
}
