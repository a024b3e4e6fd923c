package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: builds the index once (timed), then times every
  * SparkEntry query at SPARK_GRAFT_SF_DIR. Prints ONE JSON line.
  * Build cost appears as the pseudo-query "index_build"; queries then
  * measure pure query-side latency (the build-once/query-many shape a
  * search engine actually has). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val buildSec = time {
      graft.api.EngineQueries.index(spark, sfDir)
    }
    // Time a REAL sink: foreach consumes every output row, so Catalyst
    // cannot prune aggregate expressions the way it does under count().
    // A failed query reports the sentinel -1.0 (never a plausible
    // duration) so baseline diffs can't mistake a crash for a speedup.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var ok = true
      val sec = time {
        try fn(spark, sfDir).foreach(_ => ())
        catch { case e: Throwable =>
          ok = false
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      }
      name -> (if (ok) sec else -1.0)
    } :+ ("index_build" -> buildSec)

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => "\"" + k + "\":\"" +
        v.replaceAll("[\\\\\"\\x00-\\x1f]", " ").take(120) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces for log-prefixing harnesses: also drop the line
    // in a file next to the repo
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
