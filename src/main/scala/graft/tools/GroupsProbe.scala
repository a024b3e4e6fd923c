package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.TextPipeline

/** A/B probe: dedup-group assignment via the full simhash pair set vs
  * the star-edge spanning set, same corpus, alternated reps in one JVM
  * (min-of-reps estimator; co-tenant waves hit both arms equally).
  * Usage: GroupsProbe <sfDir> <reps> [cpus] */
object GroupsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, dir).localCheckpoint()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"""{"arm":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
    }
    // joblog mode: ONE cold + one warm dedupGroups with per-job wall
    // durations — the sf0.1 cost is Spark-action-count-dominated
    // (5k docs), so the lever is fewer materializations, and this log
    // is the measurement that says which ones
    if (args.length > 3 && args(3) == "joblog") {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (j.time, 0L))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.computeIfPresent(j.jobId, (_, v) => (v._1, j.time))
      })
      for (tag <- Seq("cold", "warm")) {
        jobs.clear()
        time(tag)(TextPipeline.dedupGroups(docs, 8).count())
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.sortBy(_._1)
        val t0j = rows.map(_._2._1).min
        rows.foreach { case (id, (s, e)) =>
          println(f"[job] $id%3d start=${(s - t0j) / 1e3}%6.2f dur=${(e - s) / 1e3}%6.2f s")
        }
      }
      spark.stop()
      return
    }
    // warm both arms
    TextPipeline.dedupGroupsFromPairs(docs, TextPipeline.simhashPairs(docs, 8)).count()
    TextPipeline.dedupGroups(docs, 8).count()
    for (_ <- 1 to reps) {
      time("pairs")(TextPipeline
        .dedupGroupsFromPairs(docs, TextPipeline.simhashPairs(docs, 8)).count())
      time("edges")(TextPipeline.dedupGroups(docs, 8).count())
    }
    spark.stop()
  }
}
