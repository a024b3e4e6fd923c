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
