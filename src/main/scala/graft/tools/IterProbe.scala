package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline
/** A/B probe for the CC round shape at sf0.1. */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val pairs = TextPipeline.simhashEdges(docs, 8).localCheckpoint()
    val p2 = pairs.select("a","b")
    val edges = p2.union(p2.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    def runLoop(tag: String)(propagate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
      var comp = edges.groupBy("a").agg(min("b").as("nb"))
        .select(col("a").as("doc_id"), least(col("a"), col("nb")).as("comp"))
      var changed = 1L; var iters = 0
      val t0 = System.nanoTime()
      while (changed > 0 && iters < 32) {
        val next = propagate(comp)
          .select(col("doc_id"), col("comp"), (col("old") =!= col("comp")).as("chg"))
          .localCheckpoint()
        changed = next.where(col("chg")).count()
        comp = next.select("doc_id","comp")
        iters += 1
      }
      println(f"[iterprobe] $tag rounds=$iters wall=${(System.nanoTime()-t0)/1e9}%.2f s")
      comp.agg(sum(col("comp"))).collect()(0).getLong(0)
    }
    def current(comp: org.apache.spark.sql.DataFrame) = {
      val nbrMin = edges
        .join(comp.select(col("doc_id").as("b"), col("comp").as("bc")), Seq("b"))
        .groupBy(col("a").as("doc_id")).agg(min("bc").as("nbc"))
      val s1 = comp.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbc"), col("comp"))).as("c1"))
      val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
      s1.join(s1.select(col("doc_id").as("cid"), col("c1").as("cc")),
          col("c1") === col("cid"), "left")
        .select(col("doc_id"), col("old"), c2.as("comp"))
    }
    def unioned(comp: org.apache.spark.sql.DataFrame) = {
      val nbr = edges
        .join(comp.select(col("doc_id").as("b"), col("comp").as("bc")), Seq("b"))
        .select(col("a").as("doc_id"), col("bc"), lit(null).cast("long").as("self"))
      val s1 = nbr.union(comp.select(col("doc_id"), col("comp").as("bc"),
          col("comp").as("self")))
        .groupBy("doc_id").agg(min("bc").as("c1"), max("self").as("old"))
      val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
      s1.join(s1.select(col("doc_id").as("cid"), col("c1").as("cc")),
          col("c1") === col("cid"), "left")
        .select(col("doc_id"), col("old"), c2.as("comp"))
    }
    var sums = Set.empty[Long]
    for (rep <- 1 to 3) {
      sums += runLoop("unioned")(unioned)
      sums += runLoop("current")(current)
    }
    println(s"[iterprobe] label-sum agreement: ${sums.size == 1} ($sums)")
    spark.stop()
  }
}
