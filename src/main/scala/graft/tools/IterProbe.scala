package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val pairs = TextPipeline.simhashEdges(docs, 8).localCheckpoint()
    val p2 = pairs.select("a","b")
    val edgesDf = p2.union(p2.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    // --- DataFrame loop, AQE toggled ---
    for (aqe <- Seq("true", "false"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      def propagate(comp: org.apache.spark.sql.DataFrame) = {
        val nbrMin = edgesDf
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
      var comp = edgesDf.groupBy("a").agg(min("b").as("nb"))
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
      println(f"[iterprobe] arm=df-aqe$aqe rounds=$iters wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // --- RDD loop (co-partitioned joins) ---
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val part = new org.apache.spark.HashPartitioner(32)
      val edges = edgesDf.as[(Long, Long)].rdd
        .map { case (a, b) => (b, a) } // keyed by neighbor for join with comp
        .partitionBy(part)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      edges.count()
      var comp = edges
        .map { case (b, a) => (a, b) }
        .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
        .map { case (a, nb) => (a, math.min(a, nb)) }
        .partitionBy(part)
      var changed = 1L; var iters = 0
      while (changed > 0 && iters < 32) {
        val nbrMin = edges.join(comp) // co-partitioned: narrow
          .map { case (_, (a, bc)) => (a, bc) }
          .reduceByKey(part, (x: Long, y: Long) => math.min(x, y))
        val s1 = comp.leftOuterJoin(nbrMin) // narrow
          .mapValues { case (c, nbc) => math.min(c, nbc.getOrElse(Long.MaxValue)) }
        val byLabel = s1.map { case (v, c1) => (c1, v) }.partitionBy(part)
        val jumped = byLabel.leftOuterJoin(s1) // co-partitioned
          .map { case (c1, (v, cc)) => (v, math.min(c1, cc.getOrElse(c1))) }
          .partitionBy(part)
        val stepped = comp.join(jumped)
          .mapValues { case (old, nw) => (old, nw) }
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        changed = stepped.filter { case (_, (old, nw)) => old != nw }.count()
        val prev = comp
        comp = stepped.mapValues(_._2)
        iters += 1
      }
      println(f"[iterprobe] arm=rdd rounds=$iters wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
