package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline
/** A/B: minhash candidate dedup via distinct() vs first-matching-band
  * colocated filter (the simhashPairs trick). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val P = 2147483647L
    val nHash = 12; val rowsPerBand = 3; val nBands = 4
    def sig() = {
      val sh = TextPipeline.shingles(docs)
      val sdf = sh.select("sh").distinct()
      val nPart = spark.sessionState.conf.numShufflePartitions
      val ids = graft.build.IndexBuilder.assignDocIds(sdf, Seq("sh"), nPart)
        .withColumn("sid", col("docId") + 1L).select("sh", "sid")
      val withIds = sh.join(ids, "sh").select("doc_id", "sid")
      val minCols = (0 until nHash).map { i =>
        min((lit(2L * i + 1) * col("sid") + lit(7919L * i + 1)) % P).as(s"mh$i")
      }
      withIds.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }
    def bandCols = (0 until nBands).map { b =>
      (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}") % 1000003L)
        .reduceLeft((acc, x) => acc * 1000003L + x)
    }
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"[mh] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    for (rep <- 1 to 3) {
      t("firstband") {
        val s = sig()
        val banded = s.select((col("doc_id") +: (0 until nBands).map(b => bandCols(b).as(s"bk$b")) :+
          posexplode(array(bandCols: _*)).as(Seq("band", "bkey"))): _*)
        val fm = (0 until nBands).foldRight(lit(-1)) { (b, els) =>
          when(col(s"x.bk$b") === col(s"y.bk$b"), lit(b)).otherwise(els)
        }
        banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
              && col("x.doc_id") < col("y.doc_id"))
          .where(col("x.band") === fm)
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .count()
      }
      t("distinct") { TextPipeline.minhashCandidates(docs).count() }
    }
    spark.stop()
  }
}
