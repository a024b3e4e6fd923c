package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: simhash with the committed (tf pre-agg by (doc,term), then
  * 62-sum by doc — two exchanges) vs per-occurrence direct 62-sum by
  * doc (one exchange). tf·(2·bit−1) is linear in tf, so the sums are
  * the same exact integers. Parity = count + sum(simhash mod p). */
object SimAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()
    val P = 2147483647L

    def occurrenceVariant(): DataFrame = {
      val emitted = TextPipeline.emittedTok(docs)
      // same termIds dense ranking as the committed path
      val nPart = spark.sessionState.conf.numShufflePartitions
      val ids = graft.build.IndexBuilder
        .assignDocIds(emitted.select("term").distinct(), Seq("term"), nPart)
        .withColumn("tid", col("docId") + 1L).select("term", "tid")
      val withIds = emitted.join(ids, "term")
        .withColumn("h", (col("tid") * 2654435761L + 911L) % P
          + shiftleft((col("tid") * 2246822519L + 1337L) % P, 31))
      val bitSums = (0 until 62).map { b =>
        sum(shiftright(col("h"), b).bitwiseAND(1L) * 2 - 1).as(s"sb$b")
      }
      withIds.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 62).map(b => when(col(s"sb$b") > 0, lit(1L << b)).otherwise(0L))
            .reduceLeft(_ + _).as("simhash"))
    }

    def time(df: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val r = d.agg(count(lit(1)), sum(pmod(col("simhash"), lit(1000000007L)))).collect()(0)
      (w, r.getLong(0), r.getLong(1))
    }

    for (rep <- 1 to 3) {
      val (wA, nA, sA) = time(TextPipeline.simhash(docs))
      val (wB, nB, sB) = time(occurrenceVariant())
      println(f"[simagg] rep=$rep tf-preagg=$wA%6.2f s  per-occurrence=$wB%6.2f s  parity=${nA == nB && sA == sB} (n=$nA sum=$sA)")
    }
    spark.stop()
  }
}
