package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: self-joins over un-checkpointed small frames (exchange-reuse
  * SMJ) vs checkpoint-then-broadcast. Variants: minhash band-key join
  * (sig ckpt), jaccard prefix-candidate join (pref ckpt). */
object CkptBcastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()

    val nHash = 12; val rowsPerBand = 3; val P = 2147483647L
    def sigDf(): DataFrame = {
      val sh = TextPipeline.shingles(docs)
      val nPart = spark.sessionState.conf.numShufflePartitions
      val ids = graft.build.IndexBuilder
        .assignDocIds(sh.select("sh").distinct(), Seq("sh"), nPart)
        .withColumn("sid", col("docId") + 1L).select("sh", "sid")
      val withIds = sh.join(ids, "sh").select("doc_id", "sid")
      val minCols = (0 until nHash).map { i =>
        min((lit(2L * i + 1) * col("sid") + lit(7919L * i + 1)) % P).as(s"mh$i")
      }
      withIds.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }
    def bandKeyOf(sig: DataFrame): DataFrame = {
      val bandCols = (0 until nHash / rowsPerBand).map { b =>
        (0 until rowsPerBand)
          .map(r => col(s"mh${b * rowsPerBand + r}") % 1000003L)
          .reduceLeft((acc, x) => acc * 1000003L + x)
      }
      sig.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
    }
    def joinBand(bandKey: DataFrame, bcast: Boolean): DataFrame = {
      val y = if (bcast) broadcast(bandKey.as("y")) else bandKey.as("y")
      bandKey.as("x").join(y,
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
    }

    def jacCand(ckptBcast: Boolean): DataFrame = {
      val tau = 0.8
      val arrs = TextPipeline.shingleArrays(docs)
      val prefLen = (col("sz") - ceil(col("sz") * tau) + 1).cast("int")
      val pref0 = arrs.select(col("doc_id"),
        explode(slice(col("sids"), lit(1), prefLen)).as("sid"))
      val pref = if (ckptBcast) pref0.localCheckpoint() else pref0
      val y = if (ckptBcast) broadcast(pref.as("y")) else pref.as("y")
      val cand = pref.as("x").join(y,
          col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      cand
        .join(arrs.select(col("doc_id").as("a"), col("sids").as("sa"), col("sz").as("sza")), "a")
        .join(arrs.select(col("doc_id").as("b"), col("sids").as("sb"), col("sz").as("szb")), "b")
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("jaccard",
          col("i").cast("double") / (col("sza") + col("szb") - col("i")).cast("double"))
        .where(col("jaccard") >= tau)
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
    }

    def time(df: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val r = d.agg(count(lit(1)), sum(col("a") + col("b"))).collect()(0)
      (w, r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    for (rep <- 1 to 3) {
      val (wmA, nmA, smA) = time(joinBand(bandKeyOf(sigDf()), bcast = false))
      val (wmB, nmB, smB) = time(joinBand(bandKeyOf(sigDf().localCheckpoint()), bcast = true))
      println(f"[ckptbcast] rep=$rep minhash cur=$wmA%6.2f s  ckpt+bcast=$wmB%6.2f s  parity=${nmA == nmB && smA == smB} (n=$nmA)")
      val (wjA, njA, sjA) = time(jacCand(false))
      val (wjB, njB, sjB) = time(jacCand(true))
      println(f"[ckptbcast] rep=$rep jaccard cur=$wjA%6.2f s  ckpt+bcast=$wjB%6.2f s  parity=${njA == njB && sjA == sjB} (n=$njA)")
    }
    spark.stop()
  }
}
