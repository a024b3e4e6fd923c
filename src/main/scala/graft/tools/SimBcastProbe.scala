package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextPipeline

/** A/B: banded LSH self-joins as committed (SMJ + exchange reuse) vs a
  * broadcast-hinted probe side. Self-join caveat under test: broadcast
  * breaks exchange reuse, so the build side recomputes — cheap above a
  * checkpoint, possibly not for minhash's un-checkpointed sig DAG. */
object SimBcastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1").localCheckpoint()

    def bandCols(maxHam: Int): Seq[Column] = {
      val nBits = 62; val nBands = maxHam + 1
      val base = nBits / nBands; val rem = nBits % nBands
      val widths = Array.tabulate(nBands)(b => base + (if (b < rem) 1 else 0))
      val lows = widths.scanLeft(0)(_ + _)
      widths.indices.map { b =>
        shiftright(col("simhash"), lows(b)).bitwiseAND(lit((1L << widths(b)) - 1))
      }
    }
    def firstMatch(x: Column, y: Column, maxHam: Int): Column = {
      val nBits = 62; val nBands = maxHam + 1
      val base = nBits / nBands; val rem = nBits % nBands
      val widths = Array.tabulate(nBands)(b => base + (if (b < rem) 1 else 0))
      val lows = widths.scanLeft(0)(_ + _)
      val xor = x.bitwiseXOR(y)
      widths.indices.foldRight(lit(-1)) { (b, els) =>
        when(shiftright(xor, lows(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)) === 0L, lit(b)).otherwise(els)
      }
    }

    val maxHam = 8
    def pairsVariant(bcast: Boolean): DataFrame = {
      val s = TextPipeline.simhash(docs).localCheckpoint()
      val banded = s.select(col("doc_id"), col("simhash"),
        posexplode(array(bandCols(maxHam): _*)).as(Seq("band", "bval")))
      val y = if (bcast) broadcast(banded.as("y")) else banded.as("y")
      banded.as("x").join(y,
          col("x.band") === col("y.band") && col("x.bval") === col("y.bval")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.simhash").as("sx"), col("y.simhash").as("sy"), col("x.band").as("band"))
        .withColumn("ham", bit_count(col("sx").bitwiseXOR(col("sy"))))
        .where(col("ham") <= maxHam
          && col("band") === firstMatch(col("sx"), col("sy"), maxHam))
        .select(col("a"), col("b"), col("ham"))
    }

    def minhashVariant(bcast: Boolean): DataFrame = {
      // mirror of minhashCandidates with an optional broadcast probe side
      val nHash = 12; val rowsPerBand = 3; val P = 2147483647L
      val sh = TextPipeline.shingles(docs)
      val spark2 = sh.sparkSession
      val nPart = spark2.sessionState.conf.numShufflePartitions
      val ids = graft.build.IndexBuilder
        .assignDocIds(sh.select("sh").distinct(), Seq("sh"), nPart)
        .withColumn("sid", col("docId") + 1L).select("sh", "sid")
      val withIds = sh.join(ids, "sh").select("doc_id", "sid")
      val minCols = (0 until nHash).map { i =>
        min((lit(2L * i + 1) * col("sid") + lit(7919L * i + 1)) % P).as(s"mh$i")
      }
      val sig = withIds.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      val bandColsM = (0 until nHash / rowsPerBand).map { b =>
        (0 until rowsPerBand)
          .map(r => col(s"mh${b * rowsPerBand + r}") % 1000003L)
          .reduceLeft((acc, x) => acc * 1000003L + x)
      }
      val bandKey = sig.select(col("doc_id"),
        posexplode(array(bandColsM: _*)).as(Seq("band", "bkey")))
      val y = if (bcast) broadcast(bandKey.as("y")) else bandKey.as("y")
      bandKey.as("x").join(y,
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
    }

    def time(df: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val cols = d.columns.take(2).map(c => col(c))
      val r = d.agg(count(lit(1)), sum(cols(0) + cols(1))).collect()(0)
      (w, r.getLong(0), r.getLong(1))
    }

    for (rep <- 1 to 3) {
      val (wpS, npS, spS) = time(pairsVariant(false))
      val (wpB, npB, spB) = time(pairsVariant(true))
      println(f"[simbcast] rep=$rep pairs   smj=$wpS%6.2f s  bcast=$wpB%6.2f s  parity=${npS == npB && spS == spB} (n=$npS)")
      val (wmS, nmS, smS) = time(minhashVariant(false))
      val (wmB, nmB, smB) = time(minhashVariant(true))
      println(f"[simbcast] rep=$rep minhash smj=$wmS%6.2f s  bcast=$wmB%6.2f s  parity=${nmS == nmB && smS == smB} (n=$nmS)")
    }
    spark.stop()
  }
}
