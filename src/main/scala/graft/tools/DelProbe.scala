package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.EngineQueries
import graft.pipeline.TextPipeline

/** A/B: Deletes.appliedWith broadcast-set path (small delete set, no
  * postings shuffle) vs the shard-cogroup path — toggled via
  * autoBroadcastJoinThreshold. Parity = count + order-invariant
  * checksum over every column including the blob bytes. */
object DelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val idx = EngineQueries.index(spark, dir)
    val delSet = TextPipeline.documents(spark, dir)
      .where(col("doc_id") % 7 === 3)
      .select(col("doc_id").cast("long").as("docId"))

    def run(thresh: String): (Double, Long, Long, Long) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      val t0 = System.nanoTime()
      val applied = graft.build.Deletes.applied(spark, idx.withDeletes(delSet))
      applied.postings.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      val r = applied.postings
        .agg(count(lit(1)),
          sum(hash(col("field"), col("term"), col("shard"), col("df"),
            col("cf"), col("maxTf"), col("blob")).cast("long")))
        .collect()(0)
      val docsSum = applied.docs.agg(sum(col("docId"))).collect()(0).getLong(0)
      (w, r.getLong(0), r.getLong(1), docsSum)
    }

    for (rep <- 1 to 3) {
      val (wC, nC, hC, dC) = run("-1")
      val (wB, nB, hB, dB) = run("10485760")
      println(f"[delprobe] rep=$rep cogroup=$wC%6.2f s  bcast=$wB%6.2f s  parity=${nC == nB && hC == hB && dC == dB} (n=$nC hash=$hC)")
    }
    spark.stop()
  }
}
