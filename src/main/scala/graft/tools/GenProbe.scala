package graft.tools
import org.apache.spark.sql.SparkSession
object GenProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm
    spark.range(5000).map(i => CodeCorpus.doc(42L, i, 100).content.length).reduce(_+_)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val s = spark.range(n).map(i => CodeCorpus.doc(42L, i, 100).content.length).reduce(_+_)
      println(f"[gen] cpus=$cpus rep$r ${(System.nanoTime()-t0)/1e9}%.2f s (sum=$s)")
    }
    spark.stop()
  }
}
