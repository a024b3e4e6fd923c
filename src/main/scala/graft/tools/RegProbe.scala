package graft.tools
import org.apache.spark.sql.SparkSession
object RegProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[regprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("index_build") { graft.api.EngineQueries.index(spark, dir) }
    t("dict_terms") { graft.api.EngineQueries.dictTerms(spark, dir).foreach(_ => ()) }
    t("bm25_single") { graft.api.EngineQueries.bm25Single(spark, dir).foreach(_ => ()) }
    t("boolean_phrase1") { graft.api.EngineQueries.booleanPhrase(spark, dir).foreach(_ => ()) }
    t("boolean_phrase2") { graft.api.EngineQueries.booleanPhrase(spark, dir).foreach(_ => ()) }
    t("const_range1") { graft.api.EngineQueries.constRange(spark, dir).foreach(_ => ()) }
    t("const_range2") { graft.api.EngineQueries.constRange(spark, dir).foreach(_ => ()) }
    spark.stop()
  }
}
