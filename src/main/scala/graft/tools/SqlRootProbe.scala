package graft.tools
import org.apache.spark.sql.SparkSession
/** Times the persisted-SQL-root write + first TVF query (the match_sql
  * first-touch cost) and a compact cycle — A/B evidence for write-path
  * file sizing. */
object SqlRootProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[sqlroot] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val idx = graft.api.EngineQueries.index(spark, dir)
    for (rep <- 1 to 3) {
      val out = java.nio.file.Files.createTempDirectory("graft_sqlroot").toString
      t(s"write$rep") { graft.table.IndexTables.write(spark, idx, out) }
      val n = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .filter(p => p.toString.endsWith(".parquet")).count()
      println(s"[sqlroot] files=$n")
      t(s"load+query$rep") {
        graft.sql.MatchQuery.register(spark)
        spark.sql(s"SELECT * FROM match_query('$out', 'spark merge window', 10)")
          .foreach(_ => ())
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
    spark.stop()
  }
}
