package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IndexBuilder, IndexConfig}
import graft.model.CodeDoc
import graft.query.Searcher

/** FIXTURES.md F2 — the reference's field-sort collector semantics
  * (TestHBaseIndexSearcher.java:97-121,149-181) made deterministic:
  * 101 docs, seeded LCG airport codes, query `searchterm_always`,
  * sort by airport asc/desc, k=25 → hit sequence monotone in the
  * sort field. */
class FieldSortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val airports = Vector("NYC", "JFK", "EWR", "SEA", "SFO", "OAK", "SJC")

  // seeded LCG (deterministic stand-in for the reference's Math.random)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))

  private val corpus = {
    val rng = lcg(42L).drop(1).take(202).toVector
    (100 to 0 by -1).map { i =>
      val code = airports((math.abs(rng(i * 2)) % airports.length).toInt)
      val always = math.abs(rng(i * 2 + 1)) % 2 == 0
      val searchTerm = if (always || i % 3 == 0) "searchterm_always" else "searchterm_never"
      CodeDoc("apt", s"doc$i", "c0", "text",
        s"airport_${code.toLowerCase} $searchTerm filler$i")
    }
  }

  private lazy val index = IndexBuilder.fromCodeDocs(spark, corpus.toDS(),
    IndexConfig(shardSizeDocs = 16)).cache()
  private lazy val searcher = new Searcher(spark, index)

  test("asc sort: 25 hits in non-decreasing airport order") {
    val matched = searcher.totalHits(Seq("searchterm_always"))
    assert(matched > 25, s"fixture should have >25 matching docs, got $matched")
    val hits = searcher.sortedTopK(Seq("searchterm_always"), "content", ascending = true, 25)
    // sort key: use the airport term embedded in content's prefix
    val rows = hits.collect()
    assert(rows.length === 25)
    val keys = rows.map(_.getString(1))
    assert(keys.toSeq === keys.sorted.toSeq)
  }

  test("desc sort: 25 hits in non-increasing airport order") {
    val rows = searcher.sortedTopK(Seq("searchterm_always"), "content", ascending = false, 25)
      .collect()
    val keys = rows.map(_.getString(1))
    assert(keys.toSeq === keys.sorted.reverse.toSeq)
  }

  test("hits < k returns hits, no error (reference AIOOBE fixed)") {
    // the reference's PQ drain had a latent AIOOBE when hits < k
    // (HBaseTopFieldCollector.java:138-144); we return just the hits
    val rare = searcher.sortedTopK(Seq("filler7"), "path", ascending = true, 25).collect()
    assert(rare.length === 1)
    val none = searcher.topK(Seq("nosuchterm_xyz"), 25).collect()
    assert(none.isEmpty)
  }

  test("all 101 docs indexed; untokenized path field enumerable") {
    assert(index.stats.numDocs === 101)
    val pathSearcher = new Searcher(spark, index, field = "path")
    assert(pathSearcher.totalHits(Seq("doc50")) === 1)
  }
}
