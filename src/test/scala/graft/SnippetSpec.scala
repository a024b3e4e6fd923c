package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Best-window snippet generation (Lucene-contrib Highlighter surface):
  * hand-computed windows, marker placement, stopword-in-separator
  * behavior, tie → leftmost, no-match → leading window. */
class SnippetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def searcherOver(rows: (Long, String)*): Searcher = {
    val idx = IndexBuilder.fromText(spark, rows.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", cfg = IndexConfig(shardSizeDocs = 16))
    new Searcher(spark, idx)
  }

  private def snippetOf(s: Searcher, terms: Seq[String], width: Int): Map[Long, (Int, String)] =
    s.snippets(s.topK(terms, 10), terms, width)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap

  test("window maximizes matches; markers wrap matched tokens; raw separators preserved") {
    val s = searcherOver(
      0L -> "alpha beta gamma delta eps zeta eta theta",
      1L -> "zzz yyy xxx")
    // width 4 covers both delta (idx 3) and eta (idx 6)? no — needs 4
    // consecutive: [delta eps zeta eta] has both
    val m4 = snippetOf(s, Seq("delta", "eta"), 4)
    assert(m4(0L) === ((2, "«delta» eps zeta «eta»")))
    // width 3 can hold only one match; tie → leftmost (window ending
    // at delta): "beta gamma «delta»"
    val m3 = snippetOf(s, Seq("delta", "eta"), 3)
    assert(m3(0L) === ((1, "beta gamma «delta»")))
  }

  test("stopwords are not window tokens but survive inside separator text") {
    val s = searcherOver(0L -> "The delta, eta; and gamma.")
    // emitted = [delta, eta, gamma]; width 2 windows tie at 1 match →
    // leftmost [delta, eta]; the raw ', ' separator survives
    val m = snippetOf(s, Seq("delta", "gamma"), 2)
    assert(m(0L) === ((1, "«delta», eta")))
    // width 3 = whole emitted span, both matched, '; and ' preserved
    val m3 = snippetOf(s, Seq("delta", "gamma"), 3)
    assert(m3(0L) === ((2, "«delta», eta; and «gamma»")))
  }

  test("no matching term in a hit's window contract: leading window; custom markers") {
    val s = searcherOver(0L -> "alpha beta gamma delta")
    val df = s.snippets(
      Seq((0L, 1.0)).toDF("docId", "score"), Seq("nosuchterm"), 2,
      pre = "<b>", post = "</b>")
    val r = df.collect().head
    assert(r.getInt(2) === 0)
    assert(r.getString(3) === "alpha beta")
    val marked = s.snippets(
      Seq((0L, 1.0)).toDF("docId", "score"), Seq("beta"), 2,
      pre = "<b>", post = "</b>").collect().head
    assert(marked.getString(3) === "alpha <b>beta</b>")
  }
}
