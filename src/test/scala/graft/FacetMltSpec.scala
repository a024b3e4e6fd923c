package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Facet counts, grouped top-k, MoreLikeThis, regex expansion, and
  * explain() — the collector/contrib surface layered over the reader
  * SPI. Hand-pinned micro-cases plus cross-path identities against
  * the already-verified topK/topKWand plans. */
class FacetMltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mix(z: Long): Long = graft.tools.CodeCorpus.mix(z)

  private def index(rows: Seq[(Long, String, String)], shardSize: Long = 16L) =
    IndexBuilder.fromText(spark, rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", untokenized = Seq("lang"),
      cfg = IndexConfig(shardSizeDocs = shardSize))

  private def randomDocs(n: Int, seed: Long): Seq[(Long, String, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val langs = Vector("en", "de", "fr")
    (0 until n).map { i =>
      val len = 5 + (mix(seed ^ i) & 0x7FFFFFFF).toInt % 40
      val words = (0 until len).map { t =>
        vocab(((mix(seed ^ (i * 131L + t)) & 0x7FFFFFFF) % vocab.length).toInt)
      }
      (i.toLong, words.mkString(" "),
        langs(((mix(seed ^ (i * 17L)) & 0x7FFFFFFF) % langs.length).toInt))
    }
  }

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("facetCounts: hand-pinned counts, AND mode, tombstones") {
    val idx = index(Seq(
      (0L, "alpha beta", "en"),
      (1L, "alpha", "en"),
      (2L, "beta", "de"),
      (3L, "alpha beta gamma", "de"),
      (4L, "gamma", "fr"),
      (5L, "alpha", "fr")))
    val s = new Searcher(spark, idx)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // OR over {alpha, beta}: en {0,1}, de {2,3}, fr {5} — count desc, value asc
    assert(rows(s.facetCounts(Seq("alpha", "beta"), "lang", 10)) ===
      Seq(("de", 2L), ("en", 2L), ("fr", 1L)))
    // AND: docs 0 and 3 only
    assert(rows(s.facetCounts(Seq("alpha", "beta"), "lang", 10,
      requireAll = true)) === Seq(("de", 1L), ("en", 1L)))
    // topN truncates after the (count desc, value asc) sort
    assert(rows(s.facetCounts(Seq("alpha", "beta"), "lang", 1)) ===
      Seq(("de", 2L)))
    // single-term path (no per-doc distinct shuffle): alpha in 0,1,3,5
    assert(rows(s.facetCounts(Seq("alpha"), "lang", 10)) ===
      Seq(("en", 2L), ("de", 1L), ("fr", 1L)))
    // tombstoned docs leave the counts
    val s2 = new Searcher(spark, idx.withDeletes(Seq(0L, 3L).toDF("docId")))
    assert(rows(s2.facetCounts(Seq("alpha", "beta"), "lang", 10)) ===
      Seq(("de", 1L), ("en", 1L), ("fr", 1L)))
    assert(rows(s2.facetCounts(Seq("alpha"), "lang", 10)) ===
      Seq(("en", 1L), ("fr", 1L)))
  }

  test("groupedTopK ≡ per-group slice of the global scored order") {
    val corpus = randomDocs(120, 91L)
    val idx = index(corpus, shardSize = 32L)
    val s = new Searcher(spark, idx)
    val got = s.groupedTopK(Seq("alpha", "beta"), "lang", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    // expected: full scored set joined to lang, per-lang top-3 by
    // (score desc, docId asc) — computed with plain Scala collections
    val langOf = corpus.map(c => (c._1, c._3)).toMap
    val scored = s.scoredDocs(Seq("alpha", "beta")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expected = scored.groupBy(x => langOf(x._1)).toSeq.flatMap {
      case (lang, xs) =>
        xs.sortBy(x => (-x._2, x._1)).take(3).zipWithIndex.map {
          case ((d, sc), i) => (lang, d, sc, i + 1)
        }
    }.sortBy(x => (x._1, x._4))
    assert(got.map(x => (x._1, x._2, x._4)).toSeq ===
      expected.map(x => (x._1, x._2, x._4)))
    got.map(_._3).zip(expected.map(_._3)).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b)))
    }
  }

  test("moreLikeThis: tf desc / df asc / term asc selection, seed excluded") {
    // seed doc 0: gamma×3, zeta×2, alpha×1 — maxQueryTerms=2 must pick
    // {gamma, zeta}; alpha-only docs must NOT match
    val idx = index(Seq(
      (0L, "gamma gamma gamma zeta zeta alpha", "en"),
      (1L, "gamma zeta", "en"), // both selected terms
      (2L, "zeta beta", "de"), // one selected term
      (3L, "alpha alpha alpha", "fr"), // only the unselected term
      (4L, "beta", "fr"))) // no query term
    val s = new Searcher(spark, idx)
    val got = hits(s.moreLikeThisTopK(0L, 10, maxQueryTerms = 2))
    assert(got.map(_._1).toSet === Set(1L, 2L)) // seed excluded, 3/4 unmatched
    // identity with the explicit scoring-OR over the selection
    val viaWand = hits(s.topKWand(Seq("gamma", "zeta"), 10,
      docFilter = Some(org.apache.spark.sql.functions.col("docId") =!= 0L)))
    assert(got === viaWand)
    // includeSeed brings doc 0 back (it matches its own terms best)
    val withSeed = hits(s.moreLikeThisTopK(0L, 10, maxQueryTerms = 2,
      includeSeed = true))
    assert(withSeed.map(_._1).contains(0L))
    assert(withSeed.head._1 === 0L)
    // df asc tiebreak: seed tfs tie at 1, so the RARER term must win
    // the 1-term cap
    val idx2 = index(Seq(
      (0L, "gamma zeta", "en"), // tf 1 each; df(gamma)=3 > df(zeta)=2
      (1L, "gamma zeta", "en"),
      (2L, "gamma", "de")))
    val s2 = new Searcher(spark, idx2)
    val one = hits(s2.moreLikeThisTopK(0L, 10, maxQueryTerms = 1))
    // selection must be zeta: the gamma-only doc 2 can't match
    assert(one.map(_._1).toSet === Set(1L))
  }

  test("moreLikeThisFromText ≡ docId form on the same seed content") {
    val corpus = randomDocs(100, 103L)
    val idx = index(corpus, shardSize = 32L)
    val s = new Searcher(spark, idx)
    val seedText = corpus.find(_._1 == 7L).get._2
    // external-text MLT with the seed's own content ranks exactly like
    // the docId form that KEEPS the seed (like(Reader) has no doc to
    // exclude)
    val fromText = hits(s.moreLikeThisFromText(seedText, 20, maxQueryTerms = 3))
    val fromDoc = hits(s.moreLikeThisTopK(7L, 20, maxQueryTerms = 3,
      includeSeed = true))
    assert(fromText.nonEmpty)
    assert(fromText === fromDoc)
    // unknown-vocabulary text matches nothing
    assert(hits(s.moreLikeThisFromText("qq ww ee", 10)).isEmpty)
  }

  test("constantScore: filter semantics, boost, range form, tombstones") {
    val idx = index(Seq(
      (0L, "alpha beta", "en"),
      (1L, "gamma", "en"),
      (2L, "beta delta", "de"),
      (3L, "zeta", "fr"),
      (4L, "beta", "fr")))
    val s = new Searcher(spark, idx)
    import org.apache.spark.sql.functions.{col => c}
    def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // docs containing beta, docId order, constant 1.0 — no idf anywhere
    assert(ids(s.constantScoreTopK(c("term") === "beta", 10)) ===
      Seq((0L, 1.0), (2L, 1.0), (4L, 1.0)))
    // boost scales the constant; k truncates in docId order
    assert(ids(s.constantScoreTopK(c("term") === "beta", 2, boost = 2.5)) ===
      Seq((0L, 2.5), (2L, 2.5)))
    // range form [b, e): beta + delta
    assert(ids(s.constantScoreRangeTopK(Some("b"), Some("e"), 10)) ===
      Seq((0L, 1.0), (2L, 1.0), (4L, 1.0)))
    // disjoint range: nothing
    assert(ids(s.constantScoreRangeTopK(Some("x"), Some("y"), 10)).isEmpty)
    // tombstones drop through the live side
    val s2 = new Searcher(spark, idx.withDeletes(Seq(2L).toDF("docId")))
    assert(ids(s2.constantScoreTopK(c("term") === "beta", 10)) ===
      Seq((0L, 1.0), (4L, 1.0)))
  }

  test("explainDoc: rows sum to the doc's query score; deletes explain empty") {
    val corpus = randomDocs(80, 97L)
    val idx = index(corpus, shardSize = 16L)
    val s = new Searcher(spark, idx)
    val terms = Seq("alpha", "beta", "gamma")
    val top = hits(s.topK(terms, 5))
    assert(top.nonEmpty)
    val (doc, score) = top.head
    val ex = s.explainDoc(terms, doc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ex.map(_._1).toSeq === ex.map(_._1).toSeq.sorted) // term order
    assert(ex.forall(r => terms.contains(r._1)))
    val sum = ex.map(_._4).sum
    assert(math.abs(sum - score) <= 1e-9 * math.max(1.0, math.abs(score)),
      s"explain sum $sum vs topK score $score")
    // df column matches the global dictionary
    val dfs = s.docFreqs(terms)
    ex.foreach { r => assert(r._3 === dfs(r._1)) }
    // a deleted doc explains to zero rows
    val s2 = new Searcher(spark, idx.withDeletes(Seq(doc).toDF("docId")))
    assert(s2.explainDoc(terms, doc).collect().isEmpty)
  }

  test("regexpTopK ≡ WAND over the anchored-regex dictionary expansion") {
    val corpus = randomDocs(100, 101L)
    val idx = index(corpus, shardSize = 32L)
    val s = new Searcher(spark, idx)
    // (alpha|beta|eta) — note 'eta' also suffixes beta/theta/zeta; the
    // anchored match must NOT pull those in
    val got = hits(s.regexpTopK("(alpha|beta|eta)", 20))
    val explicit = hits(s.topKWand(Seq("alpha", "beta", "eta"), 20))
    assert(got.nonEmpty)
    assert(got === explicit)
    // character-class + quantifier form: [gz]a?mma? → gamma only
    val cls = hits(s.regexpTopK("[gz]a?mma?", 20))
    val gammaOnly = hits(s.topKWand(Seq("gamma"), 20))
    assert(cls === gammaOnly)
  }

  test("constantScore: open-ended predicate stays driver-bounded and exact") {
    // The constant-score rewrite exists for UNBOUNDED expansions; the
    // metadata collect must aggregate in Spark (one (shard-set, Σdf)
    // row to the driver — VERDICT r5 #1), never per-(term, shard)
    // rows. Exercise the widest possible predicate — every dictionary
    // term matches — and pin the result: every live doc with ≥1
    // emitted term, docId order, constant score.
    val corpus = randomDocs(120, 1234L)
    val idx = index(corpus, shardSize = 16L)
    val s = new Searcher(spark, idx)
    import org.apache.spark.sql.functions.{col => c, length => len}
    def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wide = ids(s.constantScoreTopK(len(c("term")) >= 0, 200))
    // every corpus doc has ≥5 vocab words → all 120 docs match
    assert(wide === (0L until 120L).map(d => (d, 1.0)))
    // tombstones still apply through the live side on the wide path
    val s2 = new Searcher(spark, idx.withDeletes(Seq(3L, 77L).toDF("docId")))
    val wide2 = ids(s2.constantScoreTopK(len(c("term")) >= 0, 200))
    assert(wide2 === (0L until 120L).filterNot(d => d == 3L || d == 77L)
      .map(d => (d, 1.0)))
    // wide ≡ union of narrow per-term constant-score sets
    val vocabIds = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
      .flatMap(t => ids(s.constantScoreTopK(c("term") === t, 200)).map(_._1))
      .distinct.sorted
    assert(wide.map(_._1) === vocabIds)
  }
}
