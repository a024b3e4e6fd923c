package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Boolean MUST_NOT (Lucene prohibited clauses) and the term-expansion
  * query family (prefix / wildcard / range — Lucene MultiTermQuery via
  * the reference's TermEnum SPI): exhaustive ≡ WAND, exclusion drops
  * exactly the matching docs without changing survivors' scores, and
  * expansions match their explicit-term-list equivalents. */
class BooleanQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mix(z: Long): Long = graft.tools.CodeCorpus.mix(z)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def docsDf(n: Int, seed: Long) =
    (0 until n).map { i =>
      val len = 3 + (mix(seed ^ i) & 0x7FFFFFFF).toInt % 30
      val words = (0 until len).map { t =>
        vocab(((mix(seed ^ (i * 131L + t)) & 0x7FFFFFFF) % vocab.length).toInt)
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

  private def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("MUST_NOT: exhaustive ≡ WAND; drops exactly the excluded docs; survivors' scores unchanged") {
    for (shardSize <- Seq(16L, 1024L)) {
      val idx = IndexBuilder.fromText(spark, docsDf(150, 11L), "doc_id", "text",
        cfg = IndexConfig(shardSizeDocs = shardSize)).cache()
      val s = new Searcher(spark, idx)
      val terms = Seq("alpha", "kappa")
      val not = Seq("zeta")
      val k = idx.stats.numDocs.toInt // full ranking: set equality checkable

      val plain = topMap(s.topK(terms, k))
      val ex = topMap(s.topK(terms, k, mustNot = not))
      val wand = topMap(s.topKWand(terms, k, mustNot = not))
      val excluded = s.matches(not).toDF().select("docId")
        .collect().map(_.getLong(0)).toSet

      assert(ex.keySet === wand.keySet, s"shard=$shardSize")
      assert(ex.keySet === plain.keySet -- excluded, s"shard=$shardSize")
      assert(ex.keySet.forall(d => !excluded(d)))
      // exclusion must not perturb surviving scores (both paths)
      ex.foreach { case (d, sc) =>
        assert(math.abs(sc - plain(d)) <= 1e-12 * math.max(1.0, math.abs(plain(d))))
        assert(math.abs(sc - wand(d)) <= 1e-12 * math.max(1.0, math.abs(plain(d))))
      }
      idx.unpersist()
    }
  }

  test("MUST_NOT in AND mode: both paths; term both required and prohibited → empty") {
    val idx = IndexBuilder.fromText(spark, docsDf(120, 13L), "doc_id", "text",
      cfg = IndexConfig(shardSizeDocs = 32)).cache()
    val s = new Searcher(spark, idx)
    val k = idx.stats.numDocs.toInt
    val ex = topMap(s.topK(Seq("alpha", "beta"), k, requireAll = true,
      mustNot = Seq("gamma")))
    val wand = topMap(s.topKWand(Seq("alpha", "beta"), k, requireAll = true,
      mustNot = Seq("gamma")))
    assert(ex === wand)
    assert(ex.nonEmpty) // corpus is dense enough that some doc has α∧β∧¬γ
    // contradiction: MUST ∧ MUST_NOT on the same term
    assert(s.topK(Seq("alpha"), k, requireAll = true, mustNot = Seq("alpha"))
      .collect().isEmpty)
    assert(s.topKWand(Seq("alpha"), k, requireAll = true, mustNot = Seq("alpha"))
      .collect().isEmpty)
    idx.unpersist()
  }

  test("prefix/wildcard/range expansion ≡ explicit term list; bounds honored; TooManyClauses") {
    val idx = IndexBuilder.fromText(spark, docsDf(140, 17L), "doc_id", "text",
      cfg = IndexConfig(shardSizeDocs = 64)).cache()
    val s = new Searcher(spark, idx)
    val k = 25

    // prefix "e" → {eps, eta}
    assert(topMap(s.prefixTopK("e", k)) === topMap(s.topKWand(Seq("eps", "eta"), k)))
    // wildcard "?eta" → {beta, zeta} (one leading char, literal tail)
    assert(topMap(s.wildcardTopK("?eta", k)) === topMap(s.topKWand(Seq("beta", "zeta"), k)))
    // wildcard with literal prefix + star: "ka*" → {kappa}
    assert(topMap(s.wildcardTopK("ka*", k)) === topMap(s.topKWand(Seq("kappa"), k)))
    // range [beta, eta) → {beta, delta, eps}; [beta, eta] adds eta
    assert(topMap(s.rangeTopK(Some("beta"), Some("eta"), k)) ===
      topMap(s.topKWand(Seq("beta", "delta", "eps"), k)))
    assert(topMap(s.rangeTopK(Some("beta"), Some("eta"), k, includeHi = true)) ===
      topMap(s.topKWand(Seq("beta", "delta", "eps", "eta"), k)))
    // fuzzy "zeta"~1: vocab within 1 edit = {zeta (0), beta (1 sub),
    // eta (1 del)} — the exact term rides its own expansion
    assert(topMap(s.fuzzyTopK("zeta", k, maxEdits = 1)) ===
      topMap(s.topKWand(Seq("beta", "eta", "zeta"), k)))
    // prefix-locked fuzzy: prefixLength=1 keeps only "z*" candidates
    assert(topMap(s.fuzzyTopK("zeta", k, maxEdits = 1, prefixLength = 1)) ===
      topMap(s.topKWand(Seq("zeta"), k)))
    // empty expansion → empty hits, not an error
    assert(s.prefixTopK("zzz", k).collect().isEmpty)
    assert(s.fuzzyTopK("qqqqqqq", k, maxEdits = 1).collect().isEmpty)
    // Lucene TooManyClauses contract: prefix "e" expands to 2 > 1
    val e = intercept[IllegalArgumentException](s.prefixTopK("e", k, maxExpansions = 1))
    assert(e.getMessage.contains("TooManyClauses"))
    idx.unpersist()
  }

  test("mixed MUST+SHOULD: hit set = MUST-conjunction; scores add SHOULD contributions") {
    for (shardSize <- Seq(16L, 1024L)) {
      val idx = IndexBuilder.fromText(spark, docsDf(150, 23L), "doc_id", "text",
        cfg = IndexConfig(shardSizeDocs = shardSize)).cache()
      val s = new Searcher(spark, idx)
      val k = idx.stats.numDocs.toInt // full ranking: set equality checkable

      val mixed = topMap(s.topKWand(Seq("alpha", "kappa"), k, must = Seq("alpha")))
      val mustOnly = topMap(s.topKWand(Seq("alpha"), k, requireAll = true))
      val both = topMap(s.topKWand(Seq("alpha", "kappa"), k, requireAll = true))
      // hit set: exactly the docs containing the MUST term
      assert(mixed.keySet === mustOnly.keySet, s"shard=$shardSize")
      // docs also containing the SHOULD term score strictly higher than
      // their MUST-only score; docs without it score identically
      mixed.foreach { case (d, sc) =>
        if (both.contains(d)) assert(sc > mustOnly(d), s"doc=$d shard=$shardSize")
        else assert(math.abs(sc - mustOnly(d)) < 1e-12, s"doc=$d shard=$shardSize")
      }
      // MUST ∧ MUST_NOT on the same term matches nothing
      assert(s.topKWand(Seq("alpha", "kappa"), k, must = Seq("alpha"),
        mustNot = Seq("alpha")).collect().isEmpty)
      idx.unpersist()
    }
  }

  test("search(query string): parser dispatch ≡ the explicit API calls") {
    val idx = IndexBuilder.fromText(spark, docsDf(150, 31L), "doc_id", "text",
      cfg = IndexConfig(shardSizeDocs = 32)).cache()
    val s = new Searcher(spark, idx)
    val k = idx.stats.numDocs.toInt

    // pure OR
    assert(topMap(s.search("alpha kappa", k)) ===
      topMap(s.topKWand(Seq("alpha", "kappa"), k)))
    // all-MUST → conjunctive leapfrog
    assert(topMap(s.search("+alpha +kappa", k)) ===
      topMap(s.topKWand(Seq("alpha", "kappa"), k, requireAll = true)))
    assert(topMap(s.search("alpha AND kappa", k)) ===
      topMap(s.topKWand(Seq("alpha", "kappa"), k, requireAll = true)))
    // mixed → ReqOpt
    assert(topMap(s.search("+alpha kappa", k)) ===
      topMap(s.topKWand(Seq("alpha", "kappa"), k, must = Seq("alpha"))))
    // MUST_NOT rides along
    assert(topMap(s.search("+alpha kappa -zeta", k)) ===
      topMap(s.topKWand(Seq("alpha", "kappa"), k, must = Seq("alpha"),
        mustNot = Seq("zeta"))))
    // quoted phrase dispatches to the positional plan
    assert(topMap(s.search("\"alpha kappa\"", k)) ===
      topMap(s.phraseTopK(Seq("alpha", "kappa"), k)))
    // only-prohibited and empty queries match nothing (Lucene contract)
    assert(s.search("-alpha", k).collect().isEmpty)
    assert(s.search("  ", k).collect().isEmpty)
    idx.unpersist()
  }

  test("phrase clauses inside boolean queries: MUST bounds, additive scores, NOT drops") {
    import graft.query.{ParsedQuery, PhraseClause}
    val docs = Seq(
      (0L, "alpha kappa zeta"), // phrase + zeta
      (1L, "alpha kappa"), // phrase only
      (2L, "kappa alpha zeta"), // terms, no phrase
      (3L, "zeta zeta"), // zeta only
      (4L, "alpha kappa alpha kappa") // phrase tf 2
    ).toDF("doc_id", "text")
    for (shardSize <- Seq(2L, 1024L)) {
      val idx = IndexBuilder.fromText(spark, docs, "doc_id", "text",
        cfg = IndexConfig(shardSizeDocs = shardSize)).cache()
      val s = new Searcher(spark, idx)
      val k = 10
      val phraseOnly = topMap(s.phraseTopK(Seq("alpha", "kappa"), k))
      val zetaOnly = topMap(s.topK(Seq("zeta"), k))
      assert(phraseOnly.keySet === Set(0L, 1L, 4L), s"shard=$shardSize")

      // MUST phrase + SHOULD term: hit set = phrase matches; score =
      // phrase contribution + zeta contribution where present
      val mixed = topMap(s.scoredDocsBoolean(
        ParsedQuery(Nil, Seq("zeta"), Nil, Seq(PhraseClause(Seq("alpha", "kappa")))))
        .select("docId", "score"))
      assert(mixed.keySet === phraseOnly.keySet, s"shard=$shardSize")
      mixed.foreach { case (d, sc) =>
        val expect = phraseOnly(d) + zetaOnly.getOrElse(d, 0.0)
        assert(math.abs(sc - expect) < 1e-9, s"doc=$d shard=$shardSize")
      }
      // same query through the parser end-to-end
      assert(topMap(s.search("+\"alpha kappa\" zeta", k)) === mixed,
        s"shard=$shardSize")

      // SHOULD phrase + SHOULD term: union of hit sets
      val orMixed = topMap(s.search("\"alpha kappa\" zeta", k))
      assert(orMixed.keySet === phraseOnly.keySet ++ zetaOnly.keySet)

      // NOT phrase: drops exactly the phrase matches from a term query
      val notPhrase = topMap(s.search("zeta -\"alpha kappa\"", k))
      assert(notPhrase.keySet === zetaOnly.keySet -- phraseOnly.keySet)
      notPhrase.foreach { case (d, sc) =>
        assert(math.abs(sc - zetaOnly(d)) < 1e-12, s"doc=$d")
      }

      // two phrase clauses, one MUST one SHOULD
      val twoPhrases = topMap(s.search("+\"alpha kappa\" \"kappa zeta\"", k))
      assert(twoPhrases.keySet === phraseOnly.keySet)
      assert(twoPhrases(0L) > phraseOnly(0L)) // doc0 has "kappa zeta" too
      idx.unpersist()
    }
  }
}
