package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.query.{ParsedQuery, PhraseClause, QueryParser}

/** Classic query-string grammar (the reference's QueryParser surface,
  * TestHBaseneSearch.java): occur bucketing for +/-/!/NOT modifiers,
  * the AND previous-clause upgrade, quoted phrases, analyzer
  * normalization inside clauses, and the fail-loud contracts. */
class QueryParserSpec extends AnyFunSuite {

  private def p(q: String): ParsedQuery = QueryParser.parse(q, Analyzer)

  test("bare terms are SHOULD under the default OR operator") {
    assert(p("alpha beta") === ParsedQuery(Nil, Seq("alpha", "beta"), Nil, Nil))
  }

  test("+ / - / ! / NOT modifiers bucket clauses") {
    val pq = p("+alpha beta -gamma !delta NOT eps")
    assert(pq.must === Seq("alpha"))
    assert(pq.should === Seq("beta"))
    assert(pq.mustNot === Seq("gamma", "delta", "eps"))
  }

  test("AND upgrades the previous clause and requires the next (QueryParserBase.addClause)") {
    assert(p("alpha AND beta") === ParsedQuery(Seq("alpha", "beta"), Nil, Nil, Nil))
    // a AND b c → +a +b c
    assert(p("alpha AND beta gamma") ===
      ParsedQuery(Seq("alpha", "beta"), Seq("gamma"), Nil, Nil))
    // a b AND c → a +b +c
    assert(p("alpha beta AND gamma") ===
      ParsedQuery(Seq("beta", "gamma"), Seq("alpha"), Nil, Nil))
    // AND never upgrades a prohibited clause
    assert(p("-alpha AND beta") ===
      ParsedQuery(Seq("beta"), Nil, Seq("alpha"), Nil))
    // OR is a no-op under the default-OR operator
    assert(p("alpha OR beta") === ParsedQuery(Nil, Seq("alpha", "beta"), Nil, Nil))
    assert(p("alpha && beta || gamma") ===
      ParsedQuery(Seq("alpha", "beta"), Seq("gamma"), Nil, Nil))
  }

  test("quoted phrase keeps analyzer slot order; 1-slot phrase degrades to a term clause") {
    assert(p("\"hash join probe\"") ===
      ParsedQuery(Nil, Nil, Nil, Nil, Seq(PhraseClause(Seq("hash", "join", "probe"))), Nil))
    assert(p("\"Spark!\"") === ParsedQuery(Nil, Seq("spark"), Nil))
  }

  test("phrase clauses carry their occur flag inside boolean queries") {
    val pq = p("+\"hash join\" spark -window -\"sort merge\"")
    assert(pq.mustPhrases === Seq(PhraseClause(Seq("hash", "join"))))
    assert(pq.should === Seq("spark"))
    assert(pq.mustNot === Seq("window"))
    assert(pq.notPhrases === Seq(PhraseClause(Seq("sort", "merge"))))
    // AND upgrades a preceding SHOULD phrase like any clause
    val pq2 = p("\"hash join\" AND spark")
    assert(pq2.mustPhrases === Seq(PhraseClause(Seq("hash", "join"))))
    assert(pq2.must === Seq("spark"))
    assert(pq2.shouldPhrases.isEmpty)
    // several phrases in one query
    val pq3 = p("\"hash join\" \"sort merge\"")
    assert(pq3.shouldPhrases === Seq(PhraseClause(Seq("hash", "join")), PhraseClause(Seq("sort", "merge"))))
  }

  test("clause text runs through the index analyzer (case, punctuation, splits)") {
    val pq = p("+Spark, -Window.")
    assert(pq.must === Seq("spark"))
    assert(pq.mustNot === Seq("window"))
    // one clause analyzing to several terms keeps the clause's occur
    // (the standard analyzer keeps snake_case whole but splits on '.')
    assert(p("+foo.bar").must === Seq("foo", "bar"))
    // '?' is NOT stripped punctuation — it is Lucene wildcard syntax
    // (the round-5 expansion clauses), so `-Window?` prohibits the
    // wildcard's expansion, not the bare term
    import graft.query.{ExpansionClause, ExpansionKind}
    assert(p("+Spark -Window?").notExpansions ===
      Seq(ExpansionClause(ExpansionKind.Wildcard, "window?")))
  }

  test("degenerate inputs: empty, operators only, stopword-ish empties, duplicates") {
    assert(p("").isEmpty)
    assert(p("AND OR NOT").mustNot.isEmpty) // trailing NOT never binds
    assert(p("alpha alpha +alpha") ===
      ParsedQuery(Seq("alpha"), Seq("alpha"), Nil)) // per-bucket dedup
    // unterminated quote: rest of string is the phrase
    assert(p("\"hash join") ===
      ParsedQuery(Nil, Nil, Nil, Nil, Seq(PhraseClause(Seq("hash", "join"))), Nil))
    // only prohibited clauses → no scoring clause
    assert(!p("-alpha -\"hash join\"").hasScoring)
  }

  test("lenient numeric suffixes: overlong digit runs and malformed boosts never throw") {
    import graft.query.{ExpansionClause, ExpansionKind}
    // phrase slop with an over-Int digit run saturates instead of
    // throwing NumberFormatException out of search()
    assert(p("\"hash join\"~99999999999") ===
      ParsedQuery(Nil, Nil, Nil, Nil,
        Seq(PhraseClause(Seq("hash", "join"), Int.MaxValue)), Nil))
    // fuzzy edit-count digit run: caps at the 2-edit maximum
    assert(p("roam~99999999999").shouldExpansions ===
      Seq(ExpansionClause(ExpansionKind.Fuzzy, "roam", 2)))
    // malformed phrase boost (two dots) falls back to 1.0, keeps the slop
    assert(p("\"hash join\"~2^1.2.3") ===
      ParsedQuery(Nil, Nil, Nil, Nil,
        Seq(PhraseClause(Seq("hash", "join"), 2, 1.0)), Nil))
    // in-range values still parse exactly
    assert(p("\"hash join\"~3^2.5") ===
      ParsedQuery(Nil, Nil, Nil, Nil,
        Seq(PhraseClause(Seq("hash", "join"), 3, 2.5)), Nil))
  }
}
