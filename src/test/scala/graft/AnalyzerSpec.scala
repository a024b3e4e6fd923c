package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer

/** Analyzer fidelity — FIXTURES.md F1/F3; reference position arithmetic
  * HBaseIndexWriter.java:124-139 (stop words removed with
  * position-increment gaps). */
class AnalyzerSpec extends AnyFunSuite {

  test("F1: 'Messi plays for Barcelona' → messi@1 plays@2 barcelona@4") {
    assert(Analyzer.tokenize("Messi plays for Barcelona") ===
      Seq(("messi", 1), ("plays", 2), ("barcelona", 4)))
  }

  test("F1 FourthTimes doc: plays tf=3, stop words dropped with gaps") {
    val txt = "Messi plays for argentina as well. He plays as a " +
      "mid-fielder and plays really well."
    val toks = Analyzer.tokenize(txt)
    val plays = toks.filter(_._1 == "plays").map(_._2)
    assert(plays.length === 3)
    // raw ordinals: messi1 plays2 for3 argentina4 as5 well6 he7 plays8
    // as9 a10 mid11 fielder12 and13 plays14 really15 well16
    assert(plays === Seq(2, 8, 14))
    assert(!toks.exists(t => Analyzer.EnglishStopWords.contains(t._1)))
    assert(toks.contains(("he", 7))) // 'he' is NOT in the Lucene 3.0 stop set
  }

  test("F3: quick brown fox produces content terms") {
    val occs = Analyzer.tokenizeField("content", "Quick Brown Fox Jumped over the bridge")
    assert(occs.nonEmpty)
    assert(occs.forall(_.field == "content"))
    assert(occs.map(_.term).contains("quick"))
    assert(!occs.map(_.term).contains("the"))
  }

  test("docLen counts emitted (non-stop) tokens") {
    assert(Analyzer.docLen("Messi plays for Barcelona") === 3)
    assert(Analyzer.docLen("") === 0)
    assert(Analyzer.docLen(null) === 0)
  }

  test("stop set is the Lucene 3.0 33-word English set") {
    assert(Analyzer.EnglishStopWords.size === 33)
    assert(Analyzer.EnglishStopWords("for") && Analyzer.EnglishStopWords("as")
      && Analyzer.EnglishStopWords("a") && Analyzer.EnglishStopWords("the"))
  }
}
