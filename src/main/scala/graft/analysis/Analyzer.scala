package graft.analysis

import graft.model.TermOcc

/** Lucene-3.0-StandardAnalyzer-compatible tokenizer as a pure function,
  * used inside typed Dataset transforms (the "analyzer UDF" of the north
  * star) — semantics of the reference's analysis loop
  * (hbasene HBaseIndexWriter.java:105-150):
  *
  *   - lowercase
  *   - word-break on any non-alphanumeric character (runs of
  *     `[a-z0-9_]` form tokens; underscore kept for code identifiers)
  *   - English stop set (Lucene 3.0 ENGLISH_STOP_WORDS_SET, 33 words)
  *   - stop words removed WITH position-increment gaps: the emitted
  *     position is the 1-based ordinal of the token among ALL raw
  *     tokens, so "Messi plays for Barcelona" → messi@1, plays@2,
  *     barcelona@4 (reference arithmetic
  *     `position += incr − 1; add(++position)`,
  *     HBaseIndexWriter.java:124-139; FIXTURES.md F1).
  *
  * Deliberately regex-simple so the identical tokenization is
  * expressible in ANSI SQL for the DuckDB correctness oracle
  * (see SparkEntry.oracleSql — `regexp_split_to_table(lower(x),
  * '[^a-z0-9_]+')` + stop-set filter + ordinality).
  */
object Analyzer extends Serializable {

  /** Lucene 3.0 StopAnalyzer.ENGLISH_STOP_WORDS_SET, verbatim. */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  /** SQL fragment of the stop set, for oracle queries. */
  val stopWordsSqlList: String =
    EnglishStopWords.toSeq.sorted.map(w => s"'$w'").mkString("(", ", ", ")")

  private[this] val tokenRe = "[a-z0-9_]+".r

  /** Raw tokens (lowercased, split), stop words INCLUDED — position
    * source of truth. */
  def rawTokens(text: String): Iterator[String] =
    if (text == null) Iterator.empty
    else tokenRe.findAllIn(text.toLowerCase)

  /** Tokenize one field value → (term, position) pairs, stop words
    * removed, positions 1-based counting stopword gaps. */
  def tokenize(text: String): Seq[(String, Int)] = {
    val out = Seq.newBuilder[(String, Int)]
    var pos = 0
    rawTokens(text).foreach { t =>
      pos += 1
      if (!EnglishStopWords.contains(t)) out += ((t, pos))
    }
    out.result()
  }

  /** Tokenize into TermOccs for a named field. */
  def tokenizeField(field: String, text: String): Seq[TermOcc] =
    tokenize(text).map { case (t, p) => TermOcc(field, t, p) }

  /** Emitted-token count (document length for BM25's dl): number of
    * non-stopword tokens. */
  def docLen(text: String): Int = {
    var n = 0
    rawTokens(text).foreach(t => if (!EnglishStopWords.contains(t)) n += 1)
    n
  }
}
