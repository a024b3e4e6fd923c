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

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'

  /** Longest stop word is 5 chars — cheap pre-filter in hot loops. */
  private val MaxStopLen = EnglishStopWords.map(_.length).max

  /** Direct char-scan over the lowercased text (no regex/Match
    * allocation — this is the build hot path). Calls f(term, pos) for
    * every RAW token, stop words included, pos 1-based. */
  @inline def scanRaw(text: String)(f: (String, Int) => Unit): Unit = {
    if (text == null) return
    // Locale.ROOT: under e.g. a Turkish default locale 'I' would
    // lowercase to dotless 'ı', silently changing tokenization and
    // breaking parity with the oracle's lower().
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var i = 0
    var pos = 0
    while (i < n) {
      while (i < n && !isTokenChar(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isTokenChar(s.charAt(i))) i += 1
        pos += 1
        f(s.substring(start, i), pos)
      }
    }
  }

  /** Raw tokens (lowercased, split), stop words INCLUDED — position
    * source of truth. */
  def rawTokens(text: String): Iterator[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    scanRaw(text)((t, _) => out += t)
    out.iterator
  }

  /** Tokenize one field value → (term, position) pairs, stop words
    * removed, positions 1-based counting stopword gaps. */
  def tokenize(text: String): Seq[(String, Int)] = {
    val out = Seq.newBuilder[(String, Int)]
    scanRaw(text) { (t, pos) =>
      if (t.length > MaxStopLen || !EnglishStopWords.contains(t))
        out += ((t, pos))
    }
    out.result()
  }

  /** Tokenize into TermOccs for a named field. */
  def tokenizeField(field: String, text: String): Seq[TermOcc] =
    tokenize(text).map { case (t, p) => TermOcc(field, t, p) }

  /** Emitted-token count (document length for BM25's dl): number of
    * non-stopword tokens. Allocation-light. */
  def docLen(text: String): Int = {
    var n = 0
    scanRaw(text) { (t, _) =>
      if (t.length > MaxStopLen || !EnglishStopWords.contains(t)) n += 1
    }
    n
  }
}
