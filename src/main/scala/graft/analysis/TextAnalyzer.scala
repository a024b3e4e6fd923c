package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pluggable analysis surface — the Spark-side counterpart of the
  * reference's runtime analyzer selection by class name
  * (hbasene create/IndexConfiguration.java:167-174): the build
  * pipeline is analyzer-agnostic and any TextAnalyzer can be injected
  * via `IndexConfig.analyzer`; the default (`Analyzer`) keeps the
  * oracle-parity tokenization and its codegen'd docLen expression, so
  * default-path indexes are byte-identical to before the extraction.
  *
  * Implementations must be Serializable (they ride in task closures)
  * and must treat null/empty text as zero tokens.
  */
trait TextAnalyzer extends Serializable {

  /** Stable name (≙ the reference's analyzer class-name config key). */
  def name: String

  /** Zero-allocation emitted-token scan: `f(buf, len, pos)` per kept
    * token with the term lowercased in a REUSED char buffer (valid
    * only during the callback) and `pos` the 1-based token position.
    * This is the build hot path — implementations should not allocate
    * per token. */
  def foreachEmittedBuf(text: String)(f: (Array[Char], Int, Int) => Unit): Unit

  /** String-level emitted scan (allocates one String per token). */
  def foreachEmitted(text: String)(f: (String, Int) => Unit): Unit =
    foreachEmittedBuf(text)((buf, len, pos) => f(new String(buf, 0, len), pos))

  /** Emitted scan WITH character offsets — `f(term, pos, start, end)`
    * where [start, end) spans the token in the analyzed text
    * (highlighting/snippets slice it back out). For ASCII input the
    * offsets index the ORIGINAL string; an analyzer that normalizes
    * non-ASCII text as a whole (the standard one lowercases via
    * Locale.ROOT, which can change string length, e.g. U+0130) may
    * report offsets into the normalized text instead — callers get
    * that normalized text back from `analyzedText`. */
  def foreachEmittedOffsets(text: String)(
      f: (String, Int, Int, Int) => Unit): Unit

  /** The string `foreachEmittedOffsets` offsets refer to — the input
    * itself unless the analyzer had to normalize it wholesale. */
  def analyzedText(text: String): String = text

  /** Emitted-token count — BM25's document length. */
  def docLen(text: String): Int = {
    var n = 0
    foreachEmittedBuf(text)((_, _, _) => n += 1)
    n
  }

  /** Column form of docLen. The default routes through a Scala UDF;
    * analyzers with a native codegen'd Expression override this (the
    * standard analyzer does — GraftFunctions.docLenCol stays inside
    * WholeStageCodegen). Must map null text to 0, not NULL. */
  def docLenCol(c: Column): Column = {
    val self = this
    udf((s: String) => if (s == null) 0 else self.docLen(s)).apply(c)
  }
}

/** Name → analyzer registry (≙ the reference's analyzer-by-class-name
  * config keyspace): the persisted index records its analyzer's name
  * in stats.json and the loader resolves it here, so a reader can
  * never silently tokenize queries with a different analyzer than the
  * index was built with. */
object TextAnalyzers {
  def byName(name: String): TextAnalyzer = name match {
    case "standard" => Analyzer
    case "code-identifier" => CodeIdentifierAnalyzer
    case other => sys.error(
      s"unknown analyzer '$other' — this index was built with an analyzer " +
        "not registered in graft.analysis.TextAnalyzers")
  }
}

/** Code-identifier analyzer: the standard scan with two deliberate
  * differences for source-code search — underscore is a SEPARATOR
  * (`snake_case` → `snake`, `case`) and there is NO stop set (code
  * queries look for literal `if`/`for`/`in`). Positions are 1-based
  * ordinals of the emitted sub-tokens. ASCII-lowercase only;
  * non-ASCII characters separate tokens. */
object CodeIdentifierAnalyzer extends TextAnalyzer {

  def name: String = "code-identifier"

  def foreachEmittedBuf(text: String)(f: (Array[Char], Int, Int) => Unit): Unit =
    scan(text)((buf, len, pos, _, _) => f(buf, len, pos))

  def foreachEmittedOffsets(text: String)(
      f: (String, Int, Int, Int) => Unit): Unit =
    scan(text)((buf, len, pos, s, e) => f(new String(buf, 0, len), pos, s, e))

  private def scan(text: String)(
      f: (Array[Char], Int, Int, Int, Int) => Unit): Unit = {
    if (text == null) return
    val n = text.length
    var buf = new Array[Char](32)
    var i = 0
    var pos = 0
    @inline def isTok(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    @inline def low(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    while (i < n) {
      while (i < n && !isTok(low(text.charAt(i)))) i += 1
      if (i < n) {
        val start = i
        var len = 0
        var c = low(text.charAt(i))
        while (isTok(c)) {
          if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
          buf(len) = c
          len += 1
          i += 1
          c = if (i < n) low(text.charAt(i)) else ' '
        }
        pos += 1
        f(buf, len, pos, start, i)
      }
    }
  }
}
