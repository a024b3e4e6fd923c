package graft.query

import graft.analysis.TextAnalyzer

/** One phrase clause: the emitted slot sequence of its quoted text
  * (duplicates included — phrase tf needs them) plus the Lucene
  * `"..."~N` slop. slop 0 = exact consecutive positions; slop > 0
  * matches the slots IN ORDER at strictly increasing positions whose
  * span exceeds the exact span by at most `slop` (an in-order window —
  * see Searcher.phraseTopK for the contract vs Lucene's
  * SloppyPhraseScorer, which additionally allows reordering). */
final case class PhraseClause(slots: Seq[String], slop: Int = 0,
    boost: Double = 1.0)

/** One multi-term (expansion) clause from the classic syntax: `sp*`
  * (prefix), `te?t` / `s*k` (wildcard), `roam~` / `roam~1` (fuzzy,
  * default 2 edits). The pattern is lowercased, not analyzed — the
  * Lucene classic parser's lowercaseExpandedTerms behavior; the
  * dictionary expansion happens at search time (Searcher resolves
  * each into its matching terms, TooManyClauses-bounded). */
final case class ExpansionClause(kind: ExpansionKind, pattern: String,
    maxEdits: Int = 2, boost: Double = 1.0)
sealed trait ExpansionKind
object ExpansionKind {
  case object Prefix extends ExpansionKind
  case object Wildcard extends ExpansionKind
  case object Fuzzy extends ExpansionKind
}

/** A classic query string parsed into Lucene BooleanQuery occur
  * buckets. Terms are post-analysis (the index's own analyzer),
  * deduplicated per bucket; each phrase clause keeps the emitted slot
  * order of its quoted text and lives in the bucket its occur flag
  * selects.
  */
final case class ParsedQuery(
    must: Seq[String],
    should: Seq[String],
    mustNot: Seq[String],
    mustPhrases: Seq[PhraseClause] = Nil,
    shouldPhrases: Seq[PhraseClause] = Nil,
    notPhrases: Seq[PhraseClause] = Nil,
    mustExpansions: Seq[ExpansionClause] = Nil,
    shouldExpansions: Seq[ExpansionClause] = Nil,
    notExpansions: Seq[ExpansionClause] = Nil,
    /** Per-TERM boosts from `term^N` suffixes (Lucene clause boosts;
      * a term appearing twice with different boosts keeps the LAST —
      * this engine folds duplicate term clauses into one). Phrase and
      * expansion clauses carry their boost on the clause itself. */
    boosts: Map[String, Double] = Map.empty) {
  def isEmpty: Boolean =
    must.isEmpty && should.isEmpty && mustNot.isEmpty &&
      mustPhrases.isEmpty && shouldPhrases.isEmpty && notPhrases.isEmpty &&
      mustExpansions.isEmpty && shouldExpansions.isEmpty && notExpansions.isEmpty
  /** Any clause that can produce a hit (NOT clauses alone match nothing). */
  def hasScoring: Boolean =
    must.nonEmpty || should.nonEmpty || mustPhrases.nonEmpty ||
      shouldPhrases.nonEmpty || mustExpansions.nonEmpty || shouldExpansions.nonEmpty
  /** Scoring phrase clauses with their MUST flag, input order. */
  def scoringPhrases: Seq[(PhraseClause, Boolean)] =
    mustPhrases.map(_ -> true) ++ shouldPhrases.map(_ -> false)
}

/** Classic Lucene query-string syntax — the surface the reference's
  * own tests reach through `o.a.lucene.queryParser.QueryParser`
  * (TestHBaseneSearch.java builds every search from
  * `new QueryParser(field, analyzer).parse(...)`), re-expressed over
  * this engine's occur buckets:
  *
  *   - `term`            → SHOULD clause (default operator OR)
  *   - `+term`           → MUST clause
  *   - `-term`, `!term`  → MUST_NOT clause
  *   - `NOT term`        → MUST_NOT clause
  *   - `a AND b` / `&&`  → both clauses MUST (QueryParserBase.addClause:
  *                         CONJ_AND upgrades the PREVIOUS clause and
  *                         requires the current one)
  *   - `a OR b` / `||`   → both SHOULD (no-op under default OR)
  *   - `"a b c"`         → quoted phrase clause (any occur: bare /
  *     `+"..."` / `-"..."` — Lucene BooleanQuery with PhraseQuery
  *     clauses; mixed term+phrase queries dispatch to the clause-level
  *     boolean scorer, `Searcher.scoredDocsBoolean`)
  *   - `"a b"~N`         → sloppy phrase (Lucene PhraseQuery.setSlop
  *     via the parser's `~` phrase suffix); a malformed suffix (no
  *     digits) is ignored, like Lucene's lenient float parse
  *   - `sp*` / `te?t`    → prefix / wildcard multi-term clause, any
  *     occur (Lucene PrefixQuery/WildcardQuery with the scoring
  *     boolean rewrite — resolved against the dictionary at search
  *     time, TooManyClauses-bounded)
  *   - `roam~` / `roam~1` → fuzzy multi-term clause (Lucene
  *     FuzzyQuery; default 2 edits, `~N` capped at 2)
  *
  * Divergences, documented:
  *   - a single clause that analyzes to several terms (e.g.
  *     `+snake_case` under the code analyzer) contributes each term
  *     with the clause's occur flag, where Lucene would synthesize a
  *     sub-PhraseQuery;
  *   - no grouping parentheses, field prefixes or boosts — the engine
  *     exposes those as explicit API calls (`Boosted`, field-scoped
  *     Searcher instances).
  */
object QueryParser {

  private final val MUST = 0
  private final val SHOULD = 1
  private final val NOT = 2

  /** Raw lexing: quoted phrases, +/-/! modifiers, AND/OR/NOT operators,
    * bare clause words. Interior '+'/'-' (e.g. `foo-bar`) stay clause
    * text — only a leading modifier counts; the analyzer strips
    * punctuation downstream anyway.
    */
  def parse(query: String, analyzer: TextAnalyzer): ParsedQuery = {
    // (occur, text, isPhrase, slop, expansion-or-null, boost) in input
    // order — occur is re-written by a following AND, so buckets form
    // only after the full scan
    val clauses =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, Boolean, Int, ExpansionClause, Double)]
    var conjAnd = false // a pending AND applies to the NEXT clause
    var mod = -1 // pending +/-/NOT modifier for the next clause
    var i = 0
    val n = query.length
    while (i < n) {
      val c = query.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = query.indexOf('"', i + 1)
        val (text, afterQuote) =
          if (end < 0) (query.substring(i + 1), n) else (query.substring(i + 1, end), end + 1)
        // optional `~N` slop then `^F` boost suffixes after the quote
        var next = afterQuote
        var slop = 0
        if (next < n && query.charAt(next) == '~') {
          var j = next + 1
          while (j < n && query.charAt(j).isDigit) j += 1
          if (j > next + 1) {
            slop = lenientInt(query.substring(next + 1, j))
            next = j
          } else next = j // bare '~': ignored (Lucene lenient parse)
        }
        var boost = 1.0
        if (next < n && query.charAt(next) == '^') {
          var j = next + 1
          while (j < n && (query.charAt(j).isDigit || query.charAt(j) == '.')) j += 1
          if (j > next + 1) {
            boost = lenientDouble(query.substring(next + 1, j), 1.0)
            next = j
          } else next = j
        }
        addClause(clauses, conjAnd, mod, text, isPhrase = true, slop = slop,
          boost = boost)
        conjAnd = false; mod = -1
        i = next
      } else if ((c == '+' || c == '-' || c == '!') && i + 1 < n &&
          !query.charAt(i + 1).isWhitespace && mod < 0) {
        mod = if (c == '+') MUST else NOT
        i += 1
      } else {
        var j = i
        while (j < n && !query.charAt(j).isWhitespace && query.charAt(j) != '"') j += 1
        val word = query.substring(i, j)
        word match {
          case "AND" | "&&" if mod < 0 => conjAnd = true
          case "OR" | "||" if mod < 0 => conjAnd = false
          case "NOT" if mod < 0 => mod = NOT
          case _ =>
            val (bare, boost) = word match {
              case BoostRx(b, f) => (b, lenientDouble(f, 1.0))
              case _ => (word, 1.0)
            }
            addClause(clauses, conjAnd, mod, bare, isPhrase = false,
              exp = classifyExpansion(bare), boost = boost)
            conjAnd = false; mod = -1
        }
        i = j
      }
    }

    val must = Seq.newBuilder[String]
    val should = Seq.newBuilder[String]
    val not = Seq.newBuilder[String]
    val mustP = Seq.newBuilder[PhraseClause]
    val shouldP = Seq.newBuilder[PhraseClause]
    val notP = Seq.newBuilder[PhraseClause]
    val mustE = Seq.newBuilder[ExpansionClause]
    val shouldE = Seq.newBuilder[ExpansionClause]
    val notE = Seq.newBuilder[ExpansionClause]
    val termBoosts = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    clauses.foreach { case (occur, text, isPhrase, slop, exp, boost) =>
      if (exp != null) {
        val e = if (boost == 1.0) exp else exp.copy(boost = boost)
        occur match {
          case MUST => mustE += e
          case NOT => notE += e
          case _ => shouldE += e
        }
      } else {
        val slots = {
          val b = Seq.newBuilder[String]
          analyzer.foreachEmitted(text)((t, _) => b += t)
          b.result()
        }
        if (slots.nonEmpty) {
          if (isPhrase && slots.length > 1) occur match {
            case MUST => mustP += PhraseClause(slots, slop, boost)
            case NOT => notP += PhraseClause(slots, slop, boost)
            case _ => shouldP += PhraseClause(slots, slop, boost)
          } else occur match { // 1-slot phrase degrades to its term clause
            case MUST => must ++= slots
            case NOT => not ++= slots
            case _ => should ++= slots
          }
          if (!isPhrase && boost != 1.0) slots.foreach(termBoosts(_) = boost)
        }
      }
    }
    ParsedQuery(must.result().distinct, should.result().distinct,
      not.result().distinct, mustP.result().distinct,
      shouldP.result().distinct, notP.result().distinct,
      mustE.result().distinct, shouldE.result().distinct,
      notE.result().distinct, termBoosts.toMap)
  }

  private val FuzzyRx = "^([^*?~]+)~([0-9]*)$".r
  private val BoostRx = "^(.+)\\^([0-9]+(?:\\.[0-9]+)?)$".r

  /** Lenient numeric suffix parses (documented Lucene-lenient parse
    * contract): an overlong digit run ("a b"~99999999999) or a
    * malformed decimal ("x^1.2.3" never matches BoostRx, but guard
    * anyway) must not throw out of `search()` — cap/fall back instead.
    * Digit-only inputs ≤ 9 chars parse exactly; longer runs saturate. */
  private def lenientInt(digits: String): Int =
    if (digits.length <= 9) digits.toInt else Int.MaxValue

  private def lenientDouble(s: String, dflt: Double): Double =
    try s.toDouble catch { case _: NumberFormatException => dflt }

  /** Classify a raw clause word as a multi-term (expansion) clause per
    * the classic syntax: trailing `~`/`~N` → fuzzy, a single trailing
    * `*` with no other wildcard → prefix, any other `*`/`?` mix with
    * at least one literal → wildcard; anything else (including a bare
    * `*` with no literals) → null = a plain analyzed term clause.
    * Patterns are lowercased, not analyzed (Lucene
    * lowercaseExpandedTerms). */
  private def classifyExpansion(word: String): ExpansionClause = word match {
    case FuzzyRx(base, edits) =>
      ExpansionClause(ExpansionKind.Fuzzy, base.toLowerCase,
        if (edits.isEmpty) 2 else math.min(lenientInt(edits), 2))
    case w if w.exists(c => c == '*' || c == '?') &&
        w.exists(c => c != '*' && c != '?') =>
      val lw = w.toLowerCase
      if (lw.endsWith("*") && !lw.dropRight(1).exists(c => c == '*' || c == '?'))
        ExpansionClause(ExpansionKind.Prefix, lw.dropRight(1))
      else ExpansionClause(ExpansionKind.Wildcard, lw)
    case _ => null
  }

  /** QueryParserBase.addClause for the flat default-OR grammar: a
    * CONJ_AND upgrades the previous clause from SHOULD to MUST (never
    * off a prohibited clause) and requires the current one unless a
    * modifier already decided its occur.
    */
  private def addClause(
      clauses: scala.collection.mutable.ArrayBuffer[(Int, String, Boolean, Int, ExpansionClause, Double)],
      conjAnd: Boolean,
      mod: Int,
      text: String,
      isPhrase: Boolean,
      slop: Int = 0,
      exp: ExpansionClause = null,
      boost: Double = 1.0): Unit = {
    if (conjAnd && clauses.nonEmpty) {
      val (prevOccur, prevText, prevPhrase, prevSlop, prevExp, prevBoost) = clauses.last
      if (prevOccur == SHOULD)
        clauses(clauses.length - 1) =
          (MUST, prevText, prevPhrase, prevSlop, prevExp, prevBoost)
    }
    val occur =
      if (mod >= 0) mod
      else if (conjAnd) MUST
      else SHOULD
    clauses += ((occur, text, isPhrase, slop, exp, boost))
  }
}
