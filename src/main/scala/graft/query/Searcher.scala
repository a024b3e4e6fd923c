package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.InvertedIndex
import graft.model.ScoredDoc
import graft.codec.PostingsCodec

/** One postings row as stored (field, term, shard, df, cf, maxTf, blob).
  * `blob` is the self-describing encoded block run (PostingsCodec
  * shard-blob layout); wrap in a BlobView to iterate. */
final case class PostingRow(
    field: String,
    term: String,
    shard: Long,
    df: Long,
    cf: Long,
    maxTf: Int,
    blob: Array[Byte])

/** Decoded match row. */
final case class MatchRow(term: String, docId: Long, tf: Int)
final case class MatchPosRow(term: String, docId: Long, tf: Int, positions: Seq[Int])

/** Query-side engine over a built InvertedIndex (SURVEY.md §2.C/§3.2).
  *
  * Two top-k paths, required rank-identical (§7.4 #1):
  *   - `topK` — exhaustive DataFrame path: decode → join dl → score
  *     column → fixed-order sum → TakeOrderedAndProject.
  *   - `topKWand` — block-max WAND per doc-range shard (cogroup of
  *     postings and doc lengths on the shard key), per-shard bounded
  *     heap, driver k-merge.
  */
final class Searcher(
    spark: SparkSession,
    index: InvertedIndex,
    field: String = "content",
    /** Max estimated size of the PRUNED (docId, dl) side the scoring
      * join will hint-broadcast; above it Catalyst plans a shuffle
      * join on docId, which shares its partitioning with the
      * downstream per-doc aggregation. */
    dlBroadcastBytes: Long = 192L << 20) {
  import spark.implicits._

  private def stats = index.stats

  /** Per-query posting METADATA — collected ONCE per query (term dfs +
    * the touched doc-range shard set together) instead of one job for
    * docFreqs plus another for touched-shard discovery. The collect
    * reads (term, shard, df) only — parquet column pruning keeps the
    * blob pages untouched — and its size is the query's (term, shard)
    * row count (≤ Σ_term ceil(N/shardSize)), a few MB even for a
    * corpus-wide term at 10^12 docs with 2^20-doc shards. */
  private final class QueryMeta(rows: Array[(String, Long, Long)]) {
    /** Global df per term (Σ over shards == termStats df). */
    val dfs: Map[String, Long] =
      rows.groupBy(_._1).map { case (t, rs) => t -> rs.iterator.map(_._3).sum }
    /** Shards holding postings for ANY query term, sorted. */
    val shards: Array[Long] = rows.map(_._2).distinct.sorted
    /** Shards holding postings for ANY of the GIVEN terms (MUST_NOT
      * queries prune on the required terms only — a shard holding just
      * excluded terms can't produce a hit). */
    def shardsWith(terms: Seq[String]): Array[Long] = {
      val want = terms.toSet
      rows.iterator.collect { case (t, s, _) if want(t) => s }
        .toArray.distinct.sorted
    }
    /** Shards holding postings for EVERY given term (conjunctive /
      * phrase pruning: a shard missing one term can't produce a hit). */
    def shardsWithAll(terms: Seq[String]): Array[Long] = {
      val need = terms.toSet
      rows.groupBy(_._2).collect {
        case (s, rs) if need.subsetOf(rs.iterator.map(_._1).toSet) => s
      }.toArray.sorted
    }
    /** Shards holding ≥1 alternative of EVERY slot group (multi-phrase
      * pruning: a shard missing a whole slot can't produce a hit). */
    def shardsWithGroups(groups: Seq[Seq[String]]): Array[Long] =
      rows.groupBy(_._2).collect {
        case (s, rs) if {
          val present = rs.iterator.map(_._1).toSet
          groups.forall(_.exists(present))
        } => s
      }.toArray.sorted
  }

  private def collectMeta(terms: Seq[String]): QueryMeta =
    new QueryMeta(index.postings
      .where(col("field") === field && col("term").isin(terms: _*))
      .select("term", "shard", "df")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))))

  /** Restrict a DataFrame with a `shard` column to the given shard set
    * WITHOUT launching a job: a literal In-filter for small sets (stays
    * inside codegen), a broadcast semi-join against a local relation
    * above that (a 10^5-entry In-list would blow up the generated
    * code — the semi-join build side ships once per executor). */
  private def pruneShards(df: DataFrame, shards: Array[Long]): DataFrame =
    if (shards.length <= 1024)
      df.where(col("shard").isin(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(shards.map(Long.box)): _*))
    else {
      val local = spark.createDataset(shards.toSeq)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("shard")
      df.join(broadcast(local), Seq("shard"), "left_semi")
    }

  /** Live (docId, dl, shard) — the single place tombstones apply: a
    * deleted doc is ABSENT from the dl side, so the exhaustive path
    * drops it at its inner scoring join and the cogroup paths skip it
    * when the shard-local dl map has no entry (Wand treats a NaN dl as
    * "not live"). The anti-join keys on (docId, shard) — shard derives
    * from docId on both sides — so the query's shard pruning filter
    * propagates through the join's equality constraint to the deletes
    * side too. Stats/df stay stale until physical apply (Lucene delete
    * semantics; Deletes.applied / compaction refreshes them). */
  private def dlWithShard: DataFrame = dlWithShard(None)

  /** `docFilter` — the Lucene Filter parameter of the reference's own
    * search entry (HBaseIndexSearcher.java:61 `search(weight, filter,
    * nDocs, ...)`): an arbitrary predicate over the stored docs table
    * (e.g. `col("lang") === "en"`). Applied to the LIVE dl side, so a
    * filtered-out doc disappears from every scoring path exactly like
    * a tombstone — WAND θ-pruning stays sound (removal only). Corpus
    * stats and df stay corpus-wide, Lucene filter semantics (a filter
    * narrows the candidate set, never re-weights idf). */
  private def dlWithShard(docFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val src = docFilter.map(index.docs.where).getOrElse(index.docs)
    val base = src
      .select(col("docId"), col("dl").cast("double").as("dl"))
      .withColumn("shard",
        (col("docId") / lit(index.config.shardSizeDocs)).cast("long"))
    index.deletes match {
      case None => base
      case Some(del) =>
        val d = del.select(col("docId").cast("long").as("docId"))
          .withColumn("shard",
            (col("docId") / lit(index.config.shardSizeDocs)).cast("long"))
        base.join(d, Seq("docId", "shard"), "left_anti")
    }
  }

  /** Slim (docId, dl) lookup for scoring joins, pruned to the doc-range
    * shards that actually hold postings for the query's terms — for
    * selective queries this shrinks the dl side from N to
    * |touched shards|·shardSize rows in BOTH regimes (smaller
    * broadcast below the gate; less shuffled data above it). The
    * broadcast gate is sized on the PRUNED estimate — |touched
    * shards|·shardSize·16 B from the already-collected metadata, NO
    * extra job — not the corpus-wide numDocs, so a selective query on
    * an arbitrarily large corpus still broadcasts while an every-shard
    * query near the gate never ships a ~200 MB copy to the driver. */
  private def dlLookup(meta: QueryMeta,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val prunedBytes = meta.shards.length.toLong * index.config.shardSizeDocs * 16L
    val slim = pruneShards(dlWithShard(docFilter), meta.shards).select("docId", "dl")
    if (prunedBytes <= dlBroadcastBytes) broadcast(slim) else slim
  }

  /** Posting rows for the query terms — bucket/point-pruned scan
    * (reference A7: one Get per term row). */
  def postingRows(terms: Seq[String]): Dataset[PostingRow] =
    index.postings
      .where(col("field") === field && col("term").isin(terms: _*))
      .as[PostingRow]

  /** Decoded (term, docId, tf) matches (reference C2 semantics). */
  def matches(terms: Seq[String]): Dataset[MatchRow] =
    postingRows(terms).flatMap { r =>
      val v = new PostingsCodec.BlobView(r.blob)
      (0 until v.nBlocks).iterator.flatMap { i =>
        v.decodeDocTf(i).iterator.map { case (d, tf) =>
          MatchRow(r.term, d, tf)
        }
      }
    }

  /** Decoded matches including positions (phrase queries). */
  def matchesWithPositions(terms: Seq[String]): Dataset[MatchPosRow] =
    postingRows(terms).flatMap { r =>
      new PostingsCodec.BlobView(r.blob).allPostings.map { p =>
        MatchPosRow(r.term, p.docId, p.tf, p.positions.toSeq)
      }
    }

  /** df per query term from the global dictionary (reference A10). */
  def docFreqs(terms: Seq[String]): Map[String, Long] =
    index.termStats
      .where(col("field") === field && col("term").isin(terms: _*))
      .select("term", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Exhaustive exact top-k. Deterministic: per-(term,doc) contribution
    * → collect_list sorted by term → fixed-order fold; order by
    * (score desc, docId asc). Returns (docId, score, nMatched).
    *
    * `mustNot` — Lucene BooleanQuery prohibited clauses (the reference
    * inherits them through its reader SPI): docs containing ANY of the
    * excluded terms are dropped via a left_anti join on docId, which
    * reuses the aggregation's docId partitioning (no extra shuffle
    * shape) and decodes only the excluded terms' own postings. */
  def scoredDocs(
      terms: Seq[String],
      scorer: Scorer = BM25(),
      requireAll: Boolean = false,
      mustNot: Seq[String] = Nil,
      must: Seq[String] = Nil,
      minShouldMatch: Int = 0,
      boosts: Map[String, Double] = Map.empty,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // `must` — Lucene BooleanQuery mixed MUST + SHOULD (ReqOptSumScorer):
    // a hit needs EVERY must term; the remaining (should) terms add
    // score when present. must terms score too, so they join the query
    // term set; must == all terms degenerates to requireAll.
    // DUPLICATE-CLAUSE FOLD (here and in topKWand): a term passed in
    // BOTH `terms` and `must` is folded into a single MUST clause — it
    // scores once and, because minShouldMatch counts OPTIONAL clauses
    // only, it does NOT count toward the mm tally. Lucene would keep
    // the two clauses separate (score twice, SHOULD copy counts toward
    // mm); same deliberate fold as documented for duplicate boosts.
    val qTerms = (terms ++ must).distinct.sorted
    val meta = collectMeta(qTerms)
    val dfs = meta.dfs
    val queryDfs = qTerms.map(t => dfs.getOrElse(t, 0L).toDouble)
    val dfLookup = typedlit(dfs.map { case (t, d) => t -> d.toDouble })

    // per-term query boost (Lucene TermQuery.setBoost): scales the
    // term's contribution; absent terms default to 1
    val boostCol =
      if (boosts.isEmpty) lit(1.0)
      else coalesce(element_at(typedlit(boosts), col("term")), lit(1.0))
    val m = matches(qTerms).toDF()
      .join(dlLookup(meta, docFilter), Seq("docId"))
      .withColumn("df", element_at(dfLookup, col("term")))
      .withColumn("tscore",
        boostCol * scorer.contributionCol(
          col("tf").cast("double"), col("df"), col("dl"), stats))

    val mustArr = must.distinct.sorted
    // Lucene setMinimumNumberShouldMatch: mm counts OPTIONAL clauses
    // only; more required matches than SHOULD clauses exist → nothing
    // matches (requireAll has zero SHOULD clauses).
    val shouldCount =
      if (requireAll) 0 else qTerms.count(t => !mustArr.contains(t))
    if (minShouldMatch > shouldCount)
      return Seq.empty[(Long, Double, Int)].toDF("docId", "score", "nMatched")
    val perDoc = m.groupBy("docId")
      .agg(sort_array(collect_list(struct(col("term"), col("tscore")))).as("cs"))
      .withColumn("nMatched", size(col("cs")))
      .withColumn("nMust",
        if (mustArr.isEmpty) lit(0)
        else size(filter(col("cs"),
          x => array_contains(typedlit(mustArr), x.getField("term")))))
      .withColumn("rawScore",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("tscore")))
      .drop("cs")
    val occurFiltered =
      if (requireAll) perDoc.where(col("nMatched") === qTerms.length)
      else if (mustArr.nonEmpty) perDoc.where(col("nMust") === mustArr.length)
      else perDoc
    // matched SHOULD clauses = matched terms minus matched MUST terms
    val filtered =
      if (minShouldMatch <= 0) occurFiltered
      else occurFiltered.where(
        col("nMatched") - col("nMust") >= minShouldMatch)
    // doc-level factor (coord · queryNorm for the legacy scorer; 1 for
    // BM25) as a CODEGEN'D column — the row-at-a-time Scala UDF this
    // replaces broke WholeStageCodegen on the matched-doc frame (one
    // row per hit; corpus-proportional for broad queries). BM25 skips
    // the multiplication entirely; docFactorCol replicates docFactor's
    // arithmetic order bit-for-bit (asserted by the existing
    // exhaustive≡WAND identity tests and the tfidf_legacy oracle).
    val scored = (
      if (scorer.docFactorIdentity) filtered.withColumn("score", col("rawScore"))
      else filtered.withColumn("score", col("rawScore") *
        scorer.docFactorCol(col("nMatched"), queryDfs, stats)))
      .select("docId", "score", "nMatched")
    val exTerms = mustNot.distinct.filterNot(qTerms.contains)
    // a term both required and prohibited matches nothing (Lucene
    // BooleanQuery contract) — requireAll makes it literal; in OR mode
    // the exclusion still wins, so just exclude the overlap too
    val exAll = mustNot.distinct
    if (exAll.isEmpty) scored
    else if ((requireAll && exTerms.length != exAll.length) ||
        mustArr.exists(exAll.contains)) // MUST ∧ MUST_NOT matches nothing
      Seq.empty[(Long, Double, Int)].toDF("docId", "score", "nMatched")
    else scored.join(
      matches(exAll).toDF().select("docId").distinct(), Seq("docId"), "left_anti")
  }

  def topK(
      terms: Seq[String],
      k: Int,
      scorer: Scorer = BM25(),
      requireAll: Boolean = false,
      mustNot: Seq[String] = Nil,
      must: Seq[String] = Nil,
      minShouldMatch: Int = 0,
      boosts: Map[String, Double] = Map.empty,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    scoredDocs(terms, scorer, requireAll, mustNot, must, minShouldMatch,
      boosts, docFilter)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .select("docId", "score")

  /** Disjunction-max top-k (Lucene DisjunctionMaxQuery over term
    * sub-queries): score = best matching term's contribution +
    * tieBreaker · (sum of the other matching terms') — the "pick the
    * best field/term, don't reward repetition" scorer dismax exists
    * for. tieBreaker ∈ [0,1]; 1 degenerates to the plain OR sum (BM25
    * docFactor ≡ 1), 0 scores only the best term. No coord/docFactor
    * (Lucene dismax has none) — use docFactor-free scorers (BM25 /
    * Boosted). Runs on the WAND cogroup: the sum-of-ubs pivot bound
    * stays admissible because dismax ≤ sum for tb ≤ 1. */
  def dismaxTopK(
      terms: Seq[String],
      k: Int,
      tieBreaker: Double = 0.0,
      scorer: Scorer = BM25()): DataFrame = {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0, "tieBreaker must be in [0,1]")
    val qTerms = terms.distinct.sorted
    val meta = collectMeta(qTerms)
    val dfs = meta.dfs
    val queryDfs = qTerms.map(t => dfs.getOrElse(t, 0L).toDouble)
    val nQueryTerms = qTerms.size
    val st = stats
    val scorerB = scorer
    val tbB = tieBreaker
    val prows = pruneShards(postingRows(qTerms).toDF(), meta.shards)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard, meta.shards)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)
    val perShard: Dataset[ScoredDoc] = prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val rows = ps.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val dlMap = new scala.collection.mutable.LongMap[Double]()
          ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
          val iters = rows.map { r =>
            val df = dfs.getOrElse(r.term, 0L).toDouble
            new TermIterator(r.term, df,
              scorerB.upperBound(r.maxTf.toDouble, df, st), scorerB, st,
              new PostingsCodec.BlobView(r.blob))
          }.toSeq
          Wand.topK(iters, d => dlMap.getOrElse(d, Double.NaN),
            scorerB, st, k, queryTermCount = nQueryTerms, queryDfsIn = queryDfs,
            dismaxTieBreaker = tbB).iterator
        }
    }
    perShard.toDF()
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  /** Exhaustive dismax cross-validation path (fixed-order fold like
    * `scoredDocs`, then max + tb·rest per doc). */
  def dismaxTopKExhaustive(
      terms: Seq[String],
      k: Int,
      tieBreaker: Double = 0.0,
      scorer: Scorer = BM25()): DataFrame = {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0)
    val qTerms = terms.distinct.sorted
    val meta = collectMeta(qTerms)
    val dfLookup = typedlit(meta.dfs.map { case (t, d) => t -> d.toDouble })
    val m = matches(qTerms).toDF()
      .join(dlLookup(meta), Seq("docId"))
      .withColumn("df", element_at(dfLookup, col("term")))
      .withColumn("tscore",
        scorer.contributionCol(col("tf").cast("double"), col("df"), col("dl"), stats))
    m.groupBy("docId")
      .agg(sort_array(collect_list(struct(col("term"), col("tscore")))).as("cs"))
      .withColumn("sm",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("tscore")))
      .withColumn("mx",
        aggregate(col("cs"), lit(Double.MinValue),
          (acc, x) => greatest(acc, x.getField("tscore"))))
      .withColumn("score", col("mx") + lit(tieBreaker) * (col("sm") - col("mx")))
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select("docId", "score")
  }

  /** Total hit count (reference totalHits, TestHBaseIndexReader.java:50).
    * Counts LIVE matches only (tombstoned docs excluded). */
  def totalHits(terms: Seq[String], requireAll: Boolean = false): Long = {
    val qTerms = terms.distinct
    val base = matches(qTerms).toDF()
    val live = index.deletes match {
      case None => base
      case Some(del) => base.join(
        del.select(col("docId").cast("long").as("docId")), Seq("docId"), "left_anti")
    }
    val m = live.groupBy("docId").agg(countDistinct("term").as("n"))
    (if (requireAll) m.where(col("n") === qTerms.length) else m).count()
  }

  /** Block-max WAND top-k, sharded by docId range: postings and doc
    * lengths cogrouped on the shard key, per-shard exact top-k with a
    * bounded heap, then a driver k-merge. Scales: a hot term's blocks
    * never congregate on one task; dl lookup is shard-local. */
  def topKWand(
      terms: Seq[String],
      k: Int,
      scorer: Scorer = BM25(),
      requireAll: Boolean = false,
      mustNot: Seq[String] = Nil,
      must: Seq[String] = Nil,
      minShouldMatch: Int = 0,
      boosts: Map[String, Double] = Map.empty,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // `must` — mixed MUST + SHOULD (Lucene ReqOptSumScorer): the Wand
    // kernel leapfrogs the must iterators and treats the rest as
    // score-only optionals. must == all terms degenerates to the AND
    // leapfrog; requireAll wins if both are given.
    val qTerms = (terms ++ must).distinct.sorted
    val mustArr =
      if (requireAll || must.isEmpty) Array.empty[String]
      else if (must.distinct.size == qTerms.size) Array.empty[String] // == AND
      else must.distinct.sorted.toArray
    val allMust = requireAll || (must.nonEmpty && must.distinct.size == qTerms.size)
    // MUST_NOT terms ride the same cogroup as exclusion-only iterators
    // (Lucene ReqExclScorer): their postings are fetched per shard but
    // never scored and never contribute to shard pruning
    val exTerms = mustNot.distinct.sorted
    if ((allMust && exTerms.exists(qTerms.contains)) ||
        mustArr.exists(exTerms.contains))
      return Seq.empty[(Long, Double)].toDF("docId", "score") // MUST ∧ MUST_NOT
    // Lucene setMinimumNumberShouldMatch counts OPTIONAL clauses only;
    // mm above the SHOULD-clause count matches nothing (allMust ⇒ 0).
    val shouldCount = if (allMust) 0 else qTerms.size - mustArr.length
    if (minShouldMatch > shouldCount)
      return Seq.empty[(Long, Double)].toDF("docId", "score")
    val mm = math.max(minShouldMatch, 0)
    val meta = collectMeta(qTerms ++ exTerms)
    val dfs = meta.dfs
    val queryDfs = qTerms.map(t => dfs.getOrElse(t, 0L).toDouble)
    val nQueryTerms = qTerms.size
    val st = stats
    val scorerB = scorer
    val exSet = exTerms.toSet
    val allMustB = allMust
    val mustSet: Set[String] = if (mustArr.isEmpty) null else mustArr.toSet
    val mmB = mm // closure-local: Searcher itself is not serializable
    val boostsB = boosts

    // Only shards that actually hold postings for the query's REQUIRED
    // terms can produce hits — and in AND mode only shards holding
    // EVERY required term (one missing term posting row forecloses the
    // whole shard). The shard set comes from the single metadata
    // collect: no discovery job, and the postings scan itself is
    // pruned in AND mode too.
    val touched =
      if (allMust) meta.shardsWithAll(qTerms)
      else if (mustArr.nonEmpty) meta.shardsWithAll(mustArr) // mixed: all MUSTs or bust
      else if (exTerms.isEmpty) meta.shards
      else meta.shardsWith(qTerms)
    val prows = pruneShards(postingRows(qTerms ++ exTerms).toDF(), touched)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard(docFilter), touched)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)

    val perShard: Dataset[ScoredDoc] = prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val (exRows, rows) = ps.toArray.partition(r => exSet(r.term))
        if (rows.isEmpty) Iterator.empty
        else {
          val dlMap = new scala.collection.mutable.LongMap[Double]()
          ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
          def mkIter(r: PostingRow): TermIterator = {
            val df = dfs.getOrElse(r.term, 0L).toDouble
            val b = boostsB.getOrElse(r.term, 1.0)
            new TermIterator(r.term, df,
              b * scorerB.upperBound(r.maxTf.toDouble, df, st), scorerB, st,
              new PostingsCodec.BlobView(r.blob), boost = b)
          }
          // NaN = "not live" (deleted or unknown): Wand skips the doc
          Wand.topK(rows.map(mkIter).toSeq, d => dlMap.getOrElse(d, Double.NaN),
            scorerB, st, k, allMustB, nQueryTerms, queryDfs,
            excludeIters = exRows.map(mkIter).toSeq,
            requiredTerms = mustSet, minShouldMatch = mmB).iterator
        }
    }
    perShard.toDF()
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  /** Phrase top-k (consecutive positions): doc matches where the term
    * of slot i occurs at start+i for every i. Phrase tf = number of
    * start positions; scored like a single pseudo-term (df = number of
    * docs containing the phrase — ranking is df-independent because
    * idf multiplies every doc's score equally, so the per-shard
    * matching can run BEFORE df is known).
    *
    * PRUNED path (replaces the corpus-wide positional explode-join):
    * per doc-range shard, docId leapfrog intersection of the distinct
    * terms with block skipping on header metadata, positions decoded
    * LAZILY only for docs where all terms aligned
    * (Wand.phraseMatches / TermIterator.curPositions) — a phrase
    * containing one common term shuffles only the matched docs, not
    * O(cf) position rows. Shards missing any query term are pruned
    * from BOTH cogroup sides via the single metadata collect.
    * Rank/hash-identical to phraseTopKExhaustive (asserted in tests).
    *
    * `slop` — Lucene PhraseQuery.setSlop via the `"..."~N` parser
    * suffix, with IN-ORDER window semantics: a start position p₀
    * matches when slots appear at strictly increasing positions whose
    * span exceeds the exact span by ≤ slop (Wand.phraseMatches greedy
    * chain). slop 0 ≡ exact consecutive. Divergence, documented:
    * Lucene's SloppyPhraseScorer also permits REORDERED terms when the
    * slop affords the moves, and weights tf by 1/(distance+1); this
    * engine keeps matches ordered and counts them whole — the same
    * simplification as the ordered SpanNearQuery form. */
  def phraseTopK(terms: Seq[String], k: Int, scorer: Scorer = BM25(),
      slop: Int = 0): DataFrame =
    scorePhraseMatched(phraseMatchRows(terms, scorer, slop), scorer, k)

  /** Score eagerly-materialized phrase match rows (docId, tf, dl) as
    * ONE pseudo-term whose df = number of matching live docs. */
  private def scorePhraseMatched(
      matched: DataFrame, scorer: Scorer, k: Int): DataFrame = {
    val phraseDf = matched.count().toDouble // docs containing the phrase
    matched
      .withColumn("score", scorer.contributionCol(
        col("tf").cast("double"), lit(phraseDf), col("dl"), stats))
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select("docId", "score")
  }

  /** Multi-phrase top-k (Lucene MultiPhraseQuery): slot j matches where
    * ANY of `slotAlts(j)` occurs — "hash (join|probe)" finds both
    * "hash join" and "hash probe", tf summing the variants' starts.
    * Lucene builds these from analyzers emitting stacked tokens and
    * from prefix-in-phrase expansion; here the alternatives are given
    * explicitly (pair with `expandTerms`-style dictionary scans for a
    * prefix slot). Same pruned per-shard leapfrog as `phraseTopK`
    * (slot cursor = min over alternatives), same one-pseudo-term
    * scoring, same `slop` window semantics; shards lacking every
    * alternative of some slot are pruned via the single metadata
    * collect. Singleton slots ≡ phraseTopK (asserted in tests). */
  def multiPhraseTopK(slotAlts: Seq[Seq[String]], k: Int,
      scorer: Scorer = BM25(), slop: Int = 0): DataFrame =
    scorePhraseMatched(multiPhraseMatchRows(slotAlts, scorer, slop), scorer, k)

  private def multiPhraseMatchRows(slotAlts: Seq[Seq[String]],
      scorer: Scorer, slop: Int): DataFrame = {
    require(slotAlts.nonEmpty && slotAlts.forall(_.nonEmpty),
      "every slot needs at least one alternative term")
    require(slop >= 0, "negative slop")
    val groups = slotAlts.map(_.distinct)
    val qTerms = groups.flatten.distinct.sorted
    val meta = collectMeta(qTerms)
    val shards =
      if (groups.exists(g => !g.exists(meta.dfs.contains))) Array.empty[Long]
      else meta.shardsWithGroups(groups)
    if (shards.isEmpty)
      return Seq.empty[(Long, Int, Double)].toDF("docId", "tf", "dl")
    val dfs = meta.dfs
    val st = stats
    val scorerB = scorer
    val slopB = slop
    val groupsB = groups
    val prows = pruneShards(postingRows(qTerms).toDF(), shards)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard, shards)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)
    prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val rows = ps.toArray
        require(rows.iterator.map(_.term).toSet.size == rows.length,
          "duplicate posting rows for one (term, shard) — phrase search " +
            "requires merged postings (one row per term per shard)")
        val iterOf = rows.map { r =>
          r.term -> new TermIterator(r.term, dfs(r.term).toDouble, 0.0,
            scorerB, st, new PostingsCodec.BlobView(r.blob))
        }.toMap
        val dlMap = new scala.collection.mutable.LongMap[Double]()
        ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
        Wand.multiPhraseMatches(groupsB, iterOf, slopB)
          .collect { case (d, tf) if dlMap.contains(d) => (d, tf, dlMap(d)) }
    }.toDF("docId", "tf", "dl")
      .localCheckpoint() // one cogroup for both the df count and scoring
  }

  /** Span-first query (Lucene SpanFirstQuery over a SpanTermQuery):
    * rank docs where `term` occurs within the first `end` token
    * positions (1-based analyzer positions, stopword slots counted —
    * the engine's convention throughout); tf counts only the
    * qualifying occurrences and the match set is scored as one
    * pseudo-term with df = qualifying docs, like the phrase family.
    * One shard-pruned pass over the term's postings; the position
    * filter runs inside codegen on the decoded arrays. */
  def spanFirstTopK(term: String, end: Int, k: Int,
      scorer: Scorer = BM25()): DataFrame = {
    require(end > 0, "end must be positive")
    val meta = collectMeta(Seq(term))
    if (!meta.dfs.contains(term)) return emptyHits
    val matched = matchesWithPositions(Seq(term)).toDF()
      .select(col("docId"),
        size(filter(col("positions"), p => p <= lit(end))).as("tf"))
      .where(col("tf") > 0)
      .join(dlLookup(meta), Seq("docId")) // live docs only (tombstones out)
      .localCheckpoint() // one pass for both the df count and scoring
    scorePhraseMatched(matched, scorer, k)
  }

  /** Unordered proximity NEAR (Lucene SpanNearQuery(a, b,
    * slop=window, inOrder=false), classic fulltext `a NEAR/w b`):
    * rank docs where `a` and `b` co-occur within `window` token
    * positions in EITHER order. tf = number of positions of `a` with
    * some position of `b` at distance ≤ window; the match set scores
    * as one pseudo-term with df = matching live docs, like the phrase
    * family. Same pruned plan as `phraseTopK`: shards lacking either
    * term are dropped from BOTH cogroup sides, docId leapfrog with
    * block skipping, positions decoded lazily only on intersection
    * docs, two-pointer window count (Wand.nearMatches). */
  def nearTopK(a: String, b: String, window: Int, k: Int,
      scorer: Scorer = BM25()): DataFrame =
    nearAllTopK(a, Seq(b), window, k, scorer)

  /** N-ary anchored proximity: docs where `anchor` and EVERY term in
    * `others` co-occur, tf = anchor occurrences with each other term
    * within `window` positions (either direction). For one other term
    * this IS the unordered two-clause SpanNearQuery; for more it is
    * the anchored per-occurrence form (divergence from Lucene's
    * minimal-cover n-clause semantics documented at
    * Wand.nearAllMatches). Same pruned plan as the phrase family. */
  def nearAllTopK(anchor: String, others: Seq[String], window: Int,
      k: Int, scorer: Scorer = BM25()): DataFrame =
    scorePhraseMatched(nearMatchRows(anchor, others, window, scorer), scorer, k)

  private def nearMatchRows(anchor: String, others: Seq[String],
      window: Int, scorer: Scorer): DataFrame = {
    val rest = others.distinct
    require(rest.nonEmpty && !rest.contains(anchor),
      "NEAR needs distinct terms with at least one non-anchor")
    require(window >= 1, "window must be >= 1")
    val qTerms = (anchor +: rest).sorted
    val meta = collectMeta(qTerms)
    val shards =
      if (qTerms.exists(t => !meta.dfs.contains(t))) Array.empty[Long]
      else meta.shardsWithAll(qTerms)
    if (shards.isEmpty)
      return Seq.empty[(Long, Int, Double)].toDF("docId", "tf", "dl")
    val dfs = meta.dfs
    val st = stats
    val scorerB = scorer
    val (aB, restB, wB) = (anchor, rest, window)
    val prows = pruneShards(postingRows(qTerms).toDF(), shards)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard, shards)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)
    prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val rows = ps.toArray
        require(rows.iterator.map(_.term).toSet.size == rows.length,
          "duplicate posting rows for one (term, shard) — NEAR search " +
            "requires merged postings (one row per term per shard)")
        val iterOf = rows.map { r =>
          r.term -> new TermIterator(r.term, dfs(r.term).toDouble, 0.0,
            scorerB, st, new PostingsCodec.BlobView(r.blob))
        }.toMap
        if (!iterOf.contains(aB) || !restB.forall(iterOf.contains)) Iterator.empty
        else {
          val dlMap = new scala.collection.mutable.LongMap[Double]()
          ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
          Wand.nearAllMatches(iterOf(aB), restB.map(iterOf).toArray, wB)
            .collect { case (d, tf) if dlMap.contains(d) => (d, tf, dlMap(d)) }
        }
    }.toDF("docId", "tf", "dl")
      .localCheckpoint() // one cogroup for both the df count and scoring
  }

  /** Span exclusion (Lucene SpanNotQuery(include, exclude, pre, post)
    * over term spans): rank docs on the occurrences of `a` that have
    * NO `b` within [p − pre, p + post]; a doc whose every `a` sits
    * near a `b` drops out entirely. tf = surviving occurrences,
    * scored as one pseudo-term with df = matching live docs, like the
    * phrase family. Plan: shards are pruned to those containing `a`
    * (the exclude term does not gate the scan); where `b` is absent
    * from a shard, every `a` doc passes at raw tf with zero positions
    * decodes (Wand.spanNotMatches). */
  def spanNotTopK(a: String, b: String, k: Int,
      pre: Int = 0, post: Int = 0, scorer: Scorer = BM25()): DataFrame = {
    require(a != b, "spanNot needs distinct include/exclude terms")
    require(pre >= 0 && post >= 0, "negative exclusion window")
    val meta = collectMeta(Seq(a, b).distinct.sorted)
    if (!meta.dfs.contains(a)) return emptyHits
    val shards = meta.shardsWithAll(Seq(a))
    if (shards.isEmpty) return emptyHits
    val qTerms = if (meta.dfs.contains(b)) Seq(a, b).sorted else Seq(a)
    val dfs = meta.dfs
    val st = stats
    val scorerB = scorer
    val (aB, bB, preB, postB) = (a, b, pre, post)
    val prows = pruneShards(postingRows(qTerms).toDF(), shards)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard, shards)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)
    val matched = prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val rows = ps.toArray
        require(rows.iterator.map(_.term).toSet.size == rows.length,
          "duplicate posting rows for one (term, shard) — spanNot search " +
            "requires merged postings (one row per term per shard)")
        val iterOf = rows.map { r =>
          r.term -> new TermIterator(r.term, dfs(r.term).toDouble, 0.0,
            scorerB, st, new PostingsCodec.BlobView(r.blob))
        }.toMap
        iterOf.get(aB) match {
          case None => Iterator.empty
          case Some(ia) =>
            val dlMap = new scala.collection.mutable.LongMap[Double]()
            ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
            Wand.spanNotMatches(ia, iterOf.getOrElse(bB, null), preB, postB)
              .collect { case (d, tf) if dlMap.contains(d) => (d, tf, dlMap(d)) }
        }
    }.toDF("docId", "tf", "dl")
      .localCheckpoint() // one cogroup for both the df count and scoring
    scorePhraseMatched(matched, scorer, k)
  }

  /** Exhaustive spanNot cross-validation oracle: positional explode of
    * `a`, anti-join against `b` positions in the exclusion window.
    * Do not use at scale. */
  def spanNotTopKExhaustive(a: String, b: String, k: Int,
      pre: Int = 0, post: Int = 0, scorer: Scorer = BM25()): DataFrame = {
    require(a != b && pre >= 0 && post >= 0)
    val m = matchesWithPositions(Seq(a, b).distinct).toDF()
    def pos(t: String) = m.where(col("term") === t)
      .select(col("docId"), explode(col("positions")).as("p"))
    val matched = pos(a).as("pa")
      .join(pos(b).as("pb"), col("pa.docId") === col("pb.docId") &&
        col("pb.p") >= col("pa.p") - lit(pre) &&
        col("pb.p") <= col("pa.p") + lit(post), "left_anti")
      .groupBy("docId").agg(count(lit(1)).cast("int").as("tf"))
      .join(dlLookup(collectMeta(Seq(a, b).distinct.sorted)), Seq("docId"))
      .localCheckpoint()
    scorePhraseMatched(matched, scorer, k)
  }

  /** Exhaustive NEAR cross-validation oracle: corpus-wide positional
    * explode, one |Δpos| ≤ window semi-join per non-anchor term (each
    * anchor occurrence counts once however many partner occurrences
    * sit in its window). Do not use at scale. */
  def nearTopKExhaustive(a: String, b: String, window: Int, k: Int,
      scorer: Scorer = BM25()): DataFrame =
    nearAllTopKExhaustive(a, Seq(b), window, k, scorer)

  def nearAllTopKExhaustive(anchor: String, others: Seq[String],
      window: Int, k: Int, scorer: Scorer = BM25()): DataFrame = {
    val rest = others.distinct
    require(rest.nonEmpty && !rest.contains(anchor) && window >= 1)
    val m = matchesWithPositions((anchor +: rest)).toDF()
    def pos(t: String) = m.where(col("term") === t)
      .select(col("docId"), explode(col("positions")).as("p"))
    val survivors = rest.foldLeft(pos(anchor)) { (acc, t) =>
      acc.as("pa").join(pos(t).as("pb"),
        col("pa.docId") === col("pb.docId") &&
          abs(col("pb.p") - col("pa.p")) <= lit(window), "left_semi")
    }
    val matched = survivors
      .groupBy("docId").agg(count(lit(1)).cast("int").as("tf"))
      .join(dlLookup(collectMeta((anchor +: rest).sorted)), Seq("docId"))
      .localCheckpoint()
    scorePhraseMatched(matched, scorer, k)
  }

  /** Synonym-group scoring (Lucene SpanOrQuery over term spans ≡ the
    * modern SynonymQuery): the group matches where ANY member occurs,
    * tf = total member occurrences, scored as ONE pseudo-term with
    * df = docs matching any member — distinct from the OR query,
    * which scores each term against its own idf. Implemented as a
    * single-slot multi-phrase (the slot's position merge IS the span
    * union; this analyzer never stacks two members on one position,
    * so the merged count equals the tf sum). */
  def spanOrTopK(terms: Seq[String], k: Int,
      scorer: Scorer = BM25()): DataFrame = {
    require(terms.nonEmpty, "empty synonym group")
    multiPhraseTopK(Seq(terms), k, scorer)
  }

  /** MatchAllDocsQuery: every LIVE doc (tombstones and docFilter out)
    * at constant score 1.0 (Lucene norms ≡ 1 here), docId order. The
    * browse/count primitive — pairs with `sortedTopKMulti` for
    * query-less field-sorted listings. One pruned scan, no postings
    * touched. */
  def matchAllTopK(k: Int,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    dlWithShard(docFilter)
      .select(col("docId"), lit(1.0).as("score"))
      .orderBy(asc("docId")).limit(k)

  /** Phrase-prefix query (Lucene MultiPhrasePrefixQuery — the engine
    * behind Elasticsearch's match_phrase_prefix): exact leading slots,
    * final slot = every dictionary term starting with `prefix`
    * (TooManyClauses-bounded A6 range scan, like `prefixTopK`), run as
    * one multi-phrase. An empty expansion matches nothing. */
  def phrasePrefixTopK(terms: Seq[String], prefix: String, k: Int,
      scorer: Scorer = BM25(), slop: Int = 0,
      maxExpansions: Int = 128): DataFrame = {
    require(prefix.nonEmpty, "empty phrase-prefix")
    val ts = expandTerms(col("term").startsWith(prefix),
      s"phrase-prefix '$prefix'", maxExpansions)
    if (ts.isEmpty) emptyHits
    else multiPhraseTopK(terms.map(Seq(_)) :+ ts, k, scorer, slop)
  }

  /** Exhaustive multi-phrase cross-validation oracle: per slot, the
    * union of its alternatives' exploded positions (distinct — a start
    * must count once however many alternatives could continue it),
    * then the same equi-join (exact) / greedy min-fold (sloppy) as
    * `phraseTopKExhaustive`. Do not use at scale. */
  def multiPhraseTopKExhaustive(slotAlts: Seq[Seq[String]], k: Int,
      scorer: Scorer = BM25(), slop: Int = 0): DataFrame = {
    require(slotAlts.nonEmpty && slotAlts.forall(_.nonEmpty) && slop >= 0)
    val groups = slotAlts.map(_.distinct)
    val m = matchesWithPositions(groups.flatten.distinct).toDF()
    def slotPos(g: Seq[String]): DataFrame =
      m.where(col("term").isin(g: _*))
        .select(col("docId"), explode(col("positions")).as("p"))
        .distinct()
    val starts =
      if (slop == 0)
        groups.zipWithIndex.map { case (g, i) =>
          slotPos(g).select(col("docId"), (col("p") - lit(i)).as("start"))
        }.reduce((a, b) => a.join(b, Seq("docId", "start")))
      else {
        val init = slotPos(groups.head)
          .select(col("docId"), col("p").as("start"), col("p").as("prev"))
        val chained = groups.drop(1).foldLeft(init) { (acc, g) =>
          acc.join(slotPos(g), Seq("docId"))
            .where(col("p") > col("prev"))
            .groupBy("docId", "start").agg(min(col("p")).as("prev"))
        }
        chained
          .where(col("prev") - col("start") <= lit(groups.length - 1 + slop))
          .select("docId", "start")
      }
    val phraseTf = starts.groupBy("docId").agg(count(lit(1)).as("tf"))
      .join(dlLookup(collectMeta(groups.flatten.distinct)), Seq("docId"))
      .localCheckpoint()
    val df = phraseTf.count().toDouble
    phraseTf
      .withColumn("score", scorer.contributionCol(
        col("tf").cast("double"), lit(df), col("dl"), stats))
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select("docId", "score")
  }

  /** Pruned positional phrase matching, factored for reuse by boolean
    * queries with phrase clauses: (docId, tf, dl) for every LIVE doc
    * containing the exact slot sequence. Eagerly materialized
    * (localCheckpoint) so the cogroup runs ONCE for both the phrase-df
    * count and any downstream scoring plan. */
  private def phraseMatchRows(terms: Seq[String], scorer: Scorer,
      slop: Int = 0): DataFrame = {
    require(terms.nonEmpty)
    require(slop >= 0, "negative slop")
    val slots = terms
    val qTerms = terms.distinct.sorted
    val meta = collectMeta(qTerms)
    val shards =
      if (qTerms.exists(t => !meta.dfs.contains(t))) Array.empty[Long]
      else meta.shardsWithAll(qTerms)
    if (shards.isEmpty)
      return Seq.empty[(Long, Int, Double)].toDF("docId", "tf", "dl")
    val dfs = meta.dfs
    val st = stats
    val scorerB = scorer
    val slopB = slop
    val prows = pruneShards(postingRows(qTerms).toDF(), shards)
      .as[PostingRow].groupByKey(_.shard)
    val dls = pruneShards(dlWithShard, shards)
      .select(col("docId"), col("dl"), col("shard"))
      .as[(Long, Double, Long)]
      .groupByKey(_._3)
    val matched = prows.cogroup(dls) {
      (_: Long, ps: Iterator[PostingRow], ds: Iterator[(Long, Double, Long)]) =>
        val rows = ps.toArray
        // one row per (term, shard) is a merge-path invariant, and this
        // toMap would SILENTLY keep one of the duplicates (undercounting
        // phrase tf on e.g. an un-merged union of segment partials) —
        // fail loudly instead, like topKWand which keeps duplicates as
        // separate iterators
        require(rows.iterator.map(_.term).toSet.size == rows.length,
          "duplicate posting rows for one (term, shard) — phrase search " +
            "requires merged postings (one row per term per shard)")
        val iterOf = rows.map { r =>
          r.term -> new TermIterator(r.term, dfs(r.term).toDouble, 0.0,
            scorerB, st, new PostingsCodec.BlobView(r.blob))
        }.toMap
        if (iterOf.size < slots.distinct.length) Iterator.empty
        else {
          val dlMap = new scala.collection.mutable.LongMap[Double]()
          ds.foreach { case (d, dl, _) => dlMap.update(d, dl) }
          // docs absent from the live dl side (tombstoned) are dropped
          // BEFORE the phrase-df count, so phrase idf reflects live
          // matches only
          Wand.phraseMatches(slots, iterOf, slopB)
            .collect { case (d, tf) if dlMap.contains(d) => (d, tf, dlMap(d)) }
        }
    }.toDF("docId", "tf", "dl")
      // eager materialization: the cogroup runs ONCE for both the df
      // count and the scoring plan; not pinned in the CacheManager
      .localCheckpoint()
    matched
  }

  /** Exhaustive phrase path (corpus-wide positional explode + equi-join
    * on (docId, start)) — retained as the cross-validation oracle for
    * the pruned path; do not use at scale. */
  def phraseTopKExhaustive(terms: Seq[String], k: Int, scorer: Scorer = BM25(),
      slop: Int = 0): DataFrame = {
    require(terms.nonEmpty && slop >= 0)
    val m = matchesWithPositions(terms.distinct).toDF()
    // explode positions per term
    def posDf(t: String, i: Int): DataFrame =
      m.where(col("term") === t)
        .select(col("docId"), explode(col("positions")).as("p"))
        .select(col("docId"), (col("p") - lit(i)).as("start"))
    val starts =
      if (slop == 0)
        terms.zipWithIndex
          .map { case (t, i) => posDf(t, i) }
          .reduce((a, b) => a.join(b, Seq("docId", "start")))
      else {
        // sloppy: the same greedy minimal chain as Wand.phraseMatches,
        // as a relational fold — each step joins slot j's positions
        // strictly above prev and keeps min(p) per (docId, start), so
        // the fold carries the minimal chain end; the window filter at
        // the end is then exact ("some chain fits" ⇔ "greedy fits").
        def posRaw(t: String): DataFrame =
          m.where(col("term") === t)
            .select(col("docId"), explode(col("positions")).as("p"))
        val init = posRaw(terms.head)
          .select(col("docId"), col("p").as("start"), col("p").as("prev"))
        val chained = terms.drop(1).foldLeft(init) { (acc, t) =>
          acc.join(posRaw(t), Seq("docId"))
            .where(col("p") > col("prev"))
            .groupBy("docId", "start").agg(min(col("p")).as("prev"))
        }
        chained
          .where(col("prev") - col("start") <= lit(terms.length - 1 + slop))
          .select("docId", "start")
      }
    // localCheckpoint (eager): the positions join runs ONCE, its result
    // is materialized for both the df count and the scoring plan, and —
    // unlike cache() — it is NOT pinned in the session CacheManager, so
    // the blocks free once this query's DataFrames are unreferenced.
    // The live dl join comes BEFORE the phrase-df count so tombstoned
    // docs don't inflate df — same contract as the pruned path (which
    // filters inside the cogroup before counting).
    val phraseTf = starts.groupBy("docId").agg(count(lit(1)).as("tf"))
      .join(dlLookup(collectMeta(terms.distinct)), Seq("docId"))
      .localCheckpoint()
    val df = phraseTf.count().toDouble // LIVE docs containing the phrase
    val withDl = phraseTf
      .withColumn("score", scorer.contributionCol(
        col("tf").cast("double"), lit(df), col("dl"), stats))
    withDl.orderBy(desc("score"), asc("docId")).limit(k)
      .select("docId", "score")
  }

  /** Field-sorted top-k (reference C5, HBaseTopFieldCollector): match
    * docs, join stored fields, sort by field value then score. */
  def sortedTopK(
      terms: Seq[String],
      sortCol: String,
      ascending: Boolean,
      k: Int,
      scorer: Scorer = BM25(),
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    sortedTopKMulti(terms, Seq((sortCol, ascending)), k, scorer, docFilter)

  /** Multi-key field sort — EXCEEDS the reference, which throws on
    * more than one sort field (HBaseIndexSearcher.java:95-97): each
    * (column, ascending) key in order, then score desc, then docId asc
    * (deterministic final tiebreak). Spark plans the whole thing as
    * one TakeOrderedAndProject over the scoring join. */
  def sortedTopKMulti(
      terms: Seq[String],
      sortCols: Seq[(String, Boolean)],
      k: Int,
      scorer: Scorer = BM25(),
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // filter + sort together = the reference's full C5 entry signature
    // (HBaseIndexSearcher.search(weight, filter, nDocs, sort))
    require(sortCols.nonEmpty, "at least one sort key required")
    val scored = scoredDocs(terms, scorer, docFilter = docFilter)
    val joined = scored.join(
      index.docs.select((Seq("docId") ++ sortCols.map(_._1)).distinct.map(col): _*),
      Seq("docId"))
    val ords = sortCols.map { case (c, asc_) => if (asc_) asc(c) else desc(c) } ++
      Seq(desc("score"), asc("docId"))
    joined.orderBy(ords: _*).limit(k)
      .select((Seq(col("docId")) ++ sortCols.map(c => col(c._1)).distinct
        :+ col("score")): _*)
  }

  /** Facet counts over a stored field for the query's match set (the
    * Lucene facet module / ES terms-aggregation surface, layered on
    * the reference's reader SPI like its collectors): LIVE matching
    * docs per distinct `facetField` value, top `topN` values by count
    * (ties → value asc). OR semantics by default; `requireAll` = AND.
    * A facet inherently touches every match, so the plan is the
    * exhaustive match set — but counts partial-aggregate map-side
    * after a shard-pruned live semi-join, and only `topN` value rows
    * reach the driver. */
  def facetCounts(
      terms: Seq[String],
      facetField: String,
      topN: Int,
      requireAll: Boolean = false,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val qTerms = terms.distinct
    require(qTerms.nonEmpty && topN > 0)
    val meta = collectMeta(qTerms)
    // single-term: posting lists are docId-unique — the per-doc
    // distinct/agg shuffle of the whole match set buys nothing
    val matched0 =
      if (qTerms.length == 1) matches(qTerms).toDF().select("docId")
      else {
        val m0 = matches(qTerms).toDF().groupBy("docId")
          .agg(countDistinct("term").as("nMatched"))
        (if (requireAll) m0.where(col("nMatched") === qTerms.length) else m0)
          .select("docId")
      }
    // tombstones drop from the MATCHED side (match-set-sized anti-join)
    val matched = index.deletes match {
      case None => matched0
      case Some(del) => matched0.join(
        del.select(col(del.columns.head).cast("long").as("docId")),
        Seq("docId"), "left_anti")
    }
    // docFilter applies to the label scan directly (it is a predicate
    // over stored docs — same live semantics as the dl-side filter).
    // The label join is the scale decision: |matched| ≤ Σ df is KNOWN
    // from the already-collected metadata, so a selective facet
    // broadcasts its match set and the 10^N-row stored-docs side never
    // shuffles (map-side semi-join + partial count; only |values| rows
    // move). Above the gate: plain shuffle join, the honest plan for a
    // corpus-wide facet.
    val estBytes = qTerms.map(t => meta.dfs.getOrElse(t, 0L)).sum * 16L
    val m = if (estBytes <= dlBroadcastBytes) broadcast(matched) else matched
    facetSide(facetField, meta.shards, docFilter)
      .join(m, Seq("docId"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value")).limit(topN)
  }

  /** (docId, value) side of a facet/group join, pruned to the query's
    * touched doc-range shards (a term whose matches cluster in few
    * shards must not pay a corpus-wide stored-docs scan to label
    * them) with the optional doc predicate pushed into the scan. */
  private def facetSide(field0: String, shards: Array[Long],
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val src = docFilter.map(index.docs.where).getOrElse(index.docs)
    pruneShards(
      src.select(col("docId"), col(field0).as("value"))
        .withColumn("shard",
          (col("docId") / lit(index.config.shardSizeDocs)).cast("long")),
      shards).drop("shard")
  }

  /** Grouped top-k (the Lucene grouping module's
    * TermFirstPassGroupingCollector surface): the best `kPerGroup`
    * docs per distinct `groupField` value, ranked by query score
    * (ties → docId asc). One window over the scoring join, partitioned
    * by the group value — the shuffle key is the group, and each
    * partition keeps a running top-k, never the corpus. Returns
    * (value, docId, score, rank) ordered by (value, rank). */
  def groupedTopK(
      terms: Seq[String],
      groupField: String,
      kPerGroup: Int,
      scorer: Scorer = BM25(),
      requireAll: Boolean = false,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(kPerGroup > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value")).orderBy(desc("score"), asc("docId"))
    // row_number + rank<=k is the WindowGroupLimit shape — Spark
    // inserts per-partition group limits BEFORE the window shuffle,
    // so each map task forwards at most k rows per group
    scoredDocs(terms, scorer, requireAll, docFilter = docFilter)
      .join(facetSide(groupField, collectMeta(terms.distinct).shards),
        Seq("docId"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= kPerGroup)
      .orderBy(asc("value"), asc("rank"))
      .select("value", "docId", "score", "rank")
  }

  /** MoreLikeThis (Lucene contrib MoreLikeThis, which drives itself
    * entirely through the reader SPI the reference exposes): select
    * the seed doc's most characteristic terms and rank the corpus
    * with the scoring-OR of that selection. Selection order is
    * tf desc, then df asc (rarer ⇒ more characteristic), then term
    * asc — integer-only comparisons, so engine and SQL oracle can
    * never diverge on a float tie (Lucene's tf·idf ordering reduces
    * to this whenever idf is monotone in df, i.e. always). Term
    * selection is driver-side over ONE stored doc (docTermVector) +
    * one pruned dictionary lookup; the query itself is the standard
    * WAND plan. The seed doc is excluded from the hits unless
    * `includeSeed` (Lucene MLT convention). */
  def moreLikeThisTopK(
      docId: Long,
      k: Int,
      maxQueryTerms: Int = 5,
      minTermFreq: Int = 1,
      scorer: Scorer = BM25(),
      includeSeed: Boolean = false): DataFrame = {
    val tv = docTermVector(docId).select("term", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    moreLikeThis(tv, k, maxQueryTerms, minTermFreq, scorer,
      excludeDocId = if (includeSeed) None else Some(docId))
  }

  /** MoreLikeThis from EXTERNAL text (Lucene MoreLikeThis.like(Reader)
    * — the seed never has to be in the index, and no stored content is
    * required): analyze with the index's own analyzer, then the same
    * selection + WAND plan as the docId form. */
  def moreLikeThisFromText(
      text: String,
      k: Int,
      maxQueryTerms: Int = 5,
      minTermFreq: Int = 1,
      scorer: Scorer = BM25()): DataFrame = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    if (text != null)
      index.config.analyzer.foreachEmitted(text) { (t, _) =>
        m.update(t, m.getOrElse(t, 0L) + 1L)
      }
    moreLikeThis(m.toArray, k, maxQueryTerms, minTermFreq, scorer, None)
  }

  private def moreLikeThis(
      termTfs: Array[(String, Long)],
      k: Int,
      maxQueryTerms: Int,
      minTermFreq: Int,
      scorer: Scorer,
      excludeDocId: Option[Long]): DataFrame = {
    require(maxQueryTerms > 0 && minTermFreq >= 1)
    val tv = termTfs.filter(_._2 >= minTermFreq)
    if (tv.isEmpty) return emptyHits
    val dfs = docFreqs(tv.map(_._1).toSeq)
    val sel = tv.sortBy { case (t, tf) => (-tf, dfs.getOrElse(t, 0L), t) }
      .take(maxQueryTerms).map(_._1).toSeq.sorted
    topKWand(sel, k, scorer,
      docFilter = excludeDocId.map(id => col("docId") =!= id))
  }

  /** Constant-score query (Lucene ConstantScoreQuery /
    * ConstantScoreRangeQuery — the 3.0-era CONSTANT_SCORE rewrite of
    * every MultiTermQuery): docs matching ANY dictionary term under
    * `pred` at score = `boost`, docId order — matching as a FILTER,
    * deliberately skipping the per-term idf arithmetic and its
    * TooManyClauses cap (the whole reason the rewrite exists). The
    * match set decodes only the predicate terms' postings; tombstones
    * and `docFilter` apply through the live dl side. */
  def constantScoreTopK(
      pred: org.apache.spark.sql.Column,
      k: Int,
      boost: Double = 1.0,
      docFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // the predicate pushes straight into the POSTINGS scan — no
    // dictionary collect, no expansion list on the driver: a
    // constant-score query has no per-term state, so an arbitrarily
    // wide predicate streams through one decode + distinct
    val prows = index.postings.where(col("field") === field && pred)
    // one metadata collect, AGGREGATED in Spark: the driver receives a
    // single (shard set, Σ df) row — never per-(term, shard) rows. The
    // open-ended predicate is the whole point of the constant-score
    // rewrite, so its expansion can be vocabulary-sized: a broad
    // predicate over a 100-TB corpus has millions of matching terms ×
    // their shards, but the DISTINCT shard set is bounded by
    // ceil(N/shardSize) (~10^6 longs at 10^12 docs) regardless of how
    // many terms match. Columns only — blob pages stay untouched.
    val metaRow = prows
      .agg(collect_set("shard").as("shards"), sum("df").as("totDf"))
      .collect().head
    if (metaRow.isNullAt(1)) return emptyHits
    val shards = metaRow.getSeq[Long](0).toArray.sorted
    val totDf = metaRow.getLong(1)
    val matched = prows.as[PostingRow].flatMap { r =>
      val v = new PostingsCodec.BlobView(r.blob)
      (0 until v.nBlocks).iterator.flatMap(i => v.decodeDocTf(i).iterator)
        .map(_._1)
    }.toDF("docId").distinct()
    // bounded match set (Σ df known) broadcasts into a semi-join
    // against the live side — the second corpus-sized shuffle the
    // first cut paid (matched ⋈ live both exchanged) disappears; same
    // gate/fallback shape as facetCounts
    val live = pruneShards(dlWithShard(docFilter), shards).select("docId")
    val joined =
      if (totDf * 16L <= dlBroadcastBytes)
        live.join(broadcast(matched), Seq("docId"), "left_semi")
      else matched.join(live, Seq("docId"), "left_semi")
    joined
      .withColumn("score", lit(boost))
      .orderBy(asc("docId")).limit(k)
      .select("docId", "score")
  }

  /** Constant-score term-range form (Lucene ConstantScoreRangeQuery). */
  def constantScoreRangeTopK(
      lo: Option[String],
      hi: Option[String],
      k: Int,
      includeLo: Boolean = true,
      includeHi: Boolean = false,
      boost: Double = 1.0): DataFrame = {
    require(lo.nonEmpty || hi.nonEmpty, "unbounded on both ends")
    val preds = Seq(
      lo.map(v => if (includeLo) col("term") >= v else col("term") > v),
      hi.map(v => if (includeHi) col("term") <= v else col("term") < v)).flatten
    constantScoreTopK(preds.reduce(_ && _), k, boost)
  }

  /** Score explanation for one (query, doc) — Lucene
    * IndexSearcher.explain(): per matching query term, the tf/df/dl
    * inputs and the scorer's contribution. Rows sum to the doc's
    * topK/topKWand score for docFactor-free scorers (BM25). The scan
    * prunes to the SINGLE doc-range shard the doc lives in and
    * decodes only the query terms' blobs there — a point debug call,
    * cost ∝ one shard, not the corpus. */
  def explainDoc(
      terms: Seq[String],
      docId: Long,
      scorer: Scorer = BM25()): DataFrame = {
    val qTerms = terms.distinct.sorted
    require(qTerms.nonEmpty)
    val shard = docId / index.config.shardSizeDocs
    val dlRow = dlWithShard(None).where(col("docId") === docId)
      .select("dl").limit(1).collect()
    // deleted or absent doc explains to nothing
    if (dlRow.isEmpty)
      return Seq.empty[(String, Long, Long, Double)]
        .toDF("term", "tf", "df", "contribution")
    val dl = dlRow.head.getDouble(0)
    val dfs = collectMeta(qTerms).dfs
    val target = docId
    val tfRows = pruneShards(postingRows(qTerms).toDF(), Array(shard))
      .as[PostingRow].flatMap { r =>
        val v = new PostingsCodec.BlobView(r.blob)
        (0 until v.nBlocks).iterator.flatMap(i => v.decodeDocTf(i).iterator)
          .collect { case (d, tf) if d == target => (r.term, tf) }
      }.toDF("term", "tf")
    val dfCol = coalesce(element_at(typedlit(dfs), col("term")), lit(0L))
    tfRows
      .withColumn("df", dfCol)
      .withColumn("contribution", scorer.contributionCol(
        col("tf").cast("double"), col("df").cast("double"), lit(dl), stats))
      .orderBy(asc("term"))
      .select(col("term"), col("tf").cast("long").as("tf"), col("df"),
        col("contribution"))
  }

  /** Term/tf/positions vector of ONE stored doc by re-analysis of its
    * stored content with the index's own analyzer — the reader-SPI
    * surface the reference declares but stubs entirely
    * (HBaseTermFreqVector.java:39-74). Requires the content column to
    * be stored (IndexConfig.storeContent); equality with the index's
    * postings for the doc is asserted in tests (same analyzer ⇒ same
    * token stream by construction). A driver-side point lookup — this
    * is a single-doc debugging/SPI call, not a scan operator. */
  def docTermVector(docId: Long): DataFrame = {
    val rows = index.docs.where(col("docId") === docId)
      .select(field).limit(1).collect()
    require(rows.nonEmpty,
      s"docId $docId not found (or content not stored) — docTermVector " +
        "re-analyzes the stored content column")
    val text = rows.head.getString(0)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    if (text != null)
      index.config.analyzer.foreachEmitted(text) { (t, p) =>
        m.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty[Int]) += p
      }
    m.iterator.map { case (t, ps) => (t, ps.length.toLong, ps.toSeq) }.toSeq
      .toDF("term", "tf", "positions")
  }

  /** Ordered term-dictionary scan from a given term (reference C1/A6,
    * HBaseTermEnum.skipTo). */
  def termEnum(fromTerm: String, limit: Int): DataFrame =
    index.termStats
      .where(col("field") === field && col("term") >= fromTerm)
      .orderBy(asc("term"))
      .limit(limit)
      .select("term", "df", "cf")

  /** Ordered dictionary scan across ALL fields from a (field, term)
    * key — the reference's HBaseTermEnum iterates the whole field/term
    * keyspace, not one field (HBaseTermEnum.java:86-100;
    * TestHBaseTermEnum.java:61-72 asserts multiple fields appear). */
  def termEnumAll(fromField: String, fromTerm: String, limit: Int): DataFrame =
    index.termStats
      .where(col("field") > fromField
        || (col("field") === fromField && col("term") >= fromTerm))
      .orderBy(asc("field"), asc("term"))
      .limit(limit)
      .select("field", "term", "df", "cf")

  /** Expand dictionary terms matching a predicate, term-ascending,
    * bounded: the scale contract of every Lucene MultiTermQuery the
    * reference inherits through its TermEnum SPI (BooleanQuery
    * rewrite throws TooManyClauses past the clause cap). The collect
    * is ≤ maxExpansions+1 strings — driver-bounded by construction. */
  private def expandTerms(
      pred: org.apache.spark.sql.Column,
      label: String,
      maxExpansions: Int): Seq[String] = {
    val ts = index.termStats
      .where(col("field") === field && pred)
      .orderBy(asc("term")).limit(maxExpansions + 1)
      .select("term").collect().map(_.getString(0)).toSeq
    require(ts.length <= maxExpansions,
      s"$label expands to more than maxExpansions=$maxExpansions terms " +
        "(Lucene BooleanQuery.TooManyClauses contract) — narrow the " +
        "pattern or raise maxExpansions")
    ts
  }

  private def emptyHits: DataFrame =
    Seq.empty[(Long, Double)].toDF("docId", "score")

  /** Dictionary predicate of a wildcard pattern: leading literal run
    * pushes down as a prefix scan, the full pattern applies as an
    * anchored regex (shared by wildcardTopK and the parser's wildcard
    * clauses). */
  private def wildcardPred(pattern: String): org.apache.spark.sql.Column = {
    val litPrefix = pattern.takeWhile(c => c != '*' && c != '?')
    val rx = "^" + pattern.map {
      case '*' => ".*"
      case '?' => "."
      case c => java.util.regex.Pattern.quote(c.toString)
    }.mkString + "$"
    if (litPrefix.isEmpty) col("term").rlike(rx)
    else col("term").startsWith(litPrefix) && col("term").rlike(rx)
  }

  /** Resolve a parsed multi-term clause against the dictionary
    * (TooManyClauses-bounded, like the explicit API calls). */
  private def expandClause(e: ExpansionClause,
      maxExpansions: Int = 1024): Seq[String] = e.kind match {
    case ExpansionKind.Prefix =>
      expandTerms(col("term").startsWith(e.pattern),
        s"prefix '${e.pattern}'", maxExpansions)
    case ExpansionKind.Wildcard =>
      expandTerms(wildcardPred(e.pattern), s"wildcard '${e.pattern}'",
        maxExpansions)
    case ExpansionKind.Fuzzy =>
      expandTerms(levenshtein(col("term"), lit(e.pattern)) <= e.maxEdits,
        s"fuzzy '${e.pattern}'~${e.maxEdits}", maxExpansions)
  }

  /** Parse a classic Lucene query string (the reference's entire search
    * surface goes through `new QueryParser(field, analyzer).parse(q)`,
    * TestHBaseneSearch.java) and dispatch to the matching pruned plan:
    * single bare phrase → positional leapfrog; all-MUST terms →
    * conjunctive WAND; mixed MUST/SHOULD terms → ReqOpt WAND; pure
    * SHOULD → OR WAND; any query mixing phrase clauses with other
    * clauses (or with a NOT, or several phrases) → the clause-level
    * boolean scorer. A query with only prohibited clauses (or none)
    * matches nothing — the Lucene BooleanQuery contract. */
  def search(query: String, k: Int, scorer: Scorer = BM25()): DataFrame = {
    val raw = QueryParser.parse(query, index.config.analyzer)
    // Resolve multi-term clauses against the dictionary (Lucene's
    // rewrite step): SHOULD expansions flatten into SHOULD terms
    // (scoring-boolean rewrite — each expanded term scores with its
    // own idf), NOT expansions flatten into the exclusion set, and a
    // MUST expansion becomes a GROUP — the doc must match ≥1 of its
    // terms. An empty MUST expansion matches nothing (a required
    // clause rewrote to the empty query); single-term groups degrade
    // to plain MUST terms.
    val shouldExpanded = raw.shouldExpansions.map(e => (expandClause(e), e.boost))
    val shouldAll = (raw.should ++ shouldExpanded.flatMap(_._1)).distinct
    val notAll =
      (raw.mustNot ++ raw.notExpansions.flatMap(expandClause(_))).distinct
    val groupsExpanded = raw.mustExpansions.map(e => (expandClause(e).distinct, e.boost))
    if (groupsExpanded.exists(_._1.isEmpty)) return emptyHits
    val (singleGroups, multiGroupsB) = groupsExpanded.partition(_._1.size == 1)
    val multiGroups = multiGroupsB.map(_._1)
    // clause boosts (`term^N`, `sp*^N`): per-term map fed to both
    // scoring paths; an expansion clause's boost lands on every term
    // it expands to (the Lucene rewrite distributes the boost)
    val allBoosts = raw.boosts ++
      (shouldExpanded ++ groupsExpanded).flatMap { case (ts, b) =>
        if (b == 1.0) Nil else ts.map(_ -> b)
      }.toMap
    val pq = raw.copy(
      must = (raw.must ++ singleGroups.flatMap(_._1)).distinct,
      should = shouldAll, mustNot = notAll,
      mustExpansions = Nil, shouldExpansions = Nil, notExpansions = Nil,
      boosts = allBoosts)
    val phrases = pq.scoringPhrases
    if (!pq.hasScoring && multiGroups.isEmpty) emptyHits
    else if (multiGroups.nonEmpty) {
      // one multi-term MUST group and nothing else scoring ⇒ a plain
      // disjunction over the expansion (the group's own rewrite)
      if (multiGroups.length == 1 && pq.must.isEmpty && pq.should.isEmpty &&
          phrases.isEmpty && pq.notPhrases.isEmpty)
        topKWand(multiGroups.head, k, scorer, mustNot = pq.mustNot,
          boosts = pq.boosts)
      else scoredDocsBoolean(pq, scorer, multiGroups)
        .orderBy(desc("score"), asc("docId")).limit(k)
        .select("docId", "score")
    } else if (phrases.nonEmpty || pq.notPhrases.nonEmpty) {
      // fast path: exactly one scoring phrase and nothing else
      if (phrases.length == 1 && pq.must.isEmpty && pq.should.isEmpty &&
          pq.mustNot.isEmpty && pq.notPhrases.isEmpty) {
        val pc = phrases.head._1
        phraseTopK(pc.slots, k,
          if (pc.boost == 1.0) scorer else Boosted(scorer, pc.boost), pc.slop)
      } else scoredDocsBoolean(pq, scorer)
        .orderBy(desc("score"), asc("docId")).limit(k)
        .select("docId", "score")
    } else if (pq.must.isEmpty && pq.should.isEmpty) emptyHits
    else if (pq.should.isEmpty)
      topKWand(pq.must, k, scorer, requireAll = true, mustNot = pq.mustNot,
        boosts = pq.boosts)
    else topKWand(pq.must ++ pq.should, k, scorer,
      mustNot = pq.mustNot, must = pq.must, boosts = pq.boosts)
  }

  /** Boolean query whose clauses mix terms and phrases (Lucene
    * BooleanQuery with PhraseQuery sub-clauses): per-clause
    * contribution rows — term clauses from the postings join, each
    * phrase clause from the PRUNED positional path (`phraseMatchRows`;
    * positions never explode corpus-wide) scored against the phrase's
    * own live df like `phraseTopK` — unioned and folded per doc in a
    * fixed clause order. MUST semantics count matched MUST clauses
    * (term or phrase); NOT drops docs matching any prohibited term or
    * phrase via one docId anti-join. The aggregation reuses the
    * docId-hash partitioning, so candidate volume is bounded by the
    * clauses' own match volumes — the phrase side is already pruned,
    * and a MUST phrase bounds the surviving set harder than any term.
    */
  def scoredDocsBoolean(pq: ParsedQuery, scorer: Scorer = BM25(),
      mustGroups: Seq[Seq[String]] = Nil): DataFrame = {
    val phrases = pq.scoringPhrases
    require(pq.hasScoring || mustGroups.nonEmpty,
      "boolean query needs at least one scoring clause")
    val plainTerms = (pq.must ++ pq.should).distinct.sorted
    val qTerms = (plainTerms ++ mustGroups.flatten).distinct.sorted
    val mustTermSet = pq.must.distinct.toSet
    val st = stats
    val sc = scorer
    val meta = if (qTerms.isEmpty) null else collectMeta(qTerms)

    // clause assignment: a plain term is its own clause "t:<term>"; a
    // MUST group's members share one clause "g:<i>" (the group matches
    // when ANY member does). A term can sit in several clauses — it
    // then contributes once per clause, which is exactly Lucene's
    // per-clause scoring of a rewritten multi-term query.
    val clausePairs: Seq[(String, String, Boolean)] =
      plainTerms.map(t => (t, "t:" + t, mustTermSet(t))) ++
        mustGroups.zipWithIndex.flatMap { case (g, i) =>
          g.distinct.map(t => (t, s"g:$i", true))
        }
    // term clause rows: (clause, docId, tscore, isMust); per-term
    // boosts (`term^N` / boosted expansions) scale the contribution
    val termRows: Option[DataFrame] = if (qTerms.isEmpty) None else {
      val dfLookup = typedlit(meta.dfs.map { case (t, d) => t -> d.toDouble })
      val clauseDf = clausePairs.toDF("term", "clause", "isMust")
      val boostCol =
        if (pq.boosts.isEmpty) lit(1.0)
        else coalesce(element_at(typedlit(pq.boosts), col("term")), lit(1.0))
      Some(matches(qTerms).toDF()
        .join(dlLookup(meta), Seq("docId"))
        .withColumn("df", element_at(dfLookup, col("term")))
        .join(broadcast(clauseDf), Seq("term"))
        .select(
          col("clause"),
          col("docId"),
          (boostCol * sc.contributionCol(
            col("tf").cast("double"), col("df"), col("dl"), st)).as("tscore"),
          col("isMust")))
    }
    // phrase clause rows: one pruned positional match set per clause;
    // df = live docs containing the phrase (same contract as phraseTopK)
    val phraseRows: Seq[(DataFrame, Double)] = phrases.zipWithIndex.map {
      case ((pc, isMust), i) =>
        val m = phraseMatchRows(pc.slots, sc, pc.slop)
        val pdf = m.count().toDouble
        (m.select(
          lit(s"p:$i").as("clause"),
          col("docId"),
          (lit(pc.boost) * sc.contributionCol(
            col("tf").cast("double"), lit(pdf), col("dl"), st)).as("tscore"),
          lit(isMust).as("isMust")), pdf)
    }
    val allRows = (termRows.toSeq ++ phraseRows.map(_._1)).reduce(_ union _)

    val nMustClauses = mustTermSet.size + pq.mustPhrases.size + mustGroups.size
    // docFactor inputs are order-free sums over per-clause dfs
    val queryDfs =
      qTerms.map(t => meta.dfs.getOrElse(t, 0L).toDouble) ++ phraseRows.map(_._2)

    // clause-match counts are over DISTINCT clause labels: a group
    // matching through two member terms is still ONE matched clause
    // (its rows still each add score — Lucene sums the rewritten
    // disjunction's sub-scorers)
    val perDoc = allRows.groupBy("docId")
      .agg(sort_array(collect_list(
        struct(col("clause"), col("tscore"), col("isMust")))).as("cs"))
      .withColumn("nMatched", size(array_distinct(
        transform(col("cs"), x => x.getField("clause")))))
      .withColumn("nMust",
        size(array_distinct(transform(
          filter(col("cs"), x => x.getField("isMust")),
          x => x.getField("clause")))))
      .withColumn("rawScore",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("tscore")))
      .drop("cs")
    val filtered =
      if (nMustClauses == 0) perDoc
      else perDoc.where(col("nMust") === nMustClauses)
    // codegen'd doc factor, same fast-path/parity contract as scoredDocs
    val scored = (
      if (sc.docFactorIdentity) filtered.withColumn("score", col("rawScore"))
      else filtered.withColumn("score", col("rawScore") *
        sc.docFactorCol(col("nMatched"), queryDfs, st)))
      .select("docId", "score", "nMatched")
    // prohibited clauses: one anti-join over the union of their docIds
    val notDfs =
      (if (pq.mustNot.nonEmpty)
        Seq(matches(pq.mustNot.distinct).toDF().select("docId")) else Nil) ++
        pq.notPhrases.map(p => phraseMatchRows(p.slots, sc, p.slop).select("docId"))
    if (notDfs.isEmpty) scored
    else scored.join(notDfs.reduce(_ union _).distinct(), Seq("docId"), "left_anti")
  }

  /** Prefix query (Lucene PrefixQuery via the reference's TermEnum
    * seek, HBaseTermEnum.skipTo): expand the dictionary — a pushed
    * StringStartsWith + range scan, the same A6 surface as termEnum —
    * then rank the expansion as a disjunctive WAND query (Lucene
    * SCORING_BOOLEAN_QUERY_REWRITE semantics: per-term idf, not
    * constant-score). */
  def prefixTopK(
      prefix: String,
      k: Int,
      scorer: Scorer = BM25(),
      maxExpansions: Int = 1024): DataFrame = {
    require(prefix.nonEmpty, "empty prefix would expand the whole dictionary")
    val ts = expandTerms(col("term").startsWith(prefix), s"prefix '$prefix'",
      maxExpansions)
    if (ts.isEmpty) emptyHits else topKWand(ts, k, scorer)
  }

  /** Wildcard query (Lucene WildcardQuery): `*` = any run, `?` = any
    * one char, everything else literal. The leading literal run pushes
    * down as a prefix range scan; the residual pattern applies as an
    * anchored regex on the dictionary. A leading wildcard forces a
    * full dictionary scan — same caveat as Lucene, and still only a
    * scan of the TERM DICTIONARY (∝ vocabulary, not corpus). */
  def wildcardTopK(
      pattern: String,
      k: Int,
      scorer: Scorer = BM25(),
      maxExpansions: Int = 1024): DataFrame = {
    require(pattern.exists(c => c != '*' && c != '?'),
      s"wildcard pattern '$pattern' has no literal characters")
    val ts = expandTerms(wildcardPred(pattern), s"wildcard '$pattern'",
      maxExpansions)
    if (ts.isEmpty) emptyHits else topKWand(ts, k, scorer)
  }

  /** Fuzzy query (Lucene FuzzyQuery): rank docs containing any
    * dictionary term within `maxEdits` Levenshtein edits of `term`.
    * Lucene 3.0's FuzzyTermEnum is exactly this — a full TermEnum
    * scan with a per-term edit-distance filter (∝ vocabulary, not
    * corpus); `prefixLength` > 0 pushes a literal prefix into the
    * dictionary scan like Lucene's prefix-locked fuzzy. The expansion
    * ranks as a plain scoring OR (per-term idf), like the rest of the
    * MultiTermQuery family here — Lucene 3.0's extra
    * (1 − d/min(len)) closeness boost is not applied. */
  def fuzzyTopK(
      term: String,
      k: Int,
      maxEdits: Int = 2,
      prefixLength: Int = 0,
      scorer: Scorer = BM25(),
      maxExpansions: Int = 1024): DataFrame = {
    require(term.nonEmpty && maxEdits >= 0 && prefixLength >= 0)
    val base = levenshtein(col("term"), lit(term)) <= maxEdits
    val pred =
      if (prefixLength > 0)
        col("term").startsWith(term.take(prefixLength)) && base
      else base
    val ts = expandTerms(pred, s"fuzzy '$term'~$maxEdits", maxExpansions)
    if (ts.isEmpty) emptyHits else topKWand(ts, k, scorer)
  }

  /** Term-range query (Lucene TermRangeQuery; reference A6 range scan):
    * rank docs containing any dictionary term in [lo, hi] / (lo, hi)
    * per the inclusive flags; a None bound is open. */
  def rangeTopK(
      lo: Option[String],
      hi: Option[String],
      k: Int,
      includeLo: Boolean = true,
      includeHi: Boolean = false,
      scorer: Scorer = BM25(),
      maxExpansions: Int = 1024): DataFrame = {
    require(lo.nonEmpty || hi.nonEmpty, "unbounded on both ends")
    val preds = Seq(
      lo.map(v => if (includeLo) col("term") >= v else col("term") > v),
      hi.map(v => if (includeHi) col("term") <= v else col("term") < v)).flatten
    val ts = expandTerms(preds.reduce(_ && _),
      s"range [${lo.getOrElse("")}, ${hi.getOrElse("")}]", maxExpansions)
    if (ts.isEmpty) emptyHits else topKWand(ts, k, scorer)
  }

  /** Regex query (Lucene 3.0 contrib RegexQuery — the same TermEnum
    * full-scan MultiTermQuery the reference inherits; modern
    * RegexpQuery): rank docs containing any dictionary term matching
    * the FULLY ANCHORED pattern. The scan touches the term dictionary
    * only (∝ vocabulary, not corpus) and the bounded expansion ranks
    * as a scoring OR with per-term idf, like the rest of the family. */
  def regexpTopK(
      pattern: String,
      k: Int,
      scorer: Scorer = BM25(),
      maxExpansions: Int = 1024): DataFrame = {
    require(pattern.nonEmpty, "empty regex pattern")
    val ts = expandTerms(col("term").rlike("^(?:" + pattern + ")$"),
      s"regex '$pattern'", maxExpansions)
    if (ts.isEmpty) emptyHits else topKWand(ts, k, scorer)
  }

  /** docKey → docId point lookup (the reference's doc2int reverse map,
    * HBaseIndexStore.java:154-159) — for re-indexing or joining
    * external labels by natural key. The docKey column exists on
    * code-corpus/table builds; a predicate-pushdown point scan here,
    * a broadcast-joinable `docs.select(docKey, docId)` for bulk use. */
  def lookupDocId(docKey: String): Option[Long] =
    index.docs.where(col("docKey") === docKey).select("docId")
      .limit(1).collect().headOption.map(_.getLong(0))

  /** docId → docKey (the forward int2doc map). */
  def lookupDocKey(docId: Long): Option[String] =
    index.docs.where(col("docId") === docId).select("docKey")
      .limit(1).collect().headOption.map(_.getString(0))

  /** Fetch stored docs for hits (reference C7 — semi-join after rank). */
  def fetch(hits: DataFrame, cols: Seq[String]): DataFrame =
    hits.join(index.docs.select((Seq("docId") ++ cols).map(col): _*), Seq("docId"))

  /** Best-window snippets for hits (the Lucene-contrib Highlighter
    * surface, absent from the reference): for each hit, re-analyze the
    * stored content with the index's own analyzer and slice the raw
    * text around the `width`-emitted-token window containing the MOST
    * query-term matches (ties → leftmost; no match → the leading
    * window), wrapping each matched token in pre/post markers.
    * Deterministic by construction. Runs as a broadcast join of the
    * tiny hit set against the docs table plus a per-row map — nothing
    * corpus-sized moves. Requires stored content
    * (IndexConfig.storeContent). Returns (docId, score, nMatches,
    * snippet). */
  def snippets(
      hits: DataFrame,
      terms: Seq[String],
      width: Int = 12,
      pre: String = "«",
      post: String = "»"): DataFrame = {
    require(width > 0)
    val qset = terms.toSet
    val az = index.config.analyzer
    val (p1, p2) = (pre, post)
    val w = width
    fetch(hits, Seq(field)).select(col("docId"), col("score"), col(field))
      .as[(Long, Double, String)]
      .map { case (docId, score, raw) =>
        val text = az.analyzedText(raw)
        val ts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
        if (text != null) az.foreachEmittedOffsets(text) { (t, _, s, e) =>
          ts += ((s, e, qset(t)))
        }
        if (ts.isEmpty) (docId, score, 0, "")
        else {
          // sliding window over emitted-token indices: O(n)
          var best = 0; var bestCnt = -1; var cnt = 0
          var i = 0
          while (i < ts.length) {
            cnt += (if (ts(i)._3) 1 else 0)
            if (i >= w) cnt -= (if (ts(i - w)._3) 1 else 0)
            val startIdx = math.max(0, i - w + 1)
            if (i >= w - 1 || i == ts.length - 1) {
              if (cnt > bestCnt) { bestCnt = cnt; best = startIdx }
            }
            i += 1
          }
          val end = math.min(ts.length, best + w)
          val sb = new java.lang.StringBuilder
          var c = ts(best)._1
          var j = best
          while (j < end) {
            val (s, e, m) = ts(j)
            sb.append(text, c, s)
            if (m) sb.append(p1)
            sb.append(text, s, e)
            if (m) sb.append(p2)
            c = e
            j += 1
          }
          (docId, score, bestCnt, sb.toString)
        }
      }
      .toDF("docId", "score", "nMatches", "snippet")
  }
}
