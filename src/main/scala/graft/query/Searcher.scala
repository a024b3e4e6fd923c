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

  /** Slim (docId, dl) lookup for scoring joins, semi-join pruned to
    * the doc-range shards that actually hold postings for the query's
    * terms — for selective queries this shrinks the dl side from N to
    * |touched shards|·shardSize rows in BOTH regimes (smaller
    * broadcast below the gate; less shuffled data above it). The
    * broadcast gate is sized on the PRUNED estimate — |touched
    * shards|·shardSize·16 B, counted by a term-pruned metadata scan —
    * not the corpus-wide numDocs, so a selective query on an
    * arbitrarily large corpus still broadcasts while an every-shard
    * query near the gate never ships a ~200 MB copy to the driver. */
  private def dlLookup(terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val touched = postingRows(terms).select("shard").distinct()
    val prunedBytes = touched.count() * index.config.shardSizeDocs * 16L
    val slim = index.docs
      .select(col("docId"), col("dl").cast("double").as("dl"))
      .withColumn("shard",
        (col("docId") / lit(index.config.shardSizeDocs)).cast("long"))
      .join(broadcast(touched), Seq("shard"), "left_semi")
      .select("docId", "dl")
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
    * (score desc, docId asc). Returns (docId, score, nMatched). */
  def scoredDocs(
      terms: Seq[String],
      scorer: Scorer = BM25(),
      requireAll: Boolean = false): DataFrame = {
    val qTerms = terms.distinct.sorted
    val dfs = docFreqs(qTerms)
    val queryDfs = qTerms.map(t => dfs.getOrElse(t, 0L).toDouble)
    val dfLookup = typedlit(dfs.map { case (t, d) => t -> d.toDouble })

    val m = matches(qTerms).toDF()
      .join(dlLookup(qTerms), Seq("docId"))
      .withColumn("df", element_at(dfLookup, col("term")))
      .withColumn("tscore",
        scorer.contributionCol(col("tf").cast("double"), col("df"), col("dl"), stats))

    val perDoc = m.groupBy("docId")
      .agg(sort_array(collect_list(struct(col("term"), col("tscore")))).as("cs"))
      .withColumn("nMatched", size(col("cs")))
      .withColumn("rawScore",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("tscore")))
      .drop("cs")
    val filtered =
      if (requireAll) perDoc.where(col("nMatched") === qTerms.length) else perDoc
    // doc-level factor (coord · queryNorm for the legacy scorer; 1 for BM25)
    // — locals only in the closure, Searcher itself is not serializable
    val (sc, qd, st) = (scorer, queryDfs, stats)
    val factorUdf = udf((n: Int) => sc.docFactor(n, qd, st))
    filtered.withColumn("score", col("rawScore") * factorUdf(col("nMatched")))
      .select("docId", "score", "nMatched")
  }

  def topK(
      terms: Seq[String],
      k: Int,
      scorer: Scorer = BM25(),
      requireAll: Boolean = false): DataFrame =
    scoredDocs(terms, scorer, requireAll)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .select("docId", "score")

  /** Total hit count (reference totalHits, TestHBaseIndexReader.java:50). */
  def totalHits(terms: Seq[String], requireAll: Boolean = false): Long = {
    val qTerms = terms.distinct
    val m = matches(qTerms).groupBy("docId").agg(countDistinct("term").as("n"))
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
      requireAll: Boolean = false): DataFrame = {
    val qTerms = terms.distinct.sorted
    val dfs = docFreqs(qTerms)
    val queryDfs = qTerms.map(t => dfs.getOrElse(t, 0L).toDouble)
    val nQueryTerms = qTerms.size
    val st = stats
    val shardSize = index.config.shardSizeDocs
    val scorerB = scorer

    val prows = postingRows(qTerms).groupByKey(_.shard)
    // Only shards that actually hold postings for the query's terms can
    // produce hits — semi-join the doc lengths down to those shards
    // (broadcast: |touched shards| ≤ Σ_term #shards, tiny) instead of
    // shuffling every (docId, dl) row in the corpus into the cogroup.
    val touchedShards = broadcast(postingRows(qTerms).select("shard").distinct())
    val dls = index.docs
      .select(col("docId"), col("dl").cast("double").as("dl"))
      .withColumn("shard", (col("docId") / lit(shardSize)).cast("long"))
      .join(touchedShards, Seq("shard"), "left_semi")
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
          Wand.topK(iters, d => dlMap.getOrElse(d, 0.0), scorerB, st, k,
            requireAll, nQueryTerms, queryDfs).iterator
        }
    }
    perShard.toDF()
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }

  /** Phrase top-k (consecutive positions), bigram-chained for n terms:
    * doc matches where term_i occurs at p+i. Phrase tf = number of
    * start positions; scored like a single pseudo-term. */
  def phraseTopK(terms: Seq[String], k: Int, scorer: Scorer = BM25()): DataFrame = {
    require(terms.nonEmpty)
    val m = matchesWithPositions(terms.distinct).toDF()
    // explode positions per term
    def posDf(t: String, i: Int): DataFrame =
      m.where(col("term") === t)
        .select(col("docId"), explode(col("positions")).as("p"))
        .select(col("docId"), (col("p") - lit(i)).as("start"))
    val starts = terms.zipWithIndex
      .map { case (t, i) => posDf(t, i) }
      .reduce((a, b) => a.join(b, Seq("docId", "start")))
    // localCheckpoint (eager): the positions join runs ONCE, its result
    // is materialized for both the df count and the scoring plan, and —
    // unlike cache() — it is NOT pinned in the session CacheManager, so
    // the blocks free once this query's DataFrames are unreferenced
    val phraseTf = starts.groupBy("docId").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = phraseTf.count().toDouble // docs containing the phrase
    val withDl = phraseTf
      .join(dlLookup(terms.distinct), Seq("docId"))
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
      scorer: Scorer = BM25()): DataFrame = {
    val scored = scoredDocs(terms, scorer)
    val joined = scored.join(index.docs.select(col("docId"), col(sortCol)), Seq("docId"))
    val ord = if (ascending) asc(sortCol) else desc(sortCol)
    joined.orderBy(ord, desc("score"), asc("docId")).limit(k)
      .select(col("docId"), col(sortCol), col("score"))
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
}
