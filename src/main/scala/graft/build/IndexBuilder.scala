package graft.build

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.{CodeDoc, CorpusStats}

/** Build configuration.
  *
  * @param shardSizeDocs docId-range width of one posting shard. A term's
  *   posting list is stored as one row per (term, shard) — the explicit
  *   skew strategy mandated by the north rule: a term appearing in
  *   every document ("public", "import") is built by
  *   ceil(N/shardSizeDocs) independent reducers instead of one, and
  *   query-side merge is pure concatenation of range-disjoint block
  *   lists (replaces the reference's single-row-per-term layout,
  *   hbasene HBaseIndexStore.java:215-240, which cannot scale past one
  *   region server per hot term).
  * @param buildPartitions shuffle parallelism of the posting groupBy
  *   (≙ "number of reduces = number of index partitions",
  *   create/mapred/BuildTableIndex.java:50-53).
  */
final case class IndexConfig(
    shardSizeDocs: Long = 1L << 20,
    buildPartitions: Int = 0) // 0 = leave to spark.sql.shuffle.partitions

/** The built index: four logical tables (SURVEY.md §1.6).
  *
  *   docs      — (docId, dl, content_sha256, + source columns)
  *   postings  — (field, term, shard, df, cf, maxTf, blocks)
  *   termStats — (field, term, df, cf, maxTf)   [global, shards merged]
  *   stats     — broadcastable corpus stats (N, avgdl)
  */
final case class InvertedIndex(
    docs: DataFrame,
    postings: DataFrame,
    termStats: DataFrame,
    stats: CorpusStats,
    config: IndexConfig) {

  def cache(): InvertedIndex = {
    docs.cache(); postings.cache(); termStats.cache(); this
  }
  def unpersist(): Unit = {
    docs.unpersist(); postings.unpersist(); termStats.unpersist()
  }
}

/** Index build DAG (SURVEY.md §3.1 "Spark shape"):
  *
  *   Dataset[doc] → dense docIDs → flatMap(tokenize, doc-local tf/pos
  *   aggregation) → groupBy(field, term, docRangeShard) →
  *   PostingAggregator → postings/docs/termStats/stats.
  *
  * Everything is DataFrame/Dataset; the only wide shuffles are the
  * docID range partitioning (code path) and the posting groupBy.
  */
object IndexBuilder {

  val TokenizedField = "content"

  /** Doc-local analysis: one input row → TermDocOcc rows per distinct
    * (field, term), tf/positions aggregated in-memory per doc (B2 with
    * no shuffle). Untokenized fields get the reference's sentinel
    * position [0] (HBaseIndexWriter.java:68-69,145-150). */
  private[graft] def analyzeDoc(
      docId: Long,
      tokenized: Seq[(String, String)],
      untokenized: Seq[(String, String)]): Iterator[(String, String, Long, Int, Seq[Int])] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Int]]
    tokenized.foreach { case (field, text) =>
      Analyzer.tokenize(text).foreach { case (term, pos) =>
        acc.getOrElseUpdate((field, term),
          scala.collection.mutable.ArrayBuffer.empty[Int]) += pos
      }
    }
    untokenized.foreach { case (field, value) =>
      if (value != null && value.nonEmpty) {
        val k = (field, value.toLowerCase)
        acc.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty[Int]) += 0
      }
    }
    acc.iterator.map { case ((f, t), ps) =>
      (f, t, docId, ps.length, ps.toSeq)
    }
  }

  /** Dense, deterministic docID assignment without a single-point sort
    * (SURVEY.md §7.4 #2): range-partition by the natural key, sort
    * within partitions, take the intra-partition ordinal from
    * monotonically_increasing_id (== pid·2^33 + in-partition row
    * number), then add broadcast per-partition offsets. Two passes over
    * the shuffled data, no global bottleneck; stable under re-runs for
    * fixed input. */
  def assignDocIds(df: DataFrame, keyCols: Seq[String], nPartitions: Int): DataFrame = {
    val sorted = df
      .repartitionByRange(math.max(nPartitions, 1), keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33))
      .withColumn("_local", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
    sorted.cache()
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = (pid, off); off += n; o
    }.toMap
    val offsetUdf = udf((pid: Long) => offsets(pid))
    sorted
      .withColumn("docId", offsetUdf(col("_pid")) + col("_local"))
      .drop("_mid", "_pid", "_local")
  }

  /** Build from the driver-mandated code-corpus shape
    * (repo, path, commit, lang, content). `content` is analyzed;
    * `path` and `lang` are indexed untokenized (reference's
    * untokenized-indexed fields, sentinel position 0). */
  def fromCodeDocs(
      spark: SparkSession,
      ds: Dataset[CodeDoc],
      cfg: IndexConfig = IndexConfig()): InvertedIndex = {
    val nPart = if (cfg.buildPartitions > 0) cfg.buildPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = ds.toDF()
      .withColumn("docKey",
        concat_ws("", col("repo"), lit("/"), col("path"), lit("@"), col("commit")))
    val withIds = assignDocIds(keyed, Seq("docKey"), nPart)
    val docs = withIds
      .withColumn("content_sha256", sha2(col("content"), 256))
      .withColumn("dl", docLenUdf(col("content")))
    build(spark, docs,
      tokenized = Seq(TokenizedField),
      untokenized = Seq("path", "lang"),
      cfg)
  }

  /** Build over a generic documents table with an existing dense id
    * column (e.g. /root/testdata documents.parquet: doc_id, text). */
  def fromText(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      untokenized: Seq[String] = Nil,
      cfg: IndexConfig = IndexConfig()): InvertedIndex = {
    val docs = df
      .withColumn("docId", col(idCol).cast("long"))
      .withColumn("content_sha256", sha2(col(textCol), 256))
      .withColumn("dl", docLenUdf(col(textCol)))
      .withColumnRenamed(textCol, TokenizedField)
    build(spark, docs, Seq(TokenizedField), untokenized, cfg)
  }

  private val docLenUdf = udf((s: String) => Analyzer.docLen(s).toLong)

  /** Core DAG shared by both entry points. `docs` must carry docId,
    * dl, content_sha256 and the field columns. */
  private def build(
      spark: SparkSession,
      docs: DataFrame,
      tokenized: Seq[String],
      untokenized: Seq[String],
      cfg: IndexConfig): InvertedIndex = {
    import spark.implicits._

    val shardSize = cfg.shardSizeDocs
    val fieldCols = (tokenized ++ untokenized).distinct
    val slim = docs.select((Seq("docId") ++ fieldCols).map(col): _*)

    // B1+B2 in one narrow pass: tokenize + doc-local (field,term) agg.
    val tokSet = tokenized.toSet
    val occs = slim
      .map { row =>
        val docId = row.getAs[Long]("docId")
        val tok = tokenized.map(f => (f, row.getAs[String](f)))
        val untok = untokenized.map(f => (f, row.getAs[String](f)))
        (docId, tok, untok)
      }
      .flatMap { case (docId, tok, untok) =>
        analyzeDoc(docId, tok.filter(t => tokSet.contains(t._1)), untok)
      }
      .toDF("field", "term", "docId", "tf", "positions")
      .withColumn("shard", (col("docId") / lit(shardSize)).cast("long"))

    val agg = udaf(new PostingAggregator())
    val grouped = {
      val g = occs.groupBy(col("field"), col("term"), col("shard"))
        .agg(agg(col("docId"), col("tf"), col("positions")).as("p"))
      if (cfg.buildPartitions > 0)
        occs.repartition(cfg.buildPartitions, col("field"), col("term"), col("shard"))
          .groupBy(col("field"), col("term"), col("shard"))
          .agg(agg(col("docId"), col("tf"), col("positions")).as("p"))
      else g
    }
    val postings = grouped.select(
      col("field"), col("term"), col("shard"),
      col("p.df").as("df"), col("p.cf").as("cf"),
      col("p.maxTf").as("maxTf"), col("p.blocks").as("blocks"))

    // Global dictionary stats — shards merged by a light aggregation
    // (no payload movement; ≙ reference docFreq, HBaseIndexReader.java:135-155).
    val termStats = postings.groupBy("field", "term").agg(
      sum("df").as("df"), sum("cf").as("cf"), max("maxTf").as("maxTf"))

    // Corpus stats (reference counter rows, HBaseIndexReader.java:231-266).
    val st = docs.agg(
      count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
      .collect()(0)
    val stats = CorpusStats(st.getLong(0),
      if (st.isNullAt(1)) 0.0 else st.getDouble(1))

    InvertedIndex(docs, postings, termStats, stats, cfg)
  }
}
