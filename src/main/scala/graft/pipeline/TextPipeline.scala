package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Training-data pipeline operators over the `documents` /
  * `embeddings` tables: dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard), similarity search (brute-force cosine, LSH
  * buckets, IVF-style partition), text analysis (lang-ID, quality,
  * token counts, fingerprints).
  *
  * Every hash here is plain integer arithmetic over DENSE RANK ids
  * (not engine-native hash functions) so the identical computation is
  * expressible in ANSI SQL for the DuckDB oracle — and exact (no
  * float divergence) across engines. Dense ranking is two-level
  * (range-partition + rank + broadcast offsets, `denseIds`), never a
  * single-partition global Window, so id assignment scales even when
  * the key space (distinct shingles) grows with the corpus.
  */
object TextPipeline {

  private val P = 2147483647L // 2^31 − 1

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Raw tokens with 1-based position (stopwords INCLUDED) —
    * mirror of the oracle's `tok` CTE. */
  def rawTok(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        Analyzer.rawTokens(text).zipWithIndex.map { case (t, i) =>
          (id, t, i + 1)
        }
      }
      .toDF("doc_id", "term", "pos")
  }

  /** Non-stopword tokens (the index's emitted stream). */
  def emittedTok(docs: DataFrame): DataFrame = {
    val stops = Analyzer.EnglishStopWords.toSeq
    rawTok(docs).where(!col("term").isin(stops: _*))
  }

  // ---- deduplication -----------------------------------------------------

  /** Exact dedup keep-list: group by content hash (sha256 — hash the
    * bytes, not the string, so the shuffle key is 32 bytes not the
    * document), keep min doc_id per group. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n"))
      .select("doc_id", "n")

  /** Token 3-gram shingles, distinct per doc. Doc-local sliding window
    * in one narrow pass — no join, no shuffle; the per-doc dedup is a
    * local Set, so even the `distinct` costs nothing corpus-wide. */
  def shingles(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Analyzer.rawTokens(text).toArray
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        var i = 0
        while (i + 2 < toks.length) {
          seen += s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
          i += 1
        }
        seen.iterator.map(sh => (id, sh))
      }
      .toDF("doc_id", "sh")
  }

  /** Dense 1-based ids over the distinct values of `keyCol`, equal to
    * `row_number() OVER (ORDER BY key)` — but computed with two-level
    * ranking (range-partition distinct keys, sort + rank within
    * partitions, broadcast per-partition offsets; the assignDocIds
    * pattern, IndexBuilder.scala:372) instead of a single-partition
    * global Window, so the ranking itself scales with the vocabulary. */
  private def denseIds(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    graft.build.IndexBuilder
      .assignDocIds(df.select(keyCol).distinct(), Seq(keyCol), nPart)
      .withColumn(idCol, col("docId") + 1L)
      .select(keyCol, idCol)
  }

  /** Exact n-gram Jaccard near-dup pairs at threshold τ. Blocking by
    * shared shingle is EXACT (J > 0 ⇒ at least one shared shingle), so
    * this is a scalable shuffle-join on the shingle key with no false
    * negatives — no O(n²) cross join. */
  def ngramJaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sz.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("sza") + col("szb") - col("i")).cast("double"))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Dense shingle ids. Distinct 3-grams grow ~corpus-sized at 100 TB,
    * so this MUST NOT be a global Window — two-level ranking only. */
  private def shingleIds(sh: DataFrame): DataFrame =
    denseIds(sh, "sh", "sid")

  /** MinHash + banded LSH candidate pairs.
    * nHash=12 permutations h_i(x) = ((2i+1)·x + (7919i+1)) mod (2³¹−1),
    * 4 bands × 3 rows; band key folded with modular base 1000003
    * (all exact 64-bit integer arithmetic — oracle-identical). */
  def minhashCandidates(docs: DataFrame, nHash: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    // band-key fold is positional base-1000003 arithmetic: 1000003³
    // still fits a long, 1000003⁴ does not — and nHash must tile into
    // whole bands or the trailing band would carry null minhashes
    require(rowsPerBand >= 1 && rowsPerBand <= 3,
      s"rowsPerBand must be 1..3 (base-1000003 fold overflows beyond), got $rowsPerBand")
    require(nHash % rowsPerBand == 0,
      s"nHash ($nHash) must be a multiple of rowsPerBand ($rowsPerBand)")
    val sh = shingles(docs)
    val withIds = sh.join(shingleIds(sh), "sh").select("doc_id", "sid")
    val hashed = withIds
      .select(col("doc_id"), explode(sequence(lit(0), lit(nHash - 1))).as("i"), col("sid"))
      .withColumn("h", ((lit(2) * col("i") + 1) * col("sid")
        + (col("i") * 7919 + 1)) % P)
    val sig = hashed.groupBy("doc_id", "i").agg(min("h").as("mh"))
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .withColumn("r", col("i") % rowsPerBand)
    val bandKey = sig.groupBy("doc_id", "band").agg(
      (0 until rowsPerBand)
        .map(r => max(when(col("r") === r, col("mh"))) % 1000003L)
        .reduceLeft((acc, x) => acc * 1000003L + x).as("bkey"))
    bandKey.as("x").join(bandKey.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Dense term ids over the emitted vocabulary (two-level ranking —
    * no single-partition Window even at vocabulary size). */
  private def termIds(emitted: DataFrame): DataFrame =
    denseIds(emitted, "term", "tid")

  /** 31-bit SimHash per doc, tf-weighted:
    * h(tid) = (tid·2654435761 + 911) mod (2³¹−1); bit b set iff
    * Σ_terms tf·(2·bit_b(h)−1) > 0. */
  def simhash(docs: DataFrame): DataFrame = {
    val emitted = emittedTok(docs)
    val tf = emitted.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val withIds = tf.join(termIds(emitted), "term")
      .withColumn("h", (col("tid") * 2654435761L + 911L) % P)
    val bits = withIds
      .select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(30))).as("b"))
      .withColumn("s", col("tf") * (expr("shiftright(h, cast(b as int))")
        .bitwiseAND(1L) * 2 - 1))
    bits.groupBy("doc_id", "b").agg(sum("s").as("sb"))
      .groupBy("doc_id")
      .agg(sum(when(col("sb") > 0, expr("shiftleft(1L, cast(b as int))"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHam — banded
    * LSH join, NOT an all-pairs cross join: the 31 simhash bits are
    * split into maxHam+1 disjoint bit bands; by pigeonhole, two hashes
    * within maxHam differing bits agree EXACTLY on at least one band,
    * so an equi-join on (band, bandValue) finds every qualifying pair
    * (no false negatives), and candidates are Hamming-verified. The
    * shuffle key is the band value — pair volume is per-bucket, never
    * O(n²) corpus-wide. */
  def simhashPairs(docs: DataFrame, maxHam: Int): DataFrame = {
    val nBits = 31
    val nBands = maxHam + 1
    require(nBands <= nBits, s"maxHam $maxHam needs ${nBands} bands > $nBits bits")
    val base = nBits / nBands
    val rem = nBits % nBands
    val widths = Array.tabulate(nBands)(b => base + (if (b < rem) 1 else 0))
    val lows = widths.scanLeft(0)(_ + _)
    val bandVals = (0 until nBands).map { b =>
      shiftright(col("simhash"), lows(b)).bitwiseAND(lit((1L << widths(b)) - 1))
    }
    // localCheckpoint: both self-join sides read the one materialized
    // simhash result; unlike cache() it is not pinned in the session
    // CacheManager, so repeated calls don't accumulate storage
    val s = simhash(docs).localCheckpoint()
    val banded = s.select(col("doc_id"), col("simhash"),
      posexplode(array(bandVals: _*)).as(Seq("band", "bval")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sx"), col("y.simhash").as("sy"))
      .distinct() // a pair can collide in several bands
      .withColumn("ham", bit_count(col("sx").bitwiseXOR(col("sy"))))
      .where(col("ham") <= maxHam)
      .select(col("a"), col("b"), col("ham"))
  }

  /** Dedup GROUP assignment: connected components over the simhash
    * near-dup pair graph — every doc labelled with the MIN doc_id
    * reachable in its component (the canonical representative;
    * singletons label themselves). Iterative min-label propagation:
    * each round is one join + groupBy (shuffle on doc_id), rounds =
    * component diameter (near-dup components are tiny, so 2–4 rounds);
    * per-round localCheckpoint truncates the lineage so the plan stays
    * flat over iterations. This is the step that turns pair-emitting
    * dedup into an actionable keep/drop decision. */
  def dedupGroups(docs: DataFrame, maxHam: Int = 8): DataFrame = {
    val pairs = simhashPairs(docs, maxHam).select("a", "b")
    val edges = pairs
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var comp = docs.select(col("doc_id"),
      col("doc_id").as("comp")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      // (1) min label among each node's neighbors
      val nbrMin = edges
        .join(comp.select(col("doc_id").as("b"), col("comp").as("bc")), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min("bc").as("nbc"))
      // s1 is read twice by the jump self-join below; both sides
      // recompute this small join rather than paying a materialization
      // action per round (comp and edges are already checkpointed)
      val s1 = comp
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbc"), col("comp"))).as("c1"))
      // (2) pointer jumping: comp ← comp(comp); labels only shrink, so
      // long chains collapse in O(log diameter) rounds instead of
      // O(diameter); the fixpoint (component min) is unchanged
      val c2 = least(col("c1"), coalesce(col("cc"), col("c1")))
      val next = s1
        .join(s1.select(col("doc_id").as("cid"), col("c1").as("cc")),
          col("c1") === col("cid"), "left")
        .select(col("doc_id"), c2.as("comp"), (col("old") =!= c2).as("chg"))
        .localCheckpoint()
      changed = next.where(col("chg")).count()
      comp = next.select("doc_id", "comp")
      rounds += 1
    }
    comp
  }

  // ---- text analysis -----------------------------------------------------

  /** Marker-stopword language heuristic (synthetic corpus carries no
    * real language signal; the operator shape — per-lang marker
    * counts, argmax with deterministic tiebreak — is the real thing). */
  def langId(docs: DataFrame): DataFrame = {
    val t = rawTok(docs)
    val counts = t.groupBy("doc_id").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("term").isin("the", "a", "of", "and", "is"), 1L).otherwise(0L)).as("en_m"),
      sum(when(col("term").isin("el", "la", "de", "que", "es"), 1L).otherwise(0L)).as("es_m"),
      sum(when(col("term").isin("der", "die", "das", "und", "ist"), 1L).otherwise(0L)).as("de_m"))
    docs.select("doc_id").join(counts, Seq("doc_id"), "left")
      .withColumn("pred_lang",
        when(col("en_m") >= col("es_m") && col("en_m") >= col("de_m") && col("en_m") > 0, "en")
          .when(col("es_m") >= col("de_m") && col("es_m") > 0, "es")
          .when(col("de_m") > 0, "de")
          .otherwise("unk"))
      .select("doc_id", "pred_lang")
  }

  /** Quality scoring: token counts, stopword ratio, avg token length,
    * composite score. All integer-derived doubles → oracle-exact. */
  def quality(docs: DataFrame): DataFrame = {
    val t = rawTok(docs)
    val agg = t.groupBy("doc_id").agg(
      count(lit(1)).as("n_tok"),
      sum(when(col("term").isin(Analyzer.EnglishStopWords.toSeq: _*), 1L)
        .otherwise(0L)).as("n_stop"),
      sum(length(col("term"))).as("sum_len"))
    agg
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tok").cast("double"))
      .withColumn("avg_len", col("sum_len").cast("double") / col("n_tok").cast("double"))
      .withColumn("qscore",
        // non-dyadic weights keep round(…,4) off exact .5e-4 decimal
        // boundaries where Spark (BigDecimal HALF_UP on the decimal
        // expansion) and DuckDB (float-multiply rounding) disagree
        least(col("n_tok").cast("double") / 97.0, lit(1.0)) * 0.47
          + (lit(1.0) - col("stop_ratio")) * 0.31
          + least(col("avg_len") / 7.3, lit(1.0)) * 0.22)
      .select(col("doc_id"), col("n_tok"), col("n_stop"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("avg_len"), 4).as("avg_len"),
        round(col("qscore"), 4).as("qscore"))
  }

  /** Token counting: whitespace chunks, regex tokens, distinct terms. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = rawTok(docs)
    val agg = t.groupBy("doc_id").agg(
      count(lit(1)).as("n_tok"), countDistinct("term").as("n_uniq"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_ws"))
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tok", "n_uniq"))
      .select("doc_id", "n_ws", "n_tok", "n_uniq")
  }

  /** Position-sensitive document fingerprint (rolling-hash style):
    * fp = Σ_pos tid·((pos·2654435761) mod 2²⁰) mod (2³¹−1). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val emitted = emittedTok(docs)
    emitted.join(termIds(emitted), "term")
      .withColumn("w", (col("pos").cast("long") * 2654435761L) % 1048576L)
      .groupBy("doc_id")
      .agg((sum(col("tid") * col("w")) % P).as("fp"))
  }

  // ---- similarity search over embeddings ----------------------------------

  /** Brute-force cosine top-k vs a query vector (the exactness
    * baseline; scale path = lshBuckets / ivfTopK below). Dot products
    * via zip_with + fixed-order fold (codegen'd, deterministic). */
  def cosineTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryVecId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    cosineTopKVec(emb, q, k, excludeId = Some(queryVecId))
  }

  /** Cosine top-k against an explicit query vector. */
  def cosineTopKVec(
      emb: DataFrame,
      q: Array[Double],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val qCol = typedlit(q.toSeq)
    val dot = aggregate(
      zip_with(col("embedding"), qCol, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(
      transform(col("embedding"), a => a.cast("double") * a.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    excludeId.map(id => emb.where(col("vec_id") =!= id)).getOrElse(emb)
      .withColumn("cos", dot / (sqrt(na) * lit(qNorm)))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 3).as("sim"))
  }

  /** Random-hyperplane LSH bucket histogram. Embeddings quantized to
    * round(x·1000) BIGINT first so the per-plane sign is EXACT integer
    * arithmetic (no float-sum sign flips across engines); 8 planes,
    * weights w(b,i) = ((7919b + 104729i) mod 97) − 48. */
  def lshBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame =
    vectorBuckets(emb, nPlanes).groupBy("bucket").agg(count(lit(1)).as("n"))

  /** (vec_id, bucket) hyperplane-LSH assignment — shared by the bucket
    * histogram and the near-dup pair blocking. */
  def vectorBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame = {
    val q = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("qv", round(col("v").cast("double") * 1000.0).cast("long"))
    val planes = q.select(col("vec_id"), col("i"), col("qv"),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("b"))
      .withColumn("w", (col("b") * 7919L + col("i") * 104729L) % 97L - 48L)
    val bits = planes.groupBy("vec_id", "b").agg(sum(col("qv") * col("w")).as("s"))
    bits.groupBy("vec_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, cast(b as int))"))
        .otherwise(0L)).as("bucket"))
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH bucket blocking
    * (same integer-exact bucket ⇒ candidate) + exact cosine verify
    * ≥ tau. Same-bucket semantics IS the operator — the shuffle key is
    * the bucket value, so pair volume is per-bucket, never O(n²); at
    * scale recall is tuned by nPlanes (fewer planes → bigger buckets →
    * higher recall, more verify work). */
  def embedCosinePairs(emb: DataFrame, tau: Double, nPlanes: Int = 8): DataFrame = {
    val withB = emb.join(vectorBuckets(emb, nPlanes), "vec_id")
      .select("vec_id", "bucket", "embedding")
    val pairs = withB.as("x").join(withB.as("y"),
      col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
    val dot = aggregate(
      zip_with(col("x.embedding"), col("y.embedding"),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def norm(c: org.apache.spark.sql.Column) = sqrt(aggregate(
      transform(c, a => a.cast("double") * a.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    // threshold on the ROUNDED cosine: the raw double differs between
    // engines by summation order at ~1e-16, and a membership decision
    // on the unrounded value could flip a boundary pair; rounding first
    // aligns the filter with the emitted `sim` value (the repo's
    // round-at-the-output-edge parity rule)
    pairs
      .withColumn("sim", round(
        dot / (norm(col("x.embedding")) * norm(col("y.embedding"))), 3))
      .where(col("sim") >= tau)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), col("sim"))
  }

  /** IVF-style ANN over a PRE-SUPPLIED coarse partition (the `label`
    * column): search only the query's partition. This is the
    * oracle-checked surface (SQL-expressible); `ivfKmeansTopK` below is
    * the same search shape with a real, engine-built quantizer. */
  def ivfTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val qLabel = emb.where(col("vec_id") === queryVecId)
      .select("label").head().getInt(0)
    cosineTopKWithin(emb.where(col("label") === qLabel), queryVecId, k)
  }

  private def cosineTopKWithin(emb: DataFrame, queryVecId: Long, k: Int): DataFrame =
    cosineTopK(emb, queryVecId, k)

  // ---- IVF with a real coarse quantizer (seeded k-means) -------------------

  /** Deterministic seeded Lloyd k-means over the embedding column.
    * Seeds = the k lowest vec_ids; each iteration broadcasts the k×d
    * centroid matrix in the assignment closure and recomputes centroids
    * from a (k·d)-row aggregate — per iteration: one narrow pass over
    * the vectors plus a k·d-row shuffle; nothing corpus-sized reaches
    * the driver. Empty clusters keep their previous centroid. */
  def kmeansCentroids(emb: DataFrame, k: Int, nIter: Int): Array[Array[Double]] = {
    require(k >= 1 && nIter >= 0)
    var cents: Array[Array[Double]] = emb.orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var it = 0
    while (it < nIter) {
      val assignU = nearestUdf(cents)
      val sums = emb
        .select(assignU(col("embedding")).as("c"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy("c", "i")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty cluster → keep centroid
      sums.foreach { r =>
        val c = r.getInt(0); val i = r.getInt(1)
        next(c)(i) = r.getDouble(2) / r.getLong(3).toDouble
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Argmin-squared-distance assignment against a broadcast-in-closure
    * centroid matrix. */
  private def nearestUdf(cents: Array[Array[Double]]) =
    udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val ctr = cents(c)
        var d = 0.0; var i = 0
        while (i < ctr.length) {
          val x = v(i).toDouble - ctr(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** IVF ANN with an engine-built quantizer: cluster with seeded
    * k-means, then exact-search only the nProbe clusters whose
    * centroids are nearest the query vector. nProbe = nClusters
    * degrades gracefully to exact brute force (recall 1.0); at scale
    * the assignment column is precomputed once and the probed scan is
    * a partition-pruned read, so per-query cost is ~nProbe/nClusters
    * of the corpus. */
  def ivfKmeansTopK(
      emb: DataFrame,
      queryVecId: Long,
      k: Int,
      nClusters: Int = 8,
      nIter: Int = 3,
      nProbe: Int = 1): DataFrame = {
    val cents = kmeansCentroids(emb, nClusters, nIter)
    val q = emb.where(col("vec_id") === queryVecId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val probe = clustersByDistance(cents, q)
      .take(math.min(nProbe, cents.length)).toSeq
    val assignU = nearestUdf(cents)
    cosineTopK(emb.where(assignU(col("embedding")).isin(probe: _*)),
      queryVecId, k)
  }

  /** Rank cluster ids by squared distance of their centroid to q. */
  private def clustersByDistance(cents: Array[Array[Double]], q: Array[Double]): Array[Int] =
    cents.zipWithIndex.map { case (ctr, c) =>
      var d = 0.0; var i = 0
      while (i < ctr.length) { val x = q(i) - ctr(i); d += x * x; i += 1 }
      (d, c)
    }.sortBy(t => (t._1, t._2)).map(_._2)

  /** Persist an IVF layout: vectors written PARTITIONED BY cluster id
    * (each coarse cell is its own parquet directory) plus a k-row
    * centroid table. At query time only the probed clusters' files are
    * read — directory-level partition pruning, the on-disk form of the
    * IVF inverted lists. */
  def ivfWrite(emb: DataFrame, root: String, nClusters: Int = 8, nIter: Int = 3): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(emb, nClusters, nIter)
    val assignU = nearestUdf(cents)
    emb.withColumn("cluster", assignU(col("embedding")))
      .write.mode("overwrite").partitionBy("cluster")
      .option("compression", "snappy").parquet(s"$root/vectors")
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
  }

  /** Query a persisted IVF layout: rank centroids by distance to the
    * query vector (k-row driver read), then cosine top-k over ONLY the
    * nProbe nearest clusters — the scan must show a cluster partition
    * filter (asserted in AnnSpec). */
  def ivfQuery(
      spark: SparkSession,
      root: String,
      q: Array[Double],
      k: Int,
      nProbe: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val cents = spark.read.parquet(s"$root/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val probe = clustersByDistance(cents, q).take(math.min(nProbe, cents.length)).toSeq
    val vecs = spark.read.parquet(s"$root/vectors")
      .where(col("cluster").isin(probe: _*))
    cosineTopKVec(vecs, q, k, excludeId)
  }
}
