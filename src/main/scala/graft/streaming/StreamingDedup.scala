package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming training-data operators on Structured Streaming:
  *
  *   - `firstSeen` — exact dedup over an unbounded stream: keep the
  *     FIRST document per content hash, drop every later duplicate.
  *     Custom state via flatMapGroupsWithState (state = one boolean
  *     marker per sha256 group, so state size is one entry per
  *     DISTINCT document — the streaming analogue of dedupExact's
  *     min(doc_id) keep-list).
  *   - `tokenRate` — watermarked event-time windowed aggregation of
  *     emitted-token counts (the corpus-throughput signal a pipeline
  *     dashboard reads); late rows beyond the watermark are dropped
  *     and state for closed windows is purged.
  *
  * Both operators are plan fragments (readStream → transform →
  * caller's writeStream), so they compose with any sink.
  */
object StreamingDedup {

  /** One kept row per first-seen content hash. Output columns:
    * (doc_id, text, sha). Append-mode compatible.
    *
    * @param stateTtl optional processing-time TTL (e.g. "1 hour"): a
    *   hash unseen for that long has its marker PURGED, bounding state
    *   at one entry per distinct hash within the TTL window — the
    *   exactness/state trade for genuinely unbounded streams (a dup
    *   arriving after the TTL is re-emitted). None (default) keeps
    *   exact forever-dedup with state growing by distinct-hash count. */
  def firstSeen(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyed = stream
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .withColumn("sha", sha2(col("text"), 256))
      .as[(Long, String, String)]
      .groupByKey(_._3)
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    keyed
      .flatMapGroupsWithState[Boolean, (Long, String, String)](
        OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(Long, String, String)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // TTL expired: purge the marker
            state.remove()
            Iterator.empty
          } else if (state.exists) { // hash already emitted once
            stateTtl.foreach(state.setTimeoutDuration) // dup seen: extend
            Iterator.empty
          } else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            // first row of the group in this batch wins (batch-local
            // order); emit exactly one
            var best: (Long, String, String) = null
            rows.foreach { r => if (best == null || r._1 < best._1) best = r }
            Iterator.single(best)
          }
      }
      .toDF("doc_id", "text", "sha")
  }

  /** Event-time windowed emitted-token counts with a watermark:
    * (window_start, window_end, n_docs, n_tokens). */
  def tokenRate(
      stream: DataFrame,
      tsCol: String,
      textCol: String,
      windowLen: String,
      watermark: String): DataFrame = {
    val spark = stream.sparkSession
    graft.sql.GraftFunctions.register(spark)
    stream
      .withColumn("_toks", expr(s"graft_doclen($textCol)").cast("long"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_docs"), sum(col("_toks")).as("n_tokens"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_docs"), col("n_tokens"))
  }
}
