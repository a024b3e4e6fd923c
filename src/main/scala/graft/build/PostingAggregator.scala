package graft.build

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.codec.PostingsCodec
import graft.model.Posting

/** One (term, doc) occurrence row fed into the posting aggregator:
  * the output of doc-local analysis (SURVEY.md §2 B1+B2 done in one
  * pass, no shuffle before the groupBy). */
final case class TermDocOcc(
    docId: Long,
    tf: Int,
    positions: Seq[Int])

/** Encoded posting-list payload for one (field, term, shard) group. */
final case class PostingsPayload(
    df: Long,
    cf: Long,
    maxTf: Int,
    blob: Array[Byte])

/** Custom typed Aggregator building compressed posting blocks —
  * the Spark-native replacement for the reference's in-memory posting
  * accumulation + segment flush (hbasene HBaseIndexStore.java:162-267,
  * adaptive list/bitset upgrade :187-200). Used as
  * `functions.udaf(...)` inside `groupBy(field, term, shard)`.
  *
  * Memory safety at scale comes from the doc-range `shard` key, not
  * from the aggregator: a skewed term ("public", "import") is split
  * across ceil(N/shardSize) disjoint docId-range groups, so no single
  * buffer ever exceeds shardSize postings (SURVEY.md §7.4 #3 — salt by
  * docId range, not hash, so partials are range-disjoint and
  * query-side merge is pure concatenation).
  */
class PostingAggregator
    extends Aggregator[TermDocOcc, ArrayBuffer[TermDocOcc], PostingsPayload] {

  override def zero: ArrayBuffer[TermDocOcc] = ArrayBuffer.empty

  override def reduce(
      buf: ArrayBuffer[TermDocOcc], occ: TermDocOcc): ArrayBuffer[TermDocOcc] = {
    buf += occ
    buf
  }

  override def merge(
      a: ArrayBuffer[TermDocOcc], b: ArrayBuffer[TermDocOcc]): ArrayBuffer[TermDocOcc] = {
    if (a.length >= b.length) { a ++= b; a } else { b ++= a; b }
  }

  override def finish(buf: ArrayBuffer[TermDocOcc]): PostingsPayload = {
    val sorted = buf.sortInPlace()(Ordering.by((o: TermDocOcc) => o.docId))
    val postings: IndexedSeq[Posting] =
      sorted.map(o => Posting(o.docId, o.tf, o.positions.toArray)).toIndexedSeq
    val blob = PostingsCodec.encodePostingsBlob(postings)
    var cf = 0L
    var maxTf = 0
    postings.foreach { p => cf += p.tf; if (p.tf > maxTf) maxTf = p.tf }
    PostingsPayload(postings.length.toLong, cf, maxTf, blob)
  }

  override def bufferEncoder: Encoder[ArrayBuffer[TermDocOcc]] =
    Encoders.kryo[ArrayBuffer[TermDocOcc]]

  override def outputEncoder: Encoder[PostingsPayload] =
    Encoders.product[PostingsPayload]
}
