package graft.codec

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

import graft.model.{Posting, PostingBlock}

/** Delta + unsigned-LEB128 varint codec for positions and posting
  * blocks.
  *
  * Replaces the reference's fixed-4-byte positions codec
  * (hbasene AlphaTermPositionsEncoder.java:42-49) and its adaptive
  * int-list/bitset posting representation
  * (HBaseIndexStore.java:179-202) with a single compressed layout:
  * sorted docIDs delta-encoded, tf varint, positions delta-encoded —
  * plus per-block (minDoc, maxDoc, n, maxTf) metadata enabling block
  * skipping and block-max WAND (SURVEY.md §2 B5/D2). Storage-level
  * compression (reference: GZ per column family,
  * HBaseIndexStore.java:376-387) is delegated to Parquet page
  * compression on top of this.
  *
  * Block payload layout (after the struct-level metadata columns):
  *   for each posting i in docId order:
  *     varint(docId_i − prevDocId)   // prev = minDoc-anchored: first
  *                                   // delta is docId_0 − minDoc == 0
  *     varint(tf_i)
  *     tf_i × varint(pos_j − prevPos) // prevPos starts at 0; positions
  *                                    // strictly increasing, 1-based
  */
object PostingsCodec {

  /** Max postings per block; 128 keeps blocks cache-friendly and gives
    * fine-grained skip granularity (Lucene uses the same block size). */
  val BlockSize: Int = 128

  // ---- varint primitives -------------------------------------------------

  def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint requires non-negative, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class Reader(val buf: Array[Byte]) {
    var pos: Int = 0
    def hasNext: Boolean = pos < buf.length
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xFF
        pos += 1
        result |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def readVarInt(): Int = readVarLong().toInt
  }

  // ---- positions codec (reference E1 / B5) -------------------------------

  /** Encode a sorted positions array (delta varint, count-prefixed).
    * Round-trip contract = AbstractTermPositionsEncoderTest.java:48-57. */
  def encodePositions(positions: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(positions.length + 4)
    writeVarLong(out, positions.length.toLong)
    var prev = 0
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      writeVarLong(out, (p - prev).toLong)
      prev = p
      i += 1
    }
    out.toByteArray
  }

  def decodePositions(bytes: Array[Byte]): Array[Int] = {
    val r = new Reader(bytes)
    val n = r.readVarInt()
    val arr = new Array[Int](n)
    var prev = 0
    var i = 0
    while (i < n) {
      prev += r.readVarInt()
      arr(i) = prev
      i += 1
    }
    arr
  }

  /** tf without full decode (AlphaTermPositionsEncoder.java:51-54). */
  def termFrequency(bytes: Array[Byte]): Int =
    new Reader(bytes).readVarInt()

  // ---- posting blocks ----------------------------------------------------

  /** Encode postings (MUST be sorted by docId, distinct) into blocks of
    * ≤ BlockSize with per-block metadata. */
  def encodeBlocks(sorted: IndexedSeq[Posting]): Array[PostingBlock] = {
    val blocks = ArrayBuffer.empty[PostingBlock]
    var start = 0
    while (start < sorted.length) {
      val end = math.min(start + BlockSize, sorted.length)
      val minDoc = sorted(start).docId
      val maxDoc = sorted(end - 1).docId
      var maxTf = 0
      val out = new ByteArrayOutputStream(256)
      var prevDoc = minDoc
      var i = start
      while (i < end) {
        val p = sorted(i)
        writeVarLong(out, p.docId - prevDoc)
        prevDoc = p.docId
        writeVarLong(out, p.tf.toLong)
        var prevPos = 0
        var j = 0
        while (j < p.positions.length) {
          writeVarLong(out, (p.positions(j) - prevPos).toLong)
          prevPos = p.positions(j)
          j += 1
        }
        if (p.tf > maxTf) maxTf = p.tf
        i += 1
      }
      blocks += PostingBlock(minDoc, maxDoc, end - start, maxTf, out.toByteArray)
      start = end
    }
    blocks.toArray
  }

  def decodeBlock(b: PostingBlock): Array[Posting] = {
    val r = new Reader(b.data)
    val arr = new Array[Posting](b.n)
    var doc = b.minDoc
    var i = 0
    while (i < b.n) {
      doc += r.readVarLong()
      val tf = r.readVarInt()
      val positions = new Array[Int](tf)
      var prevPos = 0
      var j = 0
      while (j < tf) {
        prevPos += r.readVarInt()
        positions(j) = prevPos
        j += 1
      }
      arr(i) = Posting(doc, tf, positions)
      i += 1
    }
    arr
  }

  /** Decode only (docId, tf) pairs — the scoring hot path skips
    * positions without materializing them. */
  def decodeDocTf(b: PostingBlock): Array[(Long, Int)] = {
    val r = new Reader(b.data)
    val arr = new Array[(Long, Int)](b.n)
    var doc = b.minDoc
    var i = 0
    while (i < b.n) {
      doc += r.readVarLong()
      val tf = r.readVarInt()
      var j = 0
      while (j < tf) { r.readVarLong(); j += 1 } // skip positions
      arr(i) = (doc, tf)
      i += 1
    }
    arr
  }
}
