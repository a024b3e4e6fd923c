package graft.model

/** Core data model for the graft inverted-index engine.
  *
  * Shapes derive from the reference's intended data model (see
  * /root/repo/SURVEY.md §1): documents with a string natural key and a
  * dense long docID, a per-field term dictionary, posting lists with
  * per-(term,doc) positions, and corpus-level statistics feeding the
  * scorer (reference: hbasene HBaseIndexStore.java:136-152,
  * HBaseIndexReader.java:135-155).
  */

/** One source-code file row — the driver-mandated input table shape
  * (BASELINE.json `input_hint`). */
final case class CodeDoc(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** A single token occurrence produced by the analyzer.
  * `pos` is the 1-based token ordinal counting stopword gaps
  * (reference position arithmetic: HBaseIndexWriter.java:124-139). */
final case class TermOcc(field: String, term: String, pos: Int)

/** One posting: a document containing a term, with positions.
  * tf == positions.length (AlphaTermPositionsEncoder.java:51-54). */
final case class Posting(docId: Long, tf: Int, positions: Array[Int])

/** An encoded posting block: metadata + delta/varint payload.
  * The metadata fields drive block skipping / block-max WAND
  * (SURVEY.md §2 D2); on disk, a shard row's blocks are packed into
  * one self-describing blob (PostingsCodec.encodeBlob). */
final case class PostingBlock(
    minDoc: Long,
    maxDoc: Long,
    n: Int,
    maxTf: Int,
    data: Array[Byte])

/** Corpus statistics broadcast to the scorer (reference keeps these as
  * HBase counter rows, HBaseIndexReader.java:231-266). */
final case class CorpusStats(numDocs: Long, avgDocLen: Double)

/** A scored search hit. */
final case class ScoredDoc(docId: Long, score: Double)

/** Per-document length row (dl = token count incl. stopword gaps is NOT
  * used; dl counts emitted tokens, i.e. sum of tf over terms). */
final case class DocLen(docId: Long, dl: Long)
