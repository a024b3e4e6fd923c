package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextPipeline

/** Deterministic sampling + token-budget packing: exact-rate law,
  * stability, stratum gating, and the partition-layout-independence
  * of the two-level prefix sum. */
class PackSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map { i =>
    (i.toLong, s"tok${i % 7} " * (1 + i % 5), if (i % 3 == 0) "en" else "de")
  }.toDF("doc_id", "text", "lang")

  test("sampleDeterministic: exact rate on contiguous ids, id-stable") {
    val d = docs(2000)
    val kept = TextPipeline.sampleDeterministic(d, "doc_id", 250, 1000, salt = 17)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 761 is coprime to 1000 → the residue map is a bijection per
    // 1000-block: EXACTLY 250 kept in each
    assert(kept.count(_ < 1000L) === 250)
    assert(kept.count(_ >= 1000L) === 250)
    // a doc's fate depends only on its id: the same ids survive from a
    // different (shuffled, partially overlapping) frame
    val other = docs(2000).where($"doc_id" >= 500L).repartition(7)
    val kept2 = TextPipeline.sampleDeterministic(other, "doc_id", 250, 1000, salt = 17)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === kept.filter(_ >= 500L))
    // num = 0 keeps nothing; num = den keeps everything
    assert(TextPipeline.sampleDeterministic(d, "doc_id", 0, 1000).count() === 0L)
    assert(TextPipeline.sampleDeterministic(d, "doc_id", 1000, 1000).count() === 2000L)
  }

  test("sampleStratified: per-stratum numerators, absent strata drop") {
    val d = docs(3000)
    val kept = TextPipeline.sampleStratified(d, "doc_id", "lang",
      Map("en" -> 1000L, "de" -> 0L), den = 1000)
      .select("doc_id", "lang").collect()
    // en keeps at full rate, de (and anything unmapped) keeps nothing
    assert(kept.forall(_.getString(1) == "en"))
    assert(kept.length === 1000) // every doc_id % 3 == 0
    val half = TextPipeline.sampleStratified(d, "doc_id", "lang",
      Map("en" -> 500L), den = 1000).count()
    // residue bijection applies WITHIN the stratum's id set only
    // approximately — but the bound is hard: ≤ ceil of the full-rate
    assert(half > 0 && half < 1000)
  }

  test("packSequences: contiguous fill, partition-layout independent") {
    val d = docs(500)
    val got = TextPipeline.packSequences(d, budget = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.length === 500)
    // reference: sequential cumulative fill
    var cum = 0L
    val expect = got.map { case (id, n, _) =>
      val bin = cum / 37; cum += n; (id, n, bin)
    }
    assert(got.toSeq === expect.toSeq)
    // n_tokens is the analyzer's emitted count (docs here have no
    // stopwords, so tokens = whitespace words)
    assert(got.take(5).map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // the same input through 1 and 7 range partitions packs identically
    val one = TextPipeline.packSequences(d, budget = 37, parts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val seven = TextPipeline.packSequences(d.repartition(13), budget = 37, parts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(one.toSeq === seven.toSeq)
    assert(one.map(x => (x._1, x._2)).toSeq === got.map(x => (x._1, x._3)).toSeq)
    // bins fill to ≈ budget: every bin except the last reaches ≥ budget
    // when its straddling doc lands (bin boundaries are cumsum/budget)
    val maxBin = got.map(_._3).max
    assert(maxBin === (cum - got.last._2) / 37)
    // REGRESSION: a narrow coalesce downstream (Verify's coalesce(1)
    // before write) must not collapse the prefix sum — TaskContext
    // partition ids lie inside a coalesced task; the split index the
    // implementation uses does not
    val coalesced = TextPipeline.packSequences(d, budget = 37).coalesce(1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(coalesced.toSeq === got.map(x => (x._1, x._3)).toSeq)
  }
}
