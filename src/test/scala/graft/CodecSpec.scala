package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.codec.PostingsCodec
import graft.model.Posting

/** Positions / posting-block codec — FIXTURES.md F4 round-trip plus
  * property tests (reference contract:
  * AbstractTermPositionsEncoderTest.java:48-57,
  * AlphaTermPositionsEncoder.java:51-54).
  * (No scalatestplus bridge offline — generators sampled manually,
  * fixed seed for determinism.) */
class CodecSpec extends AnyFunSuite {

  /** Deterministic mini-forAll over a ScalaCheck Gen. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  test("F4: round-trip [1,3,4,9,10]") {
    val p = Array(1, 3, 4, 9, 10)
    assert(PostingsCodec.decodePositions(PostingsCodec.encodePositions(p)).toSeq === p.toSeq)
    assert(PostingsCodec.termFrequency(PostingsCodec.encodePositions(p)) === 5)
  }

  test("round-trip empty") {
    assert(PostingsCodec.decodePositions(PostingsCodec.encodePositions(Array.empty)).isEmpty)
  }

  private val sortedPositions: Gen[Array[Int]] =
    Gen.listOf(Gen.chooseNum(0, 1 << 28)).map(_.distinct.sorted.toArray)

  test("property: positions round-trip identity + tf") {
    forAll(sortedPositions) { p =>
      val enc = PostingsCodec.encodePositions(p)
      assert(PostingsCodec.decodePositions(enc).toSeq == p.toSeq)
      assert(PostingsCodec.termFrequency(enc) == p.length)
    }
  }

  private val postingsGen: Gen[IndexedSeq[Posting]] = for {
    docIds <- Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.distinct.sorted)
    tfs <- Gen.listOfN(docIds.length, Gen.chooseNum(1, 200))
  } yield docIds.zip(tfs).map { case (d, tf) =>
    Posting(d, tf, (1 to tf).map(_ * 3).toArray)
  }.toIndexedSeq

  test("property: block encode/decode identity, metadata correct") {
    forAll(postingsGen) { ps =>
      val blocks = PostingsCodec.encodeBlocks(ps)
      val decoded = blocks.flatMap(PostingsCodec.decodeBlock)
      assert(decoded.length == ps.length)
      decoded.zip(ps).foreach { case (a, b) =>
        assert(a.docId == b.docId && a.tf == b.tf)
        assert(a.positions.toSeq == b.positions.toSeq)
      }
      blocks.foreach { b =>
        assert(b.n <= PostingsCodec.BlockSize && b.minDoc <= b.maxDoc)
      }
      val docTf = blocks.flatMap(PostingsCodec.decodeDocTf)
      assert(docTf.toSeq == ps.map(p => (p.docId, p.tf)).toSeq)
      if (ps.nonEmpty) {
        assert(blocks.map(_.n).sum == ps.length)
        assert(blocks.map(_.maxTf).max == ps.map(_.tf).max)
      }
    }
  }
}
