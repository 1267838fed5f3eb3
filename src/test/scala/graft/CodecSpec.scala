package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{PostingCodec, SmallFloat, VByte}

/** Property-style tests with seeded randomness (deterministic runs;
  * mirrors the reference's BasePostingsFormatTestCase roundtrip checks).
  */
class CodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("SmallFloat: values < 24 are exact (NUM_FREE_VALUES)") {
    (0 until 24).foreach(i => assert(SmallFloat.lossyLength(i) == i))
  }

  test("SmallFloat: known values (hand-derived from the byte4 bit layout)") {
    assert(SmallFloat.intToByte4(24) == 24.toByte)
    assert(SmallFloat.lossyLength(24) == 24)
    assert(SmallFloat.lossyLength(100) == 96) // 76 -> mantissa 1001<<3=72 -> +24
    assert(SmallFloat.LengthTable(0) == 0)
    assert(SmallFloat.LengthTable.length == 256)
  }

  test("SmallFloat: decode∘encode is idempotent round-down; monotone") {
    (0 until 200).foreach { _ =>
      val i = rnd.nextInt(2000000)
      val d = SmallFloat.lossyLength(i)
      assert(d <= i)
      assert(SmallFloat.lossyLength(d) == d)
    }
    var prev = -1
    (0 until 100000).foreach { i =>
      val d = SmallFloat.lossyLength(i)
      assert(d >= prev); prev = d
    }
  }

  test("SmallFloat: all 256 byte values decode to distinct increasing lengths") {
    val t = SmallFloat.LengthTable
    (1 until 256).foreach(i => assert(t(i) > t(i - 1)))
  }

  test("VByte roundtrip on random non-negative longs") {
    (0 until 100).foreach { _ =>
      val xs = List.fill(rnd.nextInt(200))(rnd.nextLong().abs)
      assert(VByte.decodeAll(VByte.encode(xs)).toList == xs)
    }
  }

  test("delta roundtrip on strictly increasing docID lists") {
    (0 until 100).foreach { _ =>
      val gaps = List.fill(rnd.nextInt(300) + 1)(rnd.nextInt(1000000).toLong + 1)
      val ids = gaps.scanLeft(0L)(_ + _).tail.toArray
      assert(VByte.decodeDeltas(VByte.encodeDeltas(ids)).toList == ids.toList)
    }
  }

  test("posting block encode/decode roundtrip incl. positions and impacts") {
    val postings = Array.tabulate(300) { i =>
      val doc = i.toLong * 3 + 1
      val tf = (i % 7) + 1
      val nb = SmallFloat.intToByte4(10 + i % 90)
      val pos = Array.tabulate(tf)(j => j * 2 + (i % 3))
      (doc, tf, nb, pos)
    }
    val blocks = PostingCodec.encodeBlocks(postings)
    assert(blocks.length == 3) // 300 docs / 128
    assert(blocks(0).docCount == 128 && blocks(2).docCount == 44)
    val decodedAll = blocks.flatMap { b =>
      val d = PostingCodec.decode(b.docs, b.freqs, b.norms)
      val ps = PostingCodec.decodePositions(b.positions, d.freqs)
      assert(b.firstDocId == d.docIds.head && b.lastDocId == d.docIds.last)
      assert(b.maxTf == d.freqs.max)
      assert(b.minNormLen == d.norms.map(SmallFloat.byte4ToInt).min)
      assert(b.sumTf == d.freqs.map(_.toLong).sum)
      d.docIds.indices.map(i => (d.docIds(i), d.freqs(i), d.norms(i), ps(i)))
    }
    postings.zip(decodedAll).foreach { case ((d, tf, nb, pos), (d2, tf2, nb2, pos2)) =>
      assert(d == d2 && tf == tf2 && nb == nb2 && pos.toList == pos2.toList)
    }
  }
}
