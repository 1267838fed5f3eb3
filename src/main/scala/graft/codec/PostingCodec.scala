package graft.codec

import java.io.ByteArrayOutputStream

/** One encoded posting block: ≤128 docs of a single (field, term) posting
  * list, docID-ordered. Mirrors the reference's block shape — 128-doc
  * delta blocks with skip metadata (`first/last_doc_id`) and block-max
  * impact bounds (`max_tf`, `min_norm_len`) [8x
  * codecs/lucene84/Lucene84PostingsWriter.java, MultiLevelSkipListWriter,
  * CompetitiveImpactAccumulator] — as a columnar row (SURVEY.md §2.2).
  * Norm bytes ride inside the block so the BMW kernel scores without a
  * per-doc join.
  */
final case class EncodedBlock(
    blockId: Int,
    firstDocId: Long,
    lastDocId: Long,
    docCount: Int,
    maxTf: Int,
    minNormLen: Int, // decoded minimal doc length in the block (impact bound)
    sumTf: Long,
    docs: Array[Byte],      // delta + vbyte docIDs
    freqs: Array[Byte],     // vbyte tfs
    norms: Array[Byte],     // raw norm byte per doc
    positions: Array[Byte]) // per doc: tf delta-vbyte positions (concat)

final case class DecodedBlock(
    docIds: Array[Long],
    freqs: Array[Int],
    norms: Array[Byte])

object PostingCodec {
  val BlockSize = 128

  /** Encode one term's docID-sorted postings into 128-doc blocks.
    * Input tuples: (docId, tf, normByte, positions). Positions may be
    * empty when position indexing is disabled.
    */
  def encodeBlocks(postings: Array[(Long, Int, Byte, Array[Int])],
                   blockSize: Int = BlockSize): Array[EncodedBlock] = {
    postings.grouped(blockSize).zipWithIndex.map { case (chunk, blockId) =>
      val docIds = chunk.map(_._1)
      val tfs    = chunk.map(_._2)
      val norms  = chunk.map(_._3)
      val posOut = new ByteArrayOutputStream(64)
      chunk.foreach { case (_, _, _, ps) =>
        var prev = 0
        var first = true
        ps.foreach { p =>
          VByte.writeVLong(posOut, if (first) p.toLong else (p - prev).toLong)
          prev = p; first = false
        }
      }
      val minNormLen = norms.iterator.map(b => SmallFloat.byte4ToInt(b)).min
      EncodedBlock(
        blockId     = blockId,
        firstDocId  = docIds.head,
        lastDocId   = docIds.last,
        docCount    = chunk.length,
        maxTf       = tfs.max,
        minNormLen  = minNormLen,
        sumTf       = tfs.map(_.toLong).sum,
        docs        = VByte.encodeDeltas(docIds),
        freqs       = VByte.encode(tfs.map(_.toLong)),
        norms       = norms,
        positions   = posOut.toByteArray)
    }.toArray
  }

  def decode(docs: Array[Byte], freqs: Array[Byte], norms: Array[Byte]): DecodedBlock = {
    val ids = VByte.decodeDeltas(docs)
    val tfs = VByte.decodeAll(freqs).map(_.toInt)
    DecodedBlock(ids, tfs, norms)
  }

  /** Decode positions payload given the per-doc freqs; returns positions
    * per doc, same order as the block's docIDs.
    */
  def decodePositions(positions: Array[Byte], freqs: Array[Int]): Array[Array[Int]] = {
    var offset = 0
    freqs.map { tf =>
      val (deltas, next) = VByte.decodeN(positions, offset, tf)
      offset = next
      var acc = 0L
      deltas.map { d => acc += d; acc.toInt }
    }
  }
}
