package graft.codec

import java.io.ByteArrayOutputStream

/**
 * Variable-byte + delta codecs for posting payloads.
 *
 * Semantics per the north star ("delta + variable-byte compressed posting
 * blocks", /root/repo/BASELINE.json:6). The reference uses FOR/PFOR bit
 * packing (`lucene/core/.../codecs/lucene84/ForUtil.java` [8x]); the
 * pinned spec here is the simpler classic VByte: 7 data bits per byte,
 * high bit = continuation.
 */
object VByte {

  def writeVLong(out: ByteArrayOutputStream, value: Long): Unit = {
    require(value >= 0, s"vbyte encodes non-negative values, got $value")
    var v = value
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a sequence of non-negative longs. */
  def encode(values: Iterable[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.size * 2 max 16)
    values.foreach(writeVLong(out, _))
    out.toByteArray
  }

  /** Decode `n` vlongs from `bytes` starting at `offset`; returns values
    * and the next offset.
    */
  def decodeN(bytes: Array[Byte], offset: Int, n: Int): (Array[Long], Int) = {
    val out = new Array[Long](n)
    var pos = offset
    var i = 0
    while (i < n) {
      var value = 0L
      var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        value |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      value |= (b & 0x7FL) << shift
      out(i) = value
      i += 1
    }
    (out, pos)
  }

  def decodeAll(bytes: Array[Byte]): Array[Long] = {
    val buf = Array.newBuilder[Long]
    var pos = 0
    while (pos < bytes.length) {
      var value = 0L
      var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        value |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      value |= (b & 0x7FL) << shift
      buf += value
    }
    buf.result()
  }

  /** Delta-encode a strictly-increasing docID list (first value absolute,
    * rest gaps) then vbyte. Mirrors the shape of the reference's
    * doc-delta blocks (`Lucene84PostingsWriter` [8x]).
    */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length * 2 max 16)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      val delta = if (i == 0) v else v - prev
      require(i == 0 || delta > 0, s"docIDs must be strictly increasing at $i")
      writeVLong(out, delta)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  def decodeDeltas(bytes: Array[Byte]): Array[Long] = {
    val deltas = decodeAll(bytes)
    var acc = 0L
    var i = 0
    while (i < deltas.length) {
      acc = if (i == 0) deltas(0) else acc + deltas(i)
      deltas(i) = acc
      i += 1
    }
    deltas
  }
}
