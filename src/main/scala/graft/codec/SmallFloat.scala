package graft.codec

/**
 * Lossy small-integer encoding matching Lucene 8.x norm encoding semantics.
 *
 * Re-derivation (not a port) of the public algorithm in
 * `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java` [8x]
 * (see /root/repo/SURVEY.md §1.1 "Norms"): a 4-bit-mantissa float-like
 * code over one byte, with 24 low values stored exactly
 * (`NUM_FREE_VALUES = 255 - longToInt4(Int.MaxValue)`), and the guarantee
 * `byte4ToInt(intToByte4(i)) <= i` (round-down to the nearest
 * representable value).
 *
 * BM25 doc lengths flow through this encoding; reproducing it exactly is
 * required for rank-identical scores vs the reference (SURVEY.md §7.5 #1).
 */
object SmallFloat {

  /** 4-bit-mantissa encode of a non-negative long: 3 explicit mantissa
    * bits + implicit leading bit + 5-bit shift (0 reserved for subnormal).
    */
  private[codec] def longToInt4(i: Long): Int = {
    require(i >= 0, s"only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      val kept  = (i >>> shift).toInt & 0x07 // drop the implicit MSB
      kept | ((shift + 1) << 3)
    }
  }

  private[codec] def int4ToLong(i: Int): Long = {
    val bits  = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4        = longToInt4(Int.MaxValue) // 231
  private val NumFreeValues  = 255 - MaxInt4            // 24: values <24 exact

  /** Encode a non-negative int to one byte; decode rounds down. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only supports positive values, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  /** Decode a byte written by [[intToByte4]]. */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val l = NumFreeValues + int4ToLong(i - NumFreeValues)
      math.toIntExact(l)
    }
  }

  /** The 256-entry decoded-length table (index = unsigned norm byte) —
    * the analog of BM25Similarity.LENGTH_TABLE [8x].
    */
  val LengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))

  /** All representable decoded values, ascending (for SQL oracle generation). */
  lazy val representableValues: Array[Int] = LengthTable.distinct.sorted

  /** decode(encode(dl)): round dl down to the nearest representable value. */
  def lossyLength(dl: Int): Int = byte4ToInt(intToByte4(dl))
}
