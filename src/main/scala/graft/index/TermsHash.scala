package graft.index

import graft.analysis.{Analyzer, StopHash}

/** Partition-global fused inversion state — the DWPT termsHash analog
  * [8x index/TermsHashPerField.java, index/DocumentsWriterPerThread
  * .java]: ONE table per combine batch instead of one per document.
  *
  * Why: the per-doc `TermTable` + `HashMap[(seg, term), ChunkBuilder]`
  * design materialized every distinct term's String once PER DOC, plus
  * a tuple key per posting and a fresh position buffer per (doc, term).
  * The measured scaling ceiling of the build is the VM's allocation/GC
  * rate (BASELINE.md: 0.44–0.49 vs CPU 0.88–0.98), so allocation in the
  * hottest loop is directly lost scaling. Here a term's String is
  * interned once per BATCH (the Zipf head repeats across thousands of
  * docs), its position buffer is reused across docs, and the stop check
  * is the allocation-free [[graft.analysis.StopHash]] probe — per-token
  * steady-state work is a char scan + one open-addressing probe with
  * zero allocation.
  *
  * Layout: a slot→entry index array (rebuilt on growth) over DENSE
  * parallel entry arrays (stable entry ids, so the per-doc touched list
  * survives a mid-doc rehash — Lucene's termID indirection).
  */
private[index] final class TermsHash(stops: StopHash, indexPositions: Boolean) {
  private var cap = 1 << 12
  private var mask = cap - 1
  private var slots = java.util.Arrays.copyOf(TermsHash.MinusOnes, cap)

  private var n = 0 // dense entry count
  private var hashes = new Array[Int](1 << 10)
  private var segs = new Array[Int](1 << 10)
  private var terms = new Array[String](1 << 10)
  private var builders = new Array[ChunkBuilder](1 << 10)
  private var curDoc = new Array[Long](1 << 10)
  private var curTf = new Array[Int](1 << 10)
  private var posBufs = new Array[TermsHash.IntBuf](1 << 10)

  private var touched = new Array[Int](256)
  private var nTouched = 0

  /** Conservative heap estimate for the combine budget (same accounting
    * as the pre-fused path: map-entry cost per new (seg, term), posting
    * cost per flushed (doc, term)).
    */
  var bytes = 0L

  private def growDense(): Unit = {
    val c = hashes.length * 2
    hashes = java.util.Arrays.copyOf(hashes, c)
    segs = java.util.Arrays.copyOf(segs, c)
    terms = java.util.Arrays.copyOf(terms, c)
    builders = java.util.Arrays.copyOf(builders, c)
    curDoc = java.util.Arrays.copyOf(curDoc, c)
    curTf = java.util.Arrays.copyOf(curTf, c)
    posBufs = java.util.Arrays.copyOf(posBufs, c)
  }

  private def rehash(): Unit = {
    cap *= 2; mask = cap - 1
    slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    var e = 0
    while (e < n) {
      var i = mix(hashes(e), segs(e)) & mask
      while (slots(i) != -1) i = (i + 1) & mask
      slots(i) = e
      e += 1
    }
  }

  private def mix(h: Int, seg: Int): Int = h ^ (seg * 0x9e3779b9)

  /** One non-stop token occurrence: text[s, e) lowercased on the fly,
    * `h` the FNV-1a hash over the lowercased chars.
    */
  private def offer(seg: Int, docId: Long, text: String, s: Int, e: Int,
                    h: Int, pos: Int): Unit = {
    val len = e - s
    var i = mix(h, seg) & mask
    var entry = -1
    while (entry == -1) {
      val ei = slots(i)
      if (ei == -1) { // new distinct (seg, term) of this batch
        if (n == hashes.length) growDense()
        val a = new Array[Char](len)
        var j = 0
        while (j < len) { a(j) = Analyzer.lower(text.charAt(s + j)); j += 1 }
        entry = n; n += 1
        slots(i) = entry
        hashes(entry) = h; segs(entry) = seg; terms(entry) = new String(a)
        builders(entry) = new ChunkBuilder
        curDoc(entry) = docId; curTf(entry) = 0
        if (indexPositions) {
          if (posBufs(entry) == null) posBufs(entry) = new TermsHash.IntBuf
          else posBufs(entry).clear()
        }
        bytes += 64L + 2L * len
        if (n * 2 > cap) rehash()
      } else if (hashes(ei) == h && segs(ei) == seg && terms(ei).length == len && {
        val t = terms(ei)
        var j = 0
        var eq = true
        while (eq && j < len) { eq = t.charAt(j) == Analyzer.lower(text.charAt(s + j)); j += 1 }
        eq
      }) {
        entry = ei
        if (curDoc(entry) != docId) { // first occurrence in THIS doc
          curDoc(entry) = docId; curTf(entry) = 0
          if (indexPositions) {
            if (posBufs(entry) == null) posBufs(entry) = new TermsHash.IntBuf
            else posBufs(entry).clear()
          }
        } else {
          // already touched this doc: bump only
          curTf(entry) += 1
          if (indexPositions) posBufs(entry).add(pos)
          return
        }
      } else {
        i = (i + 1) & mask
      }
    }
    // first occurrence of `entry` in this doc
    curTf(entry) += 1
    if (indexPositions) posBufs(entry).add(pos)
    if (nTouched == touched.length)
      touched = java.util.Arrays.copyOf(touched, nTouched * 2)
    touched(nTouched) = entry; nTouched += 1
  }

  /** Analyze one document into the table (tokenize → lowercase → stop —
    * exactly [[Analyzer.analyze]]'s semantics: positions count EVERY
    * token incl. stop words, dl counts non-stop tokens only). Returns dl.
    * Must be followed by [[endDoc]] (which flushes the touched entries
    * once the norm byte is known) before the next addDoc.
    */
  def addDoc(seg: Int, docId: Long, text: String): Int = {
    var dl = 0
    var pos = 0
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && !Analyzer.isTokenChar(text.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && Analyzer.isTokenChar(text.charAt(i))) i += 1
        var s = start
        while (s < i) {
          val e = math.min(s + Analyzer.MaxTokenLength, i)
          var h = Analyzer.FnvSeed
          var k = s
          while (k < e) { h = (h ^ Analyzer.lower(text.charAt(k))) * Analyzer.FnvPrime; k += 1 }
          if (!stops.contains(text, s, e, h)) {
            offer(seg, docId, text, s, e, h, pos)
            dl += 1
          }
          pos += 1
          s = e
        }
      }
    }
    dl
  }

  /** Flush the current doc's touched entries into their chunk builders
    * (norms are known only at doc end — Lucene likewise writes norms
    * after the doc's fields are inverted).
    */
  def endDoc(docId: Long, normByte: Int): Unit = {
    var j = 0
    while (j < nTouched) {
      val e = touched(j)
      val ps =
        if (indexPositions) posBufs(e).toArray else Array.emptyIntArray
      builders(e).add(docId, curTf(e), normByte, ps)
      bytes += 48L + (if (indexPositions) 8L * ps.length else 0L)
      j += 1
    }
    nTouched = 0
  }

  /** Emit every (seg, term) chunk accumulated in this batch. */
  def results(): Iterator[PostingChunk] =
    Iterator.range(0, n).map(e => builders(e).result(segs(e), terms(e)))
}

private[index] object TermsHash {
  private val MinusOnes: Array[Int] = {
    val a = new Array[Int](1 << 12)
    java.util.Arrays.fill(a, -1)
    a
  }

  /** Growable int buffer reused across docs (clear, don't reallocate). */
  private[index] final class IntBuf {
    private var a = new Array[Int](8)
    private var nI = 0
    def add(x: Int): Unit = {
      if (nI == a.length) a = java.util.Arrays.copyOf(a, nI * 2)
      a(nI) = x; nI += 1
    }
    def clear(): Unit = nI = 0
    def toArray: Array[Int] = java.util.Arrays.copyOfRange(a, 0, nI)
  }
}
