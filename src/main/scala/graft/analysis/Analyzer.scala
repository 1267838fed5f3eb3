package graft.analysis

/** One token: term text + token position (post stop-filter positions keep
  * their gaps, as the reference's StopFilter preserves position increments
  * — `lucene/core/.../analysis/StopFilter.java` [8x]).
  */
final case class Token(term: String, pos: Int)

/** Per-document analysis result: indexed doc length (token count after
  * stop filtering — what the reference writes to norms) plus per-term
  * stats aggregated document-locally (tf + positions).
  */
final case class DocTerms(dl: Int, terms: Array[TermInDoc])
final case class TermInDoc(term: String, tf: Int, positions: Array[Int])

/**
 * Analysis chain reproducing the reference StandardAnalyzer semantics on
 * the ASCII subset our corpora use (SURVEY.md §2.1, §7.5 #2):
 * tokenizer (alphanumeric runs, UAX#29-compatible for ASCII
 * letters/digits; maxTokenLength=255 with overlong runs split at the
 * limit) → lowercase → stop filter (position increments preserved).
 *
 * Reference behaviors mirrored [8x]:
 *  - `analysis/standard/StandardTokenizer.java`: maxTokenLength default
 *    255, ALPHANUM runs;
 *  - `analysis/LowerCaseFilter.java`;
 *  - `analysis/StopFilter.java` + the classic 33-word English stop set of
 *    `analysis/en/EnglishAnalyzer.ENGLISH_STOP_WORDS_SET` (note: the
 *    no-arg StandardAnalyzer in ≥7.0 has an EMPTY stop set, LUCENE-7444 —
 *    the stop set is a parameter here, defaulting to the English list).
 */
object Analyzer {

  /** The classic 33-word English stop set [8x EnglishAnalyzer]. */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  val MaxTokenLength = 255

  private[graft] def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Tokenize only (no stop filter): lowercase alphanumeric runs with
    * positions 0,1,2,…; runs longer than maxTokenLength split at the
    * limit (each chunk its own token, like the reference tokenizer).
    */
  def tokenizeRaw(text: String): Array[Token] = {
    val out = Array.newBuilder[Token]
    var pos = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isTokenChar(text.charAt(i))) i += 1
        var s = start
        while (s < i) {
          val e = math.min(s + MaxTokenLength, i)
          out += Token(text.substring(s, e).toLowerCase(java.util.Locale.ROOT), pos)
          pos += 1
          s = e
        }
      }
    }
    out.result()
  }

  /** Full chain: tokenize → lowercase → stop filter (gap-preserving). */
  def tokenize(text: String, stopWords: Set[String] = EnglishStopWords): Array[Token] =
    tokenizeRaw(text).filterNot(t => stopWords.contains(t.term))

  private[graft] def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** FNV-1a seed/prime shared by the fused-kernel hashers ([[StopHash]],
    * the doc-local [[TermTable]], and the partition-global arena table of
    * the index build) — all hash the LOWERCASED token chars, so a hash
    * computed once per token is reusable across the stop check and the
    * intern probe.
    */
  private[graft] final val FnvSeed = -2128831035
  private[graft] final val FnvPrime = 16777619

  /** Open-addressing document-local inversion table keyed directly by
    * the token's chars: a String is materialized ONCE per DISTINCT term
    * of the doc, never per occurrence (round-1 advisor: the per-token
    * `sb.toString` was the dominant allocation of the hottest loop).
    * Stopwords occupy a slot with a null position buffer so repeated
    * stop tokens also skip materialization.
    */
  private final class TermTable(stopWords: Set[String]) {
    private var cap = 64
    private var mask = cap - 1
    private var hashes = new Array[Int](cap)
    private var keys = new Array[String](cap)
    private var bufs = new Array[PosBuf](cap) // null for stopwords
    private var size = 0
    var dl = 0

    private def rehash(): Unit = {
      val oh = hashes; val ok = keys; val ob = bufs
      cap *= 2; mask = cap - 1
      hashes = new Array[Int](cap); keys = new Array[String](cap)
      bufs = new Array[PosBuf](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) {
          var j = oh(i) & mask
          while (keys(j) != null) j = (j + 1) & mask
          hashes(j) = oh(i); keys(j) = ok(i); bufs(j) = ob(i)
        }
        i += 1
      }
    }

    /** One token occurrence: text[s, e) (lowercased on the fly). */
    def offer(text: String, s: Int, e: Int, pos: Int): Unit = {
      val len = e - s
      var h = FnvSeed // FNV-1a over lowercased chars (shared constants)
      var k = s
      while (k < e) { h = (h ^ lower(text.charAt(k))) * FnvPrime; k += 1 }
      var i = h & mask
      var done = false
      while (!done) {
        val key = keys(i)
        if (key == null) { // new distinct term: materialize once
          val a = new Array[Char](len)
          var j = 0
          while (j < len) { a(j) = lower(text.charAt(s + j)); j += 1 }
          val term = new String(a)
          hashes(i) = h; keys(i) = term
          if (!stopWords.contains(term)) {
            val b = new PosBuf; b.add(pos); bufs(i) = b
            dl += 1
          }
          size += 1
          if (size * 2 > cap) rehash()
          done = true
        } else if (hashes(i) == h && key.length == len && {
          var j = 0
          var eq = true
          while (eq && j < len) { eq = key.charAt(j) == lower(text.charAt(s + j)); j += 1 }
          eq
        }) {
          val b = bufs(i)
          if (b != null) { // non-stop term seen again
            b.add(pos)
            dl += 1
          }
          done = true
        } else i = (i + 1) & mask
      }
    }

    /** Indexed terms, sorted (deterministic downstream order). */
    def result(): Array[TermInDoc] = {
      var n = 0
      var i = 0
      while (i < cap) { if (bufs(i) != null) n += 1; i += 1 }
      val terms = new Array[TermInDoc](n)
      var j = 0
      i = 0
      while (i < cap) {
        if (bufs(i) != null) {
          val ps = bufs(i).toArray
          terms(j) = TermInDoc(keys(i), ps.length, ps)
          j += 1
        }
        i += 1
      }
      java.util.Arrays.sort(terms, Ordering.by((t: TermInDoc) => t.term))
      terms
    }
  }

  /** Scan `text` once, feeding each token occurrence to `table`. */
  private def scan(text: String, table: TermTable): Unit = {
    var pos = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isTokenChar(text.charAt(i))) i += 1
        var s = start
        while (s < i) {
          val e = math.min(s + MaxTokenLength, i)
          table.offer(text, s, e, pos)
          pos += 1
          s = e
        }
      }
    }
  }

  /** Multivalued-field analysis — Lucene's
    * `Analyzer#getPositionIncrementGap` contract [8x analysis/Analyzer
    * .java, Solr schema positionIncrementGap=100]: each value runs the
    * full chain, and the positions of value k start at (raw tokens of
    * all previous values) + k·gap, so a phrase/span query can never
    * match across a value boundary once gap exceeds the query width.
    */
  def tokenizeValues(values: Seq[String], gap: Int,
                     stopWords: Set[String] = EnglishStopWords): Array[Token] = {
    val out = Array.newBuilder[Token]
    var base = 0
    var k = 0
    for (v <- values) {
      if (k > 0) base += gap
      val raw = tokenizeRaw(v)
      raw.foreach { t =>
        if (!stopWords.contains(t.term)) out += Token(t.term, base + t.pos)
      }
      base += raw.length
      k += 1
    }
    out.result()
  }

  /** Compose a multivalued field into ONE text whose single-value
    * analysis is token-for-token AND position-for-position identical to
    * [[tokenizeValues]] (property-tested): values joined by `gap`
    * stopword tokens. StopFilter keeps position increments and stop
    * tokens never count toward dl, so postings, positions and norms all
    * equal the multivalued analysis — the fused index kernel needs no
    * second code path for multivalued fields.
    */
  def joinValues(values: Seq[String], gap: Int): String = {
    val sep = " " + ("the " * gap).trim + " "
    values.mkString(sep)
  }

  /** Document-local inversion: per-term tf + positions, and dl = number of
    * indexed (post-stop-filter) tokens — the value the norm byte encodes.
    * Terms are returned sorted for deterministic downstream order.
    *
    * Fused single pass (tokenize→lowercase→stop→invert) with one String
    * per distinct term — this is the hottest loop of the index build;
    * the token-array path ([[tokenize]]) is kept for tests/API and the
    * two are property-tested identical.
    */
  def analyze(text: String, stopWords: Set[String] = EnglishStopWords): DocTerms = {
    val t = new TermTable(stopWords)
    scan(text, t)
    DocTerms(t.dl, t.result())
  }

  /** Count indexed (post-stop-filter) tokens only — the dl the norm byte
    * encodes. Cheaper than [[analyze]]: a pure char scan against a
    * [[StopHash]], zero allocations per call beyond the probe table.
    */
  def countTokens(text: String, stopWords: Set[String] = EnglishStopWords): Int =
    countTokensWith(text, new StopHash(stopWords))

  /** [[countTokens]] with a prebuilt, reusable [[StopHash]] — the
    * per-partition docmeta kernel: no String is ever materialized (stop
    * words are recognized by hash + char compare against the stored stop
    * set), so the pass allocates nothing per document.
    */
  def countTokensWith(text: String, stops: StopHash): Int = {
    var dl = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isTokenChar(text.charAt(i))) i += 1
        var s = start
        while (s < i) {
          val e = math.min(s + MaxTokenLength, i)
          var h = FnvSeed
          var k = s
          while (k < e) { h = (h ^ lower(text.charAt(k))) * FnvPrime; k += 1 }
          if (!stops.contains(text, s, e, h)) dl += 1
          s = e
        }
      }
    }
    dl
  }

  private final class PosBuf {
    private var a = new Array[Int](4)
    private var n = 0
    def add(p: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = p; n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  }
}

/** Allocation-free stop-word membership test for the fused build kernels:
  * the (small) stop set is laid out once in an open-addressing table of
  * precomputed FNV-1a hashes + the words themselves; a token span is
  * checked by hash then char-wise compare against the stored word, so NO
  * String is materialized for non-stop tokens — the overwhelming majority
  * at web scale. Exactly equivalent to `stopWords.contains(lowercased
  * token)`: a stored word that is not itself a lowercase token string can
  * never char-compare equal, matching the Set semantics on the analyzer's
  * lowercased output.
  */
final class StopHash(stopWords: Set[String]) {
  private val cap = {
    var c = 8
    while (c < stopWords.size * 4) c <<= 1
    c
  }
  private val mask = cap - 1
  private val hashes = new Array[Int](cap)
  private val words = new Array[String](cap)
  stopWords.foreach { w =>
    var h = Analyzer.FnvSeed
    var k = 0
    while (k < w.length) { h = (h ^ w.charAt(k)) * Analyzer.FnvPrime; k += 1 }
    var i = h & mask
    while (words(i) != null) i = (i + 1) & mask
    hashes(i) = h; words(i) = w
  }

  /** Is text[s,e), lowercased on the fly, a stop word? `h` must be the
    * FNV-1a hash over the lowercased chars (the caller computes it once
    * per token and reuses it for the intern probe).
    */
  def contains(text: String, s: Int, e: Int, h: Int): Boolean = {
    val len = e - s
    var i = h & mask
    while (true) {
      val w = words(i)
      if (w == null) return false
      if (hashes(i) == h && w.length == len) {
        var j = 0
        var eq = true
        while (eq && j < len) { eq = w.charAt(j) == Analyzer.lower(text.charAt(s + j)); j += 1 }
        if (eq) return true
      }
      i = (i + 1) & mask
    }
    false
  }
}

/**
 * Deterministic HTML text extraction — the `html:binary → text:string`
 * step with the per-row invariant "byte-identical extracted text per url"
 * (/root/repo/BASELINE.json:15). Pairs with [[HtmlCodec.render]]: the
 * synthesized corpus builds html FROM text, and extractText inverts it
 * exactly (golden-tested). Semantics follow the reference's
 * HTMLStripCharFilter [8x analysis/charfilter/HTMLStripCharFilter.java]
 * on the subset we emit: tags dropped, basic entities decoded.
 */
object HtmlCodec {
  // &amp; must decode LAST: escape turns a literal "&lt;" in the text
  // into "&amp;lt;", and folding &amp;->& first would re-expose "&lt;"
  // to the later replace — double-unescaping, breaking the byte-identical
  // render/extract round trip the input_hint requires
  private val entities = List(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&'  => sb.append("&amp;")
      case '<'  => sb.append("&lt;")
      case '>'  => sb.append("&gt;")
      case '"'  => sb.append("&quot;")
      case '\'' => sb.append("&#39;")
      case c    => sb.append(c)
    }
    sb.toString
  }

  def unescape(s: String): String =
    entities.foldLeft(s) { case (acc, (e, c)) => acc.replace(e, c) }

  /** Render a page. UTF-8 bytes. */
  def render(title: String, text: String): Array[Byte] =
    (s"<html><head><title>${escape(title)}</title></head>" +
      s"<body><p>${escape(text)}</p></body></html>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Strip tags, decode entities, return body text. Deterministic pure
    * function of the bytes.
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    // take <body> content if present, else whole doc
    val body = {
      val b0 = s.indexOf("<body>")
      val b1 = s.lastIndexOf("</body>")
      if (b0 >= 0 && b1 > b0) s.substring(b0 + "<body>".length, b1) else s
    }
    val sb = new StringBuilder(body.length)
    var inTag = false
    body.foreach { c =>
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) sb.append(c)
    }
    unescape(sb.toString)
  }
}
