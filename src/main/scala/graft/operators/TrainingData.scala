package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Large-scale training-data pipeline operators over the `documents`
 * corpus: deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash),
 * text analysis (language-ID heuristic, quality scoring, token counting,
 * document fingerprinting).
 *
 * Scale stance (100 TB): everything before a dedup join is NARROW
 * (shingling is a per-row `transform` over the split array — no window,
 * no shuffle); the exact pairwise path shuffles once on the shingle and
 * is the small-scale oracle; the LSH path is the scale path (candidates
 * via band-bucket join, exact Jaccard verified only on candidates).
 * Integer/quantized outputs keep the DuckDB oracle hash-stable.
 */
object TrainingData {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup: group by content hash (md5 — byte-stable across
    * engines); keeper = min doc_id per group (deterministic survivor).
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))

  /** Distinct word 3-gram shingles per doc, computed NARROW: a per-row
    * array `transform` over `split(text)` — no window shuffle. Matches
    * the oracle's `lead(term,1/2) OVER (PARTITION BY doc ORDER BY pos)`
    * formulation exactly.
    */
  private[graft] def shingles(s: SparkSession, dir: String,
                                  n: Int = 3): DataFrame =
    shinglesDf(docs(s, dir), n)

  private[graft] def shinglesDf(d: DataFrame, n: Int = 3): DataFrame = {
    val l = split(col("text"), " ")
    val idxs = sequence(lit(1), size(l) - (n - 1)) // 1-based element_at
    val grams = transform(idxs, i =>
      concat_ws(" ", (0 until n).map(o => element_at(l, i + o)): _*))
    d.where(size(l) >= n)
      .select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  private def jaccardQ(inter: Column, na: Column, nb: Column): Column =
    round(inter * 10000.0 / (na + nb - inter)).cast("long")

  /** Exact n-gram-Jaccard near-dup pairs (threshold 0.8 on word
    * 3-grams): shingle-equality self-join → per-pair intersection →
    * Jaccard. Quadratic in hot shingles — the small-scale differential
    * oracle for [[dedupMinhashLsh]], which is the 100 TB path.
    */
  def dedupNgramPairs(s: SparkSession, dir: String,
                      thresholdQ: Long = 8000L): DataFrame = {
    val sh = shingles(s, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("i", "shingle")
    val b = sh.toDF("j", "shingle")
    val inter = a.join(b, Seq("shingle")).where(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("i", "na"), Seq("i"))
      .join(sizes.toDF("j", "nb"), Seq("j"))
      .select(col("i"), col("j"),
        jaccardQ(col("inter"), col("na"), col("nb")).as("jaccard_q"))
      .where(col("jaccard_q") >= thresholdQ)
  }

  // ——— MinHash + LSH ———

  /** Stable 64-bit string hash (FNV-1a + splitmix64 finalizer). */
  private[graft] def h64(str: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < str.length) { h ^= str.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val MinHashFns = 32
  val LshBands = 16 // × 2 rows: P(miss | J=0.8) = (1-.8²)¹⁶ ≈ 7e-8

  private[graft] def signature(shingleHashes: Iterator[Long]): Array[Long] = {
    val sig = Array.fill(MinHashFns)(Long.MaxValue)
    shingleHashes.foreach { x =>
      var i = 0
      while (i < MinHashFns) {
        // per-function mix: splitmix64 of (x ^ seed_i)
        var z = (x ^ (0x9e3779b97f4a7c15L * (i + 1))) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < sig(i)) sig(i) = z
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH near-dup pairs — the 100 TB dedup path. Signatures are
    * computed narrow per doc; candidate pairs come from 16 band buckets
    * (2 rows/band); exact shingle Jaccard is then verified ONLY on
    * candidates, so the quadratic join never materializes. With J ≥ 0.8
    * the per-pair miss probability is (1−0.8²)¹⁶ ≈ 7e-8, hence the
    * result equals [[dedupNgramPairs]] (the DuckDB oracle) w.h.p.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String,
                      thresholdQ: Long = 8000L): DataFrame =
    dedupMinhashLshDf(s, docs(s, dir), thresholdQ)

  /** Bucket-size cap for all-pairs candidate generation. A Common-Crawl
    * boilerplate cluster can drop 10⁵⁺ near-identical docs into ONE band
    * bucket; emitting its B² pairs is a skew/OOM killer no matter how
    * it's partitioned. Above the cap the bucket degrades to a STAR: each
    * member pairs with the bucket's min doc_id only (O(B) pairs). For
    * clusters that big the members are near-identical w.h.p., so the hub
    * edge still flags every member as a duplicate of the cluster keeper
    * — cluster-level recall is preserved; only redundant within-cluster
    * pair edges are dropped (documented recall trade).
    */
  val MaxBucket = 256

  def dedupMinhashLshDf(s: SparkSession, corpus: DataFrame,
                        thresholdQ: Long = 8000L): DataFrame = {
    import s.implicits._
    val sh = shinglesDf(corpus)
    // signatures NARROW per doc — the shingle set is document-local, so
    // MinHash needs no shuffle at all (the groupByKey formulation would
    // shuffle every shingle once just to regroup by doc)
    val bands = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val toks = text.split(' ')
        if (toks.length < 3) Iterator.empty
        else {
          val grams = scala.collection.mutable.HashSet.empty[String]
          var i = 0
          while (i + 2 < toks.length) {
            grams += (toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
            i += 1
          }
          val sig = signature(grams.iterator.map(h64))
          Iterator.tabulate(LshBands)(b => (b, sig(2 * b), sig(2 * b + 1), docId))
        }
      }.toDF("band", "h1", "h2", "doc_id")
    // candidate pairs via a SELF-JOIN on the bucket key — distributed
    // and AQE-skew-splittable, never a per-bucket in-row array (the
    // round-1 collect_list formulation put a whole bucket's B² pairs in
    // one task). Oversized buckets take the star path instead.
    val stats = bands.groupBy("band", "h1", "h2")
      .agg(count(lit(1)).as("bn"), min("doc_id").as("hub"))
      .where(col("bn") > 1)
    val keyed = bands.join(stats, Seq("band", "h1", "h2"))
    val small = keyed.where(col("bn") <= MaxBucket)
    val pairsSmall = small.select(col("band"), col("h1"), col("h2"), col("doc_id").as("i"))
      .join(small.select(col("band"), col("h1"), col("h2"), col("doc_id").as("j")),
        Seq("band", "h1", "h2"))
      .where(col("i") < col("j"))
      .select("i", "j")
    val pairsStar = keyed
      .where(col("bn") > MaxBucket && col("doc_id") =!= col("hub"))
      .select(col("hub").as("i"), col("doc_id").as("j"))
    val cand = pairsSmall.union(pairsStar).distinct()
    // exact verification restricted to candidates
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("i", "shingle")
    val b = sh.toDF("j", "shingle")
    val inter = cand.join(a, Seq("i")).join(b, Seq("j", "shingle"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("i", "na"), Seq("i"))
      .join(sizes.toDF("j", "nb"), Seq("j"))
      .select(col("i"), col("j"),
        jaccardQ(col("inter"), col("na"), col("nb")).as("jaccard_q"))
      .where(col("jaccard_q") >= thresholdQ)
  }

  /** SimHash-64 fingerprint per doc (tf-weighted unigram hashes):
    * near-dup docs differ in few bits. Hash-based — no SQL oracle
    * (rows-only driver check); determinism is spec-tested.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (docId, text) =>
        val acc = new Array[Int](64)
        text.split(' ').foreach { w =>
          if (w.nonEmpty) {
            val h = h64(w)
            var bit = 0
            while (bit < 64) {
              if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
              bit += 1
            }
          }
        }
        var f = 0L
        var bit = 0
        while (bit < 64) { if (acc(bit) > 0) f |= (1L << bit); bit += 1 }
        (docId, f)
      }.toDF("doc_id", "simhash")
  }

  // ——— Text analysis ———

  private val stopArray: Column = array(
    graft.analysis.Analyzer.EnglishStopWords.toSeq.sorted.map(lit): _*)

  /** Language-ID heuristic: share of English stopwords among tokens
    * (integer arithmetic: 100·n_stop > 15·n_tok ⇒ "en"). A real n-gram
    * model slots in per language; the pipeline shape (narrow map,
    * integer thresholds) is the deliverable.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => array_contains(stopArray, t)))
    docs(s, dir).select(col("doc_id"),
      when(nTok > 0 && nStop * 100 > nTok * 15, lit("en"))
        .otherwise(lit("unk")).as("lang_pred"))
  }

  /** Quality scoring: token count, char count, stopword permille, mean
    * word length (centi) — all integer (floor-div) for oracle parity.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => array_contains(stopArray, t))).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    docs(s, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      floor(lit(1000L) * nStop / nTok).cast("long").as("stop_permille"),
      floor(lit(100L) * sumLen / nTok).cast("long").as("mean_wordlen_c"))
  }

  /** Token counting two ways: whitespace tokens + regex (BPE-ish word
    * piece proxy) tokens.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("re_tokens"))

  /** Document fingerprint: MinHash-1 winnowing — min md5 over word
    * 4-gram shingles (md5 is byte-stable across engines → SQL oracle).
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    val l = split(col("text"), " ")
    val idxs = sequence(lit(1), size(l) - 3)
    val grams = transform(idxs, i =>
      concat_ws(" ", element_at(l, i), element_at(l, i + 1),
        element_at(l, i + 2), element_at(l, i + 3)))
    // fully narrow: min over the in-row md5 array — no explode, no
    // shuffle (the min-of-hashes is a per-document reduction)
    docs(s, dir)
      .where(size(l) >= 4)
      .select(col("doc_id"),
        array_min(transform(grams, g => md5(g))).as("fingerprint"))
  }
}
