package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.HtmlCodec

/**
 * Deterministic Common-Crawl-style corpus generator matching the
 * input_hint schema (url, warc_ts, html, text, lang) —
 * /root/repo/BASELINE.json:15, SURVEY.md §7.4 M0.
 *
 * Every row is a pure function of (seed, id): parallelism- and
 * partitioning-independent, so scaling runs at local[8] and local[32]
 * see byte-identical input. Vocabulary is Zipfian-ish with the 33
 * English stopwords injected at high frequency to exercise
 * term-frequency skew (the north rule's skew clause), and the html is
 * rendered FROM the text so `extractText(html) == text` byte-identically
 * per url (per-row invariant).
 */
object CorpusSynth {

  val VocabSize = 2000

  /** splitmix64 — public-domain PRNG step; deterministic per (seed,id,k). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val stopArr = graft.analysis.Analyzer.EnglishStopWords.toArray.sorted

  /** word k of the vocabulary: w0000..wNNNN (ASCII letters+digits only —
    * keeps the tokenizer in the unambiguous UAX#29 subset, SURVEY.md §7.5).
    */
  private def vocabWord(k: Int): String = f"w$k%04d"

  /** Zipf-ish rank sample: maps a uniform u in [0,1) to a rank with
    * p(r) ∝ 1/(r+1) via inverse CDF of the harmonic distribution,
    * approximated by exp-scaling (deterministic, branch-free).
    */
  private def zipfRank(u: Double, n: Int): Int = {
    val r = (math.exp(u * math.log(n.toDouble + 1)) - 1).toInt
    math.min(math.max(r, 0), n - 1)
  }

  private val langs = Array("en", "de", "es", "fr", "zh")

  /** Generate doc text for a given id: 20–120 words, ~25% stopwords. */
  def textFor(seed: Long, id: Long): String = {
    val h0 = mix(seed ^ mix(id))
    val nWords = 20 + (java.lang.Long.remainderUnsigned(h0, 101L)).toInt // 20..120
    val sb = new StringBuilder(nWords * 6)
    var k = 0
    while (k < nWords) {
      val h = mix(h0 ^ (k + 1).toLong * 0x632be59bd9b4e019L)
      val pick = java.lang.Long.remainderUnsigned(h, 1000L)
      val word =
        if (pick < 250) stopArr((java.lang.Long.remainderUnsigned(mix(h), stopArr.length.toLong)).toInt)
        else {
          val u = (java.lang.Long.remainderUnsigned(mix(h + 1), 1000000L)).toDouble / 1000000.0
          vocabWord(zipfRank(u, VocabSize))
        }
      if (k > 0) sb.append(' ')
      sb.append(word)
      k += 1
    }
    sb.toString
  }

  final case class SynthRow(url: String, warc_ts: java.sql.Timestamp,
                            html: Array[Byte], text: String, lang: String)

  /** Deterministic corpus of n docs, generated distributed via
    * spark.range (scales to any n; each row derived only from its id).
    */
  def corpus(spark: SparkSession, n: Long, seed: Long = 42L,
             numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    val baseTs = 1700000000000L // fixed epoch base; offset deterministic per url
    spark.range(0, n, 1, parts).map { id =>
      val text = textFor(seed, id)
      val site = java.lang.Long.remainderUnsigned(mix(seed ^ id ^ 0x51L), 1000L)
      val url  = s"https://site$site.example/p/$id"
      val ts   = new java.sql.Timestamp(baseTs + java.lang.Long.remainderUnsigned(mix(seed ^ id ^ 0x7fL), 86400000L * 30))
      val lang = langs((java.lang.Long.remainderUnsigned(mix(seed ^ id ^ 0xabL), langs.length.toLong)).toInt)
      SynthRow(url, ts, HtmlCodec.render(s"doc $id", text), text, lang)
    }.toDF()
  }

  /** Same corpus with a dense deterministic doc_id (== range id) — the
    * shape the indexer consumes. docIDs are a function of data, never of
    * partition scheduling (SURVEY.md §7.5 #4).
    */
  def corpusWithIds(spark: SparkSession, n: Long, seed: Long = 42L,
                    numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map { id =>
      (id, s"https://doc/$id", textFor(seed, id))
    }.toDF("doc_id", "url", "text")
  }
}
