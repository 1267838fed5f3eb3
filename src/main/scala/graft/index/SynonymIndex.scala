package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.analysis.{Analyzer, SynRule, SynonymGraph}
import graft.codec.SmallFloat

/** Synonym-expanded index build — the index whose analysis chain runs
  * [[graft.analysis.SynonymGraph]] before the stop filter, so synonyms
  * are REAL postings (df, tf, positions) and every downstream query
  * operator works on them unchanged [8x synonym/SynonymGraphFilter.java
  * applied index-time in a schema chain].
  *
  * Built through the ordinary non-fused pipeline (analyze → invert →
  * buildPostings): the synonym rewrite is a narrow per-doc map, the
  * rest is exactly the production posting shuffle + block encode —
  * nothing about scale changes.
  */
object SynonymIndex {

  /** Demo rule set over the fixed corpus vocabulary:
    *  - equivalence class {spark, flame} (expand=true — `flame` never
    *    occurs raw, so its postings must equal spark's);
    *  - multi-token mapping "big data" => bigdata (matched on adjacent
    *    raw tokens, injected at the first token's position).
    */
  val DemoRules: Seq[SynRule] =
    SynonymGraph.equivalence("spark", "flame") :+
      SynRule(List("big", "data"), List("bigdata"))

  val SegSize: Long = 1024L

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexView]()

  def buildView(spark: SparkSession, corpus: Dataset[DocInput],
                rules: Seq[SynRule], segSize: Long,
                stopWords: Set[String] = Analyzer.EnglishStopWords): IndexView = {
    import spark.implicits._
    val rulesB = spark.sparkContext.broadcast(rules.toList)
    val stopsB = spark.sparkContext.broadcast(stopWords)
    val analyzed = corpus.mapPartitions { it =>
      // rule dispatch built once per partition, not per doc
      val byFirst = SynonymGraph.matcher(rulesB.value)
      val stops = stopsB.value
      it.flatMap { d =>
        val a = SynonymGraph.analyzeWith(d.text, byFirst, stops)
        if (a.dl == 0) Iterator.empty
        else Iterator.single(AnalyzedDoc(Indexer.segmentOf(d.doc_id, segSize),
          d.doc_id, d.url, a.dl, SmallFloat.intToByte4(a.dl).toInt & 0xff,
          a.terms))
      }
    }
    val postings =
      Indexer.buildPostings(spark, Indexer.invertAnalyzed(spark, analyzed))
    IndexView(postings, Indexer.buildTerms(postings),
      Indexer.docMeta(spark, analyzed))
  }

  /** The synonym-expanded index of a documents corpus under
    * [[DemoRules]], built once per JVM per corpus.
    */
  def synonymIndex(spark: SparkSession, sfDir: String): IndexView = {
    val got = cache.computeIfAbsent(sfDir, { _ =>
      import org.apache.spark.sql.functions.col
      val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("doc_id").cast("string").as("url"),
          col("text"))
      val v = buildView(spark, Indexer.asDocInput(spark, corpus), DemoRules,
        SegSize).persisted()
      v.postings.count() // materialize once
      v
    })
    if (got.postings.sparkSession.sparkContext.isStopped) {
      cache.remove(sfDir, got)
      synonymIndex(spark, sfDir)
    } else got
  }
}
