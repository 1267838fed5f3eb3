package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CommonGramsFilter postings [8x lucene/analysis/common .../
  * commongrams/CommonGramsFilter.java, CommonGramsQueryFilter.java;
  * solr CommonGramsFilterFactory]: at index time, every adjacent token
  * pair where EITHER side is a common word (the stop set) additionally
  * emits a combined bigram token `w1_w2`, so a phrase containing a
  * stopword is answered from ONE short posting list instead of
  * intersecting the stopword's enormous one — the classic
  * phrase-with-stopword trap ("the spark" forces a scan of `the`'s
  * postings, the longest list in any index). Our primary index
  * stop-FILTERS (position gaps), so such a phrase is not answerable
  * from it at all; the common-gram postings close that semantics gap
  * exactly the way the reference does.
  *
  * The build is a WRITE-path pass (one raw tokenize per corpus, the
  * same cost class as any index build), cached per JVM per corpus like
  * [[NestedBlocks]]; queries read only the gram's own postings with a
  * pushed equality filter. At 100 TB the gram table is written beside
  * the segment tables (grams are ~stop-adjacent bigrams only — a small
  * fraction of positions) and the phrase query never touches a
  * stopword posting list.
  */
object CommonGrams {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** (gram, doc_id, tf) postings of stop-adjacent bigrams. */
  def gramPostings(spark: SparkSession, sfDir: String): DataFrame = {
    val got = cache.computeIfAbsent(sfDir, { _ =>
      import spark.implicits._
      val stop = graft.analysis.Analyzer.EnglishStopWords
      val df = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text").cast("string"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          // CommonGramsFilter runs on the RAW stream, before StopFilter
          val raw = graft.analysis.Analyzer.tokenizeRaw(text)
          Iterator.range(0, raw.length - 1).collect {
            case i if stop.contains(raw(i).term) || stop.contains(raw(i + 1).term) =>
              (raw(i).term + "_" + raw(i + 1).term, id)
          }
        }
        .toDF("gram", "doc_id")
        .groupBy("gram", "doc_id").agg(count(lit(1)).as("tf"))
        .persist()
      df.count() // materialize once
      df
    })
    if (got.sparkSession.sparkContext.isStopped) {
      cache.remove(sfDir, got)
      gramPostings(spark, sfDir)
    } else got
  }

  /** Phrase-with-stopword query answered from the gram postings: docs
    * containing `w1 w2` adjacently, with the per-doc phrase tf — the
    * CommonGramsQueryFilter rewrite (the query-side chain replaces the
    * pair with its single gram token).
    */
  def phraseDocs(spark: SparkSession, sfDir: String,
                 w1: String, w2: String): DataFrame =
    gramPostings(spark, sfDir)
      .where(col("gram") === s"${w1}_$w2")
      .select("doc_id", "tf")
}
