package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.codec.{PostingCodec, SmallFloat}
import graft.index.{Indexer, PostingBlockRow, PostingInput}

/**
 * Multi-field indexing + cross-field DisMax — the reference's
 * per-field inverted index (every Lucene field has its own terms,
 * norms, and collection statistics [8x index/FieldInfo.java,
 * PerFieldPostingsFormat]) and Solr's `qf`-weighted DisMax across
 * fields [Solr DisMaxQParser.java], Spark-first:
 *
 *  - A second field (`title` = the document's first [[TitleWords]]
 *    whitespace tokens — deterministic, so the DuckDB oracle can
 *    reproduce it) is analyzed independently of the body: its own
 *    doc length, its own SmallFloat norm byte, its own stop-filtered
 *    term stream.
 *  - Both fields flow through the SAME posting-block builder; the
 *    field lives in the term key (`field:term`), which keeps the two
 *    dictionaries disjoint while sharing every downstream invariant
 *    (block encode, skip metadata, impacts).
 *  - Scoring is per-field BM25 with that FIELD's docCount, avgdl and
 *    df (not the collection's), then DisMax-combined per doc:
 *    max + tieBreaker * (sum - max).
 */
object MultiField {

  val TitleWords = 4

  /** Cross-field DisMax top-k over (title, body) for `qTerms`. */
  def dismaxTopK(spark: SparkSession, dir: String, qTerms: Seq[String],
                 tie: Double, k: Int, segSize: Long): DataFrame = {
    import spark.implicits._
    val stop = Analyzer.EnglishStopWords
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]

    // per-(doc, field) analysis — narrow, one pass; a field whose
    // tokens are all stop-filtered is absent for that doc (per-field
    // docCount semantics, as in the reference)
    val analyzed = corpus.flatMap { case (id, text) =>
      val title = text.split(' ').take(TitleWords).mkString(" ")
      Seq("title" -> title, "body" -> text).iterator.flatMap { case (f, ft) =>
        val a = Analyzer.analyze(ft, stop)
        if (a.dl == 0) Iterator.empty
        else Iterator.single(
          (id, f, a.dl, SmallFloat.intToByte4(a.dl).toInt & 0xff, a.terms))
      }
    }

    // per-FIELD collection stats (tiny agg, broadcast)
    val fstats: Map[String, (Long, Long)] = analyzed
      .map(t => (t._2, t._3.toLong)).toDF("field", "dl")
      .groupBy("field").agg(count(lit(1)).as("n"), sum("dl").as("sttf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // field-prefixed postings through the real block builder
    val inputs: Dataset[PostingInput] = analyzed.flatMap { case (id, f, _, nb, ts) =>
      ts.iterator.map(t => PostingInput(Indexer.segmentOf(id, segSize),
        f + ":" + t.term, id, t.tf, nb, Array.emptyIntArray))
    }
    val postings = Indexer.buildPostings(spark, inputs)
    val terms = Indexer.buildTerms(postings)

    // per-(field, term) idf from that field's df and docCount; K1/B and
    // the idf shape come from the spec's constants (LuceneSpec is the
    // single scoring source of truth — CLAUDE.md invariant)
    val k1 = graft.spec.LuceneSpec.K1d
    val b = graft.spec.LuceneSpec.Bd
    val qf = for (f <- Seq("title", "body"); t <- qTerms.distinct) yield f + ":" + t
    val idf: Map[String, Double] = terms.filter(col("term").isin(qf: _*))
      .groupBy("term").agg(sum("df").as("df")).collect()
      .map { r =>
        val ft = r.getString(0); val df = r.getLong(1)
        val n = fstats(ft.substring(0, ft.indexOf(':')))._1
        ft -> math.log(1d + (n - df + 0.5) / (df + 0.5))
      }.toMap
    val avgdl: Map[String, Double] =
      fstats.map { case (f, (n, sttf)) => f -> sttf.toDouble / n }
    val bcIdf = spark.sparkContext.broadcast(idf)
    val bcAvg = spark.sparkContext.broadcast(avgdl)

    val entries = postings.filter(col("term").isin(qf: _*)).as[PostingBlockRow]
      .flatMap { b =>
        val d = PostingCodec.decode(b.docs, b.freqs, b.norms)
        Iterator.tabulate(d.docIds.length)(i =>
          (d.docIds(i), b.term, d.freqs(i), SmallFloat.byte4ToInt(d.norms(i))))
      }
    entries.groupByKey(_._1).mapGroups { (docId, it) =>
      val rows = it.toArray.sortBy(_._2) // ascending field:term order
      val perField = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      rows.foreach { case (_, ft, tf, ldl) =>
        val f = ft.substring(0, ft.indexOf(':'))
        val s = bcIdf.value(ft) * tf /
          (tf + k1 * (1 - b + b * ldl / bcAvg.value(f)))
        perField.update(f, perField.getOrElse(f, 0.0) + s)
      }
      val scores = perField.values.toArray
      val mx = scores.max
      (docId, mx + tie * (scores.sum - mx))
    }.toDF("doc_id", "score")
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }
}
