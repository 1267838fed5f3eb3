package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.codec.{PostingCodec, SmallFloat}

/** Input row of the indexer: dense global doc_id + analyzable text.
  * docIDs must be a pure function of the data (never of partition
  * scheduling) so results are identical at any parallelism
  * (SURVEY.md §7.5 #4).
  */
final case class DocInput(doc_id: Long, url: String, text: String)

/** One posting occurrence after document-local inversion (the analog of
  * the reference's per-thread in-RAM invert, DocumentsWriterPerThread
  * [8x index/DocumentsWriterPerThread.java]): term + tf + positions, plus
  * the doc's norm byte carried along so blocks embed norms without a join.
  */
final case class PostingInput(segment_id: Int, term: String, doc_id: Long,
                              tf: Int, norm_byte: Int, positions: Array[Int])

/** Columnar posting-block row — one row per ≤128-doc block of one
  * (segment, term) posting list (SURVEY.md §2.2: delta+VByte payloads,
  * skip metadata first/last_doc_id, block-max impact columns).
  */
final case class PostingBlockRow(
    segment_id: Int, field: String, term: String, block_id: Int,
    first_doc_id: Long, last_doc_id: Long, doc_count: Int,
    max_tf: Int, min_norm_len: Int, sum_tf: Long,
    docs: Array[Byte], freqs: Array[Byte], norms: Array[Byte],
    positions: Array[Byte])

final case class DocMetaRow(segment_id: Int, doc_id: Long, url: String,
                            dl: Int, norm_byte: Int, lossy_dl: Int)

/** The three segment tables of an index snapshot (SURVEY.md §1.1). */
final case class IndexView(postings: Dataset[PostingBlockRow],
                           terms: DataFrame,
                           docmeta: Dataset[DocMetaRow]) {
  def persisted(): IndexView = {
    IndexView(postings.persist(), terms.persist(), docmeta.persist())
  }
}

/**
 * Distributed inverted-index builder: Dataset pipeline of
 * flatMap-tokenize → repartition(segment, term) →
 * sortWithinPartitions(segment, term, docID) → delta+VByte block encode.
 *
 * Scale design (north rule): documents are sharded into doc-range
 * *segments* (the analog of Lucene segments / Solr shards); every
 * posting list is local to a segment, so even a stopword's list is
 * bounded by the segment size — doc-range sharding is the primary
 * term-skew control, with salted two-phase aggregation additionally
 * used for the global term-statistics aggregate (see salt usage in
 * [[GlobalStats]]). One wide shuffle builds all blocks; AQE handles
 * residual imbalance.
 */
object Indexer {
  val DefaultSegmentSize: Long = 1L << 16 // 65536 docs per segment

  val Field = "text"

  def segmentOf(docId: Long, segSize: Long): Int = (docId / segSize).toInt

  /** Document-local inversion: one narrow pass, no shuffle. */
  def invert(spark: SparkSession, corpus: Dataset[DocInput],
             segSize: Long, stopWords: Set[String]): Dataset[PostingInput] = {
    import spark.implicits._
    corpus.flatMap { d =>
      val a = Analyzer.analyze(d.text, stopWords)
      if (a.dl == 0) Iterator.empty
      else {
        val nb = SmallFloat.intToByte4(a.dl).toInt & 0xff
        val seg = segmentOf(d.doc_id, segSize)
        a.terms.iterator.map(t =>
          PostingInput(seg, t.term, d.doc_id, t.tf, nb, t.positions))
      }
    }
  }

  /** Per-doc metadata incl. the lossy norm (SmallFloat byte4). Docs whose
    * tokens are all stop-filtered carry no indexed terms and are excluded
    * (docCount semantics: docs with ≥1 indexed token).
    */
  def buildDocMeta(spark: SparkSession, corpus: Dataset[DocInput],
                   segSize: Long, stopWords: Set[String]): Dataset[DocMetaRow] = {
    import spark.implicits._
    corpus.flatMap { d =>
      val a = Analyzer.analyze(d.text, stopWords)
      if (a.dl == 0) Iterator.empty
      else {
        val nb = SmallFloat.intToByte4(a.dl).toInt & 0xff
        Iterator.single(DocMetaRow(segmentOf(d.doc_id, segSize), d.doc_id,
          d.url, a.dl, nb, SmallFloat.byte4ToInt(nb.toByte)))
      }
    }
  }

  /** The one wide stage: hash-repartition postings by (segment, term) and
    * sort within partitions by (segment, term, docID), then stream-encode
    * 128-doc blocks on group change. Per-group state is bounded by the
    * segment size, so no task can blow up on a hot term.
    */
  def buildPostings(spark: SparkSession, inverted: Dataset[PostingInput],
                    numPartitions: Int): Dataset[PostingBlockRow] = {
    import spark.implicits._
    val sorted = inverted
      .repartition(numPartitions, $"segment_id", $"term")
      .sortWithinPartitions($"segment_id", $"term", $"doc_id")
    sorted.mapPartitions { it =>
      new Iterator[PostingBlockRow] {
        private var pending: Iterator[PostingBlockRow] = Iterator.empty
        private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Byte, Array[Int])]
        private var curSeg = -1
        private var curTerm: String = null
        private var done = false

        private def flush(): Iterator[PostingBlockRow] = {
          if (buf.isEmpty) Iterator.empty
          else {
            val blocks = PostingCodec.encodeBlocks(buf.toArray)
            val (seg, term) = (curSeg, curTerm)
            buf.clear()
            blocks.iterator.map(b => PostingBlockRow(seg, Field, term,
              b.blockId, b.firstDocId, b.lastDocId, b.docCount, b.maxTf,
              b.minNormLen, b.sumTf, b.docs, b.freqs, b.norms, b.positions))
          }
        }

        private def advance(): Unit = {
          while (pending.isEmpty && !done) {
            if (it.hasNext) {
              val p = it.next()
              if (p.segment_id != curSeg || p.term != curTerm) {
                pending = flush()
                curSeg = p.segment_id; curTerm = p.term
              }
              buf += ((p.doc_id, p.tf, p.norm_byte.toByte, p.positions))
            } else {
              pending = flush()
              done = true
            }
          }
        }

        def hasNext: Boolean = { advance(); pending.hasNext }
        def next(): PostingBlockRow = { advance(); pending.next() }
      }
    }
  }

  /** Term dictionary: per (segment, term) stats derived from the (much
    * smaller) block table — the analog of the reference's .tim entries
    * [8x codecs/blocktree/BlockTreeTermsWriter.java].
    */
  def buildTerms(postings: Dataset[PostingBlockRow]): DataFrame = {
    postings.groupBy("segment_id", "field", "term")
      .agg(sum("doc_count").as("df"), sum("sum_tf").as("ctf"),
        count(lit(1)).as("n_blocks"))
  }

  /** Build all three segment tables in one pass structure. */
  def buildTables(spark: SparkSession, corpus: Dataset[DocInput],
                  segSize: Long = DefaultSegmentSize,
                  stopWords: Set[String] = Analyzer.EnglishStopWords,
                  numPartitions: Int = 0): IndexView = {
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val inverted = invert(spark, corpus, segSize, stopWords)
    val postings = buildPostings(spark, inverted, parts)
    val docmeta  = buildDocMeta(spark, corpus, segSize, stopWords)
    IndexView(postings, buildTerms(postings), docmeta)
  }

  /** Read a (doc_id, url, text) corpus DataFrame as Dataset[DocInput]. */
  def asDocInput(spark: SparkSession, df: DataFrame): Dataset[DocInput] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long").as("doc_id"),
      col("url").cast("string").as("url"),
      col("text").cast("string").as("text")).as[DocInput]
  }
}
