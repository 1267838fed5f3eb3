package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexView

/** Reverse search (percolation): a registry of STORED queries is matched
  * against a stream of documents — alerting / saved-search fan-out, the
  * reference's monitor module [8x `lucene/monitor/src/java/org/apache/
  * lucene/monitor/Monitor.java`, `QueryIndex.java`; formerly Luwak].
  *
  * The reference's scale trick is the *presearcher*: stored queries are
  * themselves indexed by their terms, so each incoming doc only
  * evaluates the few queries whose terms it contains. The Spark-first
  * analog inverts the same way: the query registry is a tiny broadcast
  * (term → query) table, the corpus side reads ONLY the union of the
  * registered queries' terms from the posting lists (one pushed `IN`
  * filter on the term dictionary — the presearcher's pruning, expressed
  * as partition/row-group pruning), and a count-equals-arity aggregate
  * evaluates every conjunction in ONE pass over those postings. No
  * per-query job, no full-corpus scan, at any registry size.
  */
object Monitor {

  /** The registered saved searches: (query_id, MUST terms, optional
    * MUST_NOT term). A literal constant shared with the DuckDB oracle.
    */
  val StoredQueries: Seq[(Long, Seq[String], Option[String])] = Seq(
    (0L, Seq("spark", "join"), None),
    (1L, Seq("merge", "scan"), None),
    (2L, Seq("hash", "table"), Some("slow")),
    (3L, Seq("window", "agg"), None),
    (4L, Seq("sort", "batch"), Some("fast")),
    (5L, Seq("vector", "dup"), None),
    (6L, Seq("key", "value", "row"), None),
    (7L, Seq("line", "spark", "table"), None))

  /** All (query_id, doc_id) matches of the registry against the indexed
    * corpus: MUST terms all present, MUST_NOT term absent.
    */
  def percolate(spark: SparkSession, view: IndexView): DataFrame = {
    import spark.implicits._
    val allTerms =
      StoredQueries.flatMap(q => q._2 ++ q._3.toSeq).distinct
    val docTerm = ExactSearch.decodedPostings(spark, view, allTerms)
      .select("doc_id", "term").distinct()
    val mustDf = StoredQueries
      .flatMap { case (qid, must, _) =>
        must.distinct.map(t => (qid, t, must.distinct.size)) }
      .toDF("query_id", "term", "arity")
    val exclDf = StoredQueries
      .flatMap { case (qid, _, ex) => ex.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val matched = docTerm.join(broadcast(mustDf), Seq("term"))
      .groupBy("query_id", "doc_id", "arity")
      .agg(count(lit(1)).as("n"))
      .where(col("n") === col("arity"))
      .select("query_id", "doc_id")
    val excluded = docTerm.join(broadcast(exclDf), Seq("term"))
      .select("query_id", "doc_id")
    matched.join(excluded, Seq("query_id", "doc_id"), "left_anti")
  }

  /** Registered exact-PHRASE queries: (query_id, phrase slots). The
    * monitor accepts arbitrary Lucene queries; [[StoredQueries]] covers
    * the conjunctive term clauses, this registry covers positional ones.
    * Shared literal constant with both oracle emitters below and with
    * the tagger dictionary (the Solr Tagger handler [8x solr/core .../
    * handler/tagger/TaggerRequestHandler.java, ex-SolrTextTagger] runs
    * the same dictionary-phrase matching, emitting occurrences instead
    * of a match bit).
    */
  val StoredPhrases: Seq[(Long, Seq[String])] = Seq(
    (0L, Seq("hash", "join")),
    (1L, Seq("merge", "scan")),
    (2L, Seq("key", "value")),
    (3L, Seq("window", "agg", "batch")))

  /** Per-(phrase, doc) exact-occurrence counts in ONE pass: the
    * registry broadcasts, the corpus side decodes positions for the
    * UNION of all registered slots' terms only (pushed In(term,…) — the
    * presearcher's pruning again), and each doc's tiny registry-term
    * position map evaluates every phrase locally. Per-doc state is
    * bounded by the registry terms' tfs, never the doc length; no
    * per-phrase job at any dictionary size.
    */
  def phraseOccurrences(spark: SparkSession, view: IndexView,
                        dict: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    val uniq = dict.flatMap(_._2).distinct
    val bc = spark.sparkContext.broadcast(dict)
    MoreQueries.positionalPostings(spark, view, uniq, Seq(uniq))
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        val pos = it.map(t => t._2 -> t._3).toMap
        bc.value.iterator.flatMap { case (qid, slots) =>
          if (!slots.forall(pos.contains)) None
          else {
            val n = pos(slots.head).count { p =>
              slots.zipWithIndex.drop(1).forall { case (t, i) =>
                java.util.Arrays.binarySearch(pos(t), p + i) >= 0 }
            }
            if (n > 0) Some((qid, docId, n)) else None
          }
        }
      }.toDF("query_id", "doc_id", "n_occ")
  }

  /** Phrase percolation: (query_id, doc_id) pairs where the stored
    * phrase occurs exactly.
    */
  def percolatePhrases(spark: SparkSession, view: IndexView): DataFrame =
    phraseOccurrences(spark, view, StoredPhrases)
      .select("query_id", "doc_id")

  /** Tagger handler: per-doc occurrence counts of every dictionary
    * phrase (the entity-tagging read of the same kernel).
    */
  def tagText(spark: SparkSession, view: IndexView): DataFrame =
    phraseOccurrences(spark, view, StoredPhrases)
      .select(col("doc_id"), col("query_id").as("tag_id"),
        col("n_occ").cast("long").as("n_occ"))

  /** Oracle twin of [[percolatePhrases]] / [[tagText]]: per-phrase
    * adjacency-chain EXISTS counts over the raw tokens, one UNION ALL
    * branch per registered phrase.
    */
  def phraseOccurrencesSql(withCounts: Boolean): String = {
    val branches = StoredPhrases.map { case (qid, slots) =>
      val joins = slots.zipWithIndex.drop(1).map { case (t, i) =>
        s"JOIN tokpos s$i ON s$i.doc_id = s0.doc_id AND s$i.term = '$t' AND s$i.pos = s0.pos + $i"
      }.mkString(" ")
      s"""SELECT CAST($qid AS BIGINT) AS query_id, s0.doc_id,
         |       count(*) AS n_occ
         |FROM tokpos s0 $joins
         |WHERE s0.term = '${slots.head}'
         |GROUP BY s0.doc_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    val cols =
      if (withCounts) "doc_id, query_id AS tag_id, n_occ"
      else "query_id, doc_id"
    s"""WITH lists AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
       |), tokpos AS (
       |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
       |  FROM lists
       |), occ AS (
       |$branches
       |)
       |SELECT $cols FROM occ""".stripMargin
  }

  /** The oracle twin: the same registry as literal VALUES rows. */
  def percolateSql(tokCte: String): String = {
    val mustRows = StoredQueries.flatMap { case (qid, must, _) =>
      must.distinct.map(t => s"($qid, '$t', ${must.distinct.size})") }
      .mkString(", ")
    val exclRows = StoredQueries.flatMap { case (qid, _, ex) =>
      ex.map(t => s"($qid, '$t')") }.mkString(", ")
    s"""WITH $tokCte, dterm AS (
       |  SELECT DISTINCT doc_id, term FROM tokf
       |), mq(query_id, term, arity) AS (VALUES $mustRows),
       |xq(query_id, term) AS (VALUES $exclRows),
       |hit AS (
       |  SELECT mq.query_id, d.doc_id
       |  FROM dterm d JOIN mq ON mq.term = d.term
       |  GROUP BY mq.query_id, d.doc_id, mq.arity
       |  HAVING count(*) = mq.arity
       |)
       |SELECT h.query_id, h.doc_id FROM hit h
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM xq JOIN dterm dx
       |    ON dx.term = xq.term AND dx.doc_id = h.doc_id
       |  WHERE xq.query_id = h.query_id)""".stripMargin
  }
}
