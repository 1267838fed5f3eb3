package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.codec.SmallFloat

/** Brute-force differentials for the round-4 scoring/integrity surfaces:
  * SweetSpotSimilarity, CombinedFieldQuery (BM25F), CheckIndex, and the
  * export-handler ordering invariants — each checked against an
  * independent driver-side computation over the raw sf0.001 corpus.
  */
class SimilaritySurfacesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def lossy(dl: Int): Int =
    SmallFloat.byte4ToInt(SmallFloat.intToByte4(dl))

  /** (doc_id, stop-filtered tokens). */
  private lazy val docs: Seq[(Long, Seq[String])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, tx) =>
        (id, tx.split(' ').toSeq
          .filter(t => t.nonEmpty && !Analyzer.EnglishStopWords.contains(t)))
      }
      .filter(_._2.nonEmpty)
  }

  test("sweetspot_topk equals brute-force plateau TF-IDF") {
    val qs = Seq("spark", "join")
    val n = docs.size.toDouble
    val df = qs.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val (min, max, steep) = (30, 60, 0.5)
    val expected = docs.map { case (id, ts) =>
      val ldl = lossy(ts.size).toDouble
      val ln = 1.0 / math.sqrt(
        steep * (math.abs(ldl - min) + math.abs(ldl - max) - (max - min)) + 1.0)
      val sc = qs.map { t =>
        val tf = ts.count(_ == t)
        if (tf == 0) 0.0
        else (math.log((n + 1.0) / (df(t) + 1.0)) + 1.0) * math.sqrt(tf.toDouble) * ln
      }.sum
      (id, math.round(sc * 10000))
    }.filter(_._2 != 0L)
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("sweetspot_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // the plateau must bite: both a norm-1 doc and a penalized doc rank
    val ldls = docs.map(d => lossy(d._2.size))
    assert(ldls.exists(l => l >= min && l <= max) &&
           ldls.exists(l => l < min || l > max))
  }

  test("combined_field_topk equals brute-force BM25F") {
    val qs = Seq("spark", "merge")
    val wTitle = 2.0
    // per-field streams: title = first 4 RAW tokens then stop filter
    val fielded: Seq[(Long, String, Seq[String])] = {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq
        .flatMap { case (id, tx) =>
          val raw = tx.split(' ').toSeq.filter(_.nonEmpty)
          val body = raw.filterNot(Analyzer.EnglishStopWords.contains)
          val title = raw.take(4).filterNot(Analyzer.EnglishStopWords.contains)
          Seq((id, "body", body), (id, "title", title)).filter(_._3.nonEmpty)
        }
    }
    val w = Map("body" -> 1.0, "title" -> wTitle)
    val byField = fielded.groupBy(_._2)
    val nDocs = byField.values.map(_.size).max.toDouble
    val sttf = byField.map { case (f, rows) =>
      w(f) * rows.map(_._3.size).sum }.sum
    val avgdl = sttf / nDocs
    val df = qs.map(t => t -> byField.values.flatten
      .groupBy(_._2).values.map(rows => rows.count(_._3.contains(t))).max
      .toDouble).toMap
    val clen = fielded.groupBy(_._1).map { case (id, rows) =>
      val wl = rows.map(r => w(r._2) * lossy(r._3.size)).sum
      (id, lossy(math.round(wl).toInt).toDouble)
    }
    val k1 = graft.spec.LuceneSpec.K1d
    val b = graft.spec.LuceneSpec.Bd
    val expected = fielded.groupBy(_._1).toSeq.map { case (id, rows) =>
      val sc = qs.map { t =>
        val tfc = rows.map(r => w(r._2) * r._3.count(_ == t)).sum
        if (tfc == 0.0) 0.0
        else {
          val idf = math.log(1d + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
          idf * tfc / (tfc + k1 * (1 - b + b * clen(id) / avgdl))
        }
      }.sum
      (id, math.round(sc * 10000))
    }.filter(_._2 != 0L)
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("combined_field_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("synonym_graph_query equals brute-force phrase-OR-term disjunction") {
    val n = docs.size.toDouble
    val sttf = docs.map(_._2.size.toLong).sum.toDouble
    val avgdl = sttf / n
    def df(t: String) = docs.count(_._2.contains(t)).toDouble
    def idf(t: String) = math.log(1d + (n - df(t) + 0.5) / (df(t) + 0.5))
    val w = idf("big") + idf("data")
    val expected = docs.map { case (id, ts) =>
      val ldl = lossy(ts.size).toDouble
      val den = (f: Double) => f + 1.2 * (1 - 0.75 + 0.75 * ldl / avgdl)
      val ptf = ts.sliding(2).count(_ == Seq("big", "data")).toDouble
      val tf = ts.count(_ == "spark").toDouble
      val ps = if (ptf == 0) 0.0 else w * ptf / den(ptf)
      val trm = if (tf == 0) 0.0 else idf("spark") * tf / den(tf)
      (id, math.round((ps + trm) * 10000))
    }.filter(_._2 != 0L).sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("synonym_graph_query")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // the graph must bite: the corpus has phrase-only AND term-only docs
    val hasPhrase = docs.filter(_._2.sliding(2).contains(Seq("big", "data")))
      .map(_._1).toSet
    val hasTerm = docs.filter(_._2.contains("spark")).map(_._1).toSet
    assert((hasPhrase -- hasTerm).nonEmpty && (hasTerm -- hasPhrase).nonEmpty)
  }

  test("check_index: OK on a fresh index, BROKEN on a tampered one") {
    val v = IndexCache.documentsIndex(spark, dir)
    val ok = graft.index.CheckIndex.report(v).collect()
    assert(ok.nonEmpty && ok.forall(_.getString(5) == "OK"))
    // tamper: drop one posting block row -> postings/dictionary diverge
    import spark.implicits._
    val first = v.postings
      .where(col("field") === graft.index.Indexer.Field).head()
    val tampered = graft.index.IndexView(
      v.postings.filter(p => !(p.term == first.term &&
        p.segment_id == first.segment_id && p.block_id == first.block_id)),
      v.terms, v.docmeta)
    val rep = graft.index.CheckIndex.report(tampered).collect()
      .map(r => (r.getLong(0), r.getString(5))).toMap
    assert(rep(first.segment_id.toLong) == "BROKEN")
    // untouched segments still report OK
    assert(rep.filterNot(_._1 == first.segment_id.toLong)
      .values.forall(_ == "OK"))
    // a segment ENTIRELY missing from one side table must surface as
    // BROKEN, not silently vanish from the report (full_outer joins —
    // round-4 ADVICE: the worst corruption class an integrity checker
    // exists to catch). Drop segment 0 from each side in turn.
    val seg0 = 0L
    val noDict = graft.index.IndexView(
      v.postings, v.terms.filter(col("segment_id") =!= 0), v.docmeta)
    val noMeta = graft.index.IndexView(
      v.postings, v.terms, v.docmeta.filter(d => d.segment_id != 0))
    val noPost = graft.index.IndexView(
      v.postings.filter(p => p.segment_id != 0), v.terms, v.docmeta)
    Seq(noDict, noMeta, noPost).foreach { broken =>
      val r2 = graft.index.CheckIndex.report(broken).collect()
        .map(r => (r.getLong(0), r.getString(5))).toMap
      assert(r2.get(seg0).contains("BROKEN"),
        s"missing-side segment must be reported BROKEN, got ${r2.get(seg0)}")
      assert(r2.filterNot(_._1 == seg0).values.forall(_ == "OK"))
    }
    // a legitimately EMPTY segment — docs whose text analyzes to zero
    // tokens: docmeta rows with dl=0, rightly NO dictionary/postings
    // rows — is a consistent index state and must report OK (all-zero
    // cross-checks), not BROKEN: empty != missing-with-nonzero-counterpart
    import spark.implicits._
    val emptyMeta = Seq(
      graft.index.DocMetaRow(999, 999000L, "u999", 0, 0, 0)).toDS()
    val withEmpty = graft.index.IndexView(
      v.postings, v.terms, v.docmeta.union(emptyMeta))
    val r3 = graft.index.CheckIndex.report(withEmpty).collect()
      .map(r => (r.getLong(0), r.getString(5))).toMap
    assert(r3.get(999L).contains("OK"),
      s"empty segment must be OK, got ${r3.get(999L)}")
    assert(r3.filterNot(_._1 == 999L).values.forall(_ == "OK"))
  }

  test("export_sorted: dense ranks in exact (n_chars desc, doc_id) order") {
    val rows = SparkEntry.queries("export_sorted")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong))
    val sorted = rows.map(r => (r._2, r._3)).toSeq
    assert(sorted == sorted.sortBy { case (id, nc) => (-nc, id) })
    // full export, not a top-k: every doc containing the term is present
    val expectedN = docs.count(_._2.contains("spark"))
    assert(rows.length == expectedN)
  }

  test("field_exists matches the brute-force non-null doc set") {
    import spark.implicits._
    val got = SparkEntry.queries("field_exists")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = orders.filter(_._3 > 350000.0)
      .groupBy(_._1).map { case (ck, rs) =>
        (ck, rs.map(_._2).max.take(4).toLong) }
    assert(got == expected)
    // the null side must be non-trivial: some customers have no value
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(got.size < nCust)
  }
}
