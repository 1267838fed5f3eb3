package graft

import org.apache.spark.sql.functions.{broadcast, col, expr, lit}

class PhoneticSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("soundex: known answers incl. the H/W merge rule") {
    import graft.analysis.Phonetic.soundex
    assert(soundex("robert") == "r163")
    assert(soundex("rupert") == "r163")
    assert(soundex("ashcraft") == "a261") // h transparent: s,c merge
    assert(soundex("ashcroft") == "a261")
    assert(soundex("tymczak") == "t522")
    assert(soundex("pfister") == "p236") // p,f same class, merged
    assert(soundex("honeyman") == "h555")
    assert(soundex("jackson") == "j250")
    assert(soundex("a") == "a000")
    assert(soundex("hw") == "h000")
  }

  test("soundex: SQL expression equals the Scala mirror on vocab + edges") {
    import spark.implicits._
    val edges = Seq("robert", "rupert", "ashcraft", "tymczak", "pfister",
      "honeyman", "a", "hw", "who", "bbbb", "mississippi", "checkpoint",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbbbbbbbbbcccccccccccc")
    val vocab = graft.synth.CorpusSynth.corpus(spark, 500L, seed = 9L)
      .select("text").as[String].collect()
      .flatMap(_.split(' ')).filter(w => w.nonEmpty && w.forall(_.isLetter))
      .distinct.toSeq
    val words = (edges ++ vocab).distinct
    val got = words.toDF("w")
      .select(col("w"), expr(graft.analysis.Phonetic.soundexSql("w")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == graft.analysis.Phonetic.soundex(w), s"word '$w'")
    }
  }

  test("common terms: rare terms gate matching, common terms still score") {
    val dir = "/root/testdata/sf0.001"
    val v = IndexCache.documentsIndex(spark, dir)
    val hits = graft.search.MoreQueries
      .commonTermsTopK(spark, v, Seq("dup", "spark", "merge"), 0.1, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every hit contains the rare term 'dup'
    val dupDocs = graft.search.MoreQueries.matchingDocs(spark, v, Seq("dup"))
      .collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(dupDocs))
    // with the cutoff at 100% every term is "low" → plain conjunction
    val all = graft.search.MoreQueries
      .commonTermsTopK(spark, v, Seq("dup", "spark", "merge"), 1.0, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val conj = graft.search.ExactSearch
      .topK(spark, v, Seq("dup", "spark", "merge"), 1000,
        graft.search.DoubleOracle, minShouldMatch = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == conj)
  }

  test("ltr rerank: model order differs from BM25 order but uses only top-N docs") {
    val dir = "/root/testdata/sf0.001"
    val v = IndexCache.documentsIndex(spark, dir)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val base = graft.search.ExactSearch
      .topK(spark, v, Seq("spark", "join"), 50, graft.search.DoubleOracle)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reranked = graft.search.MoreQueries
      .ltrRerankTopK(spark, v, corpus, Seq("spark", "join"), "vector",
        50, 50, 0.6, 0.3, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reranked == base) // rerank is a permutation of the candidates
  }

  test("ltr feature logger: one raw vector per candidate, blend = rerank") {
    val dir = "/root/testdata/sf0.001"
    val v = IndexCache.documentsIndex(spark, dir)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val feats = graft.search.MoreQueries
      .ltrFeatureVectors(spark, v, corpus, Seq("spark", "join"), "vector", 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = graft.search.ExactSearch
      .topK(spark, v, Seq("spark", "join"), 50, graft.search.DoubleOracle)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(feats.map(_._1).toSet == base.keySet) // the candidate window
    for ((id, fs, _, fl) <- feats) {
      assert(fs == math.round(base(id) * 10000), s"f_score of doc $id")
      assert(fl == 0L || fl == 1L, s"f_flag of doc $id")
    }
    // blending the logged features with the model weights reproduces the
    // rerank head (quantization slack can only reorder near-ties, and
    // the sf0.001 head has none)
    val blend = feats.map { case (id, fs, flen, fl) =>
      (id, 0.6 * fs + 0.3 * flen + 0.5 * 10000 * fl) }
      .sortBy { case (id, m) => (-m, id) }.take(5).map(_._1).toSeq
    val rr = graft.search.MoreQueries
      .ltrRerankTopK(spark, v, corpus, Seq("spark", "join"), "vector",
        50, 5, 0.6, 0.3, 0.5)
      .collect().map(_.getLong(0)).toSeq
    assert(blend == rr)
  }

  test("additive-trees rerank = the ensemble applied to the logged features") {
    val dir = "/root/testdata/sf0.001"
    val v = IndexCache.documentsIndex(spark, dir)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val feats = graft.search.MoreQueries
      .ltrFeatureVectors(spark, v, corpus, Seq("spark", "join"), "vector", 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def model(fs: Long, fl: Long, ff: Long): Long =
      (if (fs <= 3650) 10L else if (ff == 1L) 40L else 25L) +
        (if (fl <= 13000) 5L else 15L) +
        (if (fs <= 3750) { if (fl <= 15000) 2L else 8L } else 20L)
    val want = feats.map { case (id, fs, fl, ff) => (id, model(fs, fl, ff)) }
      .sortBy { case (id, m) => (-m, id) }.take(10).toSeq
    val got = graft.search.MoreQueries
      .ltrTreesRerank(spark, v, corpus, Seq("spark", "join"), "vector",
        50, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("sharded top-k merge equals the single-index answer at every shard size") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{floor, row_number}
    val dir = "/root/testdata/sf0.001"
    val v = IndexCache.documentsIndex(spark, dir)
    val scored = graft.search.ExactSearch
      .scored(spark, v, Seq("spark", "join"), graft.search.DoubleOracle)
    val global = scored.orderBy(col("score").desc, col("doc_id").asc)
      .limit(10).select("doc_id").collect().map(_.getLong(0)).toSeq
    for (shardSize <- Seq(7L, 64L, 1000L)) {
      val w = Window.partitionBy("shard")
        .orderBy(col("score").desc, col("doc_id").asc)
      val merged = scored
        .withColumn("shard", floor(col("doc_id") / shardSize))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .orderBy(col("score").desc, col("doc_id").asc).limit(10)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(merged == global, s"shardSize=$shardSize")
    }
  }

  test("decontaminate: no benchmark docs in output; hits share an 8-gram") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TrainingData.decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.forall { case (id, n) => id % 29 != 0 && n >= 1 })
    // brute-force check one flagged doc: it really shares an 8-gram
    if (out.nonEmpty) {
      val id = out.head._1
      import spark.implicits._
      val texts = spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 29 === 0 || col("doc_id") === id)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      def grams(t: String) =
        t.split(' ').sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
      val g = grams(texts(id))
      assert(texts.filter(_._1 != id).values.exists(t => grams(t).intersect(g).nonEmpty))
    }
  }

  test("double metaphone: hand-derived vectors from the published rules") {
    import graft.analysis.DoubleMetaphone.encode
    assert(encode("spark") == ("sprk", "sprk"))
    assert(encode("phone") == ("fn", "fn"))      // PH → F
    assert(encode("shell") == ("xl", "xl"))      // SH → X, LL collapses
    assert(encode("knight") == ("nt", "nt"))     // silent KN-, silent -GH-
    assert(encode("thought") == ("0t", "tt"))    // TH → θ primary / T alt
    assert(encode("judge") == ("jj", "aj"))      // initial J alt A, DGE → J
    assert(encode("batch") == ("px", "px"))      // B → P, TCH → X
    assert(encode("query") == ("kr", "kr"))      // Q → K, final Y silent
    assert(encode("vector") == ("fktr", "fktr")) // V → F, hard C → K
    assert(encode("window") == ("ant", "fnt"))   // initial W+vowel A/F
    assert(encode("merge") == ("mrj", "mrk"))    // soft G: J / germanic K
    assert(encode("dumb") == ("tm", "tm"))       // final -MB silent B
    assert(encode("xavier") == ("sfr", "sfr"))   // initial X → S, V → F
    assert(encode("nation") == ("nxn", "nxn"))   // TION → X
  }

  test("double metaphone: codes cap at 4 and vowels code only at start") {
    import graft.analysis.DoubleMetaphone.primary
    assert(primary("alphabetical").length <= 4)
    assert(primary("order") == "artr")   // initial vowel → a
    assert(primary("stream") == "strm")  // interior vowels silent
  }
}
