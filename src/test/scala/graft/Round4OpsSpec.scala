package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force twins for the round-4 training-data / routing / math
  * additions: top-n-gram char fraction, soft dedup weights, compositeId
  * routing, diff() lag semantics.
  */
class Round4OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val texts: Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
  }

  test("top_ngram_frac equals brute-force per-doc 2-gram mode") {
    val expected = texts.flatMap { case (id, tx) =>
      val toks = tx.split(' ').toSeq.filter(_.nonEmpty)
      if (toks.size < 2) None
      else {
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        // max count, tie -> lexicographically smallest gram
        val (best, n) = counts.toSeq.minBy { case (g, c) => (-c, g) }
        val tc = toks.map(_.length).sum.toLong
        Some((id, best, n, 1000L * n * (best.length - 1) / tc))
      }
    }.map { case (id, g, n, f) => (id, (g, n, f)) }.toMap
    val got = SparkEntry.queries("top_ngram_frac")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // a repeated gram must exist somewhere or the mode rule is untested
    assert(expected.values.exists(_._2 > 1))
  }

  test("soft_dedup: weight = 1e6/clusterSize, exact dups share a cluster") {
    val byText = texts.groupBy(_._2)
    val expected = texts.map { case (id, tx) =>
      val n = byText(tx).size.toLong
      (id, (n, 1000000L / n))
    }.toMap
    val got = SparkEntry.queries("soft_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the driver corpus has no exact dups (every weight 1e6) — craft a
    // documents-shaped frame with a 3-copy cluster so the rule bites
    import spark.implicits._
    val crafted = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "x y z"), (5L, "p q"))
      .toDF("doc_id", "text")
    val m = graft.operators.TrainingData.softDedupWeightsOf(crafted)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == ((3L, 333333L))))
    assert(m(4L) == ((1L, 1000000L)) && m(5L) == ((1L, 1000000L)))
  }

  test("composite_routing: every route key lands on exactly one shard") {
    import spark.implicits._
    val got = SparkEntry.queries("composite_routing")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(got.map(_._2).sum == texts.size.toLong)
    // co-location: Σ per-shard distinct keys == global distinct keys
    val nKeys = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(got.map(_._3).sum == nKeys)
    // determinism across runs
    val again = SparkEntry.queries("composite_routing")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("Damerau-Levenshtein distance: known-answer vectors incl. transposition") {
    val d = graft.search.MoreQueries.dlDistance _
    assert(d("spark", "spark") == 0)
    assert(d("psark", "spark") == 1)   // one adjacent swap
    assert(d("ab", "ba") == 1)
    assert(d("kitten", "sitting") == 3)
    assert(d("merge", "merg") == 1)
    assert(d("ca", "abc") == 2)        // TRUE DL: swap then insert (OSA says 3)
    assert(d("a cat", "a abct") == 2)  // classic unrestricted-DL vector
    assert(d("", "abc") == 3 && d("abc", "") == 3)
    // DL never exceeds plain Levenshtein, and differs by at most the
    // number of transpositions — cross-check on random short strings
    val rnd = new scala.util.Random(5)
    def randW() = (1 to (rnd.nextInt(6) + 1)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 200).foreach { _ =>
      val (x, y) = (randW(), randW())
      val lev = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(x, y)
      assert(d(x, y) <= lev, s"DL($x,$y) > Levenshtein")
      assert(d(x, y) == d(y, x), s"DL not symmetric on ($x,$y)")
    }
  }

  test("fuzzy_transpose reaches the swapped term plain Levenshtein cannot") {
    val v = IndexCache.documentsIndex(spark, dir)
    val trans = graft.search.MoreQueries.fuzzyTransposeTerms(v, "psark", 1)
    val plain = graft.search.MoreQueries.fuzzyTerms(v, "psark", 1)
    assert(trans.contains("spark") && !plain.contains("spark"))
    // transpositions only ADD matches at the same maxEdits
    assert(plain.toSet.subsetOf(trans.toSet))
  }

  test("facet_relatedness equals brute-force per-bucket SKG z-score") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq
    val fg = rows.filter(_._3.split(' ').contains("spark")).map(_._1).toSet
    val bgn = rows.size.toDouble
    val fgn = fg.size.toDouble
    val expected = rows.groupBy(_._2).map { case (src, rs) =>
      val bg = rs.size.toDouble
      val f = rs.count(r => fg.contains(r._1)).toDouble
      val p = bg / bgn
      val z = (f - fgn * p) / math.sqrt(fgn * p * (1 - p))
      (src, (f.toLong, bg.toLong, math.round(z * 10000)))
    }
    val got = SparkEntry.queries("facet_relatedness")(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // both signs must occur or the affinity model is untested
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 0))
  }

  test("index_or_docvalues: doc set equals the conjunction under either lead") {
    import spark.implicits._
    val got = SparkEntry.queries("index_or_docvalues")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = texts.filter(_._2.split(' ').contains("spark")).map(_._1)
      .toSet.intersect(
        spark.read.parquet(s"$dir/documents.parquet")
          .where(col("n_chars").between(200L, 400L))
          .select("doc_id").as[Long].collect().toSet)
    assert(got.map(_._1).toSet == expected)
    // the lead is constant within a segment
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
  }

  test("highlight_multi_term: prefix-anchored best passages") {
    val rows = SparkEntry.queries("highlight_multi_term")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 5)
    rows.foreach { case (_, passage, score) =>
      // anchor token matches the prefix at a word boundary
      assert(passage.split(' ').head.startsWith("s"))
      assert(score >= 1001L) // ≥1 distinct term + ≥1 occurrence
    }
    // coverage scoring must bite: some passage covers >1 distinct s-term
    assert(rows.exists(_._3 >= 2000L))
  }

  test("atomic_inc: increments accumulate across generations") {
    val got = SparkEntry.queries("atomic_inc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val byDoc = texts.map { case (id, tx) =>
      (id, tx.split(' ').toSet) }.toMap
    got.foreach { case (id, base, value) =>
      val ts = byDoc(id)
      val exp = (if (ts("spark")) 5L else 0L) + (if (ts("merge")) 10L else 0L)
      assert(exp > 0 && value == base + exp)
    }
    // the accumulate rule must bite: some doc carries BOTH increments
    assert(got.exists { case (_, b, v) => v - b == 15L })
  }

  test("sharded_group_topk: two-phase protocol invariants") {
    val rows = SparkEntry.queries("sharded_group_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val groups = rows.map(_._1).distinct
    assert(groups.length == 2)
    groups.foreach { g =>
      val inG = rows.filter(_._1 == g).sortBy(_._2)
      assert(inG.map(_._2).toSeq == (1L to inG.length.toLong).toSeq)
      assert(inG.length <= 3)
      // within-group rank order is (score desc, doc_id asc)
      val pairs = inG.map(r => (-r._4, r._3)).toSeq
      assert(pairs == pairs.sorted)
    }
    // phase-2 shipping must have found at least a full first group
    assert(rows.count(_._2 == 1L) == 2)
  }

  test("bm25_params_topk: tuned k1/b shifts scores off the default curve") {
    val tuned = SparkEntry.queries("bm25_params_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dflt = SparkEntry.queries("bm25_topk_exact")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tuned.length == 10 && dflt.length == 10)
    // same query, different saturation/normalization -> different scores
    assert(tuned.toMap != dflt.toMap)
  }

  test("domain_blocklist: exactly the listed hosts are dropped") {
    val rows = SparkEntry.queries("domain_blocklist")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val blockedMods = Set(3L, 17L, 41L)
    rows.foreach { case (id, host, blocked) =>
      assert(host == s"example${id % 50}.com")
      assert((blocked == 1L) == blockedMods.contains(id % 50))
    }
    assert(rows.exists(_._3 == 1L) && rows.exists(_._3 == 0L))
  }

  test("bloom_url_filter: no false negatives; FPs appear at higher fill") {
    val rows = SparkEntry.queries("bloom_url_filter")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a Bloom filter NEVER misses a genuinely-seen key
    assert(rows.filter(_._3 == 1L).forall(_._2 == 1L))
    // seen-set-proportional sizing keeps fill ≈ 31% at every SF, so the
    // FP property is visible (and bounded) right here
    val fp = rows.count(r => r._2 == 1L && r._3 == 0L)
    val unseen = rows.count(_._3 == 0L)
    assert(fp > 0 && fp < unseen / 4, s"fp=$fp unseen=$unseen")
  }

  test("mixed_sim_dismax: Dirichlet body shifts scores off pure-BM25 dismax") {
    val mixed = SparkEntry.queries("mixed_sim_dismax")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pure = SparkEntry.queries("multifield_dismax")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mixed.size == 10 && pure.size == 10)
    assert(mixed != pure) // same query+tie, different body similarity
  }

  test("drill_rollup equals a direct one-level rollup") {
    import spark.implicits._
    val got = SparkEntry.queries("drill_rollup")(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect().toSeq
    val expected = direct.groupBy(_._2).map { case (lang, rs) =>
      (lang, (rs.size.toLong, rs.map(_._3).sum,
        rs.map(_._1 / 128).distinct.size.toLong))
    }
    assert(got == expected)
    // the two-level structure must be real: some lang spans >1 shard
    assert(got.values.exists(_._3 > 1))
  }

  test("hard_negatives: near-dup band excluded, ranks dense per anchor") {
    val rows = SparkEntry.queries("hard_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 < 950000L))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length.toLong).toSeq)
      assert(rs.length <= 5)
    }
  }

  test("leakage_split: group-wise split partitions docs, hosts never span") {
    val got = SparkEntry.queries("leakage_split")(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.values.map(_._1).sum == texts.size.toLong)
    // every split non-empty and hosts partition (50 distinct hosts total)
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.map(_._2).sum == 50L)
  }

  test("novelty_score equals brute-force corpus-unique 8-gram fraction") {
    // RAW split positions (empties kept) — shinglesDf/gramArray and the
    // oracle's lead-window both shingle the raw token array
    val grams = texts.map { case (id, tx) =>
      (id, tx.split(' ').toSeq.sliding(8)
        .filter(_.length == 8).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val df = grams.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val expected = grams.map { case (id, gs) =>
      val uniq = gs.count(g => df(g) == 1).toLong
      (id, (gs.size.toLong, uniq, 1000L * uniq / gs.size))
    }.toMap
    val got = SparkEntry.queries("novelty_score")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // both regimes must occur: fully-novel docs and shared-gram docs
    assert(expected.values.exists(_._3 == 1000L) &&
           expected.values.exists(_._3 < 1000L))
  }

  test("rank_feature_log: unbounded boost ranks differently than saturation") {
    val logB = SparkEntry.queries("rank_feature_log")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sat = SparkEntry.queries("rank_feature_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(logB.size == 10 && sat.size == 10)
    assert(logB != sat)
  }

  test("tv_tfidf equals brute-force tf/df on the requested doc range") {
    val occ = texts.flatMap { case (id, tx) =>
      tx.split(' ').filter(t => t.nonEmpty &&
        !graft.analysis.Analyzer.EnglishStopWords.contains(t)).map((id, _))
    }
    val df = occ.distinct.groupBy(_._2).view.mapValues(_.size.toLong)
    val expected = occ.filter(_._1 <= 4L)
      .groupBy(identity).map { case ((id, t), rs) =>
        ((id, t), (rs.size.toLong, 1000000L * rs.size / df(t))) }
    val got = SparkEntry.queries("tv_tfidf")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("stats_calcdistinct: sorted distinct sets per bucket") {
    import spark.implicits._
    val rows = SparkEntry.queries("stats_calcdistinct")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source").as[(String, String)].collect()
    rows.foreach { case (lang, n, vals) =>
      val expect = base.filter(_._1 == lang).map(_._2).distinct.sorted
      assert(n == expect.length.toLong)
      assert(vals == expect.mkString(","))
    }
  }

  test("range_field_query: relation flags equal brute-force interval logic") {
    import spark.implicits._
    val ranges = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
      .map { case (id, nc) => (id, nc, nc + 20L + id % 60L) }
    val (qlo, qhi) = (200L, 250L)
    val expected = ranges
      .filter { case (_, lo, hi) => lo <= qhi && hi >= qlo }
      .map { case (id, lo, hi) =>
        (id, (lo, hi, 1L,
          if (lo >= qlo && hi <= qhi) 1L else 0L,
          if (lo <= qlo && hi >= qhi) 1L else 0L))
      }.toMap
    val got = SparkEntry.queries("range_field_query")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // all three relations must occur in the corpus or the flags are dead
    assert(got.values.exists(_._4 == 1L))
    assert(got.values.exists(_._5 == 1L))
    assert(got.values.exists(v => v._4 == 0L && v._5 == 0L))
  }

  test("diff(vec, lag) equals brute-force lagged differences") {
    import spark.implicits._
    val vals = graft.operators.MathStreams.run(spark, dir,
      "let(a=search(events, q=\"event_type:view\", sort=\"event_id asc\", rows=50), " +
        "round(scalarMultiply(10000, col(a, value))))")
      .orderBy("ord").select("v").as[Long].collect().toSeq
    for (lagN <- Seq(1, 3)) {
      val got = graft.operators.MathStreams.run(spark, dir,
        "let(a=search(events, q=\"event_type:view\", sort=\"event_id asc\", rows=50), " +
          s"diff(round(scalarMultiply(10000, col(a, value))), $lagN))")
        .orderBy("ord").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = (lagN until vals.size).map(i =>
        ((i - lagN).toLong, vals(i) - vals(i - lagN)))
      assert(got == expected, s"lag=$lagN")
    }
  }
}
