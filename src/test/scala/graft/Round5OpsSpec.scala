package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 hardening: expansion caps, the distributed Bloom build, and
  * the SessionCache fail-fast (round-4 VERDICT #2/#4/#5 + ADVICE).
  */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  // synth index whose dictionary (w0000..w1999) has hundreds of terms
  // within 2 edits of any wNNNN — big enough to exceed a 50-term cap
  lazy val synthView = {
    val v = index.Indexer.buildTables(spark,
      index.Indexer.asDocInput(spark,
        synth.CorpusSynth.corpusWithIds(spark, 1500, seed = 31L)),
      segSize = 256L).persisted()
    v.postings.count()
    v
  }

  test("fuzzy scored expansion is capped at maxExpansions, top-boost-first") {
    val query = "w0000"
    val uncapped = search.MoreQueries.fuzzyExpansion(
      synthView, query, 2, Int.MaxValue)
    assert(uncapped.size > search.MoreQueries.FuzzyMaxExpansions,
      s"fixture must exceed the cap (got ${uncapped.size})")
    val capped = search.MoreQueries.fuzzyExpansion(
      synthView, query, 2, search.MoreQueries.FuzzyMaxExpansions)
    assert(capped.size == search.MoreQueries.FuzzyMaxExpansions)
    // the cap keeps the HIGHEST-BOOST candidates (closest edits first,
    // the reference's TopTermsBlendedFreq queue), term tie-break
    def boost(t: String, ed: Int): Double =
      1.0 - ed.toDouble / math.min(t.length, query.length).toDouble
    val expected = uncapped.sortBy { case (t, _, ed) => (-boost(t, ed), t) }
      .take(search.MoreQueries.FuzzyMaxExpansions).toSet
    assert(capped.toSet == expected)
    // an exact/near match can never be evicted by high-df far edits
    assert(capped.exists(_._1 == query))
    // and the capped scored pass still returns a full top-k
    val topk = search.MoreQueries.fuzzyScoredTopK(
      spark, synthView, query, 2, 10).collect()
    assert(topk.length == 10)
  }

  test("BPE training dictionary is frequency-capped (shipped-vocab rule)") {
    val v = IndexCache.documentsIndex(spark, dir)
    val full = operators.TrainingData.bpeTrainDict(v, Int.MaxValue)
    // the cap keeps the top-by-ctf cut, deterministically tie-broken
    val top5 = operators.TrainingData.bpeTrainDict(v, 5)
    assert(top5.size == 5)
    val ctf = v.terms.where(col("field") === index.Indexer.Field)
      .groupBy("term").agg(sum("ctf").as("ctf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = full.sortBy(t => (-ctf(t), t)).take(5)
    assert(top5 == expected)
    // production cap doesn't bind at this scale: same merges as uncapped
    val capped = operators.TrainingData.bpeTrainDict(
      v, operators.TrainingData.BpeVocabCap)
    assert(capped.toSet == full.toSet)
  }

  test("distributed Bloom build is bit-for-bit the per-key position replay") {
    val rows = SparkEntry.queries("bloom_url_filter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // reference replay: collect the seen set HERE (test-side only) and
    // recompute every doc's k positions against the replayed bit set
    val seen = rows.filter(_._3 == 1L).map(_._1)
    val m = operators.TrainingData.bloomBitsFor(seen.length.toLong)
    val bits = seen.flatMap(id => operators.TrainingData.BloomHashes.map {
      case (a, b) => (id * a + b) % operators.TrainingData.BloomP % m
    }).toSet
    rows.foreach { case (id, inBloom, _) =>
      val expect = operators.TrainingData.BloomHashes.forall { case (a, b) =>
        bits((id * a + b) % operators.TrainingData.BloomP % m)
      }
      assert(inBloom == (if (expect) 1L else 0L), s"doc $id bloom mismatch")
    }
    // no false negatives; false positives exist at the 3/8 fill design
    assert(rows.filter(_._3 == 1L).forall(_._2 == 1L))
  }

  test("STC bigram frame: empty hit set yields an empty frame, not a crash") {
    val v = IndexCache.documentsIndex(spark, dir)
    val none = SparkEntry.hitBigramLabels(spark, v, "zzznosuchterm", 100)
    assert(none.collect().isEmpty)
    assert(none.columns.toSeq == Seq("doc_id", "label"))
    // and a real query produces hit-bounded rows
    val some = SparkEntry.hitBigramLabels(spark, v, "spark", 100)
    assert(some.select("doc_id").distinct().count() <= 100)
    assert(some.count() > 0)
  }

  test("Shapes: convexity, SAT separation, containment known answers") {
    import graft.search.Shapes._
    val q: Array[(Long, Long)] = Array(
      (300L, 300L), (700L, 280L), (760L, 600L), (520L, 760L), (280L, 620L))
    assert(isConvexCcw(q))
    assert(isConvexCcw(diamond(10, 10, 5, 7)))
    // small diamond well inside the pentagon: intersects + within
    assert(relations(diamond(520, 520, 20, 20), q) == ((1L, 1L, 0L)))
    // far-away diamond: fully disjoint
    assert(relations(diamond(50, 50, 10, 10), q) == ((0L, 0L, 0L)))
    // huge diamond engulfing the pentagon: intersects + contains
    assert(relations(diamond(520, 520, 985, 880), q) == ((1L, 0L, 1L)))
    // overlapping the pentagon's corner region: intersect, no containment
    assert(relations(diamond(280, 300, 30, 30), q) == ((1L, 0L, 0L)))
    // GENUINE single-point touch: diamond(270,300,30,30)'s right vertex
    // is exactly the pentagon vertex (300,300) and nothing else is
    // shared — pins the strictness convention (touch = intersect; a
    // `cross <= 0` separation rule would call this disjoint)
    assert(relations(diamond(270, 300, 30, 30), q) == ((1L, 0L, 0L)))
    assert(!separates(diamond(270, 300, 30, 30), q) &&
      !separates(q, diamond(270, 300, 30, 30)))
    // implications + a DISCRIMINATING lattice cross-check over the
    // entry construction: any 25-step lattice point inside both shapes
    // forces intersects=1, and intersects=0 forbids any shared point
    (0L until 1000L).foreach { id =>
      val p = diamond((id * 37) % 1000, (id * 73) % 1000,
        10 + (id % 40) * 25, 10 + (id % 30) * 30)
      val (i, wn, c) = relations(p, q)
      if (wn == 1L || c == 1L)
        assert(i == 1L, s"within/contains must imply intersects (id $id)")
      if (id < 300) {
        val common = (0L to 1000L by 25).exists(x =>
          (0L to 1000L by 25).exists { y =>
            val pt = Array((x, y))
            allInside(p, pt) && allInside(q, pt)
          })
        if (common) assert(i == 1L, s"shared lattice point but not intersecting (id $id)")
      }
    }
    // the corpus construction exercises all three relations (id 119
    // carries the engulfing diamond; small-extent ids sit inside)
    val rels = (0L until 1000L).map { id =>
      relations(diamond((id * 37) % 1000, (id * 73) % 1000,
        10 + (id % 40) * 25, 10 + (id % 30) * 30), q)
    }
    assert(rels.exists(_._1 == 1L) && rels.exists(_._2 == 1L) &&
      rels.exists(_._3 == 1L))
  }

  test("SessionCache: dead-session build fails fast instead of spinning") {
    val cache = new SessionCache[String](_ => false) // nothing is ever live
    val err = intercept[IllegalStateException] {
      cache.getOrBuild("k")("value")
    }
    assert(err.getMessage.contains("not live"))
    // a live cache still builds once and caches
    var builds = 0
    val ok = new SessionCache[String](_ => true)
    assert(ok.getOrBuild("k") { builds += 1; "v" } == "v")
    assert(ok.getOrBuild("k") { builds += 1; "v2" } == "v")
    assert(builds == 1)
  }
}
