package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Sanity + physical-plan checks for the Plane-B relational entries
  * (full value-level verification is the driver's DuckDB oracle; here we
  * check semantics on spot values and that the PLANS are the ones we
  * want at scale: broadcast where intended, pushed filters).
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("facet_range_other: buckets + before/after/between partition the table") {
    import spark.implicits._
    val (startC, endC, gapC) = (5000000L, 40000000L, 5000000L)
    val rows = Relational.facetRangeOther(spark, dir, startC, endC, gapC)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val prices = spark.read.parquet(s"$dir/orders.parquet")
      .select(round(col("o_totalprice") * 100).cast("long")).as[Long].collect()
    // the three `other` counts are exact
    assert(rows("before") == prices.count(_ < startC).toLong)
    assert(rows("after") == prices.count(_ >= endC).toLong)
    assert(rows("between") == prices.count(p => p >= startC && p < endC).toLong)
    // gap buckets partition `between`, and hardend clips them at end
    val buckets = rows.filter { case (k, _) =>
      k != "before" && k != "after" && k != "between" }
    assert(buckets.values.sum == rows("between"))
    assert(buckets.keys.map(_.toLong).forall(b => b >= startC && b < endC))
    buckets.foreach { case (b, n) =>
      val lo = b.toLong
      assert(n == prices.count(p => p >= lo && p < math.min(lo + gapC, endC)).toLong)
    }
  }

  test("facet_excl_tag: excluded counts partition independently of the selection") {
    import spark.implicits._
    val rows = SparkEntry.queries("facet_excl_tag")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hits = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"n_chars", $"text").as[(Long, Long, String)].collect()
      .filter(_._3.toLowerCase.split("\\s+").contains("hash"))
    assert(rows.nonEmpty && rows.map(_._2).sum == hits.length.toLong)
    rows.foreach { case (bucket, nEx, nSel) =>
      val inBucket = hits.filter(h => h._2 / 100 * 100 == bucket)
      assert(nEx == inBucket.length.toLong)
      assert(nSel == inBucket.count(h => h._2 >= 100 && h._2 <= 299).toLong)
      assert(nSel <= nEx)
    }
    // the tagged-filter exclusion must bite: some bucket keeps count
    // despite being entirely outside the selection range
    assert(rows.exists { case (_, nEx, nSel) => nSel == 0 && nEx > 0 })
  }

  test("geo_polygon: engine matches an independent ray-cast over raw keys") {
    import spark.implicits._
    val verts = graft.operators.Functions.PolygonVerts
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey".cast("long")).as[Long].collect()
    def inside(c: Long): Boolean = {
      val lat = (c % 180 - 90).toDouble + 0.5
      val lon = ((c * 7) % 360 - 180).toDouble + 0.5
      val n = verts.indices.count { i =>
        val (y1, x1) = verts(i); val (y2, x2) = verts((i + 1) % verts.length)
        ((y1 > lat) != (y2 > lat)) &&
          lon < (x2 - x1).toDouble * (lat - y1) / (y2 - y1).toDouble + x1
      }
      n % 2 == 1
    }
    val expect = keys.filter(inside).toSet
    val got = SparkEntry.queries("geo_polygon")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(expect.nonEmpty && got == expect)
    assert(expect.size < keys.length) // the polygon must exclude someone
  }

  test("group_query_topk: per-group top docs are the main query's ranking restricted to the group") {
    import spark.implicits._
    val rows = SparkEntry.queries("group_query_topk")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sc = graft.search.ExactSearch.scored(spark,
        IndexCache.documentsIndex(spark, dir), Seq("spark", "join"),
        graft.search.DoubleOracle)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def domain(t: String): Set[Long] =
      docs.filter(_._2.toLowerCase.split("\\s+").contains(t)).map(_._1).toSet
    for ((g, t) <- Seq("g_hash" -> "hash", "g_scan" -> "scan")) {
      val expect = sc.toSeq.filter { case (d, _) => domain(t)(d) }
        .sortBy { case (d, s) => (-s, d) }.take(3)
        .map { case (d, s) => (d, math.round(s * 10000)) }.toSet
      val got = rows.filter(_._1 == g).map(r => (r._2, r._3)).toSet
      assert(expect.nonEmpty && got == expect, s"group $g")
    }
  }

  test("facet_percentile: per-lang median equals exact in-memory interpolation") {
    import spark.implicits._
    val rows = Relational.facetPercentile(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val byLang = spark.read.parquet(s"$dir/documents.parquet")
      .select($"lang", $"n_chars".cast("long")).as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    assert(rows.keySet == byLang.keySet && rows.nonEmpty)
    byLang.foreach { case (l, xs) =>
      val h = (xs.length - 1) * 0.5
      val (lo, hi) = (xs(h.toInt), xs(math.ceil(h).toInt))
      val want = math.round((lo + (h - h.toInt) * (hi - lo)) * 10000)
      assert(rows(l)._1 == want && rows(l)._2 == xs.length.toLong, s"lang $l")
    }
  }

  test("suggest_context: weights are dfs within the context docs only") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)].collect()
    val dfAll = scala.collection.mutable.Map.empty[String, Int]
    val dfEn = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (_, t, lang) =>
      val terms = graft.analysis.Analyzer.tokenize(t).map(_.term).distinct
        .filter(_.startsWith("s"))
      terms.foreach { w =>
        dfAll(w) = dfAll.getOrElse(w, 0) + 1
        if (lang == "en") dfEn(w) = dfEn.getOrElse(w, 0) + 1
      }
    }
    val expect = dfEn.toSeq.sortBy { case (t, w) => (-w, t) }.take(8)
      .map { case (t, w) => (t, w.toLong) }.toList
    val got = SparkEntry.queries("suggest_context")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(expect.nonEmpty && got == expect)
    // the context must bite: some prefix term's context df < global df
    assert(dfEn.exists { case (t, w) => w < dfAll(t) })
  }

  test("rollup_agg matches brute force") {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .as[(String, String, Double, Double)].collect()
    val expect = li.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      (k._1, k._2, rows.map(_._3.toLong).sum,
        rows.map(r => math.round(r._4 * 100)).sum, rows.length.toLong)
    }.toSet
    val got = Relational.rollupAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect)
  }

  test("set ops: intersect/complement/unique consistent with each other") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val nCust = cust.count()
    val noOrders = Relational.complementKeys(spark, dir).count()
    val withOrders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(noOrders == nCust - withOrders)
    assert(Relational.uniqueDedup(spark, dir).count() <= nCust)
  }

  test("shortestPath: all shortest paths, BFS stops at first depth with hits") {
    import spark.implicits._
    // a->b->d (len 2), a->c->d (len 2), a->e->f->d (len 3, must not appear)
    val edges = Seq(("a","b"), ("a","c"), ("a","e"), ("b","d"), ("c","d"),
      ("e","f"), ("f","d")).toDF("src", "dst")
    val got = Relational.shortestPath(spark, edges, "a", "d", 5)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a->b->d", "a->c->d"))
    // unreachable target -> empty
    assert(Relational.shortestPath(spark, edges, "d", "a", 5).count() == 0)
    // depth cap respected
    assert(Relational.shortestPath(spark, edges, "a", "d", 1).count() == 0)
  }

  test("window_collapse returns one row per kept customer") {
    val df = Relational.windowCollapse(spark, dir)
    val n = df.count()
    assert(n == df.select("o_custkey").distinct().count())
  }

  test("hash_join_topk broadcasts the dimension side") {
    val plan = Relational.hashJoinTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("merge_join_agg plans a shuffle join (big-big), not a broadcast of the fact side") {
    val plan = Relational.mergeJoinAgg(spark, dir)
      .queryExecution.executedPlan.toString
    // small testdata may still broadcast under AQE thresholds; assert the
    // aggregate is partial+final (map-side combine) which is the
    // scale-critical property
    assert(plan.contains("HashAggregate"), plan.take(2000))
  }

  test("select_expr pushes the shipdate filter to the parquet scan") {
    val plan = Relational.selectExpr(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")
      || plan.contains("PushedFilters: [GreaterThanOrEqual(l_shipdate"), plan.take(3000))
  }

  test("facet_pivot cube contains the grand total") {
    val rows = Relational.facetPivot(spark, dir).collect()
    val all = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(all.getLong(2) == n)
  }

  test("stats_percentile equals exact in-memory median") {
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .select(round(col("o_totalprice") * 100).cast("long")).as[Long]
      .collect().sorted
    val n = cents.length
    val expect =
      if (n % 2 == 1) cents(n / 2).toDouble
      else (cents(n / 2 - 1) + cents(n / 2)) / 2.0
    val got = Relational.statsPercentile(spark, dir).head().getDouble(0)
    assert(got == expect)
  }

  test("asofJoin equals brute-force pair+argmax (sf0.001)") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val views = ev.filter(_._4 == "view")
    val expected = ev.filter(_._4 == "click").flatMap { c =>
      val prior = views.filter(v => v._3 == c._3 &&
        (v._2.before(c._2) || (v._2 == c._2 && v._1 < c._1)))
      if (prior.isEmpty) None
      // full-precision tie order: getTime is millis-only while the
      // engine's window orders by the microsecond timestamp
      else Some(c._1 -> prior.maxBy(v => (v._2.getTime, v._2.getNanos, v._1))._1)
    }.toMap
    val got = Relational.asofJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("graph query traverses the parent edge to the depth bound") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def reach(roots: Set[Long], maxDepth: Int): Map[Long, Int] = {
      var acc = roots.map(_ -> 0).toMap
      var frontier = roots
      for (d <- 1 to maxDepth) {
        frontier = ids.filter(id => frontier.contains(id / 10)) -- acc.keySet
        acc = acc ++ frontier.map(_ -> d)
      }
      acc
    }
    for (depth <- Seq(1, 2)) {
      val got = Relational.graphQuery(spark, dir, depth).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == reach(Set(1L, 2L), depth), s"maxDepth=$depth")
    }
  }
}
