package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Plane-B relational/dataflow operators — the reference's genuine
 * relational algebra surface (SURVEY.md §2.5 Solr Streaming Expressions,
 * §2.6 Parallel SQL, §2.7 JSON Facets), re-expressed as one-line Catalyst
 * dataflows over the driver's TPC-H-ish tables. Each public method backs
 * one `SparkEntry.queries` entry with a DuckDB oracle
 * ([[graft.OracleGen]] relational section).
 *
 * Reference operators covered [8x solr/solrj/…/io/stream,
 * solr/core/…/search/facet]:
 * RollupStream, HashJoinStream/OuterHashJoinStream, InnerJoinStream
 * (merge join), FetchStream, CartesianProductStream (explode),
 * MergeStream (union), UniqueStream, IntersectStream, ComplementStream,
 * RankStream, HavingStream, SelectStream, FacetStream (terms/range/query
 * facets), StatsStream, TimeSeriesStream, pivot facets (cube),
 * CollapsingQParserPlugin (top-1 per group), percentile/hll metrics.
 *
 * Scale notes (100 TB target): dimension-side joins are explicitly
 * `broadcast()`; big-big joins shuffle on their equi-keys and rely on
 * AQE for skew; every aggregate is partial+final (map-side combine) by
 * construction; money sums are per-row-rounded integer cents so results
 * are associativity-independent (and float-compare-safe vs the oracle).
 */
object Relational {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact integer cents of a money double (per-row, order-independent). */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** price*(1-discount) as integer 1e-6 dollars: cents × remaining basis
    * points — pure integer arithmetic, so Spark and the DuckDB oracle
    * agree bit-for-bit (no half-way float rounding ties).
    */
  private def revMicros(price: org.apache.spark.sql.Column,
                        discount: org.apache.spark.sql.Column) =
    (cents(price) * (lit(10000L) - round(discount * 10000).cast("long")))
      .as("rev_u")

  /** RollupStream + metrics: sort/hash group-by aggregation. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n"))

  /** HashJoinStream with broadcast build side: top-10 orders joined to
    * their customer (dimension broadcast — no shuffle of the fact side).
    */
  def hashJoinTopK(s: SparkSession, dir: String): DataFrame = {
    val orders = tbl(s, dir, "orders")
    val customer = tbl(s, dir, "customer").select("c_custkey", "c_name")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** InnerJoinStream analog: big-big equi-join (Catalyst sort-merge) then
    * rollup — lineitem ⋈ orders on orderkey, revenue by order priority.
    */
  def mergeJoinAgg(s: SparkSession, dir: String): DataFrame = {
    // revenue in 1e-6 dollars via pure integer arithmetic
    // (cents × remaining basis points) — no float rounding ties
    val li = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), revMicros(col("l_extendedprice"), col("l_discount")))
    val o = tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("rev_u").as("revenue_u"))
  }

  /** FetchStream: enrich a small top-k result by id-lookup against a
    * dimension (broadcast join back — late materialization).
    */
  def lookupJoin(s: SparkSession, dir: String): DataFrame = {
    val top = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
    val part = tbl(s, dir, "part").select("p_partkey", "p_name")
    top.join(broadcast(part), top("l_partkey") === part("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_name", "price_cents")
  }

  /** As-of join — an operator Spark lacks natively (the brief's example
    * custom-operator class): attribute each click to the same user's
    * MOST RECENT prior view. NOT implemented as pair join + argmax (the
    * pair set explodes quadratically on active users); instead the two
    * event kinds are interleaved in ONE sorted window per user and the
    * last view id is carried forward — one shuffle on (user_id), linear
    * state, the shape that survives 100 TB. Tie rule (deterministic):
    * at equal timestamps a view precedes a click iff its event_id is
    * smaller; the oracle encodes the same rule.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .where(col("event_type").isin("click", "view"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastView = last(
      when(col("event_type") === "view", col("event_id")),
      ignoreNulls = true).over(w)
    ev.withColumn("view_id", lastView)
      .where(col("event_type") === "click" && col("view_id").isNotNull)
      .select(col("event_id").as("click_id"), col("view_id"))
  }

  /** CartesianProductStream: explode a multivalued field into rows. */
  def cartesianExplode(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .select(explode(split(col("p_type"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** MergeStream: union of two sorted streams (customers ∪ suppliers). */
  def unionMerge(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nationkey"), lit("cust").as("src"))
    val p = tbl(s, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("nationkey"), lit("supp").as("src"))
    c.unionAll(p).groupBy("nationkey", "src").agg(count(lit(1)).as("n"))
  }

  /** UniqueStream: DISTINCT on a key set. */
  def uniqueDedup(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()

  /** IntersectStream: keys present in both streams. */
  def intersectKeys(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").select(col("c_custkey").as("key"))
      .intersect(tbl(s, dir, "supplier").select(col("s_suppkey").as("key")))

  /** ComplementStream: customers with no orders (anti join). */
  def complementKeys(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").select("c_custkey")
      .join(tbl(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")

  /** RankStream: bounded top-N by comparator (TakeOrderedAndProject). */
  def rankTopK(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .select(col("c_custkey"), cents(col("c_acctbal")).as("acctbal_cents"))
      .orderBy(col("acctbal_cents").desc, col("c_custkey").asc)
      .limit(10)

  /** HavingStream: post-aggregation predicate. */
  def havingFilter(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).as("total_cents"), count(lit(1)).as("n"))
      .filter(col("total_cents") > 50000000L)

  /** SelectStream: projection + computed fields + filter. */
  def selectExpr(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1995-04-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        revMicros(col("l_extendedprice"), col("l_discount")))

  /** FacetStream terms facet: top-N buckets by count. */
  def facetTerms(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c_mktsegment").asc)
      .limit(5)

  /** Range facet / TimeSeriesStream: monthly order buckets. */
  def facetRange(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))

  /** JSON facet `numBuckets:true` + `allBuckets:true` [8x solr
    * .../search/facet/FacetField.java, FacetFieldProcessor's
    * `allBuckets` / `numBuckets` accumulators]: the limit-cut term
    * facet plus (a) the count of ALL buckets the limit hid and (b) the
    * aggregate over the whole domain regardless of the cut. Both ride
    * the SAME per-bucket hash-agg frame — the extras are one tiny
    * re-aggregate of the bucket frame, never a second scan.
    */
  def facetAllBuckets(s: SparkSession, dir: String): DataFrame = {
    val b = tbl(s, dir, "customer")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val stats = b.agg(count(lit(1)).as("num_buckets"),
      sum("n").as("all_count"))
    b.orderBy(col("n").desc, col("c_mktsegment").asc).limit(2)
      .crossJoin(broadcast(stats))
  }

  /** Range facet with the `other` buckets [8x solr/core .../handler/
    * component/RangeFacetProcessor.java; `facet.range.other=all`,
    * `facet.range.hardend`]: gap buckets over [start, end) plus the
    * before / after / between counts. ONE scan over the fact table:
    * every row maps to a label (its bucket's start, or before/after),
    * partial+final hash agg; `between` re-aggregates the already-tiny
    * bucket frame, never the data. hardend semantics: the range is
    * clipped at `end` exactly (the last bucket never overshoots), which
    * the label expression encodes by sending p >= end to `after`.
    * All arithmetic on integer cents so the oracle matches bit-for-bit.
    */
  def facetRangeOther(s: SparkSession, dir: String,
                      startC: Long, endC: Long, gapC: Long): DataFrame = {
    val p = cents(col("o_totalprice"))
    val label = when(p < startC, lit("before"))
      .when(p >= endC, lit("after"))
      .otherwise((lit(startC) + floor((p - startC) / gapC) * gapC)
        .cast("long").cast("string"))
    val base = tbl(s, dir, "orders")
      .groupBy(label.as("bucket")).agg(count(lit(1)).as("n"))
    val between = base
      .where(col("bucket") =!= "before" && col("bucket") =!= "after")
      .agg(sum("n").as("n"))
      .select(lit("between").as("bucket"), coalesce(col("n"), lit(0L)).as("n"))
    base.unionByName(between)
  }

  /** Nested subfacets (the JSON Facet API's bucket-in-bucket shape
    * [Solr search/facet/FacetField.java]): top-3 mktsegment buckets by
    * count, each carrying its own count plus a nested top-3 nations
    * sub-facet with a sum metric. ONE aggregation pass at the finest
    * grain, parent buckets derived by re-aggregation (partial+final —
    * exact, no refinement pass needed), child ranks via a window
    * PARTITIONED by the parent bucket.
    */
  def facetNested(s: SparkSession, dir: String): DataFrame = {
    val base = tbl(s, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("bal_cents"))
    // parent cut: tiny aggregated frame (one row per segment) → the
    // orderBy/limit is a TakeOrdered over ~#segments rows
    val topSegs = base.groupBy("c_mktsegment").agg(sum("n").as("seg_n"))
      .orderBy(col("seg_n").desc, col("c_mktsegment").asc).limit(3)
    val wNation = Window.partitionBy("c_mktsegment")
      .orderBy(col("n").desc, col("c_nationkey").asc)
    base.join(broadcast(topSegs), Seq("c_mktsegment"))
      .withColumn("rn", row_number().over(wNation))
      .where(col("rn") <= 3)
      .select(col("c_mktsegment"), col("seg_n"), col("c_nationkey"),
        col("n"), col("bal_cents"))
  }

  /** Query facet: arbitrary-predicate buckets in one pass. */
  def facetQuery(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").agg(
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
      sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_discounted"),
      sum(when(col("l_quantity") >= 30, 1L).otherwise(0L)).as("n_bulk"))

  /** Pivot facets ≈ cube: hierarchical cross-tab with ALL rollup rows. */
  def facetPivot(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))

  /** unique metric (exact distinct; the HLL variant is approx-only and
    * benchmarked without an oracle).
    */
  def facetUnique(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))

  /** HLL distinct (Spark HLL++; estimate — rows-only check). */
  def facetHll(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("n_parts_approx"))

  /** Stats component: min/max/sum/mean per field (exact, cents). */
  def statsComponent(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").agg(
      min(cents(col("o_totalprice"))).as("min_cents"),
      max(cents(col("o_totalprice"))).as("max_cents"),
      sum(cents(col("o_totalprice"))).as("sum_cents"),
      count(lit(1)).as("n"))

  /** percentile metric: exact interpolated median over integer cents
    * (Spark `percentile` == DuckDB `quantile_cont` semantics; the t-digest
    * approximate variant `percentile_approx` is benchmarked rows-only).
    */
  def statsPercentile(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .agg(percentile(cents(col("o_totalprice")), lit(0.5)).as("p50_cents"))

  /** JSON facet percentile agg INSIDE buckets [8x solr .../search/facet/
    * PercentileAgg.java]: median n_chars per lang bucket. The reference
    * merges per-shard t-digests; Catalyst's partial+final aggregate
    * carries the same per-bucket state and this exact variant is a
    * semantic improvement (like the facet-refinement note in SURVEY
    * §2.7) — the bucket dataflow is identical.
    */
  def facetPercentile(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy("lang")
      .agg(round(percentile(col("n_chars"), lit(0.5)) * 10000)
        .cast("long").as("p50_chars_q"),
        count(lit(1)).as("n"))

  /** Two-phase DISTRIBUTED result grouping [8x solr/core .../search/
    * grouping/distributed/ — TopGroupsShardRequestFactory,
    * SearchGroupShardResponseProcessor / TopGroupsShardResponseProcessor;
    * request params group.distributed.first / group.distributed.second]:
    *
    *   phase 1: every shard proposes its top `nGroups` groups ranked by
    *     the group's best doc score; the merger unions the proposals and
    *     keeps the global top `nGroups` (approximate exactly as the
    *     reference is — a shard that holds a group's best doc but does
    *     not PROPOSE the group cannot elect it).
    *   phase 2: every shard ships its top `perGroup` docs FOR THE
    *     SELECTED GROUPS ONLY (the shipped set is nGroups × perGroup ×
    *     #shards rows, never a shard's full hit set); the merger
    *     re-ranks per group.
    *
    * Shards are doc-range slices (the sharded_topk convention); the
    * per-shard cuts are rank windows partitioned by shard — the
    * WindowGroupLimit shape, no global sort anywhere before the final
    * tiny merge.
    */
  def shardedGroupTopK(s: SparkSession, dir: String,
                       terms: Seq[String], nGroups: Int,
                       perGroup: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = graft.IndexCache.documentsIndex(s, dir)
    val scored = graft.search.ExactSearch
      .scored(s, v, terms, graft.search.DoubleOracle)
      .withColumn("shard", floor(col("doc_id") / 128).cast("long"))
    val meta = tbl(s, dir, "documents").select(col("doc_id"), col("source"))
    val sg = scored.join(meta, Seq("doc_id"))
    // phase 1: per-shard group proposals
    val gBest = sg.groupBy("shard", "source").agg(max("score").as("gmax"))
    val w1 = Window.partitionBy("shard")
      .orderBy(col("gmax").desc, col("source").asc)
    val proposals = gBest.withColumn("r", row_number().over(w1))
      .where(col("r") <= nGroups)
    val selected = proposals.groupBy("source").agg(max("gmax").as("gmax"))
      .orderBy(col("gmax").desc, col("source").asc).limit(nGroups)
      .select("source")
    // phase 2: per-shard per-group doc cut, then the global merge
    val w2 = Window.partitionBy("shard", "source")
      .orderBy(col("score").desc, col("doc_id").asc)
    val shipped = sg.join(broadcast(selected), Seq("source"))
      .withColumn("r", row_number().over(w2)).where(col("r") <= perGroup)
    val w3 = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id").asc)
    shipped.withColumn("grank", row_number().over(w3))
      .where(col("grank") <= perGroup)
      .select(col("source"), col("grank").cast("long").as("grank"),
        col("doc_id"),
        round(col("score") * 10000).cast("long").as("score_q"))
  }

  /** JSON facet `relatedness(fg, bg)` — the Semantic Knowledge Graph
    * aggregate [8x solr/core .../search/facet/RelatednessAgg.java; the
    * published scoring model is the z-score of Grainger, Aljadda,
    * Korayem & Smith 2016, "The Semantic Knowledge Graph" §III.C]:
    * for each bucket of the facet field, how strongly the bucket's doc
    * set is related to a FOREGROUND query set beyond chance,
    *
    *   p = bg_count / bg_size           (bucket's background rate)
    *   z = (fg_count − fg_size·p) / sqrt(fg_size·p·(1−p))
    *
    * — the significantTerms z-model applied per facet BUCKET instead of
    * per term. Foreground doc set = one pushed-filter posting decode
    * (never a corpus pass), broadcast into ONE conditional aggregate
    * over the bucket field; the bucket frame is facet-cardinality-sized.
    */
  def facetRelatedness(s: SparkSession, dir: String,
                       fgTerm: String = "spark"): DataFrame = {
    val fgDocs = docTermsFromIndex(s, dir, Some(col("term") === fgTerm))
      .select("doc_id")
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(broadcast(fgDocs.withColumn("is_fg", lit(1))),
        Seq("doc_id"), "left_outer")
    val agg = d.groupBy("source")
      .agg(count(lit(1)).as("bg_count"), count(col("is_fg")).as("fg_count"))
    // fg/bg sizes fall out of the SAME aggregate (every doc — and every
    // fg doc — lands in exactly one bucket), so the sizes are window
    // sums over the facet-cardinality-sized frame: no second corpus
    // scan, no second posting decode, no eager driver action
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val sized = agg
      .withColumn("bgn", sum("bg_count").over(all).cast("double"))
      .withColumn("fgn", sum("fg_count").over(all).cast("double"))
    val p = col("bg_count").cast("double") / col("bgn")
    val z = (col("fg_count").cast("double") - col("fgn") * p) /
      sqrt(col("fgn") * p * (lit(1.0) - p))
    sized.select(col("source"), col("fg_count"), col("bg_count"),
      round(z * lit(10000)).cast("long").as("relatedness_q"))
  }

  /** JSON facet bucket sort by a NESTED stat (`sort: {avg_chars: desc},
    * limit: 3` [8x solr/core .../search/facet/FacetField.java sort
    * handling]): buckets ordered by an aggregate computed inside each
    * bucket, not by count — the "top categories by average" query. The
    * mean is kept on the integer grid ((sum × 10⁴) div n) so bucket
    * order is a pure function of the data. One partial+final hash agg +
    * a k-bucket sort — the bucket frame is facet-cardinality-sized, so
    * the final sort is trivial at any corpus size.
    */
  def facetSortStat(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .select(col("lang"), col("n"),
        expr("(sum_chars * 10000) div n").as("avg_chars_q"))
      .orderBy(col("avg_chars_q").desc, col("lang").asc)
      .limit(3)

  /** CollapsingQParserPlugin: top-1 row per group (window collapse). */
  def windowCollapse(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    tbl(s, dir, "orders")
      // partition-key predicate applied BELOW the window: same result
      // (the window partitions by o_custkey), 10× less data shuffled
      .filter(col("o_custkey") % 10 === 0) // keep the dump small
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "price_cents")
  }

  /** ExpandComponent [8x solr handler/component/ExpandComponent.java]:
    * the companion of collapse ([[windowCollapse]]) — for each group in
    * the collapsed page, the next `expandRows` members EXCLUDING the
    * head, in the collapse sort order. Same single-window shape as the
    * collapse (partition-key filter below the window exchange).
    */
  def expandGroups(s: SparkSession, dir: String, expandRows: Int = 2): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    tbl(s, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") > 1 && col("rn") <= 1 + expandRows)
      .select("o_custkey", "o_orderkey", "price_cents", "rn")
  }

  /** TimeSeriesStream over the events table: tumbling 1-day windows. */
  def timeSeries(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(date_format(window(col("ts"), "1 day").getField("start"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))

  /** Date-math range facet (facet.range on a date field with
    * start=NOW/WEEK rounding and a calendar gap [8x solr
    * util/DateMathParser.java; range facets over TrieDate/
    * DatePointField]): buckets come from CALENDAR truncation (ISO
    * weeks here — month/year gaps are the same shape with unequal
    * widths), never arithmetic division of epoch time.
    */
  def facetRangeDatemath(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))

  /** significantTerms stream analog [Solr SignificantTermsQParserPlugin
    * / solrj io.stream SignificantTermsStream]: terms overrepresented
    * in a FOREGROUND doc set (docs matching `fgTerm`) vs the corpus
    * background. Significance here is the integer-exact lift
    * floor(10000 * (fg_df/fg_docs) / (bg_df/all_docs)) — a documented
    * re-derivation (Solr's own score is a different monotone blend);
    * per-shard counting + global merge is exactly the aggregate shape
    * below at scale.
    */
  /** Distinct (doc_id, term) presence pairs — the frame every
    * training-set op (significantTerms / featuresSelection / textLogit)
    * starts from. Decoded from the prebuilt inverted index's posting
    * blocks (docID streams only: freqs/norms/positions columns are
    * pruned at the parquet scan), NOT by re-tokenizing the raw corpus:
    * the reference computes these from the index too [8x
    * IGainTermsQParserPlugin, TermVectorsComponent]. The oracle's
    * string_split rule coincides with the index analyzer on this corpus
    * (space-separated lowercase words — OracleGen.tokCte), so the pair
    * set is identical; postings already hold each (term, doc) at most
    * once, so no distinct() shuffle is needed.
    *
    * `termFilter` (on col("term")) is applied to the BLOCK rows before
    * any decode — it reaches the (segment, term)-sorted parquet scan as
    * a pushed filter, so e.g. textLogit's 8 feature terms decode only 8
    * posting lists instead of the whole index.
    */
  /** Session-scoped cache of the FULL (doc_id, term) posting decode,
    * one per corpus dir: a dozen dictionary-routed entries (stemming,
    * filters, significant-terms, fingerprints) read exactly this
    * projection, so in one JVM (Verify + Bench run every entry) it is
    * decoded once and shared. Term-FILTERED calls bypass the cache on
    * purpose — their pushed term predicate prunes the parquet scan to a
    * few blocks, which is cheaper than filtering a materialized
    * corpus-wide frame (and at 100 TB the full frame is a table you
    * materialize deliberately, not per query).
    */
  private val docTermsCache = graft.SessionCache.frames()

  private[graft] def docTermsFromIndex(s: SparkSession, dir: String,
      termFilter: Option[Column] = None): DataFrame = {
    def decode(rows: DataFrame): DataFrame = {
      import s.implicits._
      rows
        .where(col("field") === graft.index.Indexer.Field)
        .select(col("term"), col("docs"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.flatMap { case (t, docs) =>
          graft.codec.VByte.decodeDeltas(docs).iterator.map(id => (id, t)) })
        .toDF("doc_id", "term")
    }
    termFilter match {
      case Some(f) =>
        decode(graft.IndexCache.documentsIndex(s, dir).postings.where(f).toDF())
      case None =>
        docTermsCache.getOrBuild(dir) {
          decode(graft.IndexCache.documentsIndex(s, dir).postings.toDF())
            .persist()
        }
    }
  }

  private def docTermsDistinct(s: SparkSession, dir: String): DataFrame =
    docTermsFromIndex(s, dir)

  /** AUDIT-ONLY lazy twin of [[significantTerms]]: the same dataflow
    * with placeholder corpus counts and no persist/localCheckpoint, so
    * ExplainDump can show the real plan (the production entry returns a
    * checkpointed tiny result whose plan is just an RDD scan). Never
    * use for results.
    */
  private[graft] def significantTermsPlan(s: SparkSession, dir: String,
      fgTerm: String = "spark", minDf: Long = 5L, k: Int = 20): DataFrame = {
    val fgDocs = docTermsFromIndex(s, dir, Some(col("term") === fgTerm))
      .select("doc_id")
    docTermsFromIndex(s, dir)
      .join(broadcast(fgDocs.withColumn("is_fg", lit(1))),
        Seq("doc_id"), "left_outer")
      .groupBy("term")
      .agg(count(lit(1)).as("bg_df"), count(col("is_fg")).as("fg_df"))
      .where(col("fg_df") >= minDf)
      .select(col("term"),
        floor(lit(10000.0) * col("fg_df") * lit(1000L) / (col("bg_df") * lit(100L)))
          .cast("long").as("lift_q"))
      .orderBy(col("lift_q").desc, col("term").asc)
      .limit(k)
  }

  def significantTerms(s: SparkSession, dir: String, fgTerm: String = "spark",
                       minDf: Long = 5L, k: Int = 20): DataFrame = {
    val view = graft.IndexCache.documentsIndex(s, dir)
    // foreground docset: ONE term's posting list, a pushed-filter block
    // scan + decode — never a corpus pass. Tiny → broadcast into the join
    val fgDocs = docTermsFromIndex(s, dir, Some(col("term") === fgTerm))
      .select("doc_id").persist()
    // docs with ≥1 indexed term = tokf's distinct doc count, read from
    // the doc metadata table (no decode, no distinct shuffle)
    val nAll = view.docmeta.where(col("dl") > 0).count()
    val nFg = fgDocs.count()
    // foreground + background df in ONE aggregate pass over the decoded
    // postings (per-shard count + merge shape): tag rows with fg
    // membership, then count both in the same groupBy
    val merged = docTermsFromIndex(s, dir)
      .join(broadcast(fgDocs.withColumn("is_fg", lit(1))),
        Seq("doc_id"), "left_outer")
      .groupBy("term")
      .agg(count(lit(1)).as("bg_df"), count(col("is_fg")).as("fg_df"))
    val out = merged
      .where(col("fg_df") >= minDf)
      .select(col("term"),
        floor(lit(10000.0) * col("fg_df") * nAll / (col("bg_df") * nFg))
          .cast("long").as("lift_q"))
      .orderBy(col("lift_q").desc, col("term").asc)
      .limit(k)
      .localCheckpoint(true) // materialize the tiny result, then free
    fgDocs.unpersist()
    out
  }

  /** FeaturesSelectionStream analog [Solr solrj io/stream/
    * FeaturesSelectionStream.java, backed by IGainTermsQParserPlugin]:
    * per-term information gain of a binary outcome over the training
    * docs — IG(t) = H(C) − [P(t)·H(C|t) + P(¬t)·H(C|¬t)]. All inputs
    * are EXACT integer counts (per-class term df from one
    * distinct+aggregate pass — the same per-shard count+merge shape as
    * [[significantTerms]]); the gain is float64 from those integers and
    * the ranking uses the QUANTIZED gain so an ulp can never flip an
    * order the oracle disagrees with. Top-m features.
    */
  def featuresSelection(s: SparkSession, dir: String, m: Int = 20): DataFrame = {
    val docTerm = docTermsDistinct(s, dir)
    val lbl = tbl(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 2).as("y"))
    val tot = lbl.agg(count(lit(1)).as("n"), sum("y").as("np")).head()
    val n = tot.getLong(0)
    val nPos = tot.getLong(1)
    def h(a: Column, b: Column): Column = {
      val sSum = (a + b).cast("double")
      -(when(a > 0, (a.cast("double") / sSum) * log(a.cast("double") / sSum))
          .otherwise(lit(0.0)) +
        when(b > 0, (b.cast("double") / sSum) * log(b.cast("double") / sSum))
          .otherwise(lit(0.0)))
    }
    val counts = docTerm.join(lbl, Seq("doc_id"))
      .groupBy("term")
      .agg(count(lit(1)).as("nt"), sum("y").as("nt_pos"))
    val nt = col("nt")
    val ntp = col("nt_pos")
    val ig = h(lit(nPos), lit(n - nPos)) -
      ((nt.cast("double") / lit(n.toDouble)) * h(ntp, nt - ntp) +
        ((lit(n) - nt).cast("double") / lit(n.toDouble)) *
          h(lit(nPos) - ntp, lit(n - nPos) - (nt - ntp)))
    counts.select(col("term"), round(ig * 1e6).cast("long").as("ig_q"))
      .orderBy(col("ig_q").desc, col("term").asc)
      .limit(m)
  }

  /** Feature terms of the [[textLogit]] model (shared with the oracle). */
  val LogitFeatures: Seq[String] =
    Seq("spark", "join", "merge", "hash", "sort", "query", "filter", "vector")

  /** Gradient quantization scale: per-doc gradient contributions are
    * rounded to 1/2^24 so the cross-partition sum is EXACTLY associative
    * — the trained weights are a pure function of the data (never of
    * partitioning), and the DuckDB oracle replays the identical
    * arithmetic.
    */
  private val LogitQ: Double = (1 << 24).toDouble

  /** TextLogitStream analog [Solr solrj io/stream/TextLogitStream.java]:
    * distributed batch logistic regression over term-presence features.
    * Each iteration is ONE aggregate pass (the gradient — 9 integer
    * sums), the driver updates the tiny weight vector, iteration count
    * fixed. At scale this is the canonical iterate-over-the-corpus ML
    * shape: narrow feature scan + partial-aggregated gradient, nothing
    * proportional to the corpus ever reaches the driver.
    */
  def textLogit(s: SparkSession, dir: String,
                features: Seq[String] = LogitFeatures,
                iters: Int = 3, lr: Double = 0.5): DataFrame = {
    import s.implicits._
    // feature-term filter applied at the BLOCK level (pushed parquet
    // filter): only the |features| posting lists are ever decoded
    val docTerm = docTermsFromIndex(s, dir,
      Some(col("term").isin(features: _*)))
    val fcols = features.zipWithIndex.map { case (f, j) =>
      max(when(col("term") === f, 1).otherwise(0)).as(s"x$j") }
    val xs = docTerm.groupBy("doc_id").agg(fcols.head, fcols.tail: _*)
    val feat = tbl(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 2).as("y"))
      .join(xs, Seq("doc_id"), "left_outer")
      .na.fill(0)
      .persist()
    val n = feat.count()
    val w = Array.fill(features.size + 1)(0.0) // w(0) = intercept
    var t = 0
    while (t < iters) {
      val z = features.indices.foldLeft(lit(w(0)): Column) { (acc, j) =>
        acc + lit(w(j + 1)) * col(s"x$j").cast("double") }
      val eq = round((lit(1.0) / (lit(1.0) + exp(-z)) -
        col("y").cast("double")) * LogitQ).cast("long")
      val aggs = sum(eq).as("g0") +: features.indices.map(j =>
        sum(when(col(s"x$j") === 1, eq).otherwise(lit(0L))).as(s"g${j + 1}"))
      val row = feat.agg(aggs.head, aggs.tail: _*).head()
      var k = 0
      while (k < w.length) {
        w(k) = w(k) - lr * (row.getLong(k).toDouble / LogitQ) / n
        k += 1
      }
      t += 1
    }
    feat.unpersist()
    // half-away-from-zero, matching DuckDB round() (Java math.round is
    // half-toward-+inf and would differ on negative exact-.5 ties)
    def q6(x: Double): Long =
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong
      else -math.floor(-x * 1e6 + 0.5).toLong
    ("intercept" +: features).zip(w.map(q6)).toSeq
      .toDF("feature", "weight_q")
  }

  /** GatherNodes stream analog [Solr solrj io.graph GatherNodesStream]:
    * breadth-first node gathering across relations — 2 hops here:
    * seed customers → their orders → the parts on those orders.
    * Each hop is an equi-join + distinct (per-hop frontier), exactly
    * the stream's shuffle shape at scale.
    */
  def gatherNodes(s: SparkSession, dir: String): DataFrame = {
    val seeds = tbl(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING" && col("c_custkey") < 200)
      .select(col("c_custkey"))
    val hop1 = tbl(s, dir, "orders")
      .join(seeds, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).distinct()
    tbl(s, dir, "lineitem")
      .join(hop1, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_partkey").as("node")).distinct()
  }

  /** {!graph} query parser [8x solr/core .../search/join/
    * GraphQueryParser.java, GraphQuery.java]: iterative same-collection
    * traversal — start from the root query's doc set, repeatedly follow
    * from-field → to-field edges up to maxDepth, return every reachable
    * doc (here with its discovery depth, which makes the traversal
    * order hash-visible). The edge relation is the synthesized
    * containment hierarchy parent = doc_id div 10 (the corpus has no
    * native graph column). Each level is ONE equi-join against the
    * frontier + an anti-join against the accumulated set — the
    * reference's per-level docset expansion; levels are the only serial
    * dimension, like shortest_path/dedup_clusters.
    */
  def graphQuery(s: SparkSession, dir: String,
                 maxDepth: Int = 2): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), expr("doc_id div 10").as("parent"))
    var frontier = d.where(col("doc_id").isin(1L, 2L))
      .select(col("doc_id")).withColumn("depth", lit(0))
    var acc = frontier
    for (dep <- 1 to maxDepth) {
      frontier = d
        .join(frontier.select(col("doc_id").as("p")),
          col("parent") === col("p"), "left_semi")
        .select(col("doc_id")).withColumn("depth", lit(dep))
        .join(acc.select(col("doc_id").as("seen")),
          col("doc_id") === col("seen"), "left_anti")
      acc = acc.union(frontier)
    }
    acc.groupBy("doc_id").agg(min("depth").as("depth"))
  }

  /** ShortestPathStream analog [Solr solrj io.graph
    * ShortestPathStream]: iterative breadth-first search over an edge
    * relation, returning ALL shortest paths from `from` to `to` (as
    * `a->b->c` strings). Each level is one equi-join + anti-join
    * against the visited set — the stream's iterative-join shape; the
    * visited frontier keeps same-level alternatives so every shortest
    * path survives. Driver work per level is a scalar found-check.
    */
  def shortestPath(s: SparkSession, edges: DataFrame, from: String,
                   to: String, maxDepth: Int): DataFrame = {
    import s.implicits._
    // both the frontier and the visited set are persisted PER LEVEL and
    // the previous level's caches dropped only after the new level is
    // materialized: a deep walk neither accumulates caches nor re-runs
    // earlier levels through unpersisted lineage
    var frontier = Seq((from, from)).toDF("node", "path")
    var visited = Seq(from).toDF("v_node").persist()
    var prevFrontier: Option[DataFrame] = None
    var lastNext: Option[DataFrame] = None
    var found: Option[DataFrame] = None
    var depth = 0
    while (found.isEmpty && depth < maxDepth) {
      // alias each level's edge scan so the repeated self-joins of the
      // iterative BFS stay unambiguous to the analyzer
      val lvlEdges = edges.select(col("src").as(s"src_$depth"),
        col("dst").as(s"dst_$depth"))
      val next = frontier.join(lvlEdges, col("node") === col(s"src_$depth"))
        .select(col(s"dst_$depth").as("node"),
          concat(col("path"), lit("->"), col(s"dst_$depth")).as("path"))
        .join(visited, col("node") === col("v_node"), "left_anti")
        .persist()
      val hits = next.where(col("node") === to)
      if (hits.limit(1).count() > 0) {
        // materialize the (tiny) answer eagerly so every cached level can
        // be dropped below — repeated calls leave no cache residue
        found = Some(hits.select("path").distinct().localCheckpoint(true))
        lastNext = Some(next)
      } else if (next.limit(1).count() == 0) {
        depth = maxDepth // exhausted
        lastNext = Some(next)
      } else {
        val newVisited = visited
          .union(next.select(col("node").as("v_node")).distinct()).distinct()
          .persist()
        newVisited.count() // materialize BEFORE dropping its inputs
        visited.unpersist()
        visited = newVisited
        prevFrontier.foreach(_.unpersist()) // next is cached; parent free
        prevFrontier = Some(next)
        frontier = next
        depth += 1
      }
    }
    // drop every still-cached level (answer already checkpointed);
    // unpersist is a no-op on frames that were never persisted
    visited.unpersist(); frontier.unpersist()
    prevFrontier.foreach(_.unpersist()); lastNext.foreach(_.unpersist())
    found.getOrElse(Seq.empty[String].toDF("path"))
  }

  /** The customer→order→part edge relation used by the graph entries
    * (namespaced node ids keep the tripartite node sets disjoint).
    */
  def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val co = tbl(s, dir, "orders").select(
      concat(lit("c:"), col("o_custkey")).as("src"),
      concat(lit("o:"), col("o_orderkey")).as("dst"))
    val op = tbl(s, dir, "lineitem").select(
      concat(lit("o:"), col("l_orderkey")).as("src"),
      concat(lit("p:"), col("l_partkey")).as("dst"))
    co.union(op)
  }

  /** ScoreNodesStream analog [Solr solrj io.graph ScoreNodesStream]:
    * rescore gathered nodes by tf-idf — a node reached often from the
    * seed set but globally common scores lower than one reached often
    * and globally rare. Here: gathered parts (freq = distinct seed
    * orders containing the part) weighted by ln(1 + N_orders/df);
    * integer-quantized for the oracle.
    */
  def scoreNodes(s: SparkSession, dir: String): DataFrame = {
    val seeds = tbl(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING" && col("c_custkey") < 200)
      .select(col("c_custkey"))
    val seedOrders = tbl(s, dir, "orders")
      .join(seeds, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).distinct()
    val li = tbl(s, dir, "lineitem")
    val gathered = li
      .join(seedOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_partkey").as("node"))
      .agg(countDistinct(col("l_orderkey")).as("freq"))
    val nOrders = li.select("l_orderkey").distinct().count()
    val df = li.groupBy(col("l_partkey").as("node"))
      .agg(countDistinct(col("l_orderkey")).as("df"))
    gathered.join(df, Seq("node"))
      .select(col("node"),
        floor(lit(10000.0) * col("freq") * log(lit(1.0) + lit(nOrders.toDouble) / col("df")))
          .cast("long").as("score_q"))
      .orderBy(col("score_q").desc, col("node").asc)
      .limit(20)
  }

  /** Heatmap facet [Solr facet.heatmap / HeatmapFacetCounter]: 2D
    * spatial grid counts over key-derived coordinates (same synthetic
    * lat/lon as [[Functions.geoDist]]) — one hash aggregation on the
    * (gridLat, gridLon) cell key, exactly the shape that scales (cells
    * are bounded by the grid resolution, not the row count; no skew
    * beyond real spatial density, which AQE splits).
    */
  def facetHeatmap(s: SparkSession, dir: String): DataFrame = {
    val (lat, lon) = Functions.synthLatLon
    tbl(s, dir, "customer")
      .select(floor(lat / 30).cast("long").as("cell_lat"),
        floor(lon / 30).cast("long").as("cell_lon"))
      .groupBy("cell_lat", "cell_lon").agg(count(lit(1)).as("n"))
  }

  /** Interval facets [Solr IntervalFacets / facet.interval]: counts for
    * explicitly configured intervals with per-end open/closed bounds
    * ((*,200], (200,400], (400,*)) — one pass, each row tested against
    * every interval (intervals may overlap in Solr; counts are
    * independent conditional sums, not a partition).
    */
  def facetInterval(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").agg(
      sum(when(col("n_chars") <= 200, 1L).otherwise(0L)).as("le_200"),
      sum(when(col("n_chars") > 200 && col("n_chars") <= 400, 1L)
        .otherwise(0L)).as("mid_200_400"),
      sum(when(col("n_chars") > 400, 1L).otherwise(0L)).as("gt_400"),
      sum(when(col("n_chars") >= 100 && col("n_chars") < 500, 1L)
        .otherwise(0L)).as("overlap_100_500"))

  /** Stats component variance surface [Solr StatsComponent sumOfSquares/
    * stddev]: EXACT integer moments — n, Σx, Σx², and the variance
    * numerator n·Σx² − (Σx)² (variance = num / (n·(n−1))) — the
    * shuffle-friendly one-pass shape (moments combine associatively
    * across partitions; no two-pass mean-centering), and integer-exact
    * so the oracle hash cannot wobble on float summation order.
    */
  def statsVariance(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("sum_qty"),
        sum(q * q).as("sumsq_qty"))
      .select(col("l_returnflag"), col("n"), col("sum_qty"), col("sumsq_qty"),
        (col("n") * col("sumsq_qty") - col("sum_qty") * col("sum_qty"))
          .as("var_num"))
  }

  /** §2.6 Parallel SQL surface: the engine accepts ANSI SQL directly —
    * Catalyst replaces the reference's Calcite layer wholesale.
    */
  def sqlSelect(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""SELECT o_orderpriority, count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
             FROM orders WHERE o_orderstatus = 'F'
             GROUP BY o_orderpriority""")
  }
}
