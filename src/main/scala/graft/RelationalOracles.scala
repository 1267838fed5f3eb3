package graft

/** DuckDB oracle SQL for the Plane-B relational entries
  * ([[graft.operators.Relational]]). Money is per-row-rounded to integer
  * cents (`CAST(round(x*100) AS BIGINT)`) before summing in BOTH engines,
  * so aggregate results are exact integers independent of summation
  * order; revenue uses pure integer cents×basis-points ("rev_u", 1e-6
  * dollars) to avoid half-way float rounding ties.
  */
object RelationalOracles {

  private val centsP = "CAST(round(o_totalprice * 100) AS BIGINT)"
  private val revU =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))"

  val rollupAgg: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  val hashJoinTopK: String =
    s"""SELECT o_orderkey, c_name, $centsP AS price_cents
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |ORDER BY price_cents DESC, o_orderkey ASC LIMIT 10""".stripMargin

  val mergeJoinAgg: String =
    s"""SELECT o_orderpriority, count(*) AS n, CAST(sum($revU) AS BIGINT) AS revenue_u
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin

  val lookupJoin: String =
    """WITH top AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
      |  FROM lineitem
      |  ORDER BY price_cents DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10)
      |SELECT l_orderkey, l_linenumber, p_name, price_cents
      |FROM top JOIN part ON l_partkey = p_partkey""".stripMargin

  val cartesianExplode: String =
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
      |GROUP BY word""".stripMargin

  val unionMerge: String =
    """SELECT nationkey, src, count(*) AS n FROM (
      |  SELECT CAST(c_nationkey AS INTEGER) AS nationkey, 'cust' AS src FROM customer
      |  UNION ALL
      |  SELECT CAST(s_nationkey AS INTEGER) AS nationkey, 'supp' AS src FROM supplier)
      |GROUP BY nationkey, src""".stripMargin

  val uniqueDedup: String =
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

  val intersectKeys: String =
    """SELECT c_custkey AS key FROM customer
      |INTERSECT
      |SELECT s_suppkey AS key FROM supplier""".stripMargin

  val complementKeys: String =
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  val rankTopK: String =
    """SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
      |FROM customer ORDER BY acctbal_cents DESC, c_custkey ASC LIMIT 10""".stripMargin

  val havingFilter: String =
    s"""SELECT o_custkey, CAST(sum($centsP) AS BIGINT) AS total_cents, count(*) AS n
       |FROM orders GROUP BY o_custkey HAVING sum($centsP) > 50000000""".stripMargin

  val selectExpr: String =
    s"""SELECT l_orderkey, l_linenumber, $revU AS rev_u
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
       |  AND l_shipdate <  TIMESTAMP '1995-04-01'""".stripMargin

  val facetTerms: String =
    """SELECT c_mktsegment, count(*) AS n FROM customer
      |GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment ASC LIMIT 5""".stripMargin

  val facetAllBuckets: String =
    """WITH b AS (
      |  SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1
      |), st AS (
      |  SELECT count(*) AS num_buckets, CAST(sum(n) AS BIGINT) AS all_count
      |  FROM b
      |)
      |SELECT b.c_mktsegment, b.n, st.num_buckets, st.all_count
      |FROM b CROSS JOIN st
      |ORDER BY b.n DESC, b.c_mktsegment ASC LIMIT 2""".stripMargin

  val facetRange: String =
    s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       |  count(*) AS n, CAST(sum($centsP) AS BIGINT) AS total_cents
       |FROM orders GROUP BY 1""".stripMargin

  /** facet.range other=all + hardend: the same label CASE as the
    * engine, integer-cents arithmetic (`//` = floor division on
    * BIGINT, exact for the positive prices).
    */
  def facetRangeOther(startC: Long, endC: Long, gapC: Long): String =
    s"""WITH lab AS (
       |  SELECT CASE WHEN $centsP < $startC THEN 'before'
       |              WHEN $centsP >= $endC THEN 'after'
       |              ELSE CAST($startC + (($centsP - $startC) // $gapC) * $gapC AS VARCHAR)
       |         END AS bucket
       |  FROM orders
       |), base AS (SELECT bucket, count(*) AS n FROM lab GROUP BY 1)
       |SELECT bucket, n FROM base
       |UNION ALL
       |SELECT 'between' AS bucket, CAST(coalesce(sum(n), 0) AS BIGINT) AS n
       |FROM base WHERE bucket NOT IN ('before', 'after')""".stripMargin

  val facetNested: String =
    """WITH base AS (
      |  SELECT c_mktsegment, c_nationkey, count(*) AS n,
      |    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      |  FROM customer GROUP BY c_mktsegment, c_nationkey
      |), seg AS (
      |  SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS seg_n FROM base
      |  GROUP BY c_mktsegment ORDER BY seg_n DESC, c_mktsegment ASC LIMIT 3
      |)
      |SELECT b.c_mktsegment, seg.seg_n, b.c_nationkey, b.n, b.bal_cents
      |FROM base b JOIN seg USING (c_mktsegment)
      |QUALIFY row_number() OVER (
      |  PARTITION BY b.c_mktsegment ORDER BY b.n DESC, b.c_nationkey ASC) <= 3""".stripMargin

  val facetQuery: String =
    """SELECT
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
      |  CAST(sum(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
      |FROM lineitem""".stripMargin

  val facetPivot: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  val facetHeatmap: String =
    """SELECT
      |  CAST(floor(((c_custkey % 180 - 90) + 0.5) / 30) AS BIGINT) AS cell_lat,
      |  CAST(floor((((c_custkey * 7) % 360 - 180) + 0.5) / 30) AS BIGINT) AS cell_lon,
      |  count(*) AS n
      |FROM customer GROUP BY 1, 2""".stripMargin

  val facetInterval: String =
    """SELECT
      |  CAST(sum(CASE WHEN n_chars <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS le_200,
      |  CAST(sum(CASE WHEN n_chars > 200 AND n_chars <= 400 THEN 1 ELSE 0 END) AS BIGINT) AS mid_200_400,
      |  CAST(sum(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS BIGINT) AS gt_400,
      |  CAST(sum(CASE WHEN n_chars >= 100 AND n_chars < 500 THEN 1 ELSE 0 END) AS BIGINT) AS overlap_100_500
      |FROM documents""".stripMargin

  val facetUnique: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val statsComponent: String =
    s"""SELECT min($centsP) AS min_cents, max($centsP) AS max_cents,
       |  CAST(sum($centsP) AS BIGINT) AS sum_cents, count(*) AS n FROM orders""".stripMargin

  val statsPercentile: String =
    s"SELECT quantile_cont($centsP, 0.5) AS p50_cents FROM orders"

  val windowCollapse: String =
    """SELECT o_custkey, o_orderkey, price_cents FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn = 1 AND o_custkey % 10 = 0""".stripMargin

  val expandGroups: String =
    """SELECT o_custkey, o_orderkey, price_cents, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC) AS BIGINT) AS rn
      |  FROM orders WHERE o_custkey % 10 = 0)
      |WHERE rn BETWEEN 2 AND 3""".stripMargin

  val timeSeries: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
      |  count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1, 2""".stripMargin

  val facetRangeDatemath: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1""".stripMargin

  val sqlSelect: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority""".stripMargin
}
