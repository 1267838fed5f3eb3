package graft

/** DuckDB oracle twins for the `let`/`eval` math-stream entries
  * (`operators/MathStreams.scala`): the SAME exact-integer-moment
  * arithmetic — sums/min/max over integer-unit values (exact, order-free),
  * double math only on the exact aggregates — with every float expression
  * tree mirrored node for node, so results are bit-identical before
  * quantization.
  */
object MathOracles {

  /** shared describe tail over a CTE `vq(v BIGINT)` */
  private def describeTail: String =
    """m AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
      |             min(v) AS min_v, max(v) AS max_v,
      |             CAST(sum(v * v) AS BIGINT) AS sumsq,
      |             quantile_cont(v, 0.5) AS p50 FROM vq)
      |SELECT n, sum_v, min_v, max_v,
      |  CAST(round(CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE) * 10000) AS BIGINT) AS mean_q,
      |  CAST(round((CAST(n AS DOUBLE) * CAST(sumsq AS DOUBLE)
      |       - CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) * 10000) AS BIGINT) AS var_q,
      |  CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(sumsq AS DOUBLE)
      |       - CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) * 10000) AS BIGINT) AS stddev_q,
      |  CAST(round(p50 * 10000) AS BIGINT) AS p50_q
      |FROM m""".stripMargin

  val letDescribe: String =
    s"""WITH sub AS (SELECT value FROM events WHERE event_type = 'click'
       |            ORDER BY event_id ASC LIMIT 2000),
       |vq AS (SELECT CAST(round(value * 10000) AS BIGINT) AS v FROM sub),
       |$describeTail""".stripMargin

  val letScoreDescribe: String =
    s"""WITH ${OracleGen.bm25Ctes(Seq("spark", "join"))},
       |cand AS (SELECT score FROM sc ORDER BY score DESC, doc_id ASC LIMIT 100),
       |vq AS (SELECT CAST(round(score * 10000) AS BIGINT) AS v FROM cand),
       |$describeTail""".stripMargin

  val letRegress: String =
    """WITH sub AS (SELECT l_quantity, l_extendedprice FROM lineitem
      |             ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 3000),
      |vq AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
      |              CAST(round(l_extendedprice) AS BIGINT) AS y FROM sub),
      |m AS (SELECT count(*) AS n,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(y * y) AS BIGINT) AS syy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM vq),
      |e AS (SELECT n,
      |  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
      |  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
      |  CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |  CAST(n AS DOUBLE) AS nd FROM m)
      |SELECT n,
      |  CAST(round(num / denx * 10000) AS BIGINT) AS slope_q,
      |  CAST(round((syd - (num / denx) * sxd) / nd * 10000) AS BIGINT) AS intercept_q,
      |  CAST(round((num * num) / (denx * deny) * 1000000) AS BIGINT) AS r2_q,
      |  CAST(round(num / sqrt(denx * deny) * 1000000) AS BIGINT) AS corr_q
      |FROM e""".stripMargin

  val letHist: String =
    """WITH sub AS (SELECT value FROM events ORDER BY event_id ASC LIMIT 5000),
      |vq AS (SELECT CAST(round(value * 10000) AS BIGINT) AS v FROM sub),
      |m AS (SELECT min(v) AS vmin, max(v) AS vmax FROM vq)
      |SELECT CASE WHEN vmax = vmin THEN 0
      |       ELSE least(((v - vmin) * 10) // (vmax - vmin), 9) END AS bin,
      |       count(*) AS n
      |FROM vq, m GROUP BY 1""".stripMargin

  val letMovingAvg: String =
    """WITH sub AS (SELECT event_id, value FROM events WHERE event_type = 'view'
      |             ORDER BY event_id ASC LIMIT 200),
      |vq AS (SELECT row_number() OVER (ORDER BY event_id ASC) - 1 AS ord,
      |              CAST(round(value * 10000) AS BIGINT) AS v FROM sub),
      |w AS (SELECT ord, CAST(sum(v) OVER (ORDER BY ord ASC
      |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 7 AS ma
      |      FROM vq)
      |SELECT ord, CAST(round(ma * 100) AS BIGINT) AS ma_q FROM w WHERE ord >= 6""".stripMargin

  val letZscores: String =
    """WITH sub AS (SELECT o_orderkey, o_totalprice FROM orders
      |             WHERE o_orderstatus = 'F'
      |             ORDER BY o_orderkey ASC LIMIT 1000),
      |vq AS (SELECT row_number() OVER (ORDER BY o_orderkey ASC) - 1 AS ord,
      |              CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM sub),
      |m AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |             CAST(sum(v * v) AS BIGINT) AS sq FROM vq)
      |SELECT ord,
      |  CAST(round((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
      |       / sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
      |              - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      |              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) * 10000) AS BIGINT) AS z_q
      |FROM vq, m""".stripMargin

  val letDotCosine: String =
    """WITH sub AS (SELECT value, user_id FROM events WHERE event_type = 'click'
      |             ORDER BY event_id ASC LIMIT 2000),
      |vq AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,
      |              CAST(round(user_id) AS BIGINT) AS y FROM sub),
      |m AS (SELECT CAST(sum(x * y) AS BIGINT) AS sxy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(y * y) AS BIGINT) AS syy FROM vq)
      |SELECT sxy AS dot,
      |  CAST(round(CAST(sxy AS DOUBLE)
      |       / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
      |       * 1000000) AS BIGINT) AS cos_q
      |FROM m""".stripMargin

  val letCov: String =
    """WITH sub AS (SELECT value, user_id FROM events WHERE event_type = 'click'
      |             ORDER BY event_id ASC LIMIT 2000),
      |vq AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,
      |              CAST(round(user_id) AS BIGINT) AS y FROM sub),
      |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |             CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM vq)
      |SELECT n, CAST(round(
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) * 10000) AS BIGINT)
      |  AS cov_q
      |FROM m""".stripMargin

  val letConv: String =
    """WITH sa AS (SELECT event_id, value FROM events
      |            ORDER BY event_id ASC LIMIT 50),
      |va AS (SELECT row_number() OVER (ORDER BY event_id ASC) - 1 AS ia,
      |              CAST(round(value * 100) AS BIGINT) AS v FROM sa),
      |sb AS (SELECT event_id, user_id FROM events WHERE event_type = 'view'
      |       ORDER BY event_id ASC LIMIT 20),
      |vb AS (SELECT row_number() OVER (ORDER BY event_id ASC) - 1 AS ib,
      |              CAST(round(user_id) AS BIGINT) AS v FROM sb)
      |SELECT va.ia + vb.ib AS ord, CAST(sum(va.v * vb.v) AS BIGINT) AS v
      |FROM va, vb GROUP BY 1""".stripMargin

  val letCumsum: String =
    """WITH sub AS (SELECT event_id, value FROM events
      |             ORDER BY event_id ASC LIMIT 300),
      |vq AS (SELECT row_number() OVER (ORDER BY event_id ASC) - 1 AS ord,
      |              CAST(round(value * 100) AS BIGINT) AS v FROM sub),
      |d AS (SELECT ord - 1 AS ord, v - lag(v) OVER (ORDER BY ord ASC) AS dv
      |      FROM vq QUALIFY ord >= 1)
      |SELECT ord, CAST(sum(dv) OVER (ORDER BY ord ASC) AS BIGINT) AS v
      |FROM d""".stripMargin
}
