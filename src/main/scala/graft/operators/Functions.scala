package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Solr scalar function-query surface (SURVEY.md §2.8) — representative
 * members of each family, as codegen'd Catalyst column expressions (no
 * UDFs):
 *
 *  - date math [8x solr/util/DateMathParser.java — `NOW/DAY+1DAY`,
 *    `/MONTH-1DAY` rounding/offset arithmetic]: month-end rounding and
 *    +NDAYS offsets over the orders dates.
 *  - strdist [Solr StrDistValueSource — Levenshtein variant].
 *  - geodist [Solr GeoDistValueSource / DistanceUtils — Haversine on
 *    the mean earth radius, km]. Coordinates are synthesized
 *    deterministically from the key so the DuckDB oracle can reproduce
 *    them bit-for-bit; distances are quantized to 10 m units.
 */
object Functions {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Date math: `o_orderdate/MONTH+1MONTH-1DAY` (month end) and
    * `+90DAYS` due date, plus the day count to month end.
    */
  def dateMath(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").select(
      col("o_orderkey"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      datediff(last_day(col("o_orderdate")), to_date(col("o_orderdate")))
        .cast("long").as("days_left"),
      date_format(date_add(to_date(col("o_orderdate")), 90), "yyyy-MM-dd")
        .as("due_90d"))

  /** strdist(c_name, fixed needle, edit) — Levenshtein. */
  def strDist(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .where(col("c_custkey") < 500)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000042"))
          .cast("long").as("dist"))

  /** Math function-query family (abs/sqrt/ln/mod/greatest — Solr
    * ValueSource one-liners), integer-quantized for the oracle.
    */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .where(col("o_orderkey") < 5000)
      .select(
        col("o_orderkey"),
        floor(sqrt(col("o_totalprice"))).cast("long").as("sqrt_floor"),
        round(log(col("o_totalprice")) * 10000).cast("long").as("ln_q"),
        (col("o_orderkey") % 7).cast("long").as("mod7"),
        greatest(col("o_orderkey") % 7, col("o_orderkey") % 5)
          .cast("long").as("gmax"))

  /** scale() function query [8x solr ValueSourceParser "scale",
    * lucene/queries .../function/valuesource/ScaleFloatFunction.java]:
    * maps a per-doc value into a target range using the GLOBAL min/max
    * of the source field — the reference computes those once per
    * searcher; here a tiny agg broadcast-joins back (the GlobalStats
    * pattern — the corpus is scanned once for the extremes, once for
    * the mapping, never collected). Output in integer micro-units of
    * the [0, 1] target via floor division, so the oracle matches
    * bit-for-bit with no float-rounding hazard.
    */
  def funcScale(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    val mm = d.agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    d.crossJoin(broadcast(mm))
      .select(col("doc_id"), expr(
        "CASE WHEN hi = lo THEN 0 ELSE (n_chars - lo) * 1000000 div (hi - lo) END")
        .cast("long").as("scaled_u"))
  }

  /** Mean earth radius used by the reference's DistanceUtils (km). */
  val EarthRadiusKm = 6371.0087714

  /** Key-derived synthetic (lat, lon) — ONE definition shared by
    * geodist, geofilt, and the heatmap facet (plus their DuckDB oracle
    * SQL, which restates the same arithmetic): changing the derivation
    * in one consumer but not the others would silently desynchronize
    * the geo entries from each other and their oracles.
    */
  private[operators] def synthLatLon: (Column, Column) = (
    (col("c_custkey") % 180 - 90).cast("double") + lit(0.5),
    ((col("c_custkey") * 7) % 360 - 180).cast("double") + lit(0.5))

  /** geodist to (0, 0) over key-derived coordinates, Haversine, 10 m
    * units.
    */
  def geoDist(s: SparkSession, dir: String): DataFrame = {
    val (lat, lon) = synthLatLon
    val a = pow(sin(radians(lat) / 2), 2) +
      cos(radians(lat)) * pow(sin(radians(lon) / 2), 2)
    val distKm = lit(2 * EarthRadiusKm) * asin(sqrt(a))
    tbl(s, dir, "customer")
      .where(col("c_custkey") < 500)
      .select(col("c_custkey"),
        round(distKm * 100).cast("long").as("dist_10m"))
  }

  /** geofilt [Solr {!geofilt} / Lucene LatLonPoint.newDistanceQuery]:
    * rows within `dKm` of the origin point. The filter compares the
    * QUANTIZED distance (10 m units, same rounding as [[geoDist]]), so
    * the boundary is integer-exact for the oracle. At scale the real
    * LatLonPoint plan prunes with a bounding box first; the lat-band
    * prefilter below is that analog — a sargable range predicate the
    * scan can push down before any trigonometry runs.
    */
  def geoFilter(s: SparkSession, dir: String, dKm: Double = 3000.0): DataFrame = {
    val latBandDeg = math.ceil(dKm / 111.0) // 1° latitude ≥ ~111 km
    geoDist(s, dir)
      .where(synthLatLon._1.between(-latBandDeg, latBandDeg))
      .where(col("dist_10m") <= (dKm * 100).toLong)
  }

  /** The fixed test polygon for [[geoPolygon]] — integer (lat, lon)
    * vertices, counter-clockwise; the synthetic points sit on the .5
    * grid so no point ever lies on a vertex latitude (the ray-cast
    * boundary case cannot occur).
    */
  private[graft] val PolygonVerts: Seq[(Int, Int)] =
    Seq((60, -120), (75, 40), (0, 150), (-65, 60), (-40, -130))

  /** Polygon query [Lucene LatLonPoint.newPolygonQuery / LatLonShape;
    * Solr spatial POLYGON filter]: even-odd ray casting against a fixed
    * polygon, evaluated as a narrow codegen'd column expression per row
    * (no join, no trig). The reference prunes candidates with the BKD
    * tree; here the polygon's bounding box goes first as two sargable
    * range predicates (parquet min/max pruning — the same role), and
    * the exact per-edge crossing test runs only on the box survivors.
    * The oracle replays the identical IEEE expression shape.
    */
  /** Even-odd ray-cast crossing count for one ring as a codegen'd
    * column expression — shared by [[geoPolygon]] and
    * [[geoPolygonHoles]] (and replayed IEEE-identically by the oracle).
    */
  private def ringCrossings(verts: Seq[(Int, Int)],
                            lat: Column, lon: Column): Column =
    verts.indices.map { i =>
      val (y1, x1) = verts(i)
      val (y2, x2) = verts((i + 1) % verts.length)
      when((lit(y1.toDouble) > lat) =!= (lit(y2.toDouble) > lat),
        when(lon < (lit((x2 - x1).toDouble) * (lat - lit(y1.toDouble))
          / lit((y2 - y1).toDouble)) + lit(x1.toDouble), 1).otherwise(0))
        .otherwise(0)
    }.reduce(_ + _)

  def geoPolygon(s: SparkSession, dir: String): DataFrame = {
    val (lat, lon) = synthLatLon
    val verts = PolygonVerts
    val crossings = ringCrossings(verts, lat, lon)
    val (minY, maxY) = (verts.map(_._1).min, verts.map(_._1).max)
    val (minX, maxX) = (verts.map(_._2).min, verts.map(_._2).max)
    tbl(s, dir, "customer")
      .where(lat.between(minY, maxY) && lon.between(minX, maxX))
      .where(crossings % 2 === 1)
      .select(col("c_custkey"))
  }

  /** The hole ring for [[geoPolygonHoles]] — a diamond strictly inside
    * [[PolygonVerts]]; integer vertices again so the .5-grid points
    * never sit on a vertex latitude.
    */
  private[graft] val HoleVerts: Seq[(Int, Int)] =
    Seq((30, 0), (0, 60), (-30, 0), (0, -60))

  /** Polygon query WITH HOLES [Lucene Polygon(holes…) / Polygon2D [8x
    * lucene/core/.../geo/Polygon.java, Polygon2D.java]; Solr polygons
    * accept interior rings]: contains = inside the outer ring AND NOT
    * inside any hole — two even-odd crossing counts over the same
    * point, still one narrow codegen'd predicate behind the outer
    * ring's sargable bbox (the BKD-prune role; the reference's
    * Polygon2D also tests holes only inside the outer bbox).
    */
  def geoPolygonHoles(s: SparkSession, dir: String): DataFrame = {
    val (lat, lon) = synthLatLon
    val outer = ringCrossings(PolygonVerts, lat, lon)
    val hole = ringCrossings(HoleVerts, lat, lon)
    val (minY, maxY) = (PolygonVerts.map(_._1).min, PolygonVerts.map(_._1).max)
    val (minX, maxX) = (PolygonVerts.map(_._2).min, PolygonVerts.map(_._2).max)
    tbl(s, dir, "customer")
      .where(lat.between(minY, maxY) && lon.between(minX, maxX))
      .where(outer % 2 === 1 && hole % 2 === 0)
      .select(col("c_custkey"))
  }

  /** Bounding-box query [Solr {!bbox} / Lucene LatLonPoint.newBoxQuery]:
    * two plain range predicates over the point coordinates — fully
    * sargable, pushed to the scan by Catalyst (the BKD-pruning analog;
    * no trigonometry on the filter path). Coordinates are the same
    * key-derived synth as [[geoDist]] (exact X.5 doubles — no boundary
    * float hazard).
    */
  def geoBbox(s: SparkSession, dir: String,
              latLo: Double, latHi: Double,
              lonLo: Double, lonHi: Double): DataFrame = {
    val (lat, lon) = synthLatLon
    tbl(s, dir, "customer")
      .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
      .where(col("lat").between(latLo, latHi) &&
        col("lon").between(lonLo, lonHi))
  }
}

/** DuckDB twins of [[Functions]]. */
object FunctionOracles {

  val dateMath: String =
    """SELECT o_orderkey,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE),
      |       last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_left,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d') AS due_90d
      |FROM orders""".stripMargin

  val mathFuncs: String =
    """SELECT o_orderkey,
      |  CAST(floor(sqrt(o_totalprice)) AS BIGINT) AS sqrt_floor,
      |  CAST(round(ln(o_totalprice) * 10000) AS BIGINT) AS ln_q,
      |  o_orderkey % 7 AS mod7,
      |  greatest(o_orderkey % 7, o_orderkey % 5) AS gmax
      |FROM orders WHERE o_orderkey < 5000""".stripMargin

  val strDist: String =
    """SELECT c_custkey,
      |  CAST(levenshtein(c_name, 'Customer#000000042') AS BIGINT) AS dist
      |FROM customer WHERE c_custkey < 500""".stripMargin

  val funcScale: String =
    """WITH mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents)
      |SELECT doc_id,
      |  CAST(CASE WHEN hi = lo THEN 0
      |            ELSE (n_chars - lo) * 1000000 // (hi - lo) END AS BIGINT)
      |    AS scaled_u
      |FROM documents, mm""".stripMargin

  val geoDist: String =
    s"""SELECT c_custkey,
       |  CAST(round(2 * ${Functions.EarthRadiusKm} * asin(sqrt(
       |    pow(sin(radians(c_custkey % 180 - 90 + 0.5) / 2), 2) +
       |    cos(radians(c_custkey % 180 - 90 + 0.5)) *
       |    pow(sin(radians((c_custkey * 7) % 360 - 180 + 0.5) / 2), 2)
       |  )) * 100) AS BIGINT) AS dist_10m
       |FROM customer WHERE c_custkey < 500""".stripMargin
}
