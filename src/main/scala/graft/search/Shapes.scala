package graft.search

/** Indexed-shape relations — the LatLonShape polygon-vs-polygon query
  * family [8x lucene/core .../document/LatLonShape.java,
  * LatLonShapeBoundingBoxQuery / ShapeQuery `QueryRelation`
  * INTERSECTS/WITHIN/CONTAINS; shapes are tessellated into triangles
  * and pruned by the BKD tree's bounding boxes before exact triangle
  * math]. The Spark-first shape here: each document carries a CONVEX
  * quadrilateral (a rotated diamond — exactly the 2-triangle
  * tessellation of the reference, fused: convexity makes whole-shape
  * vertex/edge tests exact without per-triangle bookkeeping), stored as
  * integer center/extent columns whose derived bounding box is the
  * SARGABLE coarse prune (the BKD role — parquet min/max stats at
  * production scale); the exact relation runs only on bbox candidates.
  *
  * All arithmetic is exact integer cross products (coordinates ≤ ~2000,
  * crosses ≤ ~4·10⁶ — no overflow, no floats), so a DuckDB oracle
  * replays every relation bit-for-bit.
  *
  * Conventions: polygons are CCW; "inside" an edge = cross ≥ 0
  * (boundary counts as inside); two shapes INTERSECT unless a
  * separating edge exists with the other shape STRICTLY outside
  * (touching counts as intersecting — the reference's rule).
  */
object Shapes {

  type Pt = (Long, Long)

  /** The fixed convex CCW query pentagon shared by the engine entry and
    * the DuckDB oracle (single source of truth — same pattern as
    * `Functions.PolygonVerts` for the geo ray-cast filter).
    */
  val QueryPentagon: Array[Pt] = Array(
    (300L, 300L), (700L, 280L), (760L, 600L), (520L, 760L), (280L, 620L))

  /** Bounding box (minX, maxX, minY, maxY) of a vertex set — the coarse
    * candidate cut both sides derive from the SAME vertices.
    */
  def bbox(poly: Array[Pt]): (Long, Long, Long, Long) =
    (poly.map(_._1).min, poly.map(_._1).max,
      poly.map(_._2).min, poly.map(_._2).max)

  /** CCW diamond (rotated quad) centered (cx, cy), half-extents w/h. */
  def diamond(cx: Long, cy: Long, w: Long, h: Long): Array[Pt] =
    Array((cx, cy - h), (cx + w, cy), (cx, cy + h), (cx - w, cy))

  /** Cross product of (b − a) × (p − a): > 0 left of ab, 0 on the line. */
  def cross(a: Pt, b: Pt, p: Pt): Long =
    (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1)

  /** True when polygon `poly` (CCW) is convex (every turn non-right). */
  def isConvexCcw(poly: Array[Pt]): Boolean =
    poly.indices.forall { i =>
      cross(poly(i), poly((i + 1) % poly.length),
        poly((i + 2) % poly.length)) >= 0
    }

  /** Every vertex of `pts` inside-or-on every edge of convex `poly`. */
  def allInside(poly: Array[Pt], pts: Array[Pt]): Boolean =
    poly.indices.forall { i =>
      val (a, b) = (poly(i), poly((i + 1) % poly.length))
      pts.forall(p => cross(a, b, p) >= 0)
    }

  /** Some edge of `poly` has ALL of `pts` strictly outside (SAT
    * separating-axis witness for disjoint convex polygons).
    */
  def separates(poly: Array[Pt], pts: Array[Pt]): Boolean =
    poly.indices.exists { i =>
      val (a, b) = (poly(i), poly((i + 1) % poly.length))
      pts.forall(p => cross(a, b, p) < 0)
    }

  /** SAT intersection for convex polygons (touch = intersect). */
  def intersects(p: Array[Pt], q: Array[Pt]): Boolean =
    !(separates(p, q) || separates(q, p))

  /** The three reference relations of doc shape `p` vs query shape `q`:
    * (intersects, within, contains) as 0/1 longs.
    */
  def relations(p: Array[Pt], q: Array[Pt]): (Long, Long, Long) = (
    if (intersects(p, q)) 1L else 0L,
    if (allInside(q, p)) 1L else 0L,
    if (allInside(p, q)) 1L else 0L)
}
