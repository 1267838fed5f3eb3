package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table
 * (`vec_id:long, embedding:array<float>, label:int`).
 *
 * - [[annBruteTopK]]: exact cosine top-k — one narrow codegen'd pass
 *   (`zip_with` + `aggregate` column functions, no UDF) + distributed
 *   `TakeOrderedAndProject`. The correctness baseline; at 100 TB it is
 *   the per-partition kernel the bucketed variant applies inside buckets.
 * - [[annLshTopK]]: random-hyperplane LSH — 12 sign bits bucket the
 *   vectors; the query probes its own bucket + all Hamming-1 neighbor
 *   buckets (multi-probe), ranking candidates by exact cosine. The scale
 *   path: candidate set ≈ nProbes/2^bits of the corpus.
 *
 * Similarities are quantized (×1e6, ~1 ulp of float data) so Spark's
 * and the oracle's summation-order differences can't flip the compare.
 */
object Vectors {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Exact brute-force cosine top-k for query vector `queryId`. */
  def annBruteTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                   k: Int = 10): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    val sim = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotD(col("embedding"), col("qv"))
          / (normD(col("embedding")) * normD(col("qv"))) * 1e6)
          .cast("long").as("sim_q"))
    sim.where(col("vec_id") =!= queryId)
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Scalar-quantized (int8) ANN — the memory-compression scale path:
    * components are symmetrically quantized to [-127, 127] against ONE
    * corpus-wide scale (a tiny agg scalar), so the candidate scan reads
    * 1 byte/dim instead of 4 (at 100 TB the stage-1 scan touches ONLY
    * the code column; the float embeddings are fetched just for the
    * oversampled candidate set). Stage 1 ranks by the integer code dot
    * (fixed-k TakeOrdered, k·oversample — NOT proportional to corpus
    * size); stage 2 exact-cosine-reranks the candidates. Fully
    * deterministic (integer ties broken by vec_id), so the DuckDB twin
    * replays both stages exactly.
    */
  def annSq8TopK(s: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 10, oversample: Int = 4): DataFrame = {
    val e = emb(s, dir)
    val absMax = aggregate(transform(col("embedding"),
      x => abs(x.cast("double"))), lit(0.0), (a, x) => greatest(a, x))
    // empty corpus → max aggregates to null; all-zero corpus → 0.0.
    // Guard both: scale 1.0 keeps every code exactly 0 (no NaN/throw)
    val srow = e.agg(max(absMax)).head()
    val rawScale = if (srow.isNullAt(0)) 0.0 else srow.getDouble(0)
    val scale = if (rawScale == 0.0) 1.0 else rawScale
    val codes = e.select(col("vec_id"), col("embedding"),
      transform(col("embedding"),
        x => round(x.cast("double") / scale * 127).cast("long")).as("c"))
    val q = codes.where(col("vec_id") === queryId)
      .select(col("c").as("qc"), col("embedding").as("qv"))
    val cand = codes.crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding"), col("qv"),
        aggregate(zip_with(col("c"), col("qc"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dot8"))
      .orderBy(col("dot8").desc, col("vec_id").asc)
      .limit(k * oversample)
    cand.select(col("vec_id"),
        round(dotD(col("embedding"), col("qv"))
          / (normD(col("embedding")) * normD(col("qv"))) * 1e6)
          .cast("long").as("sim_q"))
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batch ANN (KnnStream analog): MANY query vectors answered in ONE
    * join + window plan — no per-query driver action (round-1 advisor:
    * batch workloads should join, not loop). Queries broadcast; per-
    * query top-k via row_number over (qid) partitions. At scale the
    * corpus side stays partitioned and each executor scores its shard
    * against the broadcast query set — the classic brute-force batch
    * kernel the sketch path's stage 2 also uses per bucket.
    */
  def annBatchTopK(s: SparkSession, dir: String, nQueries: Long = 8L,
                   k: Int = 5): DataFrame =
    batchCut(batchSims(s, dir, nQueries), k)
      .select("qid", "vec_id", "sim_q")

  /** Quantized cosine of every (anchor, corpus) pair for the first
    * `nQueries` anchors — one broadcast cross join, shared by
    * [[annBatchTopK]] and [[hardNegatives]].
    */
  private def batchSims(s: SparkSession, dir: String,
                        nQueries: Long): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dotD(col("embedding"), col("qv"))
          / (normD(col("embedding")) * normD(col("qv"))) * 1e6)
          .cast("long").as("sim_q"))
  }

  /** Per-anchor top-k cut of a sims frame (rank column kept as `rn`). */
  private def batchCut(sims: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid")
      .orderBy(col("sim_q").desc, col("vec_id").asc)
    sims.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
  }

  /** Hard-negative mining (§2.9b: the contrastive-training data prep of
    * DPR / Contriever-style retriever training — per anchor, the most
    * SIMILAR corpus items that are NOT near-duplicates make the best
    * negatives): the [[annBatchTopK]] dataflow with a near-dup band
    * EXCLUDED (sim ≥ dupTau is a positive/duplicate, not a negative).
    * Same one-broadcast-join shape; at scale stage 1 swaps to the
    * sketch/IVF candidate cut exactly as ANN does.
    */
  def hardNegatives(s: SparkSession, dir: String, nQueries: Long = 8L,
                    k: Int = 5, dupTauMicro: Long = 950000L): DataFrame =
    batchCut(batchSims(s, dir, nQueries)
        .where(col("sim_q") < dupTauMicro), k)
      .select(col("qid"), col("vec_id"), col("sim_q"),
        col("rn").cast("long").as("neg_rank"))

  /** SRP-LSH sketch width. 256 sign bits = 32 bytes/vector. Measured on
    * the sf0.1 embeddings (near-random vectors — the HARD case for ANN):
    * recall@10 = 0.94 re-ranking 10% of the corpus, vs 0.28 for the
    * best bucketed-probe scheme at the same budget (see BASELINE.md ANN
    * section). Width is a precision knob, not corpus-dependent: 384
    * bits → 0.97 at the same budget.
    */
  val SketchBits = 256
  private val SketchWords = SketchBits / 64

  /** Fraction of the corpus exact-re-ranked per query (the scan budget). */
  val RerankFraction = 0.10

  /** Deterministic splitmix64 of the packed (a, b) key, mapped uniformly
    * into [-1, 1) — the single pseudo-random-unit source shared by the
    * LSH hyperplanes, the recall-evidence corpus generators (AnnRecall),
    * and the spec's clustered corpus, so they can never drift apart.
    */
  private[graft] def hashUnit(a: Long, b: Long): Double = {
    var z = (a << 32 | (b & 0xffffffffL)) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    (java.lang.Long.remainderUnsigned(z, 1000000L).toDouble / 500000.0) - 1.0
  }

  /** Deterministic pseudo-random hyperplane component (bit, dim). */
  private def plane(bit: Int, dim: Int): Double =
    hashUnit(bit.toLong, dim.toLong)

  // One precomputed SketchBits×dim hyperplane table per embedding dim
  // (per JVM): sketchOf would otherwise re-derive every component by
  // splitmix hashing (~10 ALU ops per multiply-add) for EVERY vector —
  // the dominant pass of the sketch build.
  private val planeTables =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def planesFor(dim: Int): Array[Array[Double]] =
    planeTables.computeIfAbsent(dim,
      d => Array.tabulate(SketchBits, d)((bit, i) => plane(bit, i)))

  /** Sign-random-projection sketch of a vector (narrow, per-row). */
  private[graft] def sketchOf(v: Array[Float]): Array[Long] = {
    val ps = planesFor(v.length)
    val words = new Array[Long](SketchWords)
    var bit = 0
    while (bit < SketchBits) {
      val p = ps(bit)
      var d = 0.0
      var i = 0
      while (i < v.length) { d += v(i) * p(i); i += 1 }
      if (d >= 0) words(bit >> 6) |= (1L << (bit & 63))
      bit += 1
    }
    words
  }

  private[graft] def hamming(a: Array[Long], b: Array[Long]): Int = {
    var h = 0
    var i = 0
    while (i < a.length) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** Session-scoped cache of sketched corpora (vec_id, embedding,
    * sketch), one per embeddings dir — repeated entry runs (Verify +
    * Bench in one JVM) reuse one cached copy instead of leaking a new
    * `persist()` per call (round-2 review finding). At scale this is
    * the precomputed sketch side table.
    */
  private val sketchCache = new graft.SessionCache[(DataFrame, Long)](
    v => !v._1.sparkSession.sparkContext.isStopped)

  private[graft] def sketchedCorpus(s: SparkSession, dir: String): (DataFrame, Long) =
    sketchCache.getOrBuild(dir) {
      import s.implicits._
      val sk = emb(s, dir).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, v, sketchOf(v)) }
        .toDF("vec_id", "embedding", "sketch")
        .persist()
      (sk, sk.count()) // materialize once; count reused by callers
    }

  /** Approximate cosine top-k — two-stage SRP-LSH sketch + re-rank (the
    * 100 TB path):
    *
    *  1. Stage 1 keeps every vector whose sketch is within a Hamming
    *     RADIUS of the query sketch — a NARROW filter over the compact
    *     (vec_id, sketch) columns (popcount only, ~1% of corpus bytes at
    *     realistic dims), with no global sort and no proportional-k
    *     limit: nothing funnels through one partition at any corpus
    *     size. The radius is the [[RerankFraction]]-quantile of the full
    *     Hamming histogram (one 257-bin narrow aggregate over the same
    *     compact columns + a scalar driver scan of the bins).
    *  2. Stage 2 exact-reranks only the radius survivors with
    *     full-precision cosine.
    *
    * Bucketed probing was measured and rejected: on near-random vectors
    * (this corpus) the best margin-guided multi-probe reaches only
    * recall 0.28 at the same 10% budget, because bucket membership
    * wastes the ranking information the sketch carries. Measured here:
    * recall@10 = 0.94 (see `graft.AnnRecall`).
    */
  def annLshTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 10): DataFrame = {
    import s.implicits._
    val (sketched, n) = sketchedCorpus(s, dir)
    val qRow = sketched.where(col("vec_id") === queryId)
      .select(col("embedding"), col("sketch")).as[(Array[Float], Array[Long])].head()
    val bcQ = s.sparkContext.broadcast(qRow)
    val hams = sketched.select(col("vec_id"), col("sketch"))
      .as[(Long, Array[Long])]
      .map { case (id, sk) => (id, hamming(sk, bcQ.value._2)) }
      .toDF("vec_id", "ham")
      .where(col("vec_id") =!= queryId)
    // radius = the budget-quantile of the FULL Hamming histogram: one
    // narrow 257-bin aggregate over the compact (vec_id, sketch)
    // columns — the same cost class as the stage-1 filter pass itself —
    // then a scalar driver scan of the bins. Exact (no sampling error,
    // no widening loop), deterministic (a pure function of the data),
    // and >= k candidates by construction since target >= k.
    val hist = hams.groupBy("ham").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = math.max(1L, hist.map(_._2).sum)
    val target = math.max(k.toLong, math.ceil(total * RerankFraction).toLong)
    var cum = 0L
    val radius = hist.collectFirst {
      case (h, c) if { cum += c; cum >= target } => h
    }.getOrElse(SketchBits)
    val cand = hams.where(col("ham") <= radius)
    // stage 2: exact cosine on the radius survivors only
    val qv = typedlit(bcQ.value._1.toSeq)
    cand.join(sketched.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"),
        round(dotD(col("embedding"), qv)
          / (normD(col("embedding")) * normD(qv)) * 1e6)
          .cast("long").as("sim_q"))
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }

  // ————— IVF (inverted-file / coarse-quantizer) ANN — the clustered-
  // corpus scale path. The corpus is partitioned into kCells Voronoi
  // cells of a spherical k-means; a query scores the (tiny) centroid
  // table, probes the nearest cells until the scan budget is covered,
  // and exact-reranks only the probed cells. At 100 TB the assignment
  // table is written bucketed by `cell`, so a probe reads only
  // nprobe/kCells of the data (partition pruning) — the complementary
  // design point to the SRP sketch: IVF wins when the corpus has
  // cluster structure (real embedding corpora), the Hamming-radius
  // sketch wins on unstructured vectors (measured in `graft.AnnRecall`;
  // both numbers in BASELINE.md).

  /** Lloyd iterations — FIXED (determinism and bounded cost). */
  val IvfIters = 5

  /** Fixed-point scale for centroid accumulation: component sums are
    * quantized to integers so the fold is exactly associative — the
    * centroids (and therefore every cell assignment and query answer)
    * are a pure function of the data, never of partitioning or
    * summation order (the repo-wide docID-purity invariant; float
    * partial sums would drift in ulps across parallelism levels and
    * could flip borderline assignments).
    */
  private val IvfQScale = 1L << 20

  private def unitD(v: Array[Double]): Array[Double] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { n2 += v(i) * v(i); i += 1 }
    val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Nearest centroid by dot product (centroids are unit-normalized, so
    * this ranks by cosine); ties break to the LOWER cell index.
    */
  private[graft] def nearestCell(cents: Array[Array[Double]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < cv.length) { d += cv(i) * v(i); i += 1 }
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Spherical k-means over a (vec_id, embedding) dataset — distributed
    * assignment (one narrow pass per iteration; per-partition partial
    * sums, ≤ kCells rows shipped per partition), deterministic by
    * construction: hash-ordered init, integer-quantized sums, fixed
    * iteration count. Returns unit-normalized centroids.
    */
  private[graft] def kmeansCentroids(s: SparkSession,
                                     ds: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                                     kCells: Int,
                                     iters: Int = IvfIters): Array[Array[Double]] = {
    import s.implicits._
    // deterministic spread init: the kCells vectors first in md5(vec_id)
    // order — a hash shuffle of the ids, independent of layout; the
    // global TakeOrdered ships only kCells rows
    var cents: Array[Array[Double]] = ds.toDF("vec_id", "embedding")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(kCells)
      .select("embedding").as[Array[Float]].collect()
      .map(v => unitD(v.map(_.toDouble)))
    var it = 0
    while (it < iters) {
      val bc = s.sparkContext.broadcast(cents)
      // per-partition partial (cell, quantized component sums, count):
      // integer sums make the cross-partition merge order-independent
      val partials = ds.mapPartitions { rows =>
        val c = bc.value
        val k = c.length
        var sums: Array[Array[Long]] = null
        val cnt = new Array[Long](k)
        rows.foreach { case (_, v) =>
          if (sums == null) sums = Array.fill(k)(new Array[Long](v.length))
          val cell = nearestCell(c, v)
          val sv = sums(cell)
          var i = 0
          while (i < v.length) { sv(i) += math.round(v(i).toDouble * IvfQScale); i += 1 }
          cnt(cell) += 1L
        }
        if (sums == null) Iterator.empty
        else (0 until k).iterator.filter(cnt(_) > 0).map(i => (i, sums(i), cnt(i)))
      }.collect() // ≤ kCells × nPartitions tiny rows
      val k = cents.length
      val merged = Array.fill(k)(null: Array[Long])
      val cnts = new Array[Long](k)
      partials.foreach { case (cell, sv, n) =>
        if (merged(cell) == null) merged(cell) = new Array[Long](sv.length)
        val m = merged(cell)
        var i = 0
        while (i < sv.length) { m(i) += sv(i); i += 1 }
        cnts(cell) += n
      }
      cents = Array.tabulate(k) { cell =>
        if (cnts(cell) == 0) cents(cell) // empty cell keeps its centroid
        else unitD(merged(cell).map(_.toDouble / (IvfQScale * cnts(cell))))
      }
      bc.destroy()
      it += 1
    }
    cents
  }

  /** An IVF index: the cell-assigned corpus (at scale: written bucketed
    * by `cell`), the unit centroids, and per-cell sizes (both tiny,
    * driver/broadcast-resident — the probe planner's only inputs).
    */
  final case class IvfView(assign: DataFrame, cents: Array[Array[Double]],
                           cellSizes: Array[Long], n: Long)

  private val ivfCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfView]()

  /** Cells ≈ √n, the standard IVF balance point (probe cost ≈ cell
    * cost); bounded for tiny test corpora.
    */
  private def cellsFor(n: Long): Int =
    math.max(4, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  private[graft] def ivfIndexOf(s: SparkSession, dir: String): IvfView =
    // the frame is a pure function of dir here, so the key cannot be
    // reused for a different frame — skip the per-hit row-count check
    // (a full Spark job per query on the hot path)
    ivfIndexOfDf(s, dir, emb(s, dir).select(col("vec_id"), col("embedding")),
      validateHit = false)

  /** Build (or fetch the session-cached) IVF index of a (vec_id,
    * embedding) frame — one k-means + one assignment pass, reused by
    * every query like the durable sketch table.
    */
  private[graft] def ivfIndexOfDf(s: SparkSession, key: String,
                                  df: DataFrame,
                                  validateHit: Boolean = true): IvfView = {
    var builtNow = false
    val view = ivfCache.computeIfAbsent(key, { _ =>
      builtNow = true
      import s.implicits._
      val ds = df.as[(Long, Array[Float])]
      val n = ds.count()
      val cents = kmeansCentroids(s, ds, cellsFor(n))
      val bc = s.sparkContext.broadcast(cents)
      val assign = ds.map { case (id, v) => (id, nearestCell(bc.value, v), v) }
        .toDF("vec_id", "cell", "embedding")
        .persist()
      val sizes = new Array[Long](cents.length)
      assign.groupBy("cell").count().collect()
        .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
      IvfView(assign, cents, sizes, n)
    })
    // a cached view bound to a stopped session would throw on use —
    // evict and rebuild against the live session instead
    if (!builtNow && view.assign.sparkSession.sparkContext.isStopped) {
      ivfCache.remove(key, view)
      return ivfIndexOfDf(s, key, df, validateHit)
    }
    // the cache key is caller-supplied: on a cache hit, fail loudly if
    // the key is reused for a DIFFERENT frame instead of silently
    // answering from the wrong one
    if (!builtNow && validateHit) require(view.n == df.count(),
      s"ivf cache key '$key' reused for a different frame " +
        s"(cached n=${view.n})")
    view
  }

  /** Approximate cosine top-k via IVF probe: rank cells by centroid
    * similarity, probe the nearest cells until their cumulative size
    * covers the [[RerankFraction]] budget, exact-rerank only those
    * cells. The probe plan is computed on the driver from the tiny
    * centroid/size tables; the data-side plan is a narrow `cell IN
    * (probed)` filter — bucket pruning at scale — plus the same
    * codegen'd cosine kernel as the brute-force baseline.
    */
  def annIvfTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 10): DataFrame = {
    import s.implicits._
    val idx = ivfIndexOf(s, dir)
    annIvfTopKOn(s, idx, queryId, k)
  }

  private[graft] def annIvfTopKOn(s: SparkSession, idx: IvfView,
                                  queryId: Long, k: Int): DataFrame = {
    import s.implicits._
    val qv = idx.assign.where(col("vec_id") === queryId)
      .select("embedding").as[Array[Float]].head()
    val order = probeOrder(idx.cents, qv)
    val budget = math.max(k.toLong,
      math.ceil((idx.n - 1) * RerankFraction).toLong)
    var cum = 0L
    val probed = order.takeWhile { c =>
      val more = cum < budget
      cum += idx.cellSizes(c)
      more
    }
    val qc = typedlit(qv.toSeq)
    idx.assign
      .where(col("cell").isin(probed.map(Integer.valueOf): _*)
        && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(dotD(col("embedding"), qc)
          / (normD(col("embedding")) * normD(qc)) * 1e6)
          .cast("long").as("sim_q"))
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Cells in decreasing centroid-cosine order (ties: lower cell id). */
  private[graft] def probeOrder(cents: Array[Array[Double]],
                                qv: Array[Float]): Seq[Int] = {
    val qd = unitD(qv.map(_.toDouble))
    cents.indices.sortBy { c =>
      val cv = cents(c)
      var d = 0.0
      var i = 0
      while (i < cv.length) { d += cv(i) * qd(i); i += 1 }
      (-d, c)
    }
  }

  /** Solr `kmeans()` streaming evaluator [8x solr/solrj .../io/eval/
    * KmeansEvaluator.java]: Lloyd's algorithm over the embedding
    * column — here the distributed twin, with every step made
    * order-proof: coordinates quantized to integer milli-units once,
    * distances are exact integer sums of squares, assignment ties break
    * to the lowest cluster id, and each centroid update floors the
    * per-dimension mean back to the integer grid (the reference's
    * double means made replayable — same honesty note as the quantized
    * NB log-probs). Fixed `iters` Lloyd rounds from pinned seeds (the
    * first k vectors; the reference seeds from the input order too).
    * Scale shape: centroids are a k×dim frame broadcast to a narrow
    * distance map; the update is one (cluster, dim) partial+final
    * aggregate — nothing quadratic, no driver loop over rows.
    */
  def streamKmeans(s: SparkSession, dir: String, k: Int = 4,
                   iters: Int = 2): DataFrame = {
    val pts = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("q"))
    def assigned(cents: DataFrame): DataFrame =
      // argmin as ONE hash aggregate: min over struct(dist, cid) picks
      // the closest centroid with ties to the lowest cid — no window,
      // no sort exchange (q is constant per vec_id, so first() is a
      // pure value)
      pts.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("cid"), expr(
          "aggregate(zip_with(q, cq, (a, b) -> (a - b) * (a - b)), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("dist"))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("best"),
          first(col("q")).as("q"))
        .select(col("vec_id"), col("q"),
          col("best.cid").as("cid"), col("best.dist").as("dist"))
    var cents = pts.where(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    var a = assigned(cents)
    for (_ <- 1 until iters) {
      cents = a.select(col("cid"), posexplode(col("q")))
        .groupBy("cid", "pos")
        .agg(expr("CAST(floor(sum(col) / CAST(count(1) AS DOUBLE)) AS BIGINT)")
          .as("cx"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), " +
          "x -> x.cx)").as("cq"))
      a = assigned(cents)
    }
    a.select(col("vec_id"), col("cid").as("cluster"), col("dist").as("dist_q"))
  }
}
