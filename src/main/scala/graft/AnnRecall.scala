package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Vectors

/** Measured ANN quality evidence (VERDICT round-1 item #10): corpus-
  * average recall@10 of the two-stage sketch+rerank path vs exact
  * brute-force cosine, at the documented exact-scan budget.
  *
  * The per-query average runs driver-side over the collected embeddings
  * using the ENGINE'S OWN sketch/hamming functions (identical
  * arithmetic); the distributed path itself is cross-checked against
  * that replication for a sample of queries first. Prints one JSON line.
  *
  *   SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.AnnRecall /root/testdata/sf0.1"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val n = vecs.length
    val budget = math.max(10, math.ceil(n * Vectors.RerankFraction).toInt)
    val sketches = vecs.map { case (_, v) => Vectors.sketchOf(v) }

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    def bruteTop10(qi: Int): Seq[Long] =
      vecs.indices.filter(_ != qi)
        .map(j => (vecs(j)._1, math.round(cos(vecs(qi)._2, vecs(j)._2) * 1e6)))
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1)

    val byId = vecs.toMap // hoisted: one corpus map, not one per query

    /** Exact replication of the engine's stage-1 radius rule: the
      * RerankFraction-quantile of the FULL Hamming histogram
      * (Vectors.annLshTopK), target floored at k=10.
      */
    def radiusAndCands(qi: Int): (Int, IndexedSeq[Int]) = {
      val hams = vecs.indices.filter(_ != qi)
        .map(j => j -> Vectors.hamming(sketches(j), sketches(qi)))
      val target = math.max(10L,
        math.ceil(math.max(1L, hams.size.toLong) * Vectors.RerankFraction).toLong)
      val hist = hams.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val radius = hist.collectFirst {
        case (h, c) if { cum += c; cum >= target } => h
      }.getOrElse(Vectors.SketchBits)
      (radius, hams.filter(_._2 <= radius).map(_._1).toIndexedSeq)
    }

    def sketchTop10(qi: Int): (Seq[Long], Int) = {
      val (_, candIdx) = radiusAndCands(qi)
      val top = candIdx.map(j => (vecs(j)._1,
          math.round(cos(vecs(qi)._2, byId(vecs(j)._1)) * 1e6)))
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1)
      (top, candIdx.size)
    }

    // cross-check: the distributed path == the driver replication
    for (q <- Seq(0L, 7L, 42L)) {
      val engine = Vectors.annLshTopK(spark, dir, queryId = q)
        .collect().map(_.getLong(0)).toSeq
      val repl = sketchTop10(q.toInt)._1
      require(engine == repl,
        s"engine/replication divergence for query $q: $engine vs $repl")
    }

    val perQuery = (0 until math.min(nQueries, n)).map { qi =>
      val (top, scanned) = sketchTop10(qi)
      (bruteTop10(qi).toSet.intersect(top.toSet).size / 10.0,
        scanned.toDouble / (n - 1))
    }
    val recall = perQuery.map(_._1).sum / perQuery.size
    val avgScan = perQuery.map(_._2).sum / perQuery.size
    println(f"""{"metric":"ann_recall_at_10","value":$recall%.4f,"n_vectors":$n,"n_queries":${perQuery.size},"sketch_bits":${Vectors.SketchBits},"rerank_fraction":${Vectors.RerankFraction},"avg_scanned_fraction":$avgScan%.4f,"budget_reference":$budget}""")

    // ——— IVF recall: on the driver corpus (near-random vectors — the
    // sketch path's territory, IVF expected weak) AND on a clustered
    // corpus (IVF's territory — real embedding corpora cluster). Both
    // numbers are recorded so the two scale paths' trade-off is
    // measured, not asserted.
    def brute10(all: Array[(Long, Array[Float])], qi: Int): Set[Long] =
      all.indices.filter(_ != qi)
        .map(j => (all(j)._1, math.round(cos(all(qi)._2, all(j)._2) * 1e6)))
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet

    /** Driver replication of [[Vectors.annIvfTopKOn]] over the engine's
      * own centroids/sizes. Returns (avg recall@10, avg scanned frac).
      */
    def ivfEval(all: Array[(Long, Array[Float])], idx: Vectors.IvfView,
                nQ: Int): (Double, Double) = {
      val cells = all.map { case (_, v) => Vectors.nearestCell(idx.cents, v) }
      val res = (0 until math.min(nQ, all.length)).map { qi =>
        val order = Vectors.probeOrder(idx.cents, all(qi)._2)
        val budget = math.max(10L,
          math.ceil((idx.n - 1) * Vectors.RerankFraction).toLong)
        var cum = 0L
        val probed = order.takeWhile { c =>
          val more = cum < budget; cum += idx.cellSizes(c); more
        }.toSet
        val candIdx = all.indices.filter(j => j != qi && probed(cells(j)))
        val top = candIdx
          .map(j => (all(j)._1, math.round(cos(all(qi)._2, all(j)._2) * 1e6)))
          .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
        (brute10(all, qi).intersect(top).size / 10.0,
          candIdx.size.toDouble / (all.length - 1))
      }
      (res.map(_._1).sum / res.size, res.map(_._2).sum / res.size)
    }

    val ivfIdx = Vectors.ivfIndexOf(spark, dir)
    // cross-check: distributed path == driver replication (assignment
    // array and budget are query-independent — computed once)
    val ccCells = vecs.map { case (_, v) => Vectors.nearestCell(ivfIdx.cents, v) }
    val ccBudget = math.max(10L,
      math.ceil((ivfIdx.n - 1) * Vectors.RerankFraction).toLong)
    for (q <- Seq(0L, 7L, 42L)) {
      val engine = Vectors.annIvfTopKOn(spark, ivfIdx, q, 10)
        .collect().map(_.getLong(0)).toSeq
      val qi = vecs.indexWhere(_._1 == q)
      val order = Vectors.probeOrder(ivfIdx.cents, vecs(qi)._2)
      var cum = 0L
      val probed = order.takeWhile { c =>
        val more = cum < ccBudget; cum += ivfIdx.cellSizes(c); more
      }.toSet
      val repl = vecs.indices.filter(j => j != qi && probed(ccCells(j)))
        .map(j => (vecs(j)._1, math.round(cos(vecs(qi)._2, vecs(j)._2) * 1e6)))
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSeq
      require(engine == repl,
        s"IVF engine/replication divergence for query $q: $engine vs $repl")
    }
    val (ivfRandR, ivfRandS) = ivfEval(vecs, ivfIdx, nQueries)

    // deterministic clustered corpus: 40 centers, unit vectors near them
    val dim = vecs.head._2.length
    def h64(a: Long, b: Long): Double = Vectors.hashUnit(a, b)
    val nClusters = 40
    val clustered: Array[(Long, Array[Float])] = Array.tabulate(n) { i =>
      val c = i % nClusters
      val v = Array.tabulate(dim)(d =>
        (h64(1000L + c, d) + 0.25 * h64(2000000L + i, d)).toFloat)
      (i.toLong, v)
    }
    val cdf = clustered.toSeq.toDF("vec_id", "embedding")
    val ivfClustered = Vectors.ivfIndexOfDf(spark, s"clustered-$n-$dim", cdf)
    val (ivfClusR, ivfClusS) = ivfEval(clustered, ivfClustered, nQueries)
    println(f"""{"metric":"ann_ivf_recall_at_10","random":$ivfRandR%.4f,"random_scanned":$ivfRandS%.4f,"clustered":$ivfClusR%.4f,"clustered_scanned":$ivfClusS%.4f,"cells":${ivfIdx.cents.length},"lloyd_iters":${Vectors.IvfIters},"n_vectors":$n,"n_queries":$nQueries}""")

    // ——— sq8 recall: int8 scalar quantization + integer-dot candidate
    // cut (k·oversample = 40) + exact rerank, replicated driver-side
    // with the same arithmetic as Vectors.annSq8TopK
    val sq8Scale = vecs.iterator.flatMap(_._2).map(x => math.abs(x.toDouble)).max
    val sq8Codes = vecs.map { case (_, v) =>
      v.map(x => math.round(x.toDouble / sq8Scale * 127)) }
    def sq8Top10(qi: Int): Seq[Long] = {
      val qc = sq8Codes(qi)
      val cand = vecs.indices.filter(_ != qi)
        .map { j =>
          var d = 0L; var i = 0
          while (i < qc.length) { d += sq8Codes(j)(i) * qc(i); i += 1 }
          (j, d)
        }
        .sortBy(t => (-t._2, vecs(t._1)._1)).take(40)
      cand.map { case (j, _) =>
        (vecs(j)._1, math.round(cos(vecs(qi)._2, vecs(j)._2) * 1e6)) }
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1)
    }
    for (q <- Seq(0L, 7L, 42L)) {
      val engine = Vectors.annSq8TopK(spark, dir, queryId = q)
        .collect().map(_.getLong(0)).toSeq
      val repl = sq8Top10(vecs.indexWhere(_._1 == q))
      require(engine == repl,
        s"sq8 engine/replication divergence for query $q: $engine vs $repl")
    }
    val sq8Recall = (0 until math.min(nQueries, n)).map { qi =>
      bruteTop10(qi).toSet.intersect(sq8Top10(qi).toSet).size / 10.0
    }
    println(f"""{"metric":"ann_sq8_recall_at_10","value":${sq8Recall.sum / sq8Recall.size}%.4f,"oversample":4,"bytes_per_dim":1,"n_vectors":$n,"n_queries":${sq8Recall.size}}""")
    spark.stop()
  }
}
