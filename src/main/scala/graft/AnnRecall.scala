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
    spark.stop()
  }
}
