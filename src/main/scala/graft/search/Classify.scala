package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.index.IndexView

/** Index-backed classifiers — the reference's classification module
  * trains directly on an existing index (term statistics, MLT-style
  * neighbor queries), never on re-analyzed text [8x
  * `lucene/classification/src/java/org/apache/lucene/classification/
  * SimpleNaiveBayesClassifier.java`, `KNearestNeighborClassifier.java`].
  */
object Classify {

  /** Per-(term, doc, tf) rows decoded from the WHOLE posting table —
    * the classifier's training pass is a full-index scan by design
    * (one decode, two hash aggregates; at scale this is the same
    * bounded-segment scan the merge path does, and it runs once per
    * model, not per query).
    */
  private def docTermTf(spark: SparkSession, view: IndexView): DataFrame = {
    import spark.implicits._
    view.postings
      .filter(col("field") === graft.index.Indexer.Field)
      .mapPartitions(_.flatMap { b =>
        val d = graft.codec.PostingCodec.decode(b.docs, b.freqs, b.norms)
        Iterator.tabulate(d.docIds.length)(i => (b.term, d.docIds(i), d.freqs(i)))
      })
      .toDF("term", "doc_id", "tf")
  }

  /** Multinomial naive Bayes over index term frequencies, add-one
    * smoothed (the reference's SimpleNaiveBayesClassifier shape:
    * class prior ln(n_c/N) plus per-token ln((ctf_{t,c}+1)/(tokens_c+V)),
    * V = dictionary size). All logs are quantized to ×10⁶ integers ONCE
    * per (term, class), then scores are pure integer sums — the
    * summation-order-proof trick shared with lm_surprisal — so the
    * DuckDB twin replays the argmax exactly. Ties: smaller label wins.
    *
    * Dataflow: training counts are two hash aggregates over the decoded
    * postings joined with the label column (a docvalues read, not text
    * analysis); classification joins the SAME decoded postings against
    * the (term × class) log-prob table (hash join on term) with the
    * tiny per-class constants broadcast. One postings decode feeds both.
    */
  def naiveBayes(spark: SparkSession, dir: String, view: IndexView): DataFrame = {
    val labels = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val dt = docTermTf(spark, view)
    val dtl = dt.join(labels, Seq("doc_id"))
    val ctfTC = dtl.groupBy("term", "lang").agg(sum("tf").as("ctf_tc"))
    val tokensC = ctfTC.groupBy("lang").agg(sum("ctf_tc").as("tokens_c"))
    val vocab = dt.select("term").distinct().count()
    val nDocs = labels.count()
    val priors = labels.groupBy("lang").agg(count(lit(1)).as("n_c"))
    def qln(x: Column): Column = round(log(x) * 1e6).cast("long")
    // per-class constants: prior and the smoothed-zero token log-prob
    val classFrame = priors.join(tokensC, Seq("lang"))
      .select(col("lang"),
        qln(col("n_c").cast("double") / lit(nDocs.toDouble)).as("prior_q"),
        qln(lit(1.0) / (col("tokens_c") + lit(vocab)).cast("double")).as("q0"),
        col("tokens_c"))
    val qlnTC = ctfTC.join(tokensC, Seq("lang"))
      .select(col("term"), col("lang"),
        qln((col("ctf_tc") + lit(1.0))
          / (col("tokens_c") + lit(vocab)).cast("double")).as("q_ln"))
    val contrib = dt.crossJoin(broadcast(classFrame.select("lang", "q0")))
      .join(qlnTC, Seq("term", "lang"), "left_outer")
      .select(col("doc_id"), col("lang"),
        (col("tf") * coalesce(col("q_ln"), col("q0"))).as("c"))
    val scored = contrib.groupBy("doc_id", "lang").agg(sum("c").as("s"))
      .join(broadcast(classFrame.select("lang", "prior_q")), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (col("s") + col("prior_q")).as("score_q"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("lang").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score_q"))
  }

  /** k-nearest-neighbor classifier over the embedding column (the
    * reference's KNearestNeighborClassifier swaps the MLT term query for
    * a vector query in 9.x; semantics identical): for each query vector,
    * the k nearest neighbors by quantized cosine (self excluded) vote;
    * the class with the most votes wins, ties broken by higher summed
    * similarity then smaller label. Queries broadcast against the
    * partitioned corpus — the batch-ANN join shape, no per-query jobs.
    */
  def knnClassify(spark: SparkSession, dir: String,
                  nQueries: Int = 20, k: Int = 5): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val sims = e.crossJoin(broadcast(q)).where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("label"),
        round(dotD(col("embedding"), col("qv"))
          / (sqrt(dotD(col("embedding"), col("embedding")))
            * sqrt(dotD(col("qv"), col("qv")))) * 1e6).cast("long").as("sim_q"))
    val wTop = Window.partitionBy("qid")
      .orderBy(col("sim_q").desc, col("vec_id").asc)
    val top = sims.withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= k)
    val wVote = Window.partitionBy("qid")
      .orderBy(col("votes").desc, col("sim_sum").desc, col("label").asc)
    top.groupBy("qid", "label")
      .agg(count(lit(1)).as("votes"), sum("sim_q").as("sim_sum"))
      .withColumn("vr", row_number().over(wVote)).where(col("vr") === 1)
      .select(col("qid").as("vec_id"), col("label").cast("long").as("pred_label"),
        col("votes"))
  }
}
