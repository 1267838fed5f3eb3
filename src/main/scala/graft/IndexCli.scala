package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{IndexReader, IndexStore, IndexWriter, Indexer}

/** Operational entry point for spark-submit (north rule: "runs via
  * spark-submit on multi-executor clusters") — the Solr admin/update
  * handler analog as a batch CLI. No sandbox assumptions: master comes
  * from spark-submit (--master yarn/k8s/...); local runs default to
  * local[*].
  *
  *   spark-submit --class graft.IndexCli <jar> build <corpus> <indexDir> \
  *       [nBatches] [segSize] [positions 0|1]
  *   spark-submit --class graft.IndexCli <jar> search <indexDir> <k> t1 [t2 ...]
  *   spark-submit --class graft.IndexCli <jar> describe <indexDir>
  *   spark-submit --class graft.IndexCli <jar> check <corpus>
  *   spark-submit --class graft.IndexCli <jar> synth <n> <outParquet>
  *
  * `build` accepts either the indexer shape (doc_id, url, text) or the
  * input_hint web shape (url, warc_ts, html, text, lang) — for the web
  * shape docIDs are the range-partitioned rank of the url sort (a pure
  * function of the data, never of scheduling; the same zipWithIndex
  * remap pattern as index_sort_topk). `check` verifies the per-row
  * invariant extractText(html) == text byte-identically per url.
  * `describe` prints the live snapshot and each batch's manifest — the
  * per-partition lineage + rows/bytes/postings metrics the build
  * recorded. `search` runs the block-max WAND top-k.
  */
object IndexCli {

  private def usage(): Nothing = {
    System.err.println(
      """usage: IndexCli build <corpus.parquet> <indexDir> [nBatches] [segSize] [positions 0|1]
        |       IndexCli search <indexDir> <k> <term> [term ...]
        |       IndexCli describe <indexDir>
        |       IndexCli check <corpus.parquet>
        |       IndexCli synth <nDocs> <out.parquet>""".stripMargin)
    sys.exit(2)
  }

  /** Web-shape corpus → (doc_id, url, text): docID = rank of the url
    * sort, computed with a range-partitioned sort + per-partition
    * zipWithIndex (no single-partition window; deterministic because the
    * rank depends only on the data's url order).
    */
  private[graft] def assignDocIds(spark: SparkSession, web: DataFrame): DataFrame = {
    import spark.implicits._
    val sorted = web.select(col("url"), col("text"))
      .repartitionByRange(col("url").asc)
      .sortWithinPartitions(col("url").asc)
    spark.createDataFrame(
      sorted.as[(String, String)].rdd.zipWithIndex()
        .map { case ((url, text), rank) => (rank, url, text) })
      .toDF("doc_id", "url", "text")
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val spark = SparkSession.builder()
      .appName(s"graft-${args(0)}")
      // spark-submit's --master wins; bare `runMain` gets local[*]
      .config("spark.master",
        sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, args: Array[String]): Unit = args(0) match {
    case "build" =>
      if (args.length < 3) usage()
      val (src, dir) = (args(1), args(2))
      val nBatches = if (args.length > 3) args(3).toInt else 1
      val segSize = if (args.length > 4) args(4).toLong else Indexer.DefaultSegmentSize
      val positions = if (args.length > 5) args(5) == "1" else true
      val raw = spark.read.parquet(src)
      val shaped =
        if (raw.columns.contains("doc_id")) raw.select("doc_id", "url", "text")
        else assignDocIds(spark, raw)
      val t0 = System.nanoTime()
      val snap = IndexWriter.build(spark, Indexer.asDocInput(spark, shaped),
        dir, segSize, nBatches, indexPositions = positions)
      val sec = (System.nanoTime() - t0) / 1e9
      val docs = snap.batches
        .flatMap(IndexStore.readManifest(dir, _)).map(_.docs).sum
      println(f"""{"cmd":"build","index":"$dir","version":${snap.version},"batches":${snap.batches.size},"docs":$docs,"sec":$sec%.3f,"docs_per_sec":${docs / math.max(sec, 1e-9)}%.0f}""")

    case "search" =>
      if (args.length < 4) usage()
      val dir = args(1); val k = args(2).toInt
      val terms = args.drop(3).toSeq
      val view = IndexReader.load(spark, dir)
      val t0 = System.nanoTime()
      val hits = graft.search.BmwSearch
        .topK(spark, view, terms, k, graft.search.DoubleOracle).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      hits.foreach(r =>
        println(f"""{"doc_id":${r.getLong(0)},"score":${r.getDouble(1)}%.6f}"""))
      println(f"""{"cmd":"search","terms":${terms.mkString("[\"", "\",\"", "\"]")},"k":$k,"hits":${hits.length},"ms":$ms%.1f}""")

    case "describe" =>
      if (args.length < 2) usage()
      val dir = args(1)
      val snap = IndexStore.currentSnapshot(dir)
        .getOrElse(sys.error(s"no snapshot in $dir"))
      println(s"""{"cmd":"describe","index":"$dir","version":${snap.version},"segment_size":${snap.segSize},"batches":${snap.batches.size}}""")
      snap.batches.foreach { b =>
        IndexStore.readManifest(dir, b).foreach { m =>
          println(s"""{"batch":${m.batch},"doc_range":[${m.firstDocId},${m.lastDocIdExclusive}),"segments":${m.segmentIds.mkString("[", ",", "]")},"docs":${m.docs},"postings":${m.postings},"posting_rows":${m.postingRows},"terms":${m.terms},"bytes":${m.bytes}}""")
        }
      }

    case "check" =>
      if (args.length < 2) usage()
      import spark.implicits._
      val web = spark.read.parquet(args(1))
      val bad = web.select("url", "html", "text")
        .as[(String, Array[Byte], String)]
        .map { case (url, html, text) =>
          (url, graft.analysis.HtmlCodec.extractText(html) == text) }
        .toDF("url", "ok").where(!col("ok"))
      val n = bad.count()
      println(s"""{"cmd":"check","rows":${web.count()},"extract_mismatches":$n}""")
      if (n > 0) { bad.select("url").show(5, truncate = false); sys.exit(1) }

    case "synth" =>
      if (args.length < 3) usage()
      graft.synth.CorpusSynth.corpus(spark, args(1).toLong)
        .write.mode("overwrite").parquet(args(2))
      println(s"""{"cmd":"synth","n":${args(1)},"out":"${args(2)}"}""")

    case _ => usage()
  }
}
