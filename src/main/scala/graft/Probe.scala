package graft

import org.apache.spark.sql.SparkSession
import graft.index._
import graft.synth.CorpusSynth

/** Dev-only phase-timing probe for the index build (not part of the
  * driver contract). runMain graft.Probe [nDocs] [cpus]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = Indexer.asDocInput(spark,
      CorpusSynth.corpusWithIds(spark, nDocs, 42L, cpus * 2))
    // warm JIT
    Indexer.buildTables(spark, Indexer.asDocInput(spark,
      CorpusSynth.corpusWithIds(spark, nDocs / 10, 42L, cpus * 2)), 1L << 14)
      .postings.count()

    t("synth+analyze (narrow)") {
      Indexer.analyzeCorpus(spark, corpus, 1L << 14,
        graft.analysis.Analyzer.EnglishStopWords).count()
    }
    t("…+invert count") {
      Indexer.invert(spark, corpus, 1L << 14,
        graft.analysis.Analyzer.EnglishStopWords).count()
    }
    t("full shuffle+encode count") {
      Indexer.buildTables(spark, corpus, 1L << 14).postings.count()
    }
    val out = "/tmp/graft-probe-out"
    t("postings write parquet") {
      Indexer.buildTables(spark, corpus, 1L << 14).postings
        .write.mode("overwrite").parquet(s"$out/postings")
    }
    t("docmeta write parquet") {
      Indexer.buildDocMeta(spark, corpus, 1L << 14,
        graft.analysis.Analyzer.EnglishStopWords).toDF()
        .write.mode("overwrite").parquet(s"$out/docmeta")
    }
    t("terms from written") {
      val w = spark.read.parquet(s"$out/postings").as[PostingBlockRow]
      Indexer.buildTerms(w).write.mode("overwrite").parquet(s"$out/terms")
    }
    t("full IndexWriter.build") {
      val d = new java.io.File("/tmp/graft-probe-idx")
      def rm(p: java.io.File): Unit = { if (p.isDirectory) p.listFiles.foreach(rm); p.delete() }
      rm(d)
      IndexWriter.build(spark, corpus, d.getPath, 1L << 14, nBatches = 2,
        knownMaxDoc = nDocs)
    }
    spark.stop()
  }
}

/** Phase-timing of the durable build actions. runMain graft.Probe2 [nDocs] [cpus] */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cp = ScalingBench.corpusPath(nDocs)
    // JIT warm
    IndexWriter.build(spark, Indexer.asDocInput(spark,
      CorpusSynth.corpusWithIds(spark, nDocs/10, 42L, cpus*2)),
      "/tmp/graft-probe2-warm", 1L << 14, knownMaxDoc = nDocs/10)
    def rm(p: java.io.File): Unit = { if (p.isDirectory) p.listFiles.foreach(rm); p.delete() }
    rm(new java.io.File("/tmp/graft-probe2-warm"))

    val corpus = Indexer.asDocInput(spark, spark.read.parquet(cp))
    val bd = "/tmp/graft-probe2-idx"
    rm(new java.io.File(bd))
    val stop = graft.analysis.Analyzer.EnglishStopWords
    t("TOTAL") {
      val doPersist = sys.env.get("PROBE_PERSIST").forall(_ == "1")
      val analyzed0 = Indexer.analyzeCorpus(spark, corpus, 1L << 14, stop)
      val analyzed = if (doPersist)
        analyzed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else analyzed0
      val postings = Indexer.buildPostings(spark,
        Indexer.invertAnalyzed(spark, analyzed))
      t("postings write") { postings.write.mode("overwrite").parquet(s"$bd/postings") }
      t("docmeta write") { Indexer.docMeta(spark, analyzed).toDF()
        .write.mode("overwrite").parquet(s"$bd/docmeta") }
      t("analyzed.count") { analyzed.count() }
      val written = spark.read.parquet(s"$bd/postings").as[PostingBlockRow]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("terms write") { Indexer.buildTerms(written).write.mode("overwrite").parquet(s"$bd/terms") }
      t("stats agg") { written.agg(count(lit(1)), coalesce(sum("doc_count"), lit(0L)),
          coalesce(sum(length(col("docs"))), lit(0L)),
          countDistinct(col("segment_id"), col("term"))).head() }
      written.unpersist(false); if (doPersist) analyzed.unpersist(false)
    }
    spark.stop()
  }
}

/** Per-stage wall/straggler report of one scaling-config build.
  * runMain graft.Probe3 [nDocs] [cpus]
  */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class St(id: Int, name: String, wall: Double, maxTask: Double,
                        tasks: Int, sumTask: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60), wall, 0, si.numTasks, 0)
      }
    })
    val cp = ScalingBench.corpusPath(nDocs)
    val corpus = Indexer.asDocInput(spark, spark.read.parquet(cp))
    // warm
    IndexWriter.build(spark, Indexer.asDocInput(spark,
      CorpusSynth.corpusWithIds(spark, nDocs / 10, 42L, cpus * 2)),
      "/tmp/graft-probe3-warm", 1L << 14, knownMaxDoc = nDocs / 10, indexPositions = false)
    def rm(p: java.io.File): Unit = { if (p.isDirectory) p.listFiles.foreach(rm); p.delete() }
    rm(new java.io.File("/tmp/graft-probe3-warm"))
    stages.clear()
    val t0 = System.nanoTime()
    rm(new java.io.File("/tmp/graft-probe3-idx"))
    IndexWriter.build(spark, corpus, "/tmp/graft-probe3-idx", 1L << 14,
      nBatches = 2, knownMaxDoc = nDocs, indexPositions = false)
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"[probe3] TOTAL $total%.1f s, stage wall sum ${stages.map(_.wall).sum}%.1f s")
    stages.sortBy(-_.wall).take(12).foreach { s =>
      println(f"[probe3] stage ${s.id}%3d ${s.wall}%7.2f s  tasks=${s.tasks}%4d  ${s.name}")
    }
    spark.stop()
  }
}
