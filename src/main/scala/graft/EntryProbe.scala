package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-entry timing probe (not part of the driver contract):
  * runs the named SparkEntry queries N times each against a sf dir with
  * the same warm-up Bench uses, printing every trial — separates one-time
  * plan/IO costs from steady-state query cost.
  *
  * runMain graft.EntryProbe <sfDir> <trials> <name>[,<name>…]
  */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val trials = if (args.length > 1) args(1).toInt else 2
    val names: Seq[String] =
      if (args.length > 2) args(2).split(',').toSeq
      else Seq("rescore_topn", "result_grouping", "time_travel", "stream_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmView = IndexCache.documentsIndex(spark, sfDir)
    graft.search.BmwSearch.topK(spark, warmView, Seq("spark"), 5).count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to trials).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[entry-probe] $name%-24s trial $i ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
