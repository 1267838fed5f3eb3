package graft
import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke: `SparkEntry.entry` on
  * sf0.001 must return rows. `runMain graft.EntrySmoke`.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"metric":"entry_rows","value":$n}""")
    require(n > 0, "flagship entry returned no rows")
    spark.stop()
  }
}
