package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary-in, typed-features-out, batch-shaped,
  * deterministic, partition-preserving (narrow).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("extractFeatures: schema, determinism, narrow partitioning") {
    import spark.implicits._
    val media = (0L until 64L).map(i =>
      (i, Array.tabulate(32)(j => ((i * 31 + j) % 251).toByte)))
      .toDF("doc_id", "media").repartition(7)
    val out = Multimodal.extractFeatures(spark, media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "n_frames", "feature"))
    assert(out.rdd.getNumPartitions == 7) // narrow: no shuffle
    val a = out.orderBy("doc_id").collect().map(_.toSeq.take(5)).toSeq
    val b = Multimodal.extractFeatures(spark, media)
      .orderBy("doc_id").collect().map(_.toSeq.take(5)).toSeq
    assert(a == b)
    val r0 = out.where(col("doc_id") === 0L).head()
    assert(r0.getLong(1) == 32L)
    assert(r0.getAs[scala.collection.Seq[Float]]("feature").length == 8)
  }

  test("mediaFeatures runs over the documents corpus") {
    val n = Multimodal.mediaFeatures(spark, dir).count()
    assert(n == 500L)
  }

  test("binaryMeta html render matches HtmlCodec bytes") {
    import spark.implicits._
    val metas = Multimodal.binaryMeta(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    docs.take(20).foreach { case (id, text) =>
      val html = graft.analysis.HtmlCodec.render(s"doc $id", text)
      assert(metas(id)._1 == html.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(html).map("%02x".format(_)).mkString
      assert(metas(id)._2 == md)
    }
  }
}
