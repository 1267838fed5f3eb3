package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media row: typed metadata + a small feature vector.
  * The decode itself is a STUB (no image/audio codecs in this sandbox —
  * deterministic fake derived from the bytes); the Spark-side plumbing
  * (binary column, batch-shaped mapPartitions, fixed output schema,
  * partition-count preservation) is real and tested.
  */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                               height: Int, n_frames: Int,
                               feature: Array[Float])

/**
 * Multimodal columns: media as opaque `binary` with typed metadata.
 * The corpus' `html:binary` plays the media role (same plumbing as
 * image/audio: bytes in, features out). Decode / feature-extraction
 * runs batch-wise in `mapPartitions` — the Scala analog of
 * `mapInPandas` batches: one partition = one decode batch, codecs
 * initialized once per partition, not per row.
 */
object Multimodal {

  /** STUB decode — deterministic fake. A real build swaps in an image
    * codec here (???-equivalent); everything around it stays.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    val width = 64 + (Math.floorMod(h, 1024L)).toInt
    val height = 64 + (Math.floorMod(h >>> 12, 1024L)).toInt
    val nFrames = 1 + (Math.floorMod(h >>> 24, 8L)).toInt
    val feat = Array.tabulate(8) { j =>
      (Math.floorMod(h >>> (j * 7), 2000L).toFloat / 1000f) - 1f
    }
    (width, height, nFrames, feat)
  }

  /** Batch feature extraction over a binary media column. Input shape:
    * (doc_id, media:binary). Narrow — no shuffle; scales linearly.
    */
  def extractFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition (= per-batch) codec init happens here, once
        it.map { case (id, bytes) =>
          val (w, hgt, nf, feat) = decodeStub(bytes)
          MediaFeatures(id, bytes.length.toLong, w, hgt, nf, feat)
        }
      }.toDF()
  }

  /** Driver-entry shape over `documents`: render the deterministic html
    * (binary media stand-in) and extract features. Feature vector is
    * reduced to a stable integer hash for the dump.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.analysis.HtmlCodec.render(s"doc $id", text))
      }.toDF("doc_id", "media")
    extractFeatures(s, media)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("n_frames"))
  }

  /** Binary metadata extraction with a SQL-expressible oracle: the html
    * render of `documents` rows is pure string concat (corpus text has
    * no escapable chars), so byte length + md5 are reproducible in
    * DuckDB exactly.
    */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>doc "), col("doc_id"), lit("</title></head>"),
      lit("<body><p>"), col("text"), lit("</p></body></html>"))
    s.read.parquet(s"$dir/documents.parquet")
      // octet_length, not length: n_bytes must be the UTF-8 BYTE count
      // (= extractFeatures' bytes.length), not the character count —
      // they differ the moment the corpus gains a non-ASCII char
      .select(col("doc_id"), octet_length(html).cast("long").as("n_bytes"),
        md5(html).as("content_md5"))
  }
}
