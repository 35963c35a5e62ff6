package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode/feature-extract
  * kernels.
  *
  * The Spark-side design is the real deliverable: media rides in a
  * BinaryType column next to a metadata struct; per-partition batched
  * processing via `mapPartitions` over a typed Dataset (the Scala
  * equivalent of Python's `mapInPandas` batch shape); partitioning is
  * by content-size band so decode work balances across executors even
  * when a few files are huge.
  *
  * STUB — the actual codec step: this container ships no image/audio
  * libraries, so `decodeStub` below produces deterministic fake
  * features derived from the raw bytes. Swap `decodeStub` for a JNI/
  * javacv decoder in production; every signature and the batch shape
  * stay identical.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                           content_hash: String, feature: Array[Float])

  /** Build a media table from any (id, payload-string) source — used by
    * tests to fabricate binary payloads deterministically. */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("media"),
      (length(col(textCol)) % 640).cast("int").as("width"),
      (length(col(textCol)) % 480).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** STUB decoder: deterministic 8-dim "embedding" from byte statistics.
    * Replace with a real codec; keeps the exact batch/partition shape. */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { f(i % 8) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < 8) { f(j) /= bytes.length; j += 1 } }
    f
  }

  /** Batched decode/feature-extract: one partition = one batch stream;
    * no per-row task overhead, no driver collection. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "media", "width", "height", "sample_rate")
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          md.reset()
          val hash = md.digest(r.media).map("%02x".format(_)).mkString
          MediaFeatures(r.media_id, r.kind, r.media.length.toLong, hash, decodeStub(r.media))
        }
      }
  }

  /** Frame/segment sampling plumbing: fixed-size byte windows every
    * `strideBytes` — the partition/batch shape of real frame sampling,
    * with byte slicing standing in for codec seeks. */
  def sampleSegments(media: DataFrame, segmentBytes: Int, strideBytes: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
        explode(
          transform(
            sequence(lit(0), greatest(lit(0),
              floor((length(col("media")) - 1) / strideBytes).cast("int"))),
            i => struct(i.as("segment_idx"),
              substring(col("media"), (i * strideBytes + 1).cast("int"), lit(segmentBytes))
                .as("segment")))).as("s"))
      .select(col("media_id"), col("kind"), col("s.segment_idx"), col("s.segment"))
      .where(length(col("segment")) > 0)

  /** Size-band repartitioning so a few huge blobs don't skew decode. */
  def balancedBySize(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, pmod(hash(col("media_id"), length(col("media"))), lit(partitions)))

  case class ResizedMedia(media_id: Long, kind: String, media: Array[Byte],
                          width: Int, height: Int)

  /** Resize: REAL nearest-neighbor resampling when the blob is a raw
    * 8-bit grayscale raster (width*height == byte length — the shape a
    * real decoder would hand over); blobs still in a codec container
    * pass through unchanged, marked by width/height 0, because the
    * decode step is the stubbed part. Same mapPartitions batch shape as
    * [[extractFeatures]]: at scale each partition streams its blobs
    * through one task, no driver collection, size-balanced upstream by
    * [[balancedBySize]]. */
  def resizeRaster(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    media.select("media_id", "kind", "media", "width", "height", "sample_rate")
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        if (r.width > 0 && r.height > 0 && r.width.toLong * r.height == r.media.length) {
          val out = new Array[Byte](targetW * targetH)
          var y = 0
          while (y < targetH) {
            val srcRow = (y.toLong * r.height / targetH).toInt * r.width
            var x = 0
            while (x < targetW) {
              out(y * targetW + x) = r.media(srcRow + (x.toLong * r.width / targetW).toInt)
              x += 1
            }
            y += 1
          }
          ResizedMedia(r.media_id, r.kind, out, targetW, targetH)
        } else ResizedMedia(r.media_id, r.kind, r.media, r.width, r.height)
      })
  }
}
