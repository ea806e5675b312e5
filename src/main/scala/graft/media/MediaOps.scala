package graft.media

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * decode / feature-extract step is a per-partition batch kernel
  * (mapPartitions) so a real codec drops in without changing the plan
  * shape. The actual pixel/sample decoding is STUBBED — this container has
  * no image/audio codecs — with a deterministic fake (documented below);
  * schema, partitioning, batch shape and the Spark-side plumbing are real.
  */
object MediaOps {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false),
    StructField("frame_samples", ArrayType(LongType), nullable = false)))

  /** Deterministic synthetic payload: media_id -> pseudo-random bytes.
    * Stands in for real encoded image/audio bytes. */
  def synthesize(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n).select(col("id").as("media_id"),
      // payload: md5 hex of the id, repeated 8x, as binary (256 bytes)
      repeat(md5(col("id").cast("string").cast("binary")), 8).cast("binary").as("payload"))
  }

  /** STUB decode: a real implementation would decode the image/audio here
    * (e.g. JPEG -> HxWx3, PCM -> samples) inside this partition iterator.
    * The fake derives deterministic "dimensions", a byte checksum, and
    * "frame samples" (every 64th byte) so downstream plumbing is testable. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // --- real codec goes here; deterministic fake below ---
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 12).toInt
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
        val frames = (0 until bytes.length by 64).map(j => (bytes(j) & 0xff).toLong).toArray
        Row(id, bytes.length, w, h, sum, frames.toSeq)
      }
    }(enc)
  }

  /** "resize": crop/pad frame samples to a fixed count (plumbing demo). */
  def resizeFrames(features: DataFrame, k: Int): DataFrame =
    features.withColumn("frames_k", slice(concat(col("frame_samples"),
      array_repeat(lit(0L), k)), 1, k))
}
