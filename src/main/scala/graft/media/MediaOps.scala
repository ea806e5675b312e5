package graft.media

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * decode / feature-extract step is a per-partition batch kernel
  * (mapPartitions) so any codec drops in without changing the plan shape.
  *
  * The codecs here are REAL byte-format parsers, self-contained (this
  * container ships no image/audio libraries): 24-bit uncompressed BI_RGB
  * BMP (54-byte header, bottom-up rows, 4-byte row padding) and PCM16
  * mono RIFF/WAVE. [[synthesize]] emits genuine files of both formats with
  * id-deterministic content; [[decodeFeatures]] dispatches on the container
  * magic ('BM' / 'RIFF') and extracts dimensions + content features from
  * the DECODED pixels/samples. JPEG/MP4-class codecs would slot into the
  * same dispatch. */
object MediaOps {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("frame_samples", ArrayType(LongType), nullable = false)))

  // ---- encoders (deterministic synthetic payload generation) --------------

  /** 24-bit BI_RGB BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
    * rows, each padded to 4 bytes. pixel(x, y) returns packed 0xRRGGBB. */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val b = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val v = pixel(x, y) // stored BGR
        b.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte).put(((v >> 16) & 0xff).toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** PCM16 mono RIFF/WAVE at 8 kHz. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Deterministic synthetic media: even ids are BMP images
    * (w = 16 + id%16, h = 16 + id%12), odd ids are WAV clips
    * (256 + id%128 samples). Generated distributively. */
  def synthesize(spark: SparkSession, n: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    spark.range(n).map { id =>
      val payload =
        if (id % 2 == 0) {
          val w = 16 + (id % 16).toInt; val h = 16 + (id % 12).toInt
          encodeBmp(w, h, (x, y) => (((id * 31 + x * 7 + y * 13) % 0x1000000) & 0xffffff).toInt)
        } else {
          val nS = 256 + (id % 128).toInt
          encodeWav(Array.tabulate(nS)(i => ((id * 131 + i * 17) % 8192 - 4096).toShort))
        }
      Row(id, payload)
    }(enc)
  }

  // ---- decoders ------------------------------------------------------------

  /** Decoded image: top-down row-major packed 0xRRGGBB pixels. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val pixelOffset = b.getInt(10)
    val width = b.getInt(18); val height = b.getInt(22)
    require(b.getShort(28) == 24, s"only 24-bit BI_RGB supported, got ${b.getShort(28)}")
    require(b.getInt(30) == 0, "compressed BMP unsupported")
    val rowSize = (width * 3 + 3) / 4 * 4
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowOff = pixelOffset + (height - 1 - y) * rowSize // stored bottom-up
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        px(y * width + x) = ((bytes(o + 2) & 0xff) << 16) |
          ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
        x += 1
      }
      y += 1
    }
    (width, height, px)
  }

  /** Decoded PCM16 mono samples from a RIFF/WAVE container (walks chunks
    * to the 'data' chunk). */
  def decodeWav(bytes: Array[Byte]): Array[Short] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4) == "RIFF" && new String(bytes, 8, 4) == "WAVE", "not a WAV")
    var off = 12
    // bounds-check BEFORE reading each chunk header, and reject negative
    // chunk sizes: a truncated/corrupt container fails with the intended
    // "no data chunk", never a raw StringIndexOutOfBounds
    def chunkTag(o: Int): String = {
      require(o + 8 <= bytes.length, "no data chunk")
      new String(bytes, o, 4)
    }
    while (chunkTag(off) != "data") {
      val sz = b.getInt(off + 4)
      require(sz >= 0, s"corrupt WAV chunk size $sz")
      off += 8 + sz
    }
    val dataSize = b.getInt(off + 4)
    require(dataSize >= 0 && off + 8 + dataSize <= bytes.length, "truncated WAV data chunk")
    Array.tabulate(dataSize / 2)(i => b.getShort(off + 8 + i * 2))
  }

  /** Per-partition decode + feature extraction over real containers. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
          val (w, h, px) = decodeBmp(bytes)
          var sum = 0L; var i = 0
          while (i < px.length) { sum += px(i).toLong * (i + 1); i += 1 }
          // frame samples: luma-ish of the first pixel of every 8th row
          val frames = (0 until h by 8).map(y => (px(y * w) & 0xff).toLong).toArray
          Row(id, "image", bytes.length, w, h, sum, frames.toSeq)
        } else {
          val s = decodeWav(bytes)
          var sum = 0L; var i = 0
          while (i < s.length) { sum += s(i).toLong * (i + 1); i += 1 }
          val frames = (0 until s.length by 64).map(j => s(j).toLong).toArray
          Row(id, "audio", bytes.length, s.length, 1, sum, frames.toSeq)
        }
      }
    }(enc)
  }

  /** "resize": crop/pad frame samples to a fixed count (plumbing demo). */
  def resizeFrames(features: DataFrame, k: Int): DataFrame =
    features.withColumn("frames_k", slice(concat(col("frame_samples"),
      array_repeat(lit(0L), k)), 1, k))

  /** Real pixel-level resize: nearest-neighbour source index per dst pixel
    * (floor(d * src / dst), the classic integer NN rule), re-encoded as
    * BMP. Pure function of the payload — no driver involvement. */
  def resizeBmp(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val (w, h, px) = decodeBmp(bytes)
    encodeBmp(outW, outH, (x, y) =>
      px((y.toLong * h / outH).toInt * w + (x.toLong * w / outW).toInt))
  }

  /** mapPartitions batch resize of every image payload to a fixed thumbnail
    * size (audio rows pass through untouched) — the canonical multimodal
    * normalize step of a training-data pipeline: same schema in and out, so
    * it composes anywhere in the media pipeline. */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val schema = media.select("media_id", "payload").schema
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out =
          if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
            resizeBmp(bytes, outW, outH)
          else bytes
        Row(r.getLong(0), out)
      }
    }(enc)
  }

  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false)))

  /** Audio frame sampling: fixed-length windows with hop, per-frame RMS +
    * zero-crossing count (the standard cheap audio quality/VAD features).
    * One row per (clip, frame); non-audio payloads contribute nothing. */
  def audioFrames(media: DataFrame, frameLen: Int = 64, hop: Int = 32): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameFeatureSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes.length >= 4 && new String(bytes, 0, 4) == "RIFF") {
          val s = decodeWav(bytes)
          val id = r.getLong(0)
          val nFrames = if (s.length < frameLen) 0 else (s.length - frameLen) / hop + 1
          (0 until nFrames).iterator.map { f =>
            val off = f * hop
            var sum2 = 0.0; var zc = 0; var i = 0
            while (i < frameLen) {
              val v = s(off + i).toDouble
              sum2 += v * v
              if (i > 0 && (s(off + i) < 0) != (s(off + i - 1) < 0)) zc += 1
              i += 1
            }
            Row(id, f, math.sqrt(sum2 / frameLen), zc)
          }
        } else Iterator.empty
      }
    }(enc)
  }
}
