package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the training-data pipeline (north star): media
  * assets are OPAQUE `binary` columns with typed metadata riding alongside
  * — the same stance the reference takes toward its engine blobs (`.bin`
  * snapshots are opaque column arrays until a codec interprets them).
  *
  * Decode/feature-extraction kernels are STUBBED (no image/audio libs in
  * this environment) behind [[StubDecoder]] — a deterministic fake whose
  * output depends only on the bytes — while the Spark-side plumbing is
  * real and tested: `binaryFile` ingest, metadata schema, batched
  * `mapPartitions` with a fixed batch shape (what a vectorized Arrow/pandas
  * UDF boundary needs at scale), partition sizing, and the downstream
  * feature-table contract (`Array[Float]` embedding column feeding
  * [[Similarity]]).
  */
object Multimodal {

  /** Asset table schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("n_bytes", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Ingest a directory of binary files as an asset table; media type is
    * derived from the extension, id from a stable hash of the path.
    * `binaryFile` gives one task per file — scale by file count.
    */
  def ingest(spark: SparkSession, pathGlob: String, mediaType: String = "binary"): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        xxhash64(col("path")).as("asset_id"),
        col("path").as("uri"),
        lit(mediaType).as("media_type"),
        col("length").as("n_bytes"),
        col("content"))

  /** The stubbed decode/feature kernel: deterministic pseudo-features from
    * the payload bytes. REPLACE the body with a real decoder (JNI/FFM to
    * an image or audio library) without touching any Spark plumbing — the
    * signature (bytes → fixed-dim float vector + width/height metadata) is
    * the whole contract.
    */
  object StubDecoder {
    val FeatureDim = 16

    /** Deterministic fake "decoded frame" metadata + feature vector. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val md = MessageDigest.getInstance("MD5").digest(bytes)
      def u8(i: Int) = md(i) & 0xff
      val width = 16 + u8(0) * 4   // fake dims, deterministic in content
      val height = 16 + u8(1) * 4
      val feat = Array.tabulate(FeatureDim) { i =>
        // fake feature: signed byte pairs scaled to [-1, 1]
        ((md(i % md.length) * 256 + u8((i + 3) % md.length)) / 32768.0f)
      }
      (width, height, feat)
    }

    /** Fake resize: metadata-only transform (a real kernel would re-encode). */
    def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val s = math.min(1.0, maxSide.toDouble / math.max(w, h))
      (math.max(1, (w * s).toInt), math.max(1, (h * s).toInt))
    }

    /** Fake frame sampling: one pseudo-frame hash every `stride` bytes —
      * stands in for video frame extraction.
      */
    def frameSample(bytes: Array[Byte], stride: Int): Seq[(Int, String)] = {
      (0 until math.max(1, bytes.length / math.max(stride, 1))).map { f =>
        val from = f * stride
        val until = math.min(bytes.length, from + stride)
        val md = MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(bytes, from, until))
        (f, md.map("%02x".format(_)).mkString)
      }
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Decode + feature-extract, batched per partition. `batchSize` fixes the
    * kernel's batch shape — the knob a real vectorized (Arrow) decoder
    * needs; partitions stream batches, so executor memory is bounded by
    * batchSize × asset size, not partition size.
    */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a real kernel would decode `batch` in one
          // vectorized call; the stub maps per element
          batch.iterator.map { r =>
            val (w, h, feat) = StubDecoder.decode(r.getAs[Array[Byte]]("content"))
            Row(r.getLong(0), r.getString(1), w, h, feat.toIndexedSeq)
          }
        }
      }(enc)
  }

  /** Metadata-only resize over the feature table (no payload rewrite). */
  def resizeMeta(features: DataFrame, maxSide: Int): DataFrame = {
    val s = least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("out_w", greatest(lit(1), floor(col("width") * s).cast("int")))
      .withColumn("out_h", greatest(lit(1), floor(col("height") * s).cast("int")))
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame_hash", StringType, nullable = false)))

  /** Frame sampling (video analogue): one row per sampled pseudo-frame. */
  def sampleFrames(assets: DataFrame, strideBytes: Int = 4096): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(frameSchema)
    assets.select("asset_id", "content")
      .mapPartitions { it =>
        it.flatMap { r =>
          StubDecoder.frameSample(r.getAs[Array[Byte]]("content"), strideBytes)
            .iterator.map { case (f, hsh) => Row(r.getLong(0), f, hsh) }
        }
      }(enc)
  }
}
