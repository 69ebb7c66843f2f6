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
  * Decode/feature-extraction kernels (round 2): [[JdkDecoder]] does REAL
  * decoding with pure-JDK codecs — `javax.imageio` (PNG/JPEG/GIF/BMP
  * decode + Graphics2D resize re-encode) and `javax.sound.sampled` (WAV
  * PCM) — no external libraries needed. [[StubDecoder]] remains the
  * deterministic fallback for codecs the JDK lacks (video). The
  * Spark-side plumbing is shared and tested either way: `binaryFile`
  * ingest, metadata schema, batched `mapPartitions` with a fixed batch
  * shape (what a vectorized Arrow boundary needs at scale), partition
  * sizing, and the downstream feature-table contract (`Array[Float]`
  * embedding column feeding [[Similarity]]).
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

  /** Deterministic synthetic image assets for the composition demo: a
    * 32×32 grayscale PNG per input id, split into 2×2 quadrants whose gray
    * value is pure integer arithmetic in the id —
    * `v_q = (id*37 + q*59) mod 251`. Because r=g=b and the luminance
    * weights sum to 1000 exactly (299+587+114), [[JdkDecoder.decodeImage]]
    * recovers `v_q` EXACTLY per 4×4 grid cell, so the decoded feature
    * vector is closed-form in the id: `feat[g] = v_{(g/8)*2+(g%4)/2} /
    * 127.5 - 1`. That analytic invertibility is what makes the full
    * decode→embed→ANN catalog query (`q_multimodal_ann`) oracle-able in
    * SQL while exercising the REAL javax.imageio encode+decode path.
    */
  def syntheticImageAssets(ids: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(assetSchema)
    ids.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val img = new java.awt.image.BufferedImage(32, 32,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val q = (y / 16) * 2 + (x / 16)
              val v = (((id * 37 + q * 59) % 251) + 251) % 251
              val vi = v.toInt
              img.setRGB(x, y, (vi << 16) | (vi << 8) | vi)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          Row(id, s"synthetic:$id", "image", bytes.length.toLong, bytes)
        }
      }(enc)
  }

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

  /** REAL decode kernels on pure-JDK codecs — no external libraries:
    * `javax.imageio` reads PNG/JPEG/GIF/BMP, `javax.sound.sampled` reads
    * WAV. This replaces the round-1 stub for those formats (the stub
    * remains the documented fallback for codecs the JDK lacks, e.g.
    * video).
    *
    * Features are deliberately simple, deterministic signal summaries fit
    * for dedup/similarity blocking:
    *  - image → (width, height, 16-dim = 4×4 grid of mean luminance
    *    scaled to [-1, 1]);
    *  - audio WAV → (frame count, channels, 16-dim = RMS per 1/16th of
    *    the clip, scaled to [-1, 1] against full-scale PCM).
    */
  object JdkDecoder {
    val FeatureDim = 16

    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val sums = new Array[Double](FeatureDim)
        val counts = new Array[Int](FeatureDim)
        var y = 0
        while (y < h) {
          val gy = math.min(3, y * 4 / h)
          var x = 0
          while (x < w) {
            val gx = math.min(3, x * 4 / w)
            val rgb = px(y * w + x)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            val g = gy * 4 + gx
            sums(g) += lum; counts(g) += 1
            x += 1
          }
          y += 1
        }
        val feat = Array.tabulate(FeatureDim)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i) / 127.5 - 1.0).toFloat)
        Some((w, h, feat))
      }
    } catch { case _: Exception => None } // corrupt-but-recognized bytes throw from ImageIO

    /** Real resize: decode, scale with Graphics2D (bilinear), re-encode
      * PNG. Aspect ratio preserved; no-op when already within `maxSide`.
      */
    def resizeImage(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] = try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val s = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
        if (s >= 1.0) Some(bytes)
        else {
          val w = math.max(1, (img.getWidth * s).toInt)
          val h = math.max(1, (img.getHeight * s).toInt)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      }
    } catch { case _: Exception => None }

    def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val data = in.readAllBytes()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val frameSize = math.max(1, fmt.getFrameSize)
        val nFrames = data.length / frameSize
        if (nFrames == 0) None
        else {
          // RMS over 16 equal time segments, first channel, 16-bit LE PCM
          val feat = new Array[Float](FeatureDim)
          var seg = 0
          while (seg < FeatureDim) {
            val from = (nFrames.toLong * seg / FeatureDim).toInt
            val until = math.max(from + 1, (nFrames.toLong * (seg + 1) / FeatureDim).toInt)
            var acc = 0.0
            var f = from
            while (f < math.min(until, nFrames)) {
              val off = f * frameSize
              val sample =
                if (bytesPerSample >= 2)
                  ((data(off + 1) << 8) | (data(off) & 0xff)).toDouble / 32768.0
                else (data(off).toDouble) / 128.0
              acc += sample * sample
              f += 1
            }
            feat(seg) = (math.sqrt(acc / math.max(1, until - from)) * 2 - 1).toFloat
            seg += 1
          }
          Some((nFrames, fmt.getChannels, feat))
        }
      } catch { case _: Exception => None }

    /** Route by media type; undecodable payloads fall back to the
      * deterministic stub so the pipeline never drops rows silently.
      */
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val real = mediaType match {
        case "image" => decodeImage(bytes)
        case "audio" => decodeWav(bytes)
        case _ => None
      }
      real.getOrElse(StubDecoder.decode(bytes))
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
  def extractFeatures(assets: DataFrame, batchSize: Int = 64,
                      real: Boolean = false): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a vectorized kernel would decode `batch` in
          // one call; the JDK codecs decode per element within the batch
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("content")
            val (w, h, feat) =
              if (real) JdkDecoder.decode(r.getString(1), bytes)
              else StubDecoder.decode(bytes)
            Row(r.getLong(0), r.getString(1), w, h, feat.toIndexedSeq)
          }
        }
      }(enc)
  }

  /** Real payload resize over the asset table (javax.imageio re-encode);
    * non-image or undecodable rows pass through unchanged.
    */
  def resizeAssets(assets: DataFrame, maxSide: Int): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(assetSchema)
    assets.select("asset_id", "uri", "media_type", "n_bytes", "content")
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val out =
            if (r.getString(2) == "image")
              JdkDecoder.resizeImage(bytes, maxSide).getOrElse(bytes)
            else bytes
          Row(r.getLong(0), r.getString(1), r.getString(2), out.length.toLong, out)
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
