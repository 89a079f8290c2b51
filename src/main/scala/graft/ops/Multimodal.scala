package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side machinery
  * (schema, batching, partitioning, frame explosion) is real and tested, and
  * the IMAGE codec is real too: [[decodeImages]] decodes PNG/JPEG/BMP/GIF
  * through the JDK's `javax.imageio` (ships with every JVM — no external
  * dependency) inside `mapPartitions`, the one place per-row imperative work
  * is the right Spark shape (decode is opaque binary work no Column
  * expression can express). Audio/video codecs are not in the JDK, so
  * [[decodeStub]] remains the clearly-marked stand-in for those modalities
  * only — swap its body for a JNI/FFI decoder without touching the
  * surrounding plan.
  */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Attach a binary payload column + typed metadata to a DataFrame. The
    * payload here is derived from a text column (deterministic test stand-in
    * for real image/audio bytes).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, modality: String): DataFrame = {
    val payload = col(srcCol).cast("binary")
    df.withColumn("payload", payload)
      .withColumn("meta", struct(
        lit(modality).as("modality"),
        lit("raw/utf8").as("format"),
        length(payload).cast("long").as("n_bytes"),
        md5(payload).as("checksum")))
  }

  /** Real image decode via JDK `javax.imageio`: per-row PNG/JPEG/BMP/GIF
    * decode in `mapPartitions` batches, emitting decoded dimensions,
    * channel count, and mean pixel intensities (sRGB 0–255, color-managed
    * through `getRGB` so the numbers are decoder-independent). Undecodable
    * or null payloads degrade gracefully: stat columns null plus a
    * `decode_error` reason — a poisoned row never kills the 100 TB job.
    *
    * Appended columns: `img_width`, `img_height`, `img_channels` (raster
    * bands — 3 for RGB, 4 for RGBA, 1 for gray), `img_mean` (mean over the
    * R, G and B samples of every pixel), `img_mean_rgb` (per-channel
    * means, length 3) and `decode_error` (null on success).
    *
    * Plan shape at 100 TB: a narrow per-partition map — no shuffle, no
    * driver involvement; CPU-bound decode parallelizes with the scan. Rows
    * stream through one at a time (no batch accumulation), so executor
    * memory holds one decoded image per task, not one per row.
    */
  def decodeImages(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType),
      StructField("img_channels", IntegerType),
      StructField("img_mean", DoubleType),
      StructField("img_mean_rgb", ArrayType(DoubleType)),
      StructField("decode_error", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val stats: Seq[Any] =
          if (r.isNullAt(idx)) Seq(null, null, null, null, null, "null payload")
          else try {
            val bytes = r.getAs[Array[Byte]](idx)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) Seq(null, null, null, null, null, "unsupported format")
            else {
              val w = img.getWidth
              val h = img.getHeight
              // bulk getRGB: one packed-sRGB int per pixel, color-managed —
              // identical values whatever internal raster layout the codec
              // chose (3BYTE_BGR, indexed, gray)
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var sr = 0.0; var sg = 0.0; var sb = 0.0
              var i = 0
              while (i < px.length) {
                val p = px(i)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                i += 1
              }
              val n = (w.toLong * h).toDouble
              Seq(w, h, img.getRaster.getNumBands,
                (sr + sg + sb) / (3.0 * n),
                Seq(sr / n, sg / n, sb / n), null)
            }
          } catch {
            case e: Exception =>
              Seq(null, null, null, null, null,
                s"decode failed: ${e.getClass.getSimpleName}")
          }
        Row.fromSeq(r.toSeq ++ stats)
      }
    }(enc)
  }

  /** Deterministic synthetic image bytes for fixtures and oracle rows: a
    * solid-color width×height RGB image encoded through the REAL JDK PNG
    * encoder, so [[decodeImages]] tests exercise a genuine encode→decode
    * codec round-trip. PNG is lossless, so decoded channel means equal the
    * input color exactly.
    */
  val syntheticPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((w: Int, h: Int, cr: Int, cg: Int, cb: Int) => {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (cr << 16) | (cg << 8) | cb
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    })

  /** STUB decode for the modalities the JDK has no codec for (audio,
    * video): deterministic fake feature extraction from the payload bytes —
    * replace with a JNI/FFI decoder. Produces a fixed-size feature vector
    * derived from the checksum so downstream shapes (Array[Double] of
    * dim 8) are realistic. Images have a REAL decoder: [[decodeImages]].
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val feats = (0 until 8).map { i =>
      (conv(substring(col("meta.checksum"), i * 4 + 1, 4), 16, 10).cast("double") / 65535.0)
    }
    df.withColumn("features", array(feats: _*))
      .withColumn("width", pmod(conv(substring(col("meta.checksum"), 1, 4), 16, 10).cast("long"), lit(1024L)) + 64L)
      .withColumn("height", pmod(conv(substring(col("meta.checksum"), 5, 4), 16, 10).cast("long"), lit(1024L)) + 64L)
  }

  /** Resize planning for image-like payloads: computes the target
    * dimensions (fit inside maxDim, aspect preserved) as pure column
    * arithmetic from the decoded width/height. The actual pixel resample
    * belongs in the decoder stub (no codecs in this container); the plan
    * shape — narrow map, no shuffle — is what carries to 100 TB.
    */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")).cast("double"))
    df.withColumn("resize_scale", round(scale, 6))
      .withColumn("target_width", greatest(round(col("width") * scale, 0).cast("long"), lit(1L)))
      .withColumn("target_height", greatest(round(col("height") * scale, 0).cast("long"), lit(1L)))
  }

  /** Frame sampling for video-like payloads: emit one row per sampled frame
    * offset (every `stride` bytes) — the posexplode pattern a real
    * frame-sampler uses, with partition-friendly output.
    */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.select(col("*"),
        posexplode(sequence(lit(0L), greatest(col("meta.n_bytes") - 1, lit(0L)), lit(stride.toLong)))
          .as(Seq("frame_idx", "byte_offset")))

  /** Batched feature extraction via mapPartitions — the Scala analogue of a
    * Pandas-UDF batch: rows stream through in partition-sized batches with
    * no per-row JVM↔native crossing in the real implementation.
    */
  def batchExtract(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("batch_feature", DoubleType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // STUB: real decoder would process the batch here
        val feat = if (payload == null || payload.isEmpty) 0.0
          else payload.take(64).map(b => (b & 0xff).toDouble).sum / (255.0 * math.min(payload.length, 64))
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }
}
