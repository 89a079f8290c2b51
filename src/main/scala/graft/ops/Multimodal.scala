package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side machinery
  * (schema, batching, partitioning, frame explosion) is real and tested; the
  * actual codec step is STUBBED — this container has no image/audio
  * libraries, so `decodeStub` produces deterministic fake features clearly
  * marked as such. Swap `decodeStub`'s body for a real decoder (JNI/FFI or
  * `mapInPandas` on the PySpark side) without touching the surrounding plan.
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

  /** STUB decode: deterministic fake feature extraction from the payload
    * bytes (`???`-equivalent — replace with a real codec). Produces a
    * fixed-size feature vector derived from the checksum so downstream
    * shapes (Array[Double] of dim 8) are realistic.
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
