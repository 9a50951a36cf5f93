package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support — extension scope
  * (SURVEY.md §7.2 M8). The design treats media as opaque `binary` payload
  * columns plus a typed metadata struct, exactly the shape a 100 TB
  * training-data pipeline shuffles around:
  *
  *  - payloads stay binary end-to-end (no base64 round-trips, no
  *    driver-side materialization);
  *  - metadata (mime/width/height/duration) is a first-class struct column,
  *    so pruning/filtering on it never touches payload bytes — with parquet
  *    column pruning, a `filter(meta.width > 512)` scan reads ONLY the
  *    metadata column;
  *  - decode / feature-extract run per-partition over batches. The actual
  *    codec calls are STUBBED (this container has no image/audio libraries)
  *    behind [[DecodeStub]] — deterministic fakes with the real Spark
  *    plumbing (schema, batching, partition mapping) in place, so swapping
  *    in a real codec is a one-function change.
  */
object Multimodal {

  /** Metadata struct carried next to every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Pack a text column into a fake "media" payload: a 16-byte header
    * (magic + deterministic pseudo-dimensions derived from the content
    * hash) followed by the utf-8 bytes. Stands in for real image bytes so
    * the binary plumbing is exercised end-to-end with reproducible data.
    */
  def packFake(text: Column): Column = {
    val h = F.xxhash64(text)
    val w = (F.pmod(h, F.lit(1024L)) + 1).cast("int")
    val ht = (F.pmod(F.shiftrightunsigned(h, 10), F.lit(1024L)) + 1).cast("int")
    F.struct(
      F.to_binary(F.concat(F.lit("FAKE"), F.lpad(w.cast("string"), 6, "0"),
        F.lpad(ht.cast("string"), 6, "0"), text), F.lit("utf-8")).as("payload"),
      F.struct(
        F.lit("image/fake").as("mime"),
        w.as("width"),
        ht.as("height"),
        (F.octet_length(text) + 16).cast("long").as("n_bytes")).as("meta"))
  }

  /** Attach payload+meta columns to a frame from a text source column. */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame = {
    val packed = packFake(F.col(textCol))
    df.withColumn("payload", packed.getField("payload"))
      .withColumn("meta", packed.getField("meta"))
  }

  /** STUB decode: parses the fake 16-byte header back out of the payload —
    * the real implementation would hand `payload` to an image codec. The
    * signature (binary in, struct out, pure projection) is the real
    * contract; only the body is fake.
    */
  def decodeStub(payload: Column): Column = {
    val s = payload.cast("string")
    F.struct(
      F.when(F.substring(s, 1, 4) === "FAKE", F.lit("image/fake"))
        .otherwise(F.lit("unknown")).as("mime"),
      F.substring(s, 5, 6).cast("int").as("width"),
      F.substring(s, 11, 6).cast("int").as("height"),
      F.octet_length(payload).cast("long").as("n_bytes"))
  }

  /** STUB feature extraction: a fixed-length feature vector per payload.
    * Real pipelines run a vision encoder here via per-partition batched
    * inference; the stub derives a deterministic 8-dim vector from content
    * hashes so downstream similarity plumbing can be tested. Shape contract
    * (array<float> per row, computed in a projection, batched per
    * partition) is the real one.
    */
  def featuresStub(payload: Column, dim: Int = 8): Column =
    F.array((0 until dim).map { i =>
      (F.pmod(F.xxhash64(payload, F.lit(i)), F.lit(1000L)).cast("double") / 500.0 - 1.0)
        .cast("float")
    }: _*)

  /** STUB resize: returns a payload whose fake header carries the new
    * dimensions (a real implementation re-encodes pixels). Demonstrates
    * payload→payload transforms staying distributed and binary.
    */
  def resizeStub(payload: Column, w: Int, h: Int): Column = {
    val s = payload.cast("string")
    F.to_binary(F.concat(
      F.lit("FAKE"),
      F.lpad(F.lit(w).cast("string"), 6, "0"),
      F.lpad(F.lit(h).cast("string"), 6, "0"),
      F.substring(s, 17, Int.MaxValue - 16)), F.lit("utf-8"))
  }

  /** Batched per-partition decode — the plumbing shape of real codec /
    * model-inference integration (a vision encoder wants payload BATCHES,
    * not single rows): `mapPartitions` accumulates up to `batchSize`
    * payloads, hands each batch to the (stubbed) kernel in one call, and
    * streams results back. Schema, partitioning and batch shape are the
    * real contract; only [[DecodeKernel.decodeBatch]] is fake.
    *
    * Output schema: input columns + `mime`, `width`, `height`, `n_bytes`.
    */
  def decodeBatched(df: DataFrame, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields ++ MetaSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = DecodeKernel.decodeBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)).toArray)
        batch.iterator.zip(decoded.iterator).map { case (r, d) =>
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ Seq(d.mime, d.width, d.height, d.nBytes))
        }
      }
    }(encoder)
  }

  /** STUB frame sampling for video-shaped payloads: emits `n` pseudo-frames
    * per payload (explode — the real row-multiplying shape), each a slice
    * of the source bytes with its own index.
    */
  def sampleFramesStub(df: DataFrame, payloadCol: String, n: Int): DataFrame =
    df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
      .withColumn("frame",
        F.substring(F.col(payloadCol).cast("string"),
          (F.col("frame_idx") * 8 + 17).cast("int"), F.lit(8)))
}

/** Batch decode kernel — the one swap point for a real codec. STUB: parses
  * the fake header written by [[Multimodal.packFake]].
  */
object DecodeKernel {
  final case class Decoded(mime: String, width: Int, height: Int, nBytes: Long)

  def decodeBatch(payloads: Array[Array[Byte]]): Array[Decoded] =
    payloads.map { bytes =>
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (s.startsWith("FAKE") && s.length >= 16)
        Decoded("image/fake", s.substring(4, 10).toInt, s.substring(10, 16).toInt,
          bytes.length.toLong)
      else Decoded("unknown", 0, 0, bytes.length.toLong)
    }
}
