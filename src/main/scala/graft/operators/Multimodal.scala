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
  *  - decode / feature-extract run per-partition over batches.
  *    IMAGE DECODE IS REAL: [[DecodeKernel]] reads PNG/JPEG/GIF/BMP
  *    through the JDK's own `javax.imageio` (no external dependency —
  *    headless, ships in every JRE), and [[DecodeKernel.resizeBatch]]
  *    re-encodes through `java.awt` scaling. Only the fake "FAKE"-header
  *    format (kept for deterministic plumbing tests) and the
  *    model-inference feature extractor remain stubs — a vision encoder
  *    genuinely isn't in a JDK.
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

  /** STUB feature extraction — FAKE-FORMAT ONLY since round 11: real
    * decodable images get REAL pixel-derived features from
    * [[featuresBatched]] (grid mean-luma, see
    * [[DecodeKernel.featuresBatch]]); this stub remains only as the
    * vision-encoder stand-in for fake plumbing payloads (a learned
    * encoder genuinely can't run in a bare JDK). It derives a
    * deterministic vector from content hashes so downstream similarity
    * plumbing stays testable on fake data. Shape contract (array<float>
    * per row, computed in a projection, batched per partition) is the
    * real one.
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
    * payloads, hands each batch to [[DecodeKernel.decodeBatch]] in one
    * call, and streams results back. PNG/JPEG/GIF/BMP payloads decode for
    * real (JDK ImageIO — header-only dimension reads, pixels untouched);
    * the fake format keeps its deterministic parse for plumbing tests.
    *
    * Output schema: input columns + `mime`, `width`, `height`, `n_bytes`.
    */
  def decodeBatched(df: DataFrame, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val clash = df.schema.fieldNames.toSet
      .intersect(MetaSchema.fieldNames.toSet)
    require(clash.isEmpty,
      s"decodeBatched appends ${MetaSchema.fieldNames.mkString("/")}, but " +
        s"the input already has: ${clash.mkString(", ")} — rename or drop " +
        "them first (a duplicate-name schema fails far from here)")
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

  /** REAL batched feature extraction for decodable images: appends a
    * `features` array<float> column (grid² mean-luma cells in [0,1] —
    * [[DecodeKernel.featuresBatch]]) through the same
    * mapPartitions-batched shape as [[decodeBatched]] (a codec or a
    * model wants payload BATCHES, not single rows). Fake-format and
    * undecodable payloads get NULL features — observable and
    * quarantinable, never silently fabricated. The output column feeds
    * the ANN operators directly (e.g. `Similarity.bruteForceTopK` /
    * `buildIvfIndex` on `features`), making payload → pixels → features
    * → nearest-neighbors a fully real path end-to-end.
    */
  def featuresBatched(df: DataFrame, payloadCol: String, grid: Int = 8,
      batchSize: Int = 64): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    require(!df.schema.fieldNames.contains("features"),
      "featuresBatched appends `features`, but the input already has it")
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = DecodeKernel.featuresBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)).toArray, grid)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ (if (f == null) null else f.toSeq))
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

  /** Batched per-partition image RESIZE (payload → payload, distributed,
    * binary end-to-end): real images decode, scale through `java.awt`
    * and re-encode as PNG ([[DecodeKernel.resizeBatch]]); fake payloads
    * keep the header rewrite of [[resizeStub]]; undecodable payloads pass
    * through untouched (a corrupt image must not kill a 100 TB job — pair
    * with [[decodeBatched]]'s `mime = "unknown"` to quarantine them).
    * Output schema: input columns with `payloadCol` replaced.
    */
  def resizeBatched(df: DataFrame, payloadCol: String, w: Int, h: Int,
      batchSize: Int = 64): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val resized = DecodeKernel.resizeBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)).toArray, w, h)
        batch.iterator.zip(resized.iterator).map { case (r, p) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(payloadIdx, p))
        }
      }
    }(encoder)
  }
}

/** Batch image kernel — REAL for PNG/JPEG/GIF/BMP via the JDK's
  * `javax.imageio` (zero external dependencies; forced headless); the
  * deterministic fake "FAKE"-header format is kept for plumbing tests.
  *
  * Decode reads dimensions from the image HEADER only
  * (`ImageReader.getWidth/getHeight` before any pixel access) — O(header)
  * per payload, not O(pixels), which is the difference between a metadata
  * backfill over 100 TB of images touching kilobytes vs terabytes per
  * task. Undecodable bytes yield `mime = "unknown"` with zero dims —
  * never an exception (one corrupt image must not fail a stage).
  */
object DecodeKernel {
  // image codecs must never try to contact a display from an executor
  private lazy val headless: Unit = System.setProperty("java.awt.headless", "true")

  final case class Decoded(mime: String, width: Int, height: Int, nBytes: Long)

  private def mimeOf(formatName: String): String =
    formatName.toLowerCase match {
      case "png" => "image/png"
      case "jpeg" | "jpg" => "image/jpeg"
      case "gif" => "image/gif"
      case "bmp" => "image/bmp"
      case other => "image/" + other
    }

  /** Header-only decode of one payload; null if no installed reader
    * recognizes the bytes.
    */
  private def decodeOne(bytes: Array[Byte]): Decoded = {
    headless
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Decoded(mimeOf(reader.getFormatName), reader.getWidth(0),
            reader.getHeight(0), bytes.length.toLong)
        } finally reader.dispose()
      }
    } catch { case _: Exception => null }
    finally iis.close()
  }

  /** The fake format's 4-byte magic, tested on RAW BYTES: decoding a
    * multi-megabyte real-image payload to a UTF-8 String just to check a
    * prefix would copy every payload through a char[] (plus
    * replacement-char decoding of binary) on the hot path.
    */
  private def isFake(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 && bytes(0) == 'F' && bytes(1) == 'A' &&
      bytes(2) == 'K' && bytes(3) == 'E'

  private def fakeHeader(bytes: Array[Byte]): String =
    new String(bytes, 0, 16, java.nio.charset.StandardCharsets.UTF_8)

  def decodeBatch(payloads: Array[Array[Byte]]): Array[Decoded] =
    payloads.map { bytes =>
      // a null payload (missing media row) quarantines like corrupt bytes
      // — never an NPE that kills the stage
      if (bytes == null) Decoded("unknown", 0, 0, 0L)
      else {
        // the fake parse itself is guarded: bytes that happen to start
        // with the magic but carry a malformed header (non-digit or
        // multi-byte UTF-8 where the dimensions belong) quarantine like
        // any other corrupt payload instead of throwing
        val fake =
          if (!isFake(bytes)) null
          else try {
            val s = fakeHeader(bytes)
            Decoded("image/fake", s.substring(4, 10).toInt,
              s.substring(10, 16).toInt, bytes.length.toLong)
          } catch { case _: Exception => null }
        if (fake != null) fake
        else {
          val d = try decodeOne(bytes) catch { case _: Exception => null }
          if (d != null) d else Decoded("unknown", 0, 0, bytes.length.toLong)
        }
      }
    }

  /** REAL classical feature extraction: the grid×grid mean-luma
    * thumbnail (grid² floats in [0,1], row-major) — the aHash-family
    * perceptual descriptor. Each decodable payload's pixels are read
    * through the SAME ImageIO path as [[decodeBatch]], scaled to
    * grid×grid with area-averaging awt scaling, and each cell's RGB goes
    * through the Rec.601 luma weights. Deterministic, model-free, and a
    * REAL function of the pixels — two images that look alike land close
    * in L2, so the vectors flow into the existing ANN operators
    * (bruteForceTopK / IVF / PQ) as first-class embeddings. Fake-format
    * and undecodable payloads return null (callers quarantine them;
    * the fake format keeps its deterministic [[Multimodal.featuresStub]]
    * PROJECTION for plumbing tests — a vision-encoder stand-in, now
    * explicitly fake-only).
    */
  def featuresBatch(payloads: Array[Array[Byte]],
      grid: Int): Array[Array[Float]] =
    payloads.map { bytes =>
      if (bytes == null || isFake(bytes)) null
      else {
        val img =
          try {
            headless
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
        if (img == null) null
        else {
          val thumb = new java.awt.image.BufferedImage(grid, grid,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = thumb.createGraphics()
          try {
            // area-averaging via SCALE_AREA_AVERAGING-equivalent hints:
            // bilinear on the Graphics2D draw is stable across JDKs and
            // headless-safe
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, grid, grid, null)
          } finally g.dispose()
          val out = new Array[Float](grid * grid)
          var y = 0
          while (y < grid) {
            var x = 0
            while (x < grid) {
              val rgb = thumb.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val gg = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              out(y * grid + x) =
                ((0.299f * r + 0.587f * gg + 0.114f * b) / 255.0f)
              x += 1
            }
            y += 1
          }
          out
        }
      }
    }

  /** Full-pixel resize + PNG re-encode of each decodable real image;
    * fake payloads get their header dims rewritten; anything else passes
    * through unchanged.
    */
  def resizeBatch(payloads: Array[Array[Byte]], w: Int,
      h: Int): Array[Array[Byte]] =
    payloads.map { bytes =>
      if (bytes == null) bytes // null payload passes through, like corrupt
      else if (isFake(bytes)) {
        // header rewrite only re-encodes the body; unlike decode there is
        // no digit parse to guard, and a fake-magic-but-binary payload
        // just gets a rewritten header (it decodes as unknown either way)
        val body = new String(bytes, 16, bytes.length - 16,
          java.nio.charset.StandardCharsets.UTF_8)
        ("FAKE" + f"$w%06d" + f"$h%06d" + body)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      } else {
        try {
          headless
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) bytes
          else {
            // ARGB, not RGB: the re-encode target is PNG (alpha-capable),
            // and drawing a transparent PNG/GIF onto an RGB raster would
            // composite its transparent regions onto uninitialized black —
            // silently altering the corpus instead of faithfully resizing
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_ARGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            buf.toByteArray
          }
        } catch { case _: Exception => bytes }
      }
    }
}
