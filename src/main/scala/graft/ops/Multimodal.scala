package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns with a typed metadata struct, processed in
  * distributed batches. The *decode* step is environment-dependent (no
  * image/audio codecs in this container) and is STUBBED with a clearly
  * marked deterministic fake — the Spark-side plumbing (schema,
  * partitioning, batch shape, feature extraction pipeline) is real and
  * tested, so swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** Canonical multimodal column schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Packs a payload + metadata into the canonical media struct. */
  def packMedia(content: Column, format: Column, width: Column,
      height: Column, durationMs: Column): Column =
    struct(content.as("content"),
      struct(format.as("format"), width.cast("int").as("width"),
        height.cast("int").as("height"),
        durationMs.cast("long").as("duration_ms")).as("meta"))

  /** STUB decode: a real implementation would decode the codec bytestream
    * (e.g. libjpeg/ffmpeg via a mapPartitions worker). The stub derives
    * deterministic pseudo-features from the bytes so pipelines are fully
    * testable: byte length, first byte, and a 64-bit content checksum. */
  def decodeStub(content: Column): Column =
    struct(
      length(content).cast("long").as("byte_len"),
      // first byte as an int via hex — getbit/bit_get require INTEGRAL
      // inputs and refuse binary outright
      when(length(content) > 0,
        conv(hex(content.substr(1, 1)), 16, 10).cast("int"))
        .otherwise(lit(null).cast("int")).as("first_byte"),
      xxhash64(content).as("checksum"))

  /** "Resize" on metadata only (real resize happens at decode time):
    * clamps the metadata dims preserving aspect ratio. */
  def resizeMeta(media: Column, maxDim: Int): Column = {
    val w = media.getField("meta").getField("width")
    val h = media.getField("meta").getField("height")
    val scale = when(greatest(w, h) <= maxDim, lit(1.0))
      .otherwise(lit(maxDim.toDouble) / greatest(w, h).cast("double"))
    struct(media.getField("content").as("content"),
      struct(media.getField("meta").getField("format").as("format"),
        round(w * scale).cast("int").as("width"),
        round(h * scale).cast("int").as("height"),
        media.getField("meta").getField("duration_ms").as("duration_ms"))
        .as("meta"))
  }

  /** Deterministic frame-sampling plan for a video payload: every
    * `everyMs` milliseconds over the metadata duration — returns the array
    * of timestamps a decoder would extract. */
  def frameSamplePlan(media: Column, everyMs: Long): Column = {
    require(everyMs > 0, s"everyMs must be positive (got $everyMs)")
    val dur = media.getField("meta").getField("duration_ms")
    when(dur.isNull || dur <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), dur - 1, lit(everyMs)))
  }

  /** End-to-end example pipeline: text corpus → fake media blobs →
    * decoded stub features. Demonstrates the real batch shape: the blob
    * never leaves the executors, features are columnar. */
  def featurize(df: DataFrame, idCol: String, payload: Column): DataFrame =
    df.select(col(idCol),
        packMedia(payload, lit("raw"), lit(64), lit(48), lit(0L)).as("media"))
      .select(col(idCol), col("media"),
        decodeStub(col("media").getField("content")).as("features"))

  /** Decoded-media feature row (what a real image/audio decoder would
    * emit per payload). */
  final case class DecodedFeatures(id: Long, byteLen: Long, width: Int,
      height: Int, meanByte: Double)

  /** The executor-side decode pipeline: `mapPartitions` over (id, blob)
    * rows, decoding each payload with the supplied codec inside the
    * partition iterator — the Scala analogue of a pandas/Arrow batch UDF.
    * The codec runs once per row on the executor; blobs never travel to
    * the driver. Swap [[stubCodec]] for a real libjpeg/ffmpeg binding in
    * production — the plumbing (schema, encoder, partition batching) is
    * identical. */
  def decodePartitions(df: DataFrame, idCol: String, blobCol: String)(
      codec: Array[Byte] => (Int, Int, Double))
      : org.apache.spark.sql.Dataset[DecodedFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val bytes = if (blob == null) Array.emptyByteArray else blob
        val (w, h, mean) = codec(bytes)
        DecodedFeatures(id, bytes.length.toLong, w, h, mean)
      })
  }

  /** STUB codec: deterministic pseudo-decode (dimensions and mean byte
    * derived from the payload). A real implementation would parse the
    * codec bytestream here — marked clearly as the single swap point. */
  val stubCodec: Array[Byte] => (Int, Int, Double) = { bytes =>
    val w = bytes.length % 100 + 20
    val h = bytes.length % 80 + 20
    val mean = if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
    (w, h, mean)
  }

  /** REAL codec: PNG decode through the JDK's javax.imageio (headless-
    * safe, no native libs) — the proof that [[decodePartitions]]'s seam
    * takes an actual bytestream parser, not only the stub. Returns
    * (width, height, mean red-channel value); (0, 0, 0.0) for an empty
    * or undecodable payload. */
  val pngCodec: Array[Byte] => (Int, Int, Double) = { bytes =>
    if (bytes == null || bytes.isEmpty) (0, 0, 0.0)
    else {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) (0, 0, 0.0)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
          y += 1
        }
        (w, h, sum.toDouble / (w.toLong * h))
      }
    }
  }

  /** Deterministic PNG payload: a `w`×`h` image uniformly filled with
    * gray value `fill` (0-255), encoded by the JDK PNG writer. Used to
    * exercise [[pngCodec]] end-to-end with an oracle that can predict
    * the decoded dimensions and mean from the generator arguments. */
  def pngBlob(w: Int, h: Int, fill: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val f = fill & 0xFF
    val rgb = (f << 16) | (f << 8) | f
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
