package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is real — schema, partition sizing, batched
  * per-partition execution, column pruning — but the DECODE KERNELS ARE
  * STUBS: this container has no image/audio codecs, so decode is a
  * clearly-marked deterministic fake (byte-histogram features, stride
  * slicing). Swapping in a real codec touches only the marked functions;
  * the distributed plumbing is unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType))))))

  /** Manufacture a media table from any source table (deterministic fake
    * payloads so the pipeline is runnable/testable offline): media bytes =
    * UTF-8 of a text column; meta derived from its length. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        pmod(length(col(textCol)), lit(640)).cast("int").as("width"),
        pmod(length(col(textCol)), lit(480)).cast("int").as("height"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** Cheap magic-byte sniff — avoids spinning up ImageIO reader discovery
    * on payloads that are obviously not images. */
  private[operators] def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') ||
      (bytes(0) == 'B' && bytes(1) == 'M'))

  private[operators] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else try {
      // explicit in-memory image stream: the payload is already in memory,
      // and the ImageIO.read(InputStream) default would spool every row
      // through a temp-file-backed cache (a per-call stream also avoids
      // flipping the process-global ImageIO.setUseCache switch)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself; the
      // quiet re-close guards non-read exit paths without masking a
      // successful decode behind a double-close IOException
      try Option(javax.imageio.ImageIO.read(iis))
      finally { try iis.close() catch { case _: Exception => () } }
    } catch { case _: Exception => None }

  /** Feature extraction over the binary column. PNG/JPEG/GIF/BMP payloads
    * are REALLY decoded (JDK ImageIO — no extra dependency) into a
    * `dim`-bucket luminance histogram normalized by pixel count — the call
    * shape of a decode + model forward pass, with a genuine decode.
    * Undecodable payloads fall back to the deterministic byte-histogram
    * stand-in (===== STUB ===== for an audio/video codec this container
    * lacks), so the pipeline stays runnable on any input. A per-row UDF is
    * the correct tool here: the kernel is imperative pixel work no builtin
    * expression covers. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val featurize = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else decodeImage(bytes) match {
        case Some(img) =>
          val h = new Array[Float](dim)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              h(lum * dim / 256) += 1f
              x += 1
            }
            y += 1
          }
          val n = math.max(img.getWidth * img.getHeight, 1)
          h.map(_ / n)
        case None =>
          // ===== STUB ===== byte-histogram stand-in for non-image codecs.
          val h = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1f; i += 1 }
          val n = math.max(bytes.length, 1)
          h.map(_ / n)
      }
    }
    df.withColumn("features", featurize(col("media")))
  }

  /** Refresh the typed meta struct from a REAL decode: width/height/format
    * read from the image when the payload actually decodes; the ORIGINAL
    * meta is kept untouched otherwise (a corrupt JPEG prefix must not
    * stamp format='image/jpeg' onto stale dimensions). */
  def decodeImageMeta(df: DataFrame): DataFrame = {
    // one decode per row: format+dims together, None unless decode succeeds
    val decodeInfo = udf { (bytes: Array[Byte]) =>
      decodeImage(bytes).map { img =>
        val fmt =
          if (bytes(0) == 0x89.toByte) "image/png"
          else if (bytes(0) == 0xFF.toByte) "image/jpeg"
          else if (bytes(0) == 'G') "image/gif"
          else "image/bmp"
        (fmt, img.getWidth, img.getHeight)
      }
    }
    df.withColumn("_d", decodeInfo(col("media")))
      .withColumn("meta", col("meta")
        .withField("format", coalesce(col("_d._1"), col("meta.format")))
        .withField("width", coalesce(col("_d._2"), col("meta.width")))
        .withField("height", coalesce(col("_d._3"), col("meta.height"))))
      .drop("_d")
  }

  /** ===== STUB ===== "frame sampling": slice the binary payload at a
    * byte stride, standing in for video frame extraction. Pure builtin
    * expressions (substring works on binary). */
  def frameSample(df: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    df.select(col("media_id"), col("meta"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(int(floor((length(media) - 1) / ${frameBytes * everyN})), 0)),
             |  i -> substring(media, i * ${frameBytes * everyN} + 1, $frameBytes))"""
            .stripMargin)).as(Seq("frame_no", "frame")))
      .where(length(col("frame")) > 0)

  /** Resize metadata transform (real): recompute meta after a decode
    * stage would rescale — demonstrates typed-struct column surgery. */
  def withResizedMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", col("meta")
      .withField("width", lit(w))
      .withField("height", lit(h)))
}
