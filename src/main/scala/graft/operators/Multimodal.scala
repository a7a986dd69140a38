package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is real — schema, partition sizing, batched
  * per-partition execution, column pruning — and so are two of the three
  * decode kernels: PNG/JPEG/GIF/BMP images decode via JDK ImageIO, and
  * PCM WAV audio via a pure-JVM RIFF parser (neither needs a codec
  * library). VIDEO (and compressed audio) remain clearly-marked
  * deterministic STUBS — this container has no such codecs; swapping one
  * in touches only the marked fallback branches, the distributed
  * plumbing is unchanged.
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

  private[operators] def looksLikeWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Decoded PCM audio: format header + mono-mixed samples in [-1, 1]. */
  private[operators] final case class Pcm(sampleRate: Int, channels: Int,
                                          bitsPerSample: Int,
                                          samples: Array[Double])

  /** REAL RIFF/WAVE PCM decoder — pure JVM, no codec library needed
    * (unlike image decode, PCM WAV is just a chunked header over raw
    * samples). Handles 8-bit unsigned and 16-bit signed little-endian
    * PCM (format tag 1), any channel count (mono-mixed); anything else —
    * compressed tags, truncated chunks — returns None and falls through
    * to the caller's fallback, never a partial decode. */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[Pcm] = {
    if (!looksLikeWav(bytes)) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, bits
      var data: Option[(Int, Int)] = None          // offset, len
      while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val len = bb.getInt(pos + 4)
        // long compare: a crafted len near Int.MaxValue would wrap the
        // int sum past the bounds check and drive a multi-GB allocation
        // whose OutOfMemoryError (an Error) escapes the Exception catch
        if (len < 0 || len.toLong > bytes.length.toLong - pos - 8) return None
        if (id == "fmt " && len >= 16)
          fmt = Some((bb.getShort(pos + 8) & 0xffff,
            bb.getShort(pos + 10) & 0xffff, bb.getInt(pos + 12),
            bb.getShort(pos + 22) & 0xffff))
        else if (id == "data") data = Some((pos + 8, len))
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      (fmt, data) match {
        case (Some((1, ch, rate, bits)), Some((off, len)))
            if ch >= 1 && rate > 0 && (bits == 8 || bits == 16) =>
          val bytesPerFrame = ch * bits / 8
          val n = len / bytesPerFrame
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              acc += (if (bits == 16)
                bb.getShort(off + i * bytesPerFrame + c * 2) / 32768.0
              else ((bytes(off + i * bytesPerFrame + c) & 0xff) - 128) / 128.0)
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          Some(Pcm(rate, ch, bits, out))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

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
    * `dim`-bucket luminance histogram normalized by pixel count; PCM WAV
    * payloads are REALLY decoded (pure-JVM RIFF parser) into a `dim`-
    * window RMS energy envelope — the call shape of a decode + model
    * forward pass, with genuine decodes. Remaining payloads fall back to
    * the deterministic byte-histogram stand-in (===== STUB ===== for the
    * video/compressed-audio codecs this container lacks), so the pipeline
    * stays runnable on any input. A per-row UDF is the correct tool here:
    * the kernel is imperative sample/pixel work no builtin expression
    * covers. */
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
        case None => decodeWav(bytes) match {
          case Some(pcm) =>
            // REAL audio features (pure-JVM PCM decode): RMS energy over
            // `dim` equal time windows — the energy envelope a downstream
            // audio model consumes
            val h = new Array[Float](dim)
            val n = pcm.samples.length
            var w = 0
            while (w < dim && n > 0) {
              // long products: a decodable 2 GB WAV has ~1e9 samples and
              // w*n would wrap int, collapsing windows then indexing
              // negative
              val s = (w.toLong * n / dim).toInt
              val e = math.min(math.max(((w + 1).toLong * n / dim).toInt, s + 1), n)
              var acc = 0.0
              var i = s
              while (i < e) { acc += pcm.samples(i) * pcm.samples(i); i += 1 }
              h(w) = math.sqrt(acc / math.max(e - s, 1)).toFloat
              w += 1
            }
            h
          case None =>
            // ===== STUB ===== byte-histogram stand-in for codecs this
            // container lacks (video; compressed audio).
            val h = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1f; i += 1 }
            val n = math.max(bytes.length, 1)
            h.map(_ / n)
        }
      }
    }
    df.withColumn("features", featurize(col("media")))
  }

  /** Typed audio metadata from a REAL PCM decode: sample rate, channels,
    * bit depth, frame count, duration, RMS level, and zero-crossing rate
    * (the cheap voicing/noisiness cue). Null struct for payloads that do
    * not decode as PCM WAV. */
  def decodeAudioMeta(df: DataFrame): DataFrame = {
    val audioInfo = udf { (bytes: Array[Byte]) =>
      decodeWav(bytes).map { pcm =>
        val n = pcm.samples.length
        var sq = 0.0
        var zc = 0
        var i = 0
        while (i < n) {
          sq += pcm.samples(i) * pcm.samples(i)
          if (i > 0 && (pcm.samples(i) >= 0) != (pcm.samples(i - 1) >= 0)) zc += 1
          i += 1
        }
        (pcm.sampleRate, pcm.channels, pcm.bitsPerSample, n,
          n.toDouble / pcm.sampleRate,
          math.sqrt(sq / math.max(n, 1)),
          if (n > 1) zc.toDouble / (n - 1) else 0.0)
      }
    }
    df.withColumn("audio_meta",
      audioInfo(col("media")).cast(
        "struct<sample_rate:int,channels:int,bits_per_sample:int," +
          "n_samples:int,duration_s:double,rms:double,zcr:double>"))
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
