package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One sampled frame row from [[Multimodal.frameSampleDecoded]]:
  * `frame_no` is the ORIGINAL frame index (GIF) or the stub slice index;
  * width/height only when really decoded; `decoded` marks which path
  * fired.
  *
  * TOP-LEVEL and `private[operators]` (public in bytecode) on purpose:
  * as a `private` class nested in the object, the generated encoder
  * could not see its accessors and Janino failed compilation
  * (`ERROR CodeGenerator … No applicable constructor/method found …
  * Multimodal$SampledFrame.decoded()`), silently dropping every frame
  * batch to the interpreted deserializer — MultimodalSpec pins the
  * clean-codegen property. */
private[operators] final case class SampledFrame(
    frame_no: Int, width: Option[Int], height: Option[Int],
    features: Array[Float], decoded: Boolean)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is real — schema, partition sizing, batched
  * per-partition execution, column pruning — and so are the decode
  * kernels the JDK can honestly provide: PNG/JPEG/GIF/BMP images via
  * ImageIO, PCM WAV audio via a pure-JVM RIFF parser, and MULTI-FRAME
  * animated GIF via ImageIO's frame-indexed reader (frameSampleDecoded
  * — real per-frame sampling for one container format). Other video
  * containers and compressed audio remain clearly-marked deterministic
  * STUBS for their PAYLOADS — this environment has no such codecs;
  * swapping one in touches only the marked fallback branches, the
  * distributed plumbing is unchanged. Their HEADERS are really parsed,
  * though: [[sniffContainerMeta]] reads mp4 box trees (duration,
  * dimensions, brand), mp3 frame headers (bitrate, sample rate, CBR
  * duration), and webm/Matroska EBML doctypes with no codec at all.
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

  /** Integer-math luminance histogram over `dim` buckets, normalized by
    * pixel count — the shared image-feature kernel (extractFeatures on
    * whole images, frameSampleDecoded per frame). */
  private[operators] def luminanceHistogram(img: java.awt.image.BufferedImage,
                                            dim: Int): Array[Float] = {
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
  }

  /** ===== STUB ===== deterministic byte-histogram stand-in for codecs
    * this container lacks (video containers; compressed audio). */
  private[operators] def byteHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1f; i += 1 }
    val n = math.max(bytes.length, 1)
    h.map(_ / n)
  }

  /** REAL multi-frame decode for animated GIF — the one video-adjacent
    * container the JDK decodes natively (ImageIO's GIF reader exposes
    * every frame). Returns each frame's raster AS STORED (no disposal-
    * method compositing: frame i of an optimized GIF may be a partial
    * patch — fine for feature extraction, documented rather than hidden).
    * None for non-GIF payloads or any decode failure, never partial. */
  private[operators] def decodeGifFrames(bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    if (bytes == null || bytes.length < 3 ||
        bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') None
    else try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some((0 until r.getNumImages(true)).map(r.read).toVector)
          finally r.dispose()
        }
      } finally { try iis.close() catch { case _: Exception => () } }
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
        case Some(img) => luminanceHistogram(img, dim)
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
            byteHistogram(bytes, dim)
        }
      }
    }
    df.withColumn("features", featurize(col("media")))
  }

  /** 64-bit average-hash (aHash) of a decoded image: 8×8 box-average
    * luminance grid (pure integer sums — no AWT rescaler, so the hash is
    * bit-reproducible across JVMs), bit k set iff cell k's average
    * luminance exceeds the 64-cell mean. Robust to re-encoding and mild
    * resizing — the standard cheap perceptual-dedup key. */
  private[operators] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val c = cy * 8 + (x.toLong * 8 / w).toInt
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val avgs = Array.tabulate(64)(i =>
      if (counts(i) > 0) sums(i) / counts(i) else 0L)
    val mean = avgs.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (avgs(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Perceptual image hashes: (media_id, ahash, decoded) — ahash null
    * for payloads ImageIO cannot decode. Map-side per-row kernel like
    * every media decode here. */
  def imageHashes(df: DataFrame): DataFrame = {
    val hashUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None else decodeImage(bytes).map(aHash64)
    }
    df.select(col("media_id"), hashUdf(col("media")).as("ahash"))
      .withColumn("decoded", col("ahash").isNotNull)
  }

  /** Near-duplicate IMAGES by perceptual-hash Hamming distance — the
    * multimodal face of the dedup family ("same photo, different
    * re-encode/resize"): aHash pairs generated through the SAME banded
    * 16-bit-chunk equi-join as text SimHash ([[Dedup.simhashPairs]] —
    * a ≤ maxHamming pair at maxHamming ≤ 3 must collide on one of the
    * 4 chunks by pigeonhole; wider budgets trade recall, same as text).
    * Output: (id_a, id_b, hamming). Undecodable payloads can't match
    * anything and are excluded up front. */
  def imageNearDups(df: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      imageHashes(df).where(col("decoded"))
        .select(col("media_id").as("id"), col("ahash").as("simhash")),
      maxHamming)

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

  /** Frame sampling with a REAL decode path: animated-GIF payloads
    * decode every `everyN`-th frame via ImageIO ([[decodeGifFrames]])
    * and featurize each with the shared luminance-histogram kernel —
    * actual per-frame video-pipeline plumbing, not a stand-in. Payloads
    * in containers this environment cannot decode (mp4 etc.) fall back
    * to the ===== STUB ===== byte-stride slices with byte-histogram
    * features, flagged `decoded = false` so downstream consumers can
    * tell real frames from stand-ins. Output: one row per sampled frame
    * (media_id, frame_no, width, height, features, decoded); a per-row
    * UDF is the right tool for the imperative decode, and each row's
    * work is bounded by its own payload — the operator stays map-side
    * and embarrassingly parallel at any scale. */
  def frameSampleDecoded(df: DataFrame, everyN: Int, dim: Int = 16,
                         frameBytes: Int = 64): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1: $everyN")
    require(dim >= 1 && frameBytes >= 1, "dim and frameBytes must be positive")
    val sample = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else decodeGifFrames(bytes) match {
        case Some(frames) =>
          frames.zipWithIndex.collect {
            case (img, i) if i % everyN == 0 =>
              SampledFrame(i, Some(img.getWidth), Some(img.getHeight),
                luminanceHistogram(img, dim), decoded = true)
          }
        case None =>
          val stride = frameBytes * everyN
          (0 until math.max((bytes.length + stride - 1) / stride, 0)).map { i =>
            val s = i * stride
            val slice = java.util.Arrays.copyOfRange(bytes, s,
              math.min(s + frameBytes, bytes.length))
            SampledFrame(i, None, None, byteHistogram(slice, dim),
              decoded = false)
          }
      }
    }
    df.select(col("media_id"), col("meta"),
        explode(sample(col("media"))).as("f"))
      .select(col("media_id"), col("meta"), col("f.*"))
  }

  /** ===== STUB ===== "frame sampling": slice the binary payload at a
    * byte stride, standing in for video frame extraction. Pure builtin
    * expressions (substring works on binary). Kept as the zero-decode
    * fast path; [[frameSampleDecoded]] is the real-decode variant (GIF
    * frames actually decode there). */
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

  // ---- container header sniffing (REAL — no codec needed) -----------------

  /** Header-only container metadata — REAL parsing, no decode: the
    * container formats whose PAYLOAD this environment cannot decode
    * (mp4/mp3/webm) still carry machine-readable headers, and a curation
    * pipeline wants duration/dimensions/codec for filtering and cost
    * estimation long before any decode stage runs. Everything here reads
    * a bounded prefix-structure of the byte array; nothing touches codec
    * frames, so none of it is a stub. */
  private[operators] final case class ContainerMeta(
      container: String, codec: String, duration_s: Option[Double],
      width: Option[Int], height: Option[Int], sample_rate: Option[Int],
      bitrate_kbps: Option[Int])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** ISO-BMFF (mp4/mov/m4a) header walk: `ftyp` major brand as the
    * codec tag, `moov/mvhd` timescale+duration, and the first non-zero
    * `moov/trak/tkhd` 16.16-fixed width/height. Box sizes are validated
    * (64-bit and to-end sizes included); a malformed tree yields what
    * was parsed up to the corruption, never a throw. */
  private[operators] def sniffMp4(b: Array[Byte]): Option[ContainerMeta] = {
    if (b == null || b.length < 12 || b(4) != 'f' || b(5) != 't' ||
        b(6) != 'y' || b(7) != 'p') return None
    val brand = new String(b, 8, 4, "US-ASCII").trim
    var dur: Option[Double] = None
    var w: Option[Int] = None
    var h: Option[Int] = None
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && depth < 8) {
        var size = be32(b, off.toInt)
        val typ = new String(b, off.toInt + 4, 4, "US-ASCII")
        var hdr = 8L
        if (size == 1 && off + 16 <= end) { size = be64(b, off.toInt + 8); hdr = 16 }
        else if (size == 0) size = end - off
        if (size < hdr || off + size > end) return // corrupt: keep what we have
        val p = (off + hdr).toInt
        typ match {
          case "moov" | "trak" => walk(off + hdr, off + size, depth + 1)
          case "mvhd" if dur.isEmpty && off + hdr + 4 <= end =>
            val v = b(p) & 0xff
            if (v == 1 && p + 32 <= end) {
              val ts = be32(b, p + 20); val d = be64(b, p + 24)
              if (ts > 0) dur = Some(d.toDouble / ts)
            } else if (v == 0 && p + 20 <= end) {
              val ts = be32(b, p + 12); val d = be32(b, p + 16)
              if (ts > 0) dur = Some(d.toDouble / ts)
            }
          case "tkhd" if w.isEmpty && off + hdr + 4 <= end =>
            val v = b(p) & 0xff
            val wOff = if (v == 1) p + 88 else p + 76
            if (wOff + 8 <= end) {
              val tw = (be32(b, wOff) >> 16).toInt
              val th = (be32(b, wOff + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = Some(tw); h = Some(th) }
            }
          case _ => ()
        }
        off += size
      }
    }
    walk(0, b.length.toLong, 0)
    Some(ContainerMeta("video/mp4", brand, dur, w, h, None, None))
  }

  /** MPEG audio (mp3) first-frame header past any ID3v2 tag: version,
    * Layer III bitrate/sample-rate tables, and the CBR duration
    * estimate (payload bytes · 8 / bitrate — honest for constant-rate
    * streams, the usual header-only estimator). None for free-format,
    * reserved, or non-Layer-III frames. */
  private[operators] def sniffMp3(b: Array[Byte]): Option[ContainerMeta] = {
    if (b == null || b.length < 4) return None
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      off = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    }
    if (off + 4 > b.length) return None
    val h = be32(b, off)
    if ((h & 0xFFE00000L) != 0xFFE00000L) return None
    val verBits = ((h >> 19) & 3).toInt  // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layerBits = ((h >> 17) & 3).toInt // 1=Layer III
    if (verBits == 1 || layerBits != 1) return None
    val brIdx = ((h >> 12) & 0xf).toInt
    val srIdx = ((h >> 10) & 3).toInt
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val kbps =
      if (verBits == 3)
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    val sr = (verBits match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val ver = verBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
    Some(ContainerMeta("audio/mpeg", s"mpeg$ver-layer3",
      Some((b.length - off) * 8.0 / (kbps * 1000.0)), None, None,
      Some(sr), Some(kbps)))
  }

  /** Matroska/WebM EBML header: magic + the DocType string scanned from
    * the bounded EBML head — container identification without an EBML
    * tree walk (duration lives deep in Segment/Info; honest null). */
  private[operators] def sniffWebm(b: Array[Byte]): Option[ContainerMeta] = {
    if (b == null || b.length < 8 || b(0) != 0x1A.toByte ||
        b(1) != 0x45.toByte || b(2) != 0xDF.toByte || b(3) != 0xA3.toByte)
      return None
    // DocType element id 0x4282, size as a 1-byte vint (doc types are
    // short ASCII), within the EBML head
    val limit = math.min(b.length - 3, 128)
    var i = 4
    var doc = "matroska"
    while (i < limit) {
      if (b(i) == 0x42.toByte && b(i + 1) == 0x82.toByte &&
          (b(i + 2) & 0x80) != 0) {
        val n = b(i + 2) & 0x7f
        if (i + 3 + n <= b.length) doc = new String(b, i + 3, n, "US-ASCII")
        i = limit
      } else i += 1
    }
    Some(ContainerMeta(if (doc == "webm") "video/webm" else "video/x-matroska",
      doc, None, None, None, None, None))
  }

  private[operators] def sniffContainer(b: Array[Byte]): Option[ContainerMeta] =
    sniffMp4(b).orElse(sniffMp3(b)).orElse(sniffWebm(b))

  /** `container_meta` struct from header-only sniffing of the `media`
    * column (null for unrecognized payloads) — the metadata a pipeline
    * filters/estimates on before any decode stage. Map-side, bounded
    * per-row work (headers only), the package's justified-UDF shape. */
  def sniffContainerMeta(df: DataFrame): DataFrame = {
    val sniff = udf { (bytes: Array[Byte]) => sniffContainer(bytes) }
    df.withColumn("container_meta", sniff(col("media")))
  }
}
