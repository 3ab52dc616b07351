package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata structs, decoded/feature-extracted
  * via partition-local batch processing.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * batching, deterministic output — but the actual codec is a STUB: this
  * container has no image/audio libraries, so [[decodeStub]] derives fake
  * "decoded" metadata deterministically from the bytes (documented below).
  * Swapping in a real decoder (javacv/ImageIO/JNI) changes only the body
  * of `decodeBatch`; the distributed shape — mapPartitions over batched
  * binary payloads, no driver round-trip, columnar-friendly output — is
  * what matters at 100 TB (media bytes never leave the executor that read
  * them).
  */
object Multimodal {

  /** Output schema of the decode step: input id + typed media metadata. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** STUB decode of one media payload. Deterministic fake in place of a
    * real codec: dimensions from the first two bytes, md5 as the content
    * checksum. (A real implementation decodes the header/frames here.)
    */
  private def decodeOne(id: Long, bytes: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(bytes).map("%02x".format(_)).mkString
    val w = 16 + (if (bytes.length > 0) (bytes(0) & 0xff) % 16 else 0)
    val h = 16 + (if (bytes.length > 1) (bytes(1) & 0xff) % 16 else 0)
    Row(id, bytes.length, w, h, checksum)
  }

  /** Decode a binary media column partition-by-partition. Expects columns
    * `(idCol: long, binCol: binary)`; emits [[decodedSchema]]. Batching is
    * per-partition (the iterator never materializes the partition), so
    * executor memory holds one payload at a time regardless of media size.
    */
  def decodeStub(df: DataFrame, idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(decodedSchema))
  }

  /** REAL image decode via `javax.imageio` (pure JVM — PNG/JPEG/GIF/BMP,
    * no native libs): actual pixel dimensions + md5 checksum, same
    * [[decodedSchema]] and the same partition-local streaming shape as
    * [[decodeStub]]. Payloads that no registered reader understands decode
    * to (−1, −1) rather than failing the task — at corpus scale a corrupt
    * file must be a row-level outcome, not a job-level one. The stub
    * remains the deterministic test double for corpora whose "media" bytes
    * are not real images (the synthetic tables).
    */
  def decodeImage(df: DataFrame, idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val md = java.security.MessageDigest.getInstance("MD5")
        val checksum = md.digest(bytes).map("%02x".format(_)).mkString
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(id, bytes.length, -1, -1, checksum)
        else Row(id, bytes.length, img.getWidth, img.getHeight, checksum)
      }
    }(RowEncoder.encoderFor(decodedSchema))
  }

  /** Attach a binary media payload column. For the synthetic corpus the
    * payload is the utf-8 text bytes standing in for encoded media.
    */
  def withMedia(df: DataFrame, textCol: String = "text", binCol: String = "media"): DataFrame =
    df.withColumn(binCol, col(textCol).cast("binary"))

  /** Attach REAL encoded media: a deterministic tiny PNG per row, generated
    * executor-side with `ImageIO.write` — dimensions and pixels are pure
    * arithmetic over the id, so [[decodeImage]]'s recovered `(width,
    * height)` is SQL-expressible and the real-codec path can face the
    * DuckDB oracle (the corpus's own "media" bytes are text, which no
    * image reader accepts). Same partition-local streaming shape as the
    * codecs: one payload in memory at a time, no driver round-trip.
    */
  def withGeneratedPng(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(binCol, BinaryType, nullable = false)))
    // The id-only projection is a handful of bytes per row, but the encode
    // is CPU-dense — a corpus that scans as one parquet split would encode
    // on ONE core (measured: a 16 s single-task stage at sf0.1). An
    // explicit repartition of the tiny projection spreads the work and is
    // exempt from AQE's bytes-based coalescing.
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).cast("long")).repartition(par).mapPartitions { rows =>
      // ImageIO's default ImageOutputStream is DISK-cache-backed — a temp
      // file per image; for in-memory thumbnails the memory cache is the
      // only sane setting (per-JVM static, safe to set repeatedly).
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, ((id + x * 31 + y * 131) % 0x1000000).toInt); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(RowEncoder.encoderFor(schema))
  }

  // -------------------------------------------------------------------
  // feature-extract / resize / frame-sample — same stub-codec contract as
  // decodeStub: the byte-level transform is a deterministic fake, the
  // distributed shape (schema, batching, fan-out) is the real deliverable.
  // -------------------------------------------------------------------

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("media", BinaryType, nullable = false)))

  /** STUB resize: binary→binary per-row map to a fixed `(w, h)` budget (the
    * fake keeps the first w·h payload bytes; a real codec re-encodes).
    * Shape note: output rows are bounded by w·h regardless of input size —
    * the pattern that caps downstream shuffle volume when normalizing a
    * media corpus.
    */
  def resizeStub(df: DataFrame, w: Int, h: Int,
      idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), w, h, bytes.take(w * h))
      }
    }(RowEncoder.encoderFor(resizedSchema))
  }

  val resizedRealSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("pix_sum", LongType, nullable = false)))

  /** REAL image resize: decode with `ImageIO`, nearest-neighbor scale to
    * `(w, h)` with the explicit mapping `src = (x·srcW) / w` (integer
    * division — deterministic on every JVM, unlike `AffineTransformOp`
    * whose inverse-transform rounding is implementation-defined), then
    * re-encode PNG. Emits the resized payload plus `pix_sum` — the sum of
    * the 24-bit RGB values of every destination pixel — which is pure
    * arithmetic over the source pixels and therefore SQL-expressible for
    * generated images ([[withGeneratedPng]]): the oracle checks actual
    * resampled pixel data, not just dimensions. Unreadable payloads emit
    * `(-1, -1, null, -1)` — the row-level corrupt-input channel.
    * Partition-local streaming: one image in memory at a time.
    */
  def resizeImage(df: DataFrame, w: Int, h: Int,
      idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    require(w > 0 && h > 0, s"bad target dims: ${w}x$h")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      rows.map { r =>
        val id = r.getLong(0)
        val src =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (src == null) Row(id, -1, -1, null, -1L)
        else {
          val (sw, sh) = (src.getWidth, src.getHeight)
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var pixSum = 0L
          var y = 0
          while (y < h) {
            val sy = y * sh / h
            var x = 0
            while (x < w) {
              val rgb = src.getRGB(x * sw / w, sy) & 0xffffff
              dst.setRGB(x, y, rgb)
              pixSum += rgb
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Row(id, w, h, bos.toByteArray, pixSum)
        }
      }
    }(RowEncoder.encoderFor(resizedRealSchema))
  }

  /** Attach REAL encoded multi-frame media: a deterministic animated GIF
    * per row (`2 + id % 4` frames of `(6 + id % 5) × (6 + id % 3)`),
    * written executor-side with the JDK's own GIF sequence writer — pure
    * JVM, no native codec. Pixels come from an EXPLICIT 256-gray
    * `IndexColorModel` (palette entry i = opaque (i,i,i)): every pixel
    * value is a palette member, so the encode quantizes nothing and the
    * decode applies no colorspace transform (`TYPE_BYTE_GRAY` would gamma-
    * convert) — frame f's pixel (x,y) is exactly
    * `((id + 31x + 131y + 997f) % 256) · 0x010101`, making the decoded
    * frames pure arithmetic the DuckDB oracle replays. Same
    * repartition-then-stream shape as [[withGeneratedPng]].
    */
  def withGeneratedGif(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(binCol, BinaryType, nullable = false)))
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).cast("long")).repartition(par).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      val cmap = Array.tabulate(256)(i => (0xff << 24) | i * 0x010101)
      val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
      rows.map { r =>
        val id = r.getLong(0)
        val w = 6 + (id % 5).toInt
        val h = 6 + (id % 3).toInt
        val nf = 2 + (id % 4).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id + 31 * x + 131 * y + 997 * f) % 256).toInt
              img.setRGB(x, y, (0xff << 24) | v * 0x010101)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        Row(id, bos.toByteArray)
      }
    }(RowEncoder.encoderFor(schema))
  }

  val frameRealSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false)))

  /** REAL frame sampling: open the payload with an `ImageIO` reader,
    * enumerate its frames (`getNumImages`), and emit every `everyN`-th
    * frame as its own row with actual decoded dimensions and the 24-bit
    * RGB pixel sum — the 1→N video fan-out of [[frameSampleStub]] driven
    * by a real multi-frame codec (animated GIF being the format the bare
    * JVM decodes). Lazy iterator fan-out, one payload in memory at a
    * time; unreadable payloads emit one `frame_idx = −1` row — the
    * row-level corrupt channel, same contract as [[decodeImage]].
    */
  def frameSampleImage(df: DataFrame, everyN: Int = 2,
      idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    require(everyN > 0, s"everyN must be positive: $everyN")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Seq(Row(id, -1, -1, -1, -1L)) }
          else {
            val reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = (0 until n).collect { case i if i % everyN == 0 =>
              val img = reader.read(i)
              var s = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { s += img.getRGB(x, y) & 0xffffff; x += 1 }
                y += 1
              }
              Row(id, i, img.getWidth, img.getHeight, s)
            }
            reader.dispose()
            iis.close()
            out
          }
        } catch {
          case scala.util.control.NonFatal(_) => Seq(Row(id, -1, -1, -1, -1L))
        }
      }
    }(RowEncoder.encoderFor(frameRealSchema))
  }

  /** Attach REAL encoded audio: a deterministic 8-bit unsigned PCM mono
    * WAV per row, written executor-side with the JDK's own
    * `javax.sound.sampled` codec (pure JVM, headless-safe — WAV encode
    * is file I/O, no audio device). Sample i of doc id is
    * `(id + 7i) % 256` over `400 + id % 100` samples at 8 kHz — pure
    * arithmetic, so the decoded stream is SQL-expressible and the real
    * audio path can face the oracle, exactly the [[withGeneratedPng]] /
    * [[withGeneratedGif]] pattern for the audio modality.
    */
  def withGeneratedWav(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(binCol, BinaryType, nullable = false)))
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).cast("long")).repartition(par).mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      rows.map { r =>
        val id = r.getLong(0)
        val n = 400 + (id % 100).toInt
        val pcm = Array.tabulate(n)(i => ((id + 7L * i) % 256).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(RowEncoder.encoderFor(schema))
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("amp_sum", LongType, nullable = false)))

  /** REAL audio decode: parse the payload with `AudioSystem`, recover the
    * actual sample rate and frame count, and sum the unsigned 8-bit
    * sample values — the audio analogue of [[decodeImage]]'s
    * pixel-level check. Unparseable payloads emit
    * `(−1, −1, −1)` — the row-level corrupt channel. Partition-local
    * streaming, one payload in memory at a time.
    */
  def decodeAudio(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val fmt = ais.getFormat
          val n = ais.getFrameLength
          val buf = ais.readAllBytes()
          var s = 0L
          var i = 0
          while (i < buf.length) { s += (buf(i) & 0xff); i += 1 }
          ais.close()
          Row(id, fmt.getSampleRate.toInt, n, s)
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, -1, -1L, -1L)
        }
      }
    }(RowEncoder.encoderFor(audioSchema))
  }

  val audioFeatSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  /** Audio feature extraction over a REAL codec decode: energy (sum of
    * squared centered samples — RMS's integer-exact numerator),
    * zero-crossing rate's count (sign transitions of the centered
    * waveform — the classic cheap speech/music/noise discriminator), and
    * peak amplitude. All-integer arithmetic over the decoded unsigned
    * 8-bit PCM samples (`c = s − 128`; "non-negative" is the sign
    * predicate, so silence at 128 is stable) — exact on any JVM and
    * SQL-expressible, so generated fixtures ([[withGeneratedWav]]) face
    * the oracle sample-for-sample. Unparseable payloads emit
    * `(−1, −1, −1, −1)`. Partition-local streaming, one payload in
    * memory at a time.
    */
  def audioFeatures(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val buf = ais.readAllBytes()
          ais.close()
          var sumSq = 0L
          var zc = 0L
          var peak = 0
          var prevNonNeg = true
          var i = 0
          while (i < buf.length) {
            val c = (buf(i) & 0xff) - 128
            sumSq += c.toLong * c
            val a = if (c < 0) -c else c
            if (a > peak) peak = a
            val nonNeg = c >= 0
            if (i > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            i += 1
          }
          Row(id, buf.length.toLong, sumSq, zc, peak)
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, -1L, -1L, -1L, -1)
        }
      }
    }(RowEncoder.encoderFor(audioFeatSchema))
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("afp", StringType, nullable = true)))

  /** 64-bit audio fingerprint over the REAL decode — the audio member
    * of the perceptual-hash family (dHash for images, this for
    * waveforms): samples map to 65 windows by `w = i·65 / n` (pure
    * integer division — identical in the JVM, Spark SQL, and DuckDB,
    * which is why the mapping is defined THIS way and not by floor'd
    * window boundaries), each window accumulates its integer
    * |amplitude| sum, and bit w asks "does window w+1 carry higher MEAN
    * energy than window w", compared by integer cross-multiplication
    * (`e₂·l₁ > e₁·l₂` — no division, no floats anywhere). The bit
    * pattern tracks the energy CONTOUR, so it survives loudness-scaling
    * and small length edits the way dHash survives resizes. Corrupt
    * payloads → NULL (dropped by [[Dedup.bitstringDupPairs]]).
    */
  def audioFingerprint(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val buf = ais.readAllBytes()
          ais.close()
          val n = buf.length
          if (n < 65) Row(id, null)
          else {
            val eng = Array.ofDim[Long](65)
            val len = Array.ofDim[Long](65)
            var i = 0
            while (i < n) {
              val c = (buf(i) & 0xff) - 128
              val w = (i.toLong * 65 / n).toInt
              eng(w) += (if (c < 0) -c else c)
              len(w) += 1
              i += 1
            }
            val sb = new java.lang.StringBuilder(64)
            var w = 0
            while (w < 64) {
              sb.append(if (eng(w + 1) * len(w) > eng(w) * len(w + 1)) '1' else '0')
              w += 1
            }
            Row(id, sb.toString)
          }
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, null)
        }
      }
    }(RowEncoder.encoderFor(audioFpSchema))
  }

  val decimateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_in", LongType, nullable = false),
    StructField("n_out", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("head_md5", StringType, nullable = true)))

  /** Audio DECIMATION through the real codec — keep every `factor`-th
    * decoded sample (the simplest resample: 8 kHz → 4 kHz at factor 2;
    * a production pipeline low-passes first, which needs float DSP —
    * the plumbing, batch shape, and integer statistics here are the
    * real thing). Emits the decimated stream's integer energy/peak and
    * an md5 digest of its first 64 samples — pinning actual sample
    * VALUES, not just statistics, to the oracle. Same partition-local
    * streaming and `(−1, …)` corrupt-row contract as [[audioFeatures]].
    */
  def decimateAudio(df: DataFrame, factor: Int, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    require(factor >= 1, s"factor must be positive: $factor")
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val buf = ais.readAllBytes()
          ais.close()
          var energy = 0L
          var peak = 0
          var nOut = 0L
          val head = new java.lang.StringBuilder(256)
          var i = 0
          while (i < buf.length) {
            val c = (buf(i) & 0xff) - 128
            energy += c.toLong * c
            val a = if (c < 0) -c else c
            if (a > peak) peak = a
            if (nOut < 64) { if (nOut > 0) head.append(','); head.append(c) }
            nOut += 1
            i += factor
          }
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(head.toString.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          Row(id, buf.length.toLong, nOut, energy, peak, md)
        } catch {
          case scala.util.control.NonFatal(_) => Row(id, -1L, -1L, -1L, -1, null)
        }
      }
    }(RowEncoder.encoderFor(decimateSchema))
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dhash", StringType, nullable = true)))

  /** Perceptual difference-hash (dHash) over a REAL image decode: 9×8
    * grayscale nearest-neighbor downsample (same deterministic integer
    * mapping `src = (x·srcW) div 9` as [[resizeImage]] — no
    * implementation-defined `AffineTransformOp` rounding), gray =
    * `(r+g+b) div 3`, then one bit per horizontally-adjacent pixel pair
    * (`gray[x+1] > gray[x]`): a 64-bit fingerprint robust to rescaling
    * and small brightness shifts — the standard cheap near-dup key for
    * image corpora (pair by Hamming distance downstream, e.g. via
    * [[graft.ops.Dedup.simhashDupPairs]]'s segment blocking, which is
    * hash-width-agnostic). Emitted as a 64-char '0'/'1' string: every bit
    * faces the oracle directly and the driver's pandas compare stays
    * list-free. Unreadable payloads emit NULL — the corrupt-row channel.
    * Partition-local streaming; one image in memory at a time.
    */
  def dhashImage(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      rows.map { r =>
        val id = r.getLong(0)
        val src =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (src == null) Row(id, null) else Row(id, dhashOf(src))
      }
    }(RowEncoder.encoderFor(dhashSchema))
  }

  /** The 9×8 nearest-neighbor gray downsample + adjacent-pixel-compare
    * core shared by [[dhashImage]] and [[videoDhash]]. */
  private def dhashOf(src: java.awt.image.BufferedImage): String = {
    val (sw, sh) = (src.getWidth, src.getHeight)
    val gray = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      val sy = y * sh / 8
      var x = 0
      while (x < 9) {
        val pix = src.getRGB(x * sw / 9, sy) & 0xffffff
        gray(y)(x) = ((pix >> 16) + ((pix >> 8) & 0xff) + (pix & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    val sb = new java.lang.StringBuilder(64)
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        sb.append(if (gray(y)(x + 1) > gray(y)(x)) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  val videoDhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("dhash", StringType, nullable = true)))

  /** Per-FRAME perceptual dHash over a real multi-frame decode — the
    * video fingerprint: a clip's signature is its frame-hash sequence,
    * and near-duplicate clips (re-encodes, crops, watermarks) collide
    * frame-by-frame the way near-duplicate stills collide under
    * [[dhashImage]]. Composes the [[frameSampleImage]] reader loop (real
    * `ImageIO` multi-frame decode, lazy 1→N fan-out, one payload in
    * memory at a time) with the [[dhashImage]] core per frame.
    * Unreadable payloads emit one `frame_idx = −1` null-hash row.
    */
  def videoDhash(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Seq(Row(id, -1, null)) }
          else {
            val reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = (0 until n).map(i => Row(id, i, dhashOf(reader.read(i))))
            reader.dispose()
            iis.close()
            out
          }
        } catch {
          case scala.util.control.NonFatal(_) => Seq(Row(id, -1, null))
        }
      }
    }(RowEncoder.encoderFor(videoDhashSchema))
  }

  val histSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("b0", LongType, nullable = false),
    StructField("b1", LongType, nullable = false),
    StructField("b2", LongType, nullable = false),
    StructField("b3", LongType, nullable = false),
    StructField("mean_gray", LongType, nullable = false)))

  /** Per-image brightness statistics over a REAL decode: 4-bin gray
    * histogram (bin = gray div 64 over gray = (r+g+b) div 3) and the
    * integer mean — the cheap exposure/blank-frame screen an image-corpus
    * curation pass runs before anything expensive. All-integer, so
    * generated fixtures face the oracle pixel-for-pixel. Unreadable
    * payloads emit a −1 row. Partition-local streaming.
    */
  def imageHistogram(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      rows.map { r =>
        val id = r.getLong(0)
        val src =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (src == null) Row(id, -1L, -1L, -1L, -1L, -1L, -1L)
        else {
          val (w, h) = (src.getWidth, src.getHeight)
          val bins = new Array[Long](4)
          var graySum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val pix = src.getRGB(x, y) & 0xffffff
              val gray = ((pix >> 16) + ((pix >> 8) & 0xff) + (pix & 0xff)) / 3
              bins(gray / 64) += 1
              graySum += gray
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Row(id, n, bins(0), bins(1), bins(2), bins(3), graySum / n)
        }
      }
    }(RowEncoder.encoderFor(histSchema))
  }

  val channelStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_pix", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false),
    StructField("sq_sum", LongType, nullable = false)))

  /** Per-channel moment sums over a REAL decode — the inputs to the
    * mean/std normalization every vision embedder applies (and the
    * channel-imbalance screen an image-curation pass runs): per image,
    * pixel count plus exact integer Σr, Σg, Σb and Σv² over all three
    * channels' values. Emitting MOMENTS, not statistics, is deliberate:
    * LONG sums are exact at any image size (Σv² ≤ 3n·255², within LONG
    * to ~10¹³ pixels), shard-mergeable downstream, and the one lossy
    * double formula (mean/std) happens once in the consumer where the
    * oracle can replay its exact operation order. Unreadable payloads
    * emit a −1 row; partition-local streaming, one payload in memory at
    * a time.
    */
  def channelStats(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see withGeneratedPng
      rows.map { r =>
        val id = r.getLong(0)
        val src =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case scala.util.control.NonFatal(_) => null }
        if (src == null) Row(id, -1L, -1L, -1L, -1L, -1L)
        else {
          val (w, h) = (src.getWidth, src.getHeight)
          var (rs, gs, bs, sq) = (0L, 0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val pix = src.getRGB(x, y) & 0xffffff
              val cr = pix >> 16; val cg = (pix >> 8) & 0xff; val cb = pix & 0xff
              rs += cr; gs += cg; bs += cb
              sq += cr.toLong * cr + cg.toLong * cg + cb.toLong * cb
              x += 1
            }
            y += 1
          }
          Row(id, w.toLong * h, rs, gs, bs, sq)
        }
      }
    }(RowEncoder.encoderFor(channelStatsSchema))
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", IntegerType, nullable = false),
    StructField("frame_checksum", StringType, nullable = false)))

  /** STUB frame-sample: treats the payload as fixed-size frames
    * (`frameBytes` each) and emits every `everyN`-th frame as its own row —
    * the 1→N fan-out a video pipeline needs (per-frame rows feed the
    * downstream dedup/similarity ops). Lazy iterator fan-out: no partition
    * materialization, executor memory holds one payload at a time.
    */
  def frameSampleStub(df: DataFrame, frameBytes: Int = 256, everyN: Int = 4,
      idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val md = java.security.MessageDigest.getInstance("MD5")
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 =>
            Row(id, idx, frame.length, md.digest(frame).map("%02x".format(_)).mkString)
        }
      }
    }(RowEncoder.encoderFor(frameSchema))
  }

  val embeddedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB feature-extract — the BINARY-payload test double (a
    * deterministic `dim`-float embedding from the payload, md5-seeded,
    * cycled, in [-1, 1)). Produces exactly the `array<float>` layout
    * [[Similarity]] consumes, so the media → embedding → ANN chain is
    * testable end-to-end without a real codec. For TEXT the real,
    * gate-verified embedder is [[Similarity.embedText]] (hashing-trick
    * features — m6/sim6); this stub remains only for the opaque-binary
    * modalities whose decoders aren't in this container.
    */
  def embedStub(df: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", binCol: String = "media"): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val bytes = r.getAs[Array[Byte]](1)
        val vec = (0 until dim).map { i =>
          md.reset()
          md.update(i.toByte)
          val d = md.digest(bytes)
          val x = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
          (x.toFloat / Int.MaxValue.toFloat)
        }
        Row(r.getLong(0), vec)
      }
    }(RowEncoder.encoderFor(embeddedSchema))
  }

  /** Modality routing over a MIXED binary corpus — the dispatch step a
    * real multimodal lake needs before any decoder runs: rows carry
    * opaque bytes of unknown kind (crawls interleave images, audio,
    * junk), and running every decoder over every row multiplies the
    * most expensive stage by the modality count. Detection is by
    * container MAGIC BYTES (PNG's 8-byte signature, RIFF/WAV's 4), as
    * ONE narrow codegen'd expression — `hex(substring(bin))` compares,
    * no UDF, no decode, no row materialized beyond the prefix — so the
    * router costs a prefix inspection while the per-modality decoders
    * each see only their own rows. Rows matching no signature route to
    * `unknown` (corrupt uploads, truncated writes) for the caller to
    * quarantine, mirroring the decoders' NULL-on-corrupt contract.
    */
  def routeModality(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame =
    df.withColumn("modality",
      when(hex(substring(col(binCol), 1, 8)) === "89504E470D0A1A0A", "image")
        .when(hex(substring(col(binCol), 1, 4)) === "52494646", "audio")
        .otherwise("unknown"))

  /** DECODE-FREE image metadata — width/height parsed straight out of
    * the PNG IHDR header bytes (signature at offset 0, big-endian
    * dimensions at byte offsets 16/20) as ONE codegen'd
    * `conv(hex(substring(...)))` projection: no ImageIO, no object
    * allocation, no UDF. At 100 TB this is the triage pass that sizes,
    * routes, and filters an image corpus at column-scan speed, reserving
    * the ~1000× costlier real decode ([[decodeImage]]) for the rows that
    * survive. Non-PNG rows emit NULL dimensions (the quarantine-style
    * degrade of [[routeModality]], never a throw).
    *
    * @return (idCol, width, height, n_bytes)
    */
  def pngHeaderStats(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val isPng = hex(substring(col(binCol), 1, 8)) === "89504E470D0A1A0A"
    def be32(pos: Int) =
      conv(hex(substring(col(binCol), pos, 4)), 16, 10).cast("long")
    df.select(col(idCol),
      when(isPng, be32(17)).as("width"),
      when(isPng, be32(21)).as("height"),
      length(col(binCol)).cast("long").as("n_bytes"))
  }
}
