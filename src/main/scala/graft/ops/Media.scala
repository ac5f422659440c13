package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Doc, Span}

/** Multimodal column plumbing: media spans as opaque binary columns with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The default codecs are REAL, JDK-only container codecs: [[ImageIoCodec]]
  * decodes genuine PNG stills and multi-frame animated GIFs via
  * `javax.imageio` (header decode, pixel features, bilinear resize, frame
  * walk), and [[WavCodec]] decodes genuine RIFF/PCM WAV audio via
  * `javax.sound.sampled` (windowed RMS / zero-crossing features). Every
  * driver query (x08/x12/x15/x26) runs these real paths. The codec is
  * still a SEAM: every stage takes a `Codec` (serializable, constructed
  * for per-partition use), so a heavier production decoder (javacv,
  * TwelveMonkeys) slots in without touching the plan. [[FakeCodec]] is
  * retained ONLY as the plumbing-test seam — the codec-swap test in
  * OpsSpec proves the stages are codec-agnostic. */
object Media {

  // See ImageIoCodec: ImageIO's default disk-backed stream cache costs a
  // temp-file create/fill/delete per encode or decode. Set here too so
  // paths that use ImageIO without the codec seam (withResized's lambda)
  // run memory-backed on every executor that loads this module.
  javax.imageio.ImageIO.setUseCache(false)

  /** The decode seam. Implementations must be Serializable (shipped to
    * executors) and thread-safe per partition. */
  trait Codec extends Serializable {
    /** Resolve the payload bytes for a media_ref (real impl: object-store read). */
    def fetchBytes(mediaRef: String): Array[Byte]
    /** Decode container header: (width, height, format). */
    def decode(bytes: Array[Byte]): (Int, Int, String)
    /** Fixed-width feature vector (real impl: image embedding model). */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    /** Number of decodable frames in the container (1 for still images). */
    def frameCount(bytes: Array[Byte]): Int
    /** Decode frame `i` and re-encode it standalone (PNG for the real
      * codec) — actual per-frame pixels, the video-modality decode seam. */
    def frameAt(bytes: Array[Byte], i: Int): Array[Byte]
    /** Batch form: (frameCount, selected frames) in ONE container parse.
      * `pick(n)` chooses the frame indexes given the container's count.
      * Default composes frameCount + per-frame frameAt; codecs with a
      * container parse cost (ImageIO readers) override with a single
      * reader pass — at pipeline scale this is k decodes per clip, not
      * k+1 full container parses. */
    def framesDecoded(bytes: Array[Byte], pick: Int => Seq[Int]): (Int, Seq[(Int, Array[Byte])]) = {
      val n = frameCount(bytes)
      (n, pick(n).map(i => i -> frameAt(bytes, i)))
    }
  }

  /** STUB: deterministic fake codec. Byte payloads and "decoded" metadata
    * are pure functions of the media_ref so tests are reproducible. */
  object FakeCodec extends Codec {
    def fetchBytes(mediaRef: String): Array[Byte] = {
      val h = graft.gen.Corpus.mix(mediaRef.hashCode.toLong)
      val n = 64 + (math.abs(h) % 192).toInt
      Array.tabulate(n)(i => graft.gen.Corpus.mix(h + i).toByte)
    }
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val h = graft.gen.Corpus.mix(bytes.length.toLong * 31 + (if (bytes.nonEmpty) bytes(0) else 0))
      (64 + math.abs(h % 512).toInt, 64 + math.abs((h >>> 16) % 512).toInt,
        if ((h & 1) == 0) "jpeg" else "png")
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        val h = graft.gen.Corpus.mix(java.util.Arrays.hashCode(bytes).toLong + i)
        (h >>> 40).toFloat / (1L << 24).toFloat - 0.5f
      }
    def frameCount(bytes: Array[Byte]): Int =
      1 + math.abs(graft.gen.Corpus.mix(bytes.length.toLong) % 4).toInt
    def frameAt(bytes: Array[Byte], i: Int): Array[Byte] = {
      val h = graft.gen.Corpus.mix(java.util.Arrays.hashCode(bytes).toLong * 131 + i)
      Array.tabulate(32)(j => graft.gen.Corpus.mix(h + j).toByte)
    }
  }

  /** REAL codec on the JDK's built-in `javax.imageio` — zero new
    * dependencies, genuine byte streams. `fetchBytes` synthesizes an
    * actual container (deterministic pixels from the media_ref; in
    * production this method is an object-store read and everything else
    * ships as-is): a still PNG for image-kind refs, a genuine MULTI-FRAME
    * animated GIF for a deterministic ~25% "video-kind" subset of corpus
    * refs — so the frame path decodes real per-frame pixels from a real
    * multi-frame container, not synthetic offsets. `decode` reads the
    * container header back through an ImageReader (width/height +
    * reader-reported format name), `features` averages decoded RGB over a
    * column grid, `frameCount`/`frameAt` walk the container's image
    * sequence (`reader.getNumImages`/`read(i)`). FakeCodec remains for
    * speed-insensitive plumbing tests. */
  object ImageIoCodec extends Codec {

    // ImageIO's stream cache is DISK-backed by default: every
    // createImageInputStream / ImageIO.read / ImageIO.write otherwise
    // creates, fills and deletes a temp FILE per call — tens of thousands
    // of filesystem ops per pass whose cost tracks tmpfs state, not CPU
    // (guide §1: measured 3.5-12.9 s for x12 vs ~1.5 s clean in r4/r5).
    // Memory-backed cache streams decode/encode the same bytes — output
    // is bit-identical. JVM-global, applied when the codec object
    // initializes on each executor (first use).
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic "video-kind" rule for SYNTHESIZED corpus refs: jpg
      * refs whose seed hash lands in the low quarter become multi-frame
      * GIFs (2-5 frames). Explicit .png/.gif extensions are honored. */
    private def framesFor(mediaRef: String): Int = {
      val h = graft.gen.Corpus.mix(mediaRef.hashCode.toLong)
      if (mediaRef.endsWith(".png")) 1
      else if (mediaRef.endsWith(".gif")) 2 + math.abs((h >>> 8) % 4).toInt
      else if ((h & 3) == 0) 2 + math.abs((h >>> 8) % 4).toInt
      else 1
    }

    private def frameImage(h: Long, frame: Int, w: Int, ht: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, ht, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // fill the INT_RGB backing raster directly: same 24-bit values
      // setRGB would store (they are pre-masked), without a per-pixel
      // ColorModel dispatch + sync — the synth is the x12/x08 hot path
      val px = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      val base = h + frame.toLong * 7919L * w * ht
      var y = 0
      while (y < ht) {
        val rowBase = base + y.toLong * w
        val off = y * w
        var x = 0
        while (x < w) {
          px(off + x) = (graft.gen.Corpus.mix(rowBase + x) & 0xFFFFFF).toInt
          x += 1
        }
        y += 1
      }
      img
    }

    private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    def fetchBytes(mediaRef: String): Array[Byte] = {
      val h = graft.gen.Corpus.mix(mediaRef.hashCode.toLong)
      val w = 8 + math.abs(h % 24).toInt
      val ht = 8 + math.abs((h >>> 16) % 24).toInt
      val n = framesFor(mediaRef)
      if (n == 1) encodePng(frameImage(h, 0, w, ht))
      else {
        // a real animated GIF: ImageIO's sequence writer, one image per
        // frame — reader.getNumImages(true) sees them all
        val baos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var i = 0
          while (i < n) {
            writer.writeToSequence(
              new javax.imageio.IIOImage(frameImage(h, i, w, ht), null, null), null)
            i += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        baos.toByteArray
      }
    }
    def decode(bytes: Array[Byte]): (Int, Int, String) =
      withReader(bytes)(r => (r.getWidth(0), r.getHeight(0),
        r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      // mean (R, G, B) per vertical stripe, ceil(dim/3) stripes -> [0, 1]
      val stripes = (dim + 2) / 3
      val out = new Array[Float](dim)
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB (same per-pixel conversion contract as the
      // per-call form, minus the per-pixel dispatch) feeds every stripe
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var c = 0
      while (c < stripes) {
        val x0 = w * c / stripes
        val x1 = math.max(x0 + 1, w * (c + 1) / stripes)
        var rs = 0L; var gs = 0L; var bs = 0L; var n = 0
        var x = x0
        while (x < x1 && x < w) {
          var y = 0
          while (y < h) {
            val p = px(y * w + x)
            rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
            n += 1; y += 1
          }
          x += 1
        }
        def put(i: Int, v: Long): Unit =
          if (i < dim && n > 0) out(i) = v.toFloat / (n * 255f)
        put(c * 3, rs); put(c * 3 + 1, gs); put(c * 3 + 2, bs)
        c += 1
      }
      out
    }
    private def withReader[T](bytes: Array[Byte])(f: javax.imageio.ImageReader => T): T = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no ImageIO reader for ${bytes.length}-byte payload")
        val r = readers.next()
        r.setInput(iis)
        try f(r) finally r.dispose()
      } finally iis.close()
    }

    /** REAL frame count from the container's image sequence. */
    def frameCount(bytes: Array[Byte]): Int =
      withReader(bytes)(_.getNumImages(true))

    private def readFrameRgb(r: javax.imageio.ImageReader, i: Int): Array[Byte] = {
      val img = r.read(i)
      // normalize to RGB so the digest reflects pixels, not the palette
      val rgb = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      encodePng(rgb)
    }

    /** REAL frame decode: image `i` of the container, re-encoded as a
      * standalone PNG (actual pixels — the codec test pins per-frame
      * digests differ across frames of one GIF). */
    def frameAt(bytes: Array[Byte], i: Int): Array[Byte] =
      withReader(bytes)(readFrameRgb(_, i))

    /** Batch override: one ImageInputStream/reader for the count AND every
      * selected frame — the per-clip cost a scale pipeline pays. */
    override def framesDecoded(bytes: Array[Byte],
                               pick: Int => Seq[Int]): (Int, Seq[(Int, Array[Byte])]) =
      withReader(bytes) { r =>
        val n = r.getNumImages(true)
        (n, pick(n).map(i => i -> readFrameRgb(r, i)))
      }
  }

  /** REAL audio codec on the JDK's built-in `javax.sound.sampled` — zero
    * new dependencies, genuine WAV byte streams. `fetchBytes` synthesizes
    * deterministic 16-bit mono PCM (seeded harmonic + noise mix, StrictMath
    * so every JVM renders identical samples) wrapped in an actual RIFF/WAVE
    * container by `AudioSystem.write`; in production this method is an
    * object-store read and everything else ships as-is. `decode` reads the
    * real container header back (sample rate / channels / frame count),
    * `pcm` decodes the real sample stream, and `features` computes windowed
    * RMS + zero-crossing rate over those decoded samples — the standard
    * audio-quality signals a training-data pipeline filters on. */
  object WavCodec extends Serializable {
    val SampleRate = 8000f

    // Every AudioSystem entry point (write / getAudioFileFormat /
    // getAudioInputStream) funnels through the JDK's provider registry,
    // whose lookup is a synchronized JVM-global — measured NEGATIVE
    // thread scaling (4000 clips: 1.00 s on 1 thread, 1.34 s on 8), so
    // 32 executor threads serialize on it. Resolve the SPI providers
    // ONCE per JVM via the public ServiceLoader and call them directly:
    // same JDK WaveFileReader/Writer implementations, same
    // first-provider-that-accepts semantics, identical bytes — without
    // the per-call global lock. Provider instances are stateless and
    // shared across threads exactly as AudioSystem itself shares them.
    private lazy val fileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Vector.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      // try the RIFF/WAVE reader FIRST: only one provider ever accepts a
      // given container, so the first-success result is order-independent
      // — but probing the JDK's MIDI-backed reader costs a pass through
      // the synchronized MidiSystem registry PER CALL (the same global
      // lock this cache exists to avoid), and the AIFF/AU readers an
      // exception fill each
      val (wave, rest) = b.result()
        .partition(_.getClass.getSimpleName.toLowerCase(
          java.util.Locale.ROOT).startsWith("wave"))
      wave ++ rest
    }
    private lazy val fileWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      val b = Vector.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
      while (it.hasNext) b += it.next()
      b.result()
    }

    private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                          out: java.io.OutputStream): Unit = {
      val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
      fileWriters.find(_.isFileTypeSupported(t, ais)) match {
        case Some(w) => w.write(ais, t, out); ()
        case None => // registry fallback (never taken on a stock JDK)
          javax.sound.sampled.AudioSystem.write(ais, t, out); ()
      }
    }

    private def readFormat(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
      val rs = fileReaders.iterator
      while (rs.hasNext) {
        val r = rs.next()
        try return r.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
    }

    private def readStream(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val rs = fileReaders.iterator
      while (rs.hasNext) {
        val r = rs.next()
        try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
    }

    def fetchBytes(mediaRef: String): Array[Byte] = {
      val h = graft.gen.Corpus.mix(mediaRef.hashCode.toLong)
      val n = 800 + math.abs(h % 1600).toInt // 0.1-0.3 s at 8 kHz
      val freq = 200.0 + math.abs((h >>> 16) % 1000).toDouble
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val noise = (graft.gen.Corpus.mix(h + i) >> 40).toDouble / (1L << 24).toDouble
        val s = 0.6 * StrictMath.sin(2.0 * StrictMath.PI * freq * i / SampleRate) + 0.2 * noise
        val v = math.max(-32768, math.min(32767, (s * 32767.0).toInt))
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      writeWave(ais, baos)
      baos.toByteArray
    }

    /** Real RIFF header decode: (sampleRate, channels, nFrames). */
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val aff = readFormat(bytes)
      (aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
        aff.getFrameLength.toLong)
    }

    /** Real PCM decode: signed 16-bit little-endian samples. */
    def pcm(bytes: Array[Byte]): Array[Short] = {
      val ais = readStream(bytes)
      try {
        val raw = ais.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort
          i += 1
        }
        out
      } finally ais.close()
    }

    /** Windowed (rms, zeroCrossingRate) over the decoded samples: the clip
      * splits into `windows` equal spans; rms is normalized to [0, 1]. */
    def features(bytes: Array[Byte], windows: Int): Seq[(Double, Double)] = {
      require(windows >= 1, s"windows=$windows must be >= 1")
      val s = pcm(bytes)
      if (s.isEmpty) return Seq.fill(windows)((0.0, 0.0))
      (0 until windows).map { w =>
        val lo = (w.toLong * s.length / windows).toInt
        val hi = math.max(lo + 1, ((w + 1).toLong * s.length / windows).toInt)
        var sq = 0.0
        var zc = 0
        var i = lo
        while (i < hi && i < s.length) {
          val v = s(i).toDouble / 32768.0
          sq += v * v
          if (i > lo && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
          i += 1
        }
        val n = math.min(hi, s.length) - lo
        (StrictMath.sqrt(sq / n), zc.toDouble / n)
      }
    }
  }

  case class AudioRow(doc_id: String, media_ref: String, bytes: Array[Byte],
                      sample_rate: Int, channels: Int, n_frames: Long)

  /** Audio table: one clip per document (`corpus://audio/<doc>-0.wav`),
    * binary WAV payload + decoded header metadata. Narrow map — scales
    * with partitions, same shape as `mediaTable`. */
  def audioTable(docs: Dataset[Doc]): Dataset[AudioRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      val ref = s"corpus://audio/${d.doc_id}-0.wav"
      val bytes = WavCodec.fetchBytes(ref)
      val (sr, ch, nf) = WavCodec.decode(bytes)
      AudioRow(d.doc_id, ref, bytes, sr, ch, nf)
    }
  }

  /** Windowed audio features per clip: one row per window with real
    * RMS/zero-crossing values from the decoded PCM (mapPartitions batch
    * shape, like `withFeatures`). */
  def audioFeatures(audio: Dataset[AudioRow], windows: Int = 4): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { it =>
      it.flatMap { a =>
        WavCodec.features(a.bytes, windows).zipWithIndex.map { case ((rms, zcr), w) =>
          (a.doc_id, a.media_ref, w, a.sample_rate, a.n_frames,
            math.rint(rms * 1e6) / 1e6, math.rint(zcr * 1e6) / 1e6)
        }
      }
    }.toDF("doc_id", "media_ref", "window_idx", "sample_rate", "n_frames",
      "rms", "zero_cross_rate")
  }

  case class MediaRow(doc_id: String, media_ref: String, bytes: Array[Byte],
                      width: Int, height: Int, format: String)

  /** Media table from the corpus: one row per media span, binary payload +
    * decoded metadata. Narrow flatMap — scales with partitions; per-row
    * soft-fail like the text path.
    *
    * `withMeta = false` skips the container-header decode and leaves
    * (width, height, format) as (0, 0, "") — for consumers that only read
    * the payload (frameSample), where the header parse is a second full
    * reader pass per item that column pruning cannot remove from a typed
    * flatMap (guide §2.3: don't compute what you throw away). */
  def mediaTable(docs: Dataset[Doc], codec: Codec = FakeCodec,
                 withMeta: Boolean = true): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      Option(d.spans).getOrElse(Seq.empty)
        .filter(s => s.kind == "media" && s.media_ref != null && s.media_ref.nonEmpty)
        .map { s =>
          val bytes = codec.fetchBytes(s.media_ref)
          if (withMeta) {
            val (w, h, f) = codec.decode(bytes)
            MediaRow(d.doc_id, s.media_ref, bytes, w, h, f)
          } else MediaRow(d.doc_id, s.media_ref, bytes, 0, 0, "")
        }
    }
  }

  /** Media table from RAW FILES (the `io.Sources.binaryDocs` shape:
    * doc_id/filename/length/content): each file's bytes decode to a
    * MediaRow — the ingestion→decode bridge where payloads come from
    * storage instead of a ref fetch. Same narrow shape and per-row decode
    * as `mediaTable`. */
  def mediaTableFromFiles(files: DataFrame,
                          codec: Codec = FakeCodec): Dataset[MediaRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("doc_id").cast("string"), col("filename"), col("content"))
      .as[(String, String, Array[Byte])]
      .map { case (id, fn, bytes) =>
        val (w, h, f) = codec.decode(bytes)
        MediaRow(id, fn, bytes, w, h, f)
      }
  }

  /** Feature vectors per media item (batch shape: mapPartitions so a real
    * model could batch per partition). */
  def withFeatures(media: Dataset[MediaRow], dim: Int = 16,
                   codec: Codec = FakeCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(m => (m.doc_id, m.media_ref, codec.features(m.bytes, dim).toSeq))
    }.toDF("doc_id", "media_ref", "features")
  }

  /** Frame sampling for video-like payloads: up to k frames evenly spaced
    * across the container's REAL frame sequence, each decoded through the
    * codec — one row per sampled frame carrying the actual frame content
    * (bytes length + md5 of the re-encoded frame), so the driver-visible
    * rows derive from decoded pixels, not synthetic offsets. Still images
    * yield their single frame. Narrow flatMap, per-partition decode. */
  def frameSample(media: Dataset[MediaRow], k: Int = 4,
                  codec: Codec = FakeCodec): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      // one container parse per clip: count + all selected frames
      val (n0, frames) = codec.framesDecoded(m.bytes, { nRaw =>
        val n = math.max(1, nRaw)
        val take = math.min(k, n)
        (0 until take).map(i => (i.toLong * n / take).toInt)
      })
      val n = math.max(1, n0)
      frames.zipWithIndex.map { case ((src, frame), i) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(frame).map("%02x".format(_)).mkString
        (m.doc_id, m.media_ref, i, src, n, frame.length, digest)
      }
    }.toDF("doc_id", "media_ref", "frame_idx", "src_frame", "n_frames",
      "frame_bytes", "frame_md5")
  }

  /** Resize every media payload to (targetW, targetH): decode, bilinear
    * rescale, re-encode PNG — real pixels end to end (javax.imageio +
    * Graphics2D, no new dependencies). Narrow mapPartitions, same
    * per-partition batch shape as `withFeatures`; a row whose payload
    * cannot be decoded keeps `resized = null` (soft-fail, like the text
    * path) rather than failing the stage. */
  def withResized(media: Dataset[MediaRow], targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"target ${targetW}x$targetH must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val resized: Array[Byte] =
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
            if (img == null) null
            else {
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              baos.toByteArray
            }
          } catch { case _: Exception => null }
        (m.doc_id, m.media_ref, m.width, m.height, resized)
      }
    }.toDF("doc_id", "media_ref", "src_width", "src_height", "resized")
      .withColumn("target_width", org.apache.spark.sql.functions.lit(targetW))
      .withColumn("target_height", org.apache.spark.sql.functions.lit(targetH))
  }
}
