package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The payloads are REAL containers round-tripped through JRE codecs: PNG
  * streams via `javax.imageio` and RIFF/WAVE PCM via `javax.sound.sampled`
  * — each correctness gate only passes if the decoder recovers the
  * dimensions / sample values that went into the encoder. The same
  * partition-wise seam (`mapPartitions`, one codec context per partition,
  * not per row) is where an ffmpeg binding would slot for compressed
  * audio/video; for video, `n_frames` > 1 and frame-sampling happens
  * inside the same batch loop.
  */
object Multimodal {

  // Codec hygiene, once per JVM when this object loads (driver AND each
  // executor — every mapPartitions closure below references the object):
  // ImageIO's default `useCache=true` routes EVERY stream-based encode
  // and decode through a temp FILE (FileCacheImageInput/OutputStream —
  // create, write, read back, delete, per image), even when the caller
  // hands it a pure in-memory ByteArray stream. For millions of small
  // assets that is one disk round-trip per asset for nothing. `false`
  // selects the MemoryCache streams; the codec output bytes are
  // identical (guide §1.2 step 2: per-task work).
  ImageIO.setUseCache(false)

  /** One media asset: opaque payload + typed metadata (the metadata mirrors
    * what a real manifest would declare; decode does NOT read it). */
  final case class MediaRecord(doc_id: Long, mime: String, width: Int,
      height: Int, payload: Array[Byte])

  /** The backing int[] of a TYPE_INT_RGB image — pixels live as packed
    * 0xRRGGBB ints, so bulk writes (`Arrays.fill`, direct indexing)
    * store EXACTLY what per-pixel `setRGB` would (DirectColorModel
    * masks to 24 bits; the fills below never set alpha bits) without a
    * color-model call per pixel. */
  private def rgbData(img: BufferedImage): Array[Int] =
    img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData

  /** Decoded features per asset: dimensions and pixel channels come from
    * the DECODED image, never from the manifest metadata. */
  final case class DecodedRecord(doc_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, r: Int, g: Int, b: Int,
      feature0: Double)

  /** Fabricate a real PNG per document: dimensions and fill color are pure
    * integer formulas of (doc_id, n_chars), so a DuckDB oracle can predict
    * exactly what a correct decode must recover. Encoding runs distributed
    * (one ImageIO writer per partition) — stands in for a binary source
    * (parquet/tar shards of images). */
  def fabricateFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = (nChars % 64 + 1).toInt
          val h = (nChars % 48 + 1).toInt
          val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          java.util.Arrays.fill(rgbData(img), rgb) // == setRGB of every px
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          MediaRecord(id, "image/png", w, h, out.toByteArray)
        }
      }
  }

  /** Fabricate a 64×64 GRADIENT PNG per document — unlike the uniform
    * fills, gradients give every image a structured, id-dependent aHash
    * (the mod-256 wrap boundaries move with the id base), which is what
    * perceptual-hash dedup needs to demonstrate discrimination. The
    * pixel formula is pure integer arithmetic of (doc_id, x, y);
    * `flipPixel` optionally perturbs ONE pixel (+1 gray at (3,3)) to
    * fabricate a near-duplicate. */
  def fabricateGradients(docs: DataFrame, idOffset: Long = 0L,
      flipPixel: Boolean = false): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id0 =>
          val dim = 64
          val img = new BufferedImage(dim, dim, BufferedImage.TYPE_INT_RGB)
          // id-dependent STEP sizes, not just an offset: a pure offset
          // shifts every block mean AND the threshold equally, hashing
          // identically — frequency changes are what move the aHash.
          val base = (id0 % 199).toInt
          val sx = 2 + (id0 % 7).toInt
          val sy = 3 + (id0 % 11).toInt
          val data = rgbData(img) // direct raster writes == setRGB values
          var y = 0
          while (y < dim) {
            var x = 0
            while (x < dim) {
              var g = (base + x * sx + y * sy) % 256
              if (flipPixel && x == 3 && y == 3) g = (g + 1) % 256
              data(y * dim + x) = (g << 16) | (g << 8) | g
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          MediaRecord(id0 + idOffset, "image/png", dim, dim, out.toByteArray)
        }
      }
  }

  /** Perceptual average-hash (aHash) over the DECODED pixels: downscale
    * to an 8×8 grid by exact integer block averaging of the gray channel,
    * threshold each block at the integer mean of the 64 block values —
    * bit i set iff block i ≥ mean. Near-identical images (re-encodes,
    * small brightness shifts, single-pixel edits) land within a few bits;
    * the hash is a pure function of pixels, so exact re-encodes collide
    * exactly. One mapPartitions decode pass, 64 bits per image out. */
  final case class ImageHash(doc_id: Long, ahash: Long)

  def averageHash(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        // ONE bulk getRGB instead of w·h color-model calls — identical
        // values (same sRGB conversion path, batched).
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val block = new Array[Long](64)
        val cnt = new Array[Long](64)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val b = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
            block(b) += px(y * w + x) & 0xff // gray: any channel
            cnt(b) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        var total = 0L
        val means = new Array[Long](64)
        while (i < 64) {
          means(i) = if (cnt(i) > 0) block(i) / cnt(i) else 0L
          total += means(i); i += 1
        }
        val mean = total / 64
        var hash = 0L
        i = 0
        while (i < 64) {
          if (means(i) >= mean) hash |= (1L << i)
          i += 1
        }
        ImageHash(m.doc_id, hash)
      }
    }
  }

  /** Near-duplicate image pairs by aHash hamming distance ≤ `maxDistance`
    * via [[graft.ops.Dedup.hammingPairs64]]'s width-scaled pigeonhole
    * blocking: maxDistance+1 chunks, each ⌈64/(d+1)⌉ bits — never
    * all-pairs, and never the fixed-2048-bucket saturation that made byte
    * chunks quadratic at corpus scale; the exact XOR-popcount verify runs
    * on candidates only. */
  def ahashPairs(spark: SparkSession, hashes: Dataset[ImageHash],
      maxDistance: Int): DataFrame =
    graft.ops.Dedup.hammingPairs64(hashes.toDF(), "doc_id", "ahash", maxDistance)

  /** DCT perceptual hash (pHash) bits + set-bit count per image. The
    * hash is rendered as a 64-char bit string — hash-compare friendly,
    * and free of the 1L<<63 sign-wrap a packed long would need. */
  final case class DctHash(doc_id: Long, phash: String, n_set: Int)

  /** DCT-II perceptual hash over the DECODED pixels — the
    * frequency-domain sibling of [[averageHash]] (robust to brightness
    * and contrast shifts aHash is blind to): 64×64 gray → 2×2 block SUMS
    * to a 32×32 grid (integer; the /4 mean cancels in the threshold) →
    * separable 2-D DCT-II against a µ-QUANTIZED cosine table
    * (⌊cos·10⁴+0.5⌋ as integers, so every coefficient is an EXACT 64-bit
    * integer sum — no float accumulation order anywhere) → top-left 8×8
    * coefficients minus DC, bit i set iff 63·Fᵢ > ΣF (the integer
    * cross-product form of "above the mean", division-free). One
    * mapPartitions decode pass, the same codec seam as every decoder
    * here; the magnitude bound 1024·1020·10⁸·63 < 2⁶³ makes the whole
    * pipeline overflow-safe. */
  def dctHash(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[DctHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // Quantized DCT basis, built once per partition: 8 frequencies × 32
      // positions. cos argument order mirrors the oracle verbatim.
      val cosT = Array.tabulate(8, 32)((u, x) =>
        math.floor(math.cos((2 * x + 1) * u * math.Pi / 64.0) * 10000.0
          + 0.5).toLong)
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img.getWidth == 64 && img.getHeight == 64,
          s"dctHash expects the 64x64 gradient fixture, got " +
            s"${img.getWidth}x${img.getHeight}")
        // ONE bulk getRGB instead of 4096 color-model calls — identical
        // values (same sRGB conversion path, batched).
        val px = img.getRGB(0, 0, 64, 64, null, 0, 64)
        val pix = Array.ofDim[Long](32, 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            pix(x)(y) = (px(2 * y * 64 + 2 * x) & 0xff).toLong +
              (px(2 * y * 64 + 2 * x + 1) & 0xff) +
              (px((2 * y + 1) * 64 + 2 * x) & 0xff) +
              (px((2 * y + 1) * 64 + 2 * x + 1) & 0xff)
            x += 1
          }
          y += 1
        }
        // Separable DCT: G(u, Y) = Σ_X pix·cos, F(u, v) = Σ_Y G·cos.
        val g = Array.ofDim[Long](8, 32)
        var u = 0
        while (u < 8) {
          var yy = 0
          while (yy < 32) {
            var s = 0L
            var x = 0
            while (x < 32) { s += pix(x)(yy) * cosT(u)(x); x += 1 }
            g(u)(yy) = s
            yy += 1
          }
          u += 1
        }
        val f = new Array[Long](64)
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0L
            var yy = 0
            while (yy < 32) { s += g(u)(yy) * cosT(v)(yy); yy += 1 }
            f(u * 8 + v) = s
            v += 1
          }
          u += 1
        }
        var total = 0L
        var i = 1
        while (i < 64) { total += f(i); i += 1 }
        val bits = new StringBuilder(64)
        bits.append('0') // DC slot, never set
        var nSet = 0
        i = 1
        while (i < 64) {
          if (63L * f(i) > total) { bits.append('1'); nSet += 1 }
          else bits.append('0')
          i += 1
        }
        DctHash(m.doc_id, bits.toString, nSet)
      }
    }
  }

  /** Resized features: dimensions and the (0,0) pixel of the REAL
    * half-scale render. */
  final case class ResizedRecord(doc_id: Long, width: Int, height: Int,
      r: Int, g: Int, b: Int)

  /** One "video": an ordered run of per-frame PNG payloads. */
  final case class VideoRecord(doc_id: Long, n_frames: Int,
      frames: Seq[Array[Byte]])

  /** One sampled, decoded frame. */
  final case class FrameRecord(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, r: Int, g: Int, b: Int)

  /** Partition-wise decode + REAL half-scale resize (Graphics2D render into
    * a (⌊w/2⌋∨1, ⌊h/2⌋∨1) raster — the JRE's actual scaler, not metadata
    * arithmetic). The fills are uniform, so the oracle can predict the
    * resized pixel exactly regardless of interpolation kernel. */
  def resizeHalf(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ResizedRecord] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val rw = math.max(1, img.getWidth / 2)
        val rh = math.max(1, img.getHeight / 2)
        val dst = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
        val gfx = dst.createGraphics()
        gfx.drawImage(img, 0, 0, rw, rh, null)
        gfx.dispose()
        val argb = dst.getRGB(0, 0)
        ResizedRecord(m.doc_id, rw, rh,
          (argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      }
    }
  }

  /** Fabricate a per-doc "video": `doc_id % 3 + 1` uniform-fill PNG frames
    * whose colors are integer formulas of (doc_id, frame index) — the
    * DuckDB-predictable stand-in for a real container format. (Capped at 3
    * frames: fabrication is the dominant bench cost of the frames gate and
    * the sampling semantics are already exercised at n ∈ {1,2,3}.) */
  def fabricateVideos(docs: DataFrame): Dataset[VideoRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 3 + 1).toInt
        val w = (id % 16 + 1).toInt
        val h = (id % 12 + 1).toInt
        val frames = (0 until n).map { k =>
          val rgb = ((((id + 11 * k) % 256) << 16) |
            (((id * 7 + 11 * k) % 256) << 8) | ((id * 13 + 11 * k) % 256)).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          java.util.Arrays.fill(rgbData(img), rgb) // == setRGB of every px
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          out.toByteArray
        }
        VideoRecord(id, n, frames)
      }
    }
  }

  /** Frame sampling: decode every `step`-th frame of each video (the rest
    * are never decoded — the point of sampling). Same per-partition codec
    * seam; a real container would be demuxed here instead of unpacked. */
  def sampleFrames(spark: SparkSession, videos: Dataset[VideoRecord],
      step: Int): Dataset[FrameRecord] = {
    require(step > 0, "step must be positive")
    import spark.implicits._
    videos.flatMap { v =>
      (0 until v.n_frames by step).map { k =>
        val img = ImageIO.read(new ByteArrayInputStream(v.frames(k)))
        val argb = img.getRGB(0, 0)
        FrameRecord(v.doc_id, k, img.getWidth, img.getHeight,
          (argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      }
    }
  }

  /** One audio asset: an opaque RIFF/WAVE container. */
  final case class AudioRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Per-document voice-activity report over fixed-length frames. */
  final case class VadReport(doc_id: Long, n_frames: Long, n_active: Long,
      n_segments: Long, longest_run: Long, active_ratio: Double)

  /** Energy-based voice-activity detection over the DECODED PCM stream:
    * the samples are framed (`frameLen` samples, trailing partial frame
    * dropped), a frame is active when its Σ|sample| energy reaches
    * `threshold` (integer-exact), and consecutive active frames merge into
    * segments — the trim/segment primitive an audio-pretraining pipeline
    * runs before transcription. One mapPartitions decode pass (the same
    * codec seam as [[decodeAudio]]); because the fixture waveform is an
    * integer formula of (doc_id, n_chars), a SQL oracle can re-derive
    * every frame energy from first principles — the decode path and the
    * formula path are fully independent implementations. */
  def vadSegments(spark: SparkSession, media: Dataset[AudioRecord],
      frameLen: Int = 20, threshold: Long = 160000L): Dataset[VadReport] = {
    require(frameLen >= 1, s"frameLen must be positive: $frameLen")
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(m.payload))
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val nf = n / frameLen
        var f = 0
        var nActive = 0L
        var nSegments = 0L
        var run = 0L
        var longest = 0L
        while (f < nf) {
          var e = 0L
          var j = 0
          while (j < frameLen) {
            val idx = 2 * (f * frameLen + j)
            val s = ((bytes(idx) & 0xff) | (bytes(idx + 1) << 8)).toShort.toInt
            e += math.abs(s)
            j += 1
          }
          if (e >= threshold) {
            nActive += 1
            if (run == 0L) nSegments += 1
            run += 1
            if (run > longest) longest = run
          } else run = 0L
          f += 1
        }
        val ratio =
          if (nf == 0) 0.0
          else java.math.BigDecimal.valueOf(nActive.toDouble / nf.toDouble)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        VadReport(m.doc_id, nf.toLong, nActive, nSegments, longest, ratio)
      }
    }
  }

  /** One DFT bin of one asset: exact integer Σ s·cosµ / Σ s·sinµ against
    * the µ-quantized basis (⌊trig·10⁴+0.5⌋). */
  final case class DftBin(doc_id: Long, bin: Int, re: Long, im: Long)

  /** Low-bin DFT spectrum over the DECODED PCM stream — the
    * frequency-domain audio feature (band energies / dominant harmonic)
    * next to [[vadSegments]]' time-domain energy: for bins u = 1..`bins`,
    * re = Σᵢ sᵢ·⌊cos(2πui/n)·10⁴+0.5⌋ and im = Σᵢ sᵢ·⌊sin(·)·10⁴+0.5⌋ —
    * the basis is quantized to integers, so both sums are EXACT 64-bit
    * integers (|s|≤16016 · 10⁴ · 440 samples < 2⁶³) and an oracle
    * re-deriving the samples from the fabrication formula must reproduce
    * them bit-for-bit. Same mapPartitions codec seam as [[decodeAudio]]:
    * the engine side never sees the formula, only the decoded bytes. */
  def dftBins(spark: SparkSession, media: Dataset[AudioRecord],
      bins: Int = 8): Dataset[DftBin] = {
    require(bins >= 1 && bins <= 32, s"bins out of range: $bins")
    import spark.implicits._
    media.flatMap { m =>
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(m.payload))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val s = new Array[Long](n)
      var i = 0
      while (i < n) {
        s(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
        i += 1
      }
      (1 to bins).map { u =>
        var re = 0L
        var im = 0L
        var j = 0
        while (j < n) {
          val arg = 2.0 * math.Pi * u * j / n
          re += s(j) * math.floor(math.cos(arg) * 10000.0 + 0.5).toLong
          im += s(j) * math.floor(math.sin(arg) * 10000.0 + 0.5).toLong
          j += 1
        }
        DftBin(m.doc_id, u, re, im)
      }
    }
  }

  /** Decoded audio features: format fields parsed from the container
    * header, sample statistics computed from the decoded PCM stream. */
  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
      channels: Int, bits: Int, n_samples: Long, duration_ms: Long,
      peak: Int, sum_abs: Long)

  /** Fabricate a real WAV per document — 16-bit signed PCM mono at
    * 8 or 16 kHz, `n_chars % 400 + 40` samples of the integer waveform
    * `((i·k) mod 2001 − 1000)·16` with `k = doc_id % 97 + 3` — written
    * through `AudioSystem.write` so the payload is a genuine RIFF/WAVE
    * container, not a hand-rolled blob. Every parameter is an integer
    * formula of (doc_id, n_chars), so a DuckDB oracle can predict exactly
    * what a correct decode must recover. */
  def fabricateAudio(docs: DataFrame): Dataset[AudioRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val rate = (8000L * (id % 2 + 1)).toInt
          val n = (nChars % 400 + 40).toInt
          val k = id % 97 + 3
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = ((i * k % 2001 - 1000) * 16).toInt
            pcm(2 * i) = (s & 0xff).toByte          // PCM WAV is little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(rate.toFloat, 16, 1,
            /* signed = */ true, /* bigEndian = */ false)
          val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
          AudioRecord(id, "audio/wav", out.toByteArray)
        }
      }
  }

  /** Partition-wise audio decode — a REAL `AudioSystem.getAudioInputStream`
    * parse of the WAV container. Format fields come from the parsed header,
    * peak/sum_abs from the decoded samples (PCM is lossless, so they must
    * equal the fabrication formulas exactly — that equality IS the gate). */
  def decodeAudio(spark: SparkSession, media: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(m.payload))
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var peak = 0
        var sumAbs = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sumAbs += a
          i += 2
        }
        val rate = fmt.getSampleRate.toInt
        AudioFeatures(m.doc_id, rate, fmt.getChannels,
          fmt.getSampleSizeInBits, nFrames, nFrames * 1000L / rate,
          peak, sumAbs)
      }
    }
  }

  /** Partition-wise decode/feature-extract — a REAL `ImageIO.read` of the
    * PNG stream. Dimensions, channel values, and feature0 are read from the
    * decoded raster (PNG is lossless, so they must equal the fabrication
    * formulas exactly — that equality IS the gate). */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[DecodedRecord] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // a stateful codec context would be initialized once per partition here
      it.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val argb = img.getRGB(0, 0)
        val r = (argb >> 16) & 0xff
        DecodedRecord(m.doc_id, m.mime, m.payload.length.toLong,
          img.getWidth, img.getHeight, n_frames = 1,
          r = r, g = (argb >> 8) & 0xff, b = argb & 0xff,
          feature0 = r / 255.0)
      }
    }
  }
}
