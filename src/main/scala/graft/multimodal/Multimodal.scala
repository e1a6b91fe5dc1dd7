package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is the real deliverable — schema, partitioning,
  * batch iteration (`mapPartitions`, the JVM twin of Python's
  * `mapInPandas`), and the decode seam. Decoding is REAL wherever the
  * JVM can honestly do it: pure header walks ([[HeaderCodecs]]) for
  * container metadata, raw raster/PCM extraction for the uncompressed
  * formats, and the standard JDK `javax.imageio` decoder
  * ([[PixelCodecs]]) for compressed JPEG/PNG pixels. [[StubCodecs]] is
  * only the degradation for payloads nothing can decode (raw chunks,
  * corrupt containers, codec-less formats like MJPEG-in-AVI audio) —
  * swap in a richer codec library and nothing else changes.
  *
  * Scale notes: binary payloads never pass through a shuffle here — decode
  * and feature extraction are per-partition map work directly over the
  * scan; only the (small) extracted features flow onward. That ordering
  * (project/decode early, shuffle late and narrow) is what keeps a 100 TB
  * multimodal table tractable.
  */
object Multimodal {

  /** Asset table schema: one row per media object. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),            // image | audio | video
    StructField("content", BinaryType, nullable = false),         // opaque payload
    StructField("meta", MapType(StringType, StringType), nullable = true),
  ))

  /** Deterministic synthetic asset table (fixture generator — the corpus'
    * stand-in for a real object-store-backed table). Image rows are VALID
    * minimal BMP files and audio rows VALID mono PCM8 WAVs (every fourth
    * image a binary PPM, every eighth a CRC-correct PNG with synthetic
    * IDAT — the undecodable-payload seam — and every eighth a REAL
    * JDK-encoded JPEG whose pixels decode); most video rows
    * are VALID MJPEG-flavored AVIs (real RIFF walk — frame payloads stay
    * opaque, decoding them needs a codec library), with every fifth left a
    * raw chunk payload to keep the stub fallback exercised. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import graft.functions.MinHash.mix64
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = kind match {
        case "image" if i % 8 == 0 =>
          HeaderCodecs.makePng(2 + i % 11, 2 + i % 7, i.toLong)
        case "image" if i % 8 == 2 =>
          HeaderCodecs.makeRealJpeg(2 + i % 10, 2 + i % 6, i.toLong)
        case "image" if i % 4 == 0 =>
          HeaderCodecs.makePpm(2 + i % 7, 2 + i % 5, i.toLong)
        case "image" =>
          HeaderCodecs.makeBmp(2 + i % 9, 2 + i % 6, i.toLong)
        case "audio" =>
          HeaderCodecs.makeWav(8000 + 1000 * (i % 5), 32 + (i % 160), i.toLong)
        case _ if i % 5 == 4 =>
          val len = 64 + (math.abs(mix64(i.toLong)) % 192).toInt
          Array.tabulate(len)(j => mix64(i.toLong * 1000003L + j).toByte)
        case _ =>
          // alternate genuine MJPEG (independent JPEG frames) and opaque
          // frame payloads: both layouts exist in the wild
          HeaderCodecs.makeAvi(16 + i % 16, 12 + i % 8, 4 + i % 9, i.toLong,
            jpegFrames = i % 2 == 0)
      }
      Row(i.toLong, kind, bytes, Map("source" -> s"synthetic/$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 64)), assetSchema)
  }

  case class DecodedMeta(asset_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Long)
  case class AssetFeature(asset_id: Long, feature: Array[Double])
  case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Decode each asset's header → typed metadata, batched per partition.
    * Real plumbing, stub codec (see [[StubCodecs.decodeHeader]]). */
  def decodeMeta(assets: DataFrame): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup happens HERE (codec init, native handles):
        // once per task, not per row — the pattern that matters at scale.
        val codec = HeaderCodecs
        batch.map { case (id, kind, bytes) =>
          val (w, h, frames) = codec.decodeHeader(kind, bytes)
          DecodedMeta(id, kind, w, h, frames, bytes.length.toLong)
        }
      }
  }

  /** Fixed-width feature vector per asset (16-bin byte histogram, L1
    * normalized — a stand-in for an embedding model's output with the same
    * dataflow shape: binary in, small dense vector out). The histogram is
    * computed over the DECODABLE payload — real PPM pixel bytes, BMP
    * raster, JDK-decoded JPEG/PNG pixels, WAV PCM data
    * ([[HeaderCodecs.payloadBytes]]) — so the feature describes actual
    * content wherever a decoder exists; undecodable payloads histogram
    * whole (the documented degradation stance). */
  def extractFeatures(assets: DataFrame, bins: Int = 16): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, raw) =>
          val bytes = HeaderCodecs.payloadBytes(raw)
          val hist = new Array[Double](bins)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) * bins / 256) += 1.0; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          AssetFeature(id, hist.map(_ / n))
        }
      }
  }

  case class ResizedAsset(asset_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Resize image assets to `targetW`×`targetH` grayscale: for decodable
    * payloads (P6 PPM, 24-bit BMP, and JPEG/PNG via the JDK decoder) this
    * is a REAL nearest-neighbor resample of the actual pixel raster —
    * 3-byte RGB pixels reduced to luma ((r+g+b)/3) — so the output
    * derives from payload pixels; undecodable payloads keep the
    * deterministic byte-sampler stub. The plumbing — decode dims,
    * per-partition batch transform, fixed-size typed output — is
    * identical on both paths. */
  def resizeImages(assets: DataFrame, targetW: Int = 8, targetH: Int = 8): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "image")
      .select("asset_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        val codec = HeaderCodecs
        batch.map { case (id, kind, bytes) =>
          val (w, h, _) = codec.decodeHeader(kind, bytes)
          val raster = codec.ppmRaster(bytes).orElse(codec.bmpRaster(bytes))
            .orElse(codec.compressedRaster(bytes))
          val out = new Array[Byte](targetW * targetH)
          var y = 0
          while (y < targetH) {
            var x = 0
            while (x < targetW) {
              val sx = x * w / targetW
              val sy = y * h / targetH
              val idx = sy * w + sx
              out(y * targetW + x) = raster match {
                case Some(px) if 3 * idx + 2 < px.length =>
                  // real pixels: RGB → luma byte
                  (((px(3 * idx) & 0xFF) + (px(3 * idx + 1) & 0xFF) +
                    (px(3 * idx + 2) & 0xFF)) / 3).toByte
                case Some(_) => 0 // truncated raster: black, never garbage
                case None =>
                  if (bytes.nonEmpty) bytes(math.abs(idx) % bytes.length) else 0
              }
              x += 1
            }
            y += 1
          }
          ResizedAsset(id, targetW, targetH, out)
        }
      }
  }

  case class ChannelStats(asset_id: Long, channel: String, n_pixels: Long,
      mean: Double, std: Double)

  /** Per-channel pixel statistics (mean + population std of the 0-255
    * values) from REAL rasters — the color/exposure profile an image
    * pipeline uses for normalization constants and outlier filtering.
    * Only honestly decodable payloads emit rows: P6 PPM (RGB order),
    * 24-bit BMP (stored BGR — channel names follow the format's byte
    * order, so "r" is always the red channel), and JPEG/PNG through the
    * JDK decoder ([[HeaderCodecs.compressedRaster]], sRGB order).
    * Undecodable payloads emit NOTHING rather than header-byte
    * pseudo-statistics. */
  def channelStats(assets: DataFrame): Dataset[ChannelStats] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "image")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val rgb = HeaderCodecs.ppmRaster(bytes).map((_, Array("r", "g", "b")))
            .orElse(HeaderCodecs.bmpRaster(bytes).map((_, Array("b", "g", "r"))))
            .orElse(HeaderCodecs.compressedRaster(bytes).map((_, Array("r", "g", "b"))))
          rgb.toSeq.flatMap { case (px, names) =>
            val n = px.length / 3
            if (n == 0) Nil
            else (0 until 3).map { c =>
              var sum = 0.0
              var sumSq = 0.0
              var i = c
              while (i < n * 3) {
                val v = (px(i) & 0xFF).toDouble
                sum += v; sumSq += v * v
                i += 3
              }
              val mean = sum / n
              ChannelStats(id, names(c), n.toLong, mean,
                math.sqrt(math.max(0.0, sumSq / n - mean * mean)))
            }
          }
        }
      }
  }

  case class RasterDigest(asset_id: Long, fmt: String, n_bytes: Long, crc: Long)

  /** Per-asset CRC32 digest of the REAL decoded raster bytes — the drift
    * detector for the whole pixel-decode path (PPM walk, BMP row
    * un-padding, JDK JPEG/PNG decode + sRGB conversion). Decode here is
    * bit-exact, not approximate: identical payload bytes must yield
    * identical rasters on every executor and every round, so the digests
    * are golden-pinnable the same way the sketch/recall gates pin their
    * bars. Undecodable payloads emit NOTHING (their degradation is covered
    * by the stub-path queries). */
  def rasterDigests(assets: DataFrame): Dataset[RasterDigest] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "image")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          HeaderCodecs.ppmRaster(bytes).map(("ppm", _))
            .orElse(HeaderCodecs.bmpRaster(bytes).map(("bmp", _)))
            .orElse(HeaderCodecs.compressedRaster(bytes).map(("jdk", _)))
            .map { case (fmt, px) =>
              val crc = new java.util.zip.CRC32()
              crc.update(px)
              RasterDigest(id, fmt, px.length.toLong, crc.getValue)
            }
        }
      }
  }

  /** Driver-visible THROW gate over [[rasterDigests]]: order-free
    * aggregates (count, CRC sum/xor, total raster bytes) compared against
    * golden constants measured from the deterministic fixture — any drift
    * in any decoder stage flips at least one aggregate and the gate
    * throws, surfacing as a hard `err` in the correctness report instead
    * of passing a rows-only check silently (the pattern every
    * sketch/recall gate already follows). The digest frame is bounded
    * (one narrow row per decodable image), and only four scalars reach
    * the driver. */
  def rasterDigestGate(assets: DataFrame, expectedCount: Long,
      expectedCrcSum: Long, expectedCrcXor: Long, expectedBytes: Long): DataFrame = {
    val row = rasterDigests(assets).toDF().agg(
      count(lit(1)).as("n_decoded"),
      sum(col("crc")).as("crc_sum"),
      expr("bit_xor(crc)").as("crc_xor"),
      sum(col("n_bytes")).as("raster_bytes")).head()
    val (n, s, x, b) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    require(n == expectedCount && s == expectedCrcSum &&
        x == expectedCrcXor && b == expectedBytes,
      s"decoded-raster digest drift: got (n=$n, crc_sum=$s, crc_xor=$x, " +
        s"bytes=$b), expected (n=$expectedCount, crc_sum=$expectedCrcSum, " +
        s"crc_xor=$expectedCrcXor, bytes=$expectedBytes)")
    assets.sparkSession.range(1).select(
      lit(n).as("n_decoded"), lit(s).as("crc_sum"),
      lit(x).as("crc_xor"), lit(b).as("raster_bytes"))
  }

  case class AudioFrame(asset_id: Long, frame_idx: Int, rms: Double, peak: Double)

  /** Per-frame audio energy over REAL decoded samples: WAV payloads
    * decode via [[HeaderCodecs.pcmSamples]] honoring the header's sample
    * width (8-bit unsigned offset-128 per the RIFF spec, 16-bit signed
    * LE); raw payloads degrade to the deterministic signed-byte stub.
    * Samples frame into `frameSamples` windows and emit RMS + peak per
    * frame — the feature extraction that feeds VAD/silence trimming in an
    * audio training pipeline.
    *
    * Batching shape: rows are processed in groups of `rowBatch` via a
    * chunked iterator — the JVM analog of Arrow record-batch processing
    * (`mapInPandas` batch semantics): peak memory is bounded by the chunk,
    * not the partition, and a real vectorized DSP kernel would run once per
    * chunk. The grouping is lazy (Iterator.grouped), so the partition
    * never materializes. */
  def audioFrameEnergy(assets: DataFrame, frameSamples: Int = 32,
      rowBatch: Int = 64): Dataset[AudioFrame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "audio")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(rowBatch).flatMap { chunk =>
          // per-chunk "kernel" invocation over a bounded batch
          chunk.iterator.flatMap { case (id, raw) =>
            val samples = HeaderCodecs.pcmSamples(raw)
            samples.grouped(frameSamples).zipWithIndex.map { case (frame, idx) =>
              var sumSq = 0.0
              var peak = 0.0
              var i = 0
              while (i < frame.length) {
                val s = frame(i)
                sumSq += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                i += 1
              }
              AudioFrame(id, idx, math.sqrt(sumSq / math.max(1, frame.length)), peak)
            }
          }
        }
      }
  }

  case class KeyFrame(asset_id: Long, frame_idx: Int, diff_energy: Double)

  /** Frame boundaries for one video payload: the AVI movi chunk index when
    * the container parses ([[HeaderCodecs.aviFrameBounds]]), fixed-size
    * chunking as the degraded path for raw/corrupt payloads — the same
    * real-parse-first/stub-fallback seam as [[HeaderCodecs.decodeHeader]]. */
  private def frameBounds(bytes: Array[Byte], frameBytes: Int): Array[(Int, Int)] =
    HeaderCodecs.aviFrameBounds(bytes).getOrElse(
      Array.tabulate((bytes.length + frameBytes - 1) / frameBytes) { i =>
        (i * frameBytes, math.min(frameBytes, bytes.length - i * frameBytes))
      })

  /** Key-frame selection for video assets: score each frame by mean
    * absolute byte difference against its predecessor (a scene-change
    * proxy over the container's REAL frame boundaries for AVI payloads; a
    * full pipeline diffs decoded luma planes — same dataflow) and keep the
    * `topJ` highest-energy frames per asset. Selection happens INSIDE the
    * per-row map — frames of one asset never leave the task, so there is
    * no shuffle at all; output is topJ rows per video. */
  def keyFrames(assets: DataFrame, frameBytes: Int = 32, topJ: Int = 3): Dataset[KeyFrame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "video")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val bounds = frameBounds(bytes, frameBytes)
        val scored = (1 until bounds.length).map { i =>
          val (po, pn) = bounds(i - 1)
          val (co, cn) = bounds(i)
          val n = math.min(pn, cn)
          var s = 0.0
          var j = 0
          while (j < n) {
            s += math.abs((bytes(co + j) & 0xFF) - (bytes(po + j) & 0xFF)); j += 1
          }
          KeyFrame(id, i, if (n == 0) 0.0 else s / n)
        }
        scored.sortBy(f => (-f.diff_energy, f.frame_idx)).take(topJ)
      }
  }

  case class FrameMeta(asset_id: Long, frame_idx: Int, format: String,
      width: Int, height: Int, n_bytes: Long)

  /** Per-frame metadata for video assets: sample frames on the container's
    * boundaries, then parse EACH frame payload's OWN header — MJPEG frames
    * are independent baseline JPEGs, so this is two nested container walks
    * (AVI movi index, then JPEG SOF per frame), still pure per-row map
    * work with no shuffle. Unrecognized payloads report format "raw". */
  def frameMeta(assets: DataFrame, everyK: Int = 1,
      frameBytes: Int = 32): Dataset[FrameMeta] = {
    import assets.sparkSession.implicits._
    sampleFrames(assets, everyK, frameBytes).map { fr =>
      HeaderCodecs.parse(fr.frame_bytes) match {
        case Some(m) =>
          FrameMeta(fr.asset_id, fr.frame_idx, m.format, m.width, m.height,
            fr.frame_bytes.length.toLong)
        case None =>
          FrameMeta(fr.asset_id, fr.frame_idx, "raw", 0, 0,
            fr.frame_bytes.length.toLong)
      }
    }
  }

  /** Sample every `everyK`-th frame of video assets — AVI frame chunks
    * when the container parses, fixed-size byte chunks otherwise. One
    * output row per sampled frame. */
  def sampleFrames(assets: DataFrame, everyK: Int = 2, frameBytes: Int = 32): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "video")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val bounds = frameBounds(bytes, frameBytes)
        bounds.indices.collect {
          case i if i % everyK == 0 =>
            val (o, n) = bounds(i)
            Frame(id, i, java.util.Arrays.copyOfRange(bytes, o, o + n))
        }
      }
  }
}

/** STUB codecs — the deterministic degradation for payloads NOTHING can
  * decode (raw chunks, corrupt containers, formats beyond the JDK's
  * reach). [[HeaderCodecs]] parses real containers and [[PixelCodecs]]
  * decodes real JPEG/PNG pixels first; this fallback is the last resort,
  * kept deterministic so a corrupt object in a 100 TB corpus degrades
  * predictably instead of failing the task. */
object StubCodecs {
  /** "Decode" a header: width/height/frame-count derived deterministically
    * from the first payload bytes. A real implementation parses the actual
    * container format — see [[HeaderCodecs.decodeHeader]], which tries the
    * real parsers before landing here. */
  def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xFF else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
    kind match {
      case "image" => (16 + b0 % 64, 16 + b1 % 64, 1)
      case "audio" => (0, 0, 1 + b0 % 16)            // "frames" = chunks
      case _       => (16 + b0 % 32, 16 + b1 % 32, 1 + (b0 + b1) % 8)
    }
  }
}

/** REAL compressed-pixel decode via the standard JDK's `javax.imageio`
  * (public-knowledge API, headless-capable, no native codec library
  * needed): baseline JPEG and real PNG payloads decode to actual pixel
  * rasters. This replaces the former "environment-blocked" stub stance
  * for JPEG — the JDK ships the decoder. Fixture PNGs with synthetic
  * IDAT bytes and raw payloads still fail decode and keep the documented
  * [[StubCodecs]] degradation, so both seams stay exercised.
  *
  * Executor hygiene: `ImageIO` defaults to a DISK scratch cache per
  * decode — on an executor that is a temp file per row; disabled once at
  * class init. Headless is forced on (a data-plane JVM never has a
  * display, and a missing X server must not fail the task). */
object PixelCodecs {
  if (sys.props.get("java.awt.headless").isEmpty)
    System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode a compressed image payload to a top-down interleaved RGB byte
    * raster `(width, height, w·h·3 bytes)`. None when no installed reader
    * accepts the payload (corrupt scan, unknown format) — decode failure
    * is a data property at 100 TB, not an error, so it degrades instead of
    * throwing. The decompression-bomb bound is checked from the HEADER
    * dimensions (reader metadata, no pixel decode) BEFORE the full read —
    * a crafted header declaring huge dims must not allocate a multi-GB
    * raster on an executor first and get size-checked after. Only
    * NonFatal failures degrade to None: an OutOfMemoryError or an
    * interrupt (Spark task cancellation) must propagate. */
  def rgbRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis)
          // header-only dims — no pixel decode yet
          if (reader.getWidth(0) <= 0 || reader.getHeight(0) <= 0 ||
              reader.getWidth(0).toLong * reader.getHeight(0) > (1L << 26)) null
          else reader.read(0)
        } finally { reader.dispose(); iis.close() }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h * 3)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // getRGB converts any source color model to sRGB — one
            // spelling for every BufferedImage type ImageIO can produce
            val rgb = img.getRGB(x, y)
            out(i) = ((rgb >> 16) & 0xFF).toByte
            out(i + 1) = ((rgb >> 8) & 0xFF).toByte
            out(i + 2) = (rgb & 0xFF).toByte
            i += 3
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** Real pure-JVM container parsing for the header-only formats — BMP /
  * PPM / PNG (image dimensions), WAV (sample rate / channels / frame
  * count), AVI (dimensions / frame count / movi frame index). No codec
  * library needed: these are fixed-layout byte headers and chunk walks.
  * Malformed or unrecognized payloads return None and the caller falls
  * back to [[StubCodecs]], so a corrupt object in a 100 TB corpus degrades
  * to a deterministic fake instead of failing the task. */
object HeaderCodecs {

  /** Parsed container metadata. `nFrames`: 1 for still images, PCM
    * sample-frame count for WAV. */
  case class ContainerMeta(format: String, width: Int, height: Int,
      nFrames: Int, sampleRate: Int, channels: Int, bitsPerSample: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (u16le(b, o).toLong) | (u16le(b, o + 2).toLong << 16)
  private def i32le(b: Array[Byte], o: Int): Int = u32le(b, o).toInt

  // sanity bound: dimensions past 2^20 in a header are corruption, not data
  private val MaxDim = 1 << 20

  /** BMP: 14-byte file header ("BM", file size, pixel offset) + BITMAPINFO
    * header (size ≥ 40) carrying signed little-endian width/height at
    * offsets 18/22; negative height encodes top-down row order. */
  def parseBmp(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val infoSize = i32le(bytes, 14)
    val w = i32le(bytes, 18)
    val h = math.abs(i32le(bytes, 22))
    if (infoSize < 40 || w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) None
    else Some(ContainerMeta("bmp", w, h, 1, 0, 0, u16le(bytes, 28)))
  }

  /** Binary/ASCII PPM/PGM ("P2".."P6"): ASCII magic, then whitespace- and
    * comment-separated width, height, maxval. */
  def parsePpm(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 7 || bytes(0) != 'P' ||
        bytes(1) < '2' || bytes(1) > '6') return None
    var pos = 2
    // read the next ASCII int, skipping whitespace and '#' comments
    def nextInt(): Option[Int] = {
      while (pos < bytes.length &&
          (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && Character.isDigit(bytes(pos))) pos += 1
      // >9 digits can't be a sane dimension and would overflow toInt —
      // return None so the caller degrades to the stub (never throws)
      if (pos == start || pos - start > 9) None
      else Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); _ <- nextInt() // maxval
      if w > 0 && h > 0 && w <= MaxDim && h <= MaxDim
    } yield ContainerMeta("ppm", w, h, 1, 0, 0, 8)
  }

  /** WAV: RIFF/WAVE container; walk chunks for "fmt " (format, channels,
    * sample rate, block align, bits) and "data" (payload size → frame
    * count = size / blockAlign). */
  def parseWav(bytes: Array[Byte]): Option[ContainerMeta] = {
    def tag(o: Int, s: String) = bytes.length >= o + 4 &&
      bytes(o) == s(0) && bytes(o + 1) == s(1) &&
      bytes(o + 2) == s(2) && bytes(o + 3) == s(3)
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate, channels, bits, blockAlign = 0
    var dataSize = -1L
    var ok = true
    while (ok && pos + 8 <= bytes.length && (rate == 0 || dataSize < 0)) {
      val size = u32le(bytes, pos + 4)
      if (tag(pos, "fmt ") && pos + 24 <= bytes.length) {
        channels = u16le(bytes, pos + 10)
        rate = i32le(bytes, pos + 12)
        blockAlign = u16le(bytes, pos + 20)
        bits = u16le(bytes, pos + 22)
      } else if (tag(pos, "data")) {
        dataSize = math.min(size, (bytes.length - pos - 8).toLong)
      }
      // a declared size past the payload is corruption; stop the walk with
      // whatever was parsed (a truncated final data chunk is still usable)
      if (size > bytes.length - pos - 8) ok = false
      else pos += 8 + size.toInt + (size.toInt & 1) // chunks 2-byte aligned
    }
    if (rate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some(ContainerMeta("wav", 0, 0, (dataSize / blockAlign).toInt,
      rate, channels, bits))
  }

  /** PNG: 8-byte signature, then the IHDR chunk (length 13, big-endian
    * width/height at offsets 16/20, bit depth at 24). The IHDR CRC32 (over
    * chunk type + data, as the spec defines) is VERIFIED — a flipped header
    * byte falls back to the stub path rather than yielding garbage dims. */
  def parsePng(bytes: Array[Byte]): Option[ContainerMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (bytes.length < 33 || !sig.indices.forall(i => bytes(i) == sig(i))) return None
    def u32be(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    if (u32be(8) != 13L || bytes(12) != 'I' || bytes(13) != 'H' ||
        bytes(14) != 'D' || bytes(15) != 'R') return None
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 4 + 13) // chunk type + data
    if (crc.getValue != u32be(29)) return None
    val w = u32be(16)
    val h = u32be(20)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) None
    else Some(ContainerMeta("png", w.toInt, h.toInt, 1, 0, 0, bytes(24) & 0xFF))
  }

  /** JPEG/JFIF: marker walk to the first SOF segment (0xC0–0xCF minus
    * DHT/JPG/DAC), which carries sample precision, height, width. Stops at
    * SOS — entropy-coded data follows and dimensions must precede it. This
    * is the decoder an MJPEG frame payload needs for its dimensions. */
  def parseJpeg(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 4 ||
        (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      // the spec allows any number of 0xFF fill bytes before a marker code
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 4 > bytes.length) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
        pos += 2 // standalone markers carry no length
      } else {
        val len = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (len < 7) return None
          val h = ((bytes(pos + 5) & 0xFF) << 8) | (bytes(pos + 6) & 0xFF)
          val w = ((bytes(pos + 7) & 0xFF) << 8) | (bytes(pos + 8) & 0xFF)
          return if (w > 0 && h > 0 && w <= MaxDim && h <= MaxDim)
            Some(ContainerMeta("jpeg", w, h, 1, 0, 0, bytes(pos + 4) & 0xFF))
          else None
        }
        if (marker == 0xDA) return None // SOS before any SOF: corrupt
        pos += 2 + len
      }
    }
    None
  }

  /** AVI: RIFF container with form type "AVI " — WAV's sibling layout.
    * The main header (`avih` inside `LIST hdrl`) carries total frame
    * count at data offset 16 and frame width/height at 32/36; streams,
    * codec ids, and the movi payload are separate chunks. Pure header
    * walk, no codec: enough for metadata and (via [[aviFrameBounds]])
    * frame-boundary work like key-frame selection. */
  def parseAvi(bytes: Array[Byte]): Option[ContainerMeta] = {
    def tag(o: Int, s: String) = bytes.length >= o + 4 &&
      bytes(o) == s(0) && bytes(o + 1) == s(1) &&
      bytes(o + 2) == s(2) && bytes(o + 3) == s(3)
    if (bytes.length < 24 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var pos = 12
    while (pos + 12 <= bytes.length) {
      val size = u32le(bytes, pos + 4)
      if (size > bytes.length - pos - 8) return None // truncated walk
      if (tag(pos, "LIST") && tag(pos + 8, "hdrl")) {
        // inside hdrl: the first sub-chunk must be avih (56-byte header)
        var p = pos + 12
        val end = pos + 8 + size.toInt
        while (p + 8 <= end) {
          val csz = u32le(bytes, p + 4)
          if (csz > end - p - 8) return None
          if (tag(p, "avih") && csz >= 40 && p + 8 + 40 <= bytes.length) {
            val frames = i32le(bytes, p + 8 + 16)
            val w = i32le(bytes, p + 8 + 32)
            val h = i32le(bytes, p + 8 + 36)
            return if (w > 0 && h > 0 && w <= MaxDim && h <= MaxDim && frames >= 0)
              Some(ContainerMeta("avi", w, h, frames, 0, 0, 0))
            else None
          }
          p += 8 + csz.toInt + (csz.toInt & 1)
        }
        return None
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Frame payload bounds (offset, length) from an AVI's `LIST movi`
    * chunks — ids `##dc`/`##db` (compressed/uncompressed video data for
    * stream ##). None for non-AVI or AVIs whose movi walk is corrupt, so
    * callers degrade to fixed-size chunking exactly like the metadata
    * path degrades to [[StubCodecs]]. */
  def aviFrameBounds(bytes: Array[Byte]): Option[Array[(Int, Int)]] = {
    def tag(o: Int, s: String) = bytes.length >= o + 4 &&
      bytes(o) == s(0) && bytes(o + 1) == s(1) &&
      bytes(o + 2) == s(2) && bytes(o + 3) == s(3)
    if (parseAvi(bytes).isEmpty) return None
    var pos = 12
    while (pos + 12 <= bytes.length) {
      val size = u32le(bytes, pos + 4)
      if (size > bytes.length - pos - 8) return None
      if (tag(pos, "LIST") && tag(pos + 8, "movi")) {
        val out = Array.newBuilder[(Int, Int)]
        var p = pos + 12
        val end = pos + 8 + size.toInt
        while (p + 8 <= end) {
          val csz = u32le(bytes, p + 4)
          if (csz > end - p - 8) return None
          val isDigit = (i: Int) => bytes(p + i) >= '0' && bytes(p + i) <= '9'
          val videoData = isDigit(0) && isDigit(1) && bytes(p + 2) == 'd' &&
            (bytes(p + 3) == 'c' || bytes(p + 3) == 'b')
          if (videoData) out += ((p + 8, csz.toInt))
          p += 8 + csz.toInt + (csz.toInt & 1)
        }
        val bounds = out.result()
        return if (bounds.nonEmpty) Some(bounds) else None
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Sniff + parse any recognized container. */
  def parse(bytes: Array[Byte]): Option[ContainerMeta] =
    parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseBmp(bytes))
      .orElse(parseWav(bytes)).orElse(parseAvi(bytes)).orElse(parsePpm(bytes))

  /** The decode seam used by the operators: real header parse first,
    * [[StubCodecs]] fallback for raw/unrecognized payloads. */
  def decodeHeader(kind: String, bytes: Array[Byte]): (Int, Int, Int) =
    parse(bytes) match {
      case Some(m) => (m.width, m.height, m.nFrames)
      case None    => StubCodecs.decodeHeader(kind, bytes)
    }

  /** WAV payloads contribute only their PCM data chunk to sample math;
    * raw payloads pass through whole. */
  def pcmData(bytes: Array[Byte]): Array[Byte] = {
    def tag(o: Int, s: String) = bytes.length >= o + 4 &&
      bytes(o) == s(0) && bytes(o + 1) == s(1) &&
      bytes(o + 2) == s(2) && bytes(o + 3) == s(3)
    if (parseWav(bytes).isEmpty) return bytes
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = u32le(bytes, pos + 4)
      if (tag(pos, "data")) {
        val n = math.min(size, (bytes.length - pos - 8).toLong).toInt
        return java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + n)
      }
      if (size > bytes.length - pos - 8) return bytes
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    bytes
  }

  /** Pixel raster of a binary PPM (P6): the bytes after the header — by
    * spec exactly ONE whitespace byte follows maxval, then w·h·3 RGB
    * bytes. Truncated payloads yield the available prefix (degraded, not
    * thrown). */
  def ppmRaster(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (parsePpm(bytes).isEmpty || bytes(1) != '6') return None
    // re-walk the header exactly as parsePpm does to find the pixel offset
    var pos = 2
    var ints = 0
    while (ints < 3 && pos < bytes.length) {
      while (pos < bytes.length &&
          (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      while (pos < bytes.length && Character.isDigit(bytes(pos))) pos += 1
      ints += 1
    }
    if (pos >= bytes.length) None
    else Some(java.util.Arrays.copyOfRange(bytes, pos + 1, bytes.length))
  }

  /** Pixel raster of a 24-bit BMP in top-down row order with the 4-byte
    * row padding stripped: real pixel statistics need the w·3 payload of
    * each row, not the alignment bytes, and BMP stores rows bottom-up. */
  def bmpRaster(bytes: Array[Byte]): Option[Array[Byte]] = {
    val meta = parseBmp(bytes).getOrElse(return None)
    if (meta.bitsPerSample != 24) return None
    val offset = i32le(bytes, 10)
    val w = meta.width
    val h = meta.height
    val stride = (w * 3 + 3) & ~3
    if (offset < 54 || offset.toLong + stride.toLong * h > bytes.length) return None
    val topDown = i32le(bytes, 22) < 0
    val out = new Array[Byte](w * 3 * h)
    var row = 0
    while (row < h) {
      val src = offset + (if (topDown) row else h - 1 - row) * stride
      System.arraycopy(bytes, src, out, row * w * 3, w * 3)
      row += 1
    }
    Some(out)
  }

  /** RGB raster of a COMPRESSED image payload (JPEG/PNG) through the JDK
    * decoder — attempted only when the container sniffs as one of those
    * formats, so raw payloads never pay a decode attempt; synthetic-scan
    * fixtures (fake IDAT/entropy bytes) fail inside ImageIO and degrade
    * to None exactly like corrupt real-world objects. */
  def compressedRaster(bytes: Array[Byte]): Option[Array[Byte]] =
    if (parseJpeg(bytes).isDefined || parsePng(bytes).isDefined)
      PixelCodecs.rgbRaster(bytes).map(_._3)
    else None

  /** The DECODABLE payload region of a container: WAV → PCM data chunk,
    * P6 PPM → pixel raster, 24-bit BMP → padded-row-stripped raster,
    * JPEG/PNG → JDK-decoded RGB raster ([[compressedRaster]]);
    * undecodable payloads pass through whole (the stub stance — feature
    * math then sees container bytes, which is exactly what a pipeline
    * can honestly compute for an opaque object). */
  def payloadBytes(bytes: Array[Byte]): Array[Byte] =
    ppmRaster(bytes)
      .orElse(bmpRaster(bytes))
      .orElse(compressedRaster(bytes))
      .getOrElse(if (parseWav(bytes).isDefined) pcmData(bytes) else bytes)

  /** Normalized PCM samples in [-1, 1) honoring the WAV header's sample
    * width: 8-bit WAV PCM is UNSIGNED (offset-128 per the RIFF spec),
    * 16-bit is signed little-endian. Non-WAV payloads keep the historical
    * stub reading (signed bytes) so raw assets degrade deterministically. */
  def pcmSamples(bytes: Array[Byte]): Array[Double] =
    parseWav(bytes) match {
      case Some(m) if m.bitsPerSample == 16 =>
        val pcm = pcmData(bytes)
        val out = new Array[Double](pcm.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort / 32768.0
          i += 1
        }
        out
      case Some(_) =>
        pcmData(bytes).map(b => ((b & 0xFF) - 128) / 128.0)
      case None =>
        bytes.map(_.toDouble / 128.0)
    }

  // --- builders (fixture generation + specs): valid minimal containers ---

  /** Minimal 24-bit BMP with deterministic pixel bytes. */
  def makeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val rowBytes = (w * 3 + 3) & ~3
    val pixelBytes = rowBytes * h
    val out = new Array[Byte](54 + pixelBytes)
    def putU16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def putU32(o: Int, v: Long): Unit = { putU16(o, (v & 0xFFFF).toInt); putU16(o + 2, ((v >> 16) & 0xFFFF).toInt) }
    out(0) = 'B'; out(1) = 'M'
    putU32(2, out.length.toLong); putU32(10, 54L)
    putU32(14, 40L); putU32(18, w.toLong); putU32(22, h.toLong)
    putU16(26, 1); putU16(28, 24)
    putU32(34, pixelBytes.toLong)
    var i = 0
    while (i < pixelBytes) { out(54 + i) = mix64(seed * 31 + i).toByte; i += 1 }
    out
  }

  /** Minimal mono PCM WAV with deterministic samples (8- or 16-bit). */
  def makeWav(sampleRate: Int, nSamples: Int, seed: Long, bits: Int = 8): Array[Byte] = {
    import graft.functions.MinHash.mix64
    require(bits == 8 || bits == 16, s"PCM bits must be 8 or 16, got $bits")
    val bytesPerSample = bits / 8
    val dataBytes = nSamples * bytesPerSample
    val out = new Array[Byte](44 + dataBytes)
    def putU16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def putU32(o: Int, v: Long): Unit = { putU16(o, (v & 0xFFFF).toInt); putU16(o + 2, ((v >> 16) & 0xFFFF).toInt) }
    def putTag(o: Int, s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s(i).toByte; i += 1 } }
    putTag(0, "RIFF"); putU32(4, (36 + dataBytes).toLong); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16L); putU16(20, 1); putU16(22, 1)
    putU32(24, sampleRate.toLong); putU32(28, sampleRate.toLong * bytesPerSample)
    putU16(32, bytesPerSample); putU16(34, bits)
    putTag(36, "data"); putU32(40, dataBytes.toLong)
    var i = 0
    while (i < dataBytes) { out(44 + i) = mix64(seed * 37 + i).toByte; i += 1 }
    out
  }

  /** Minimal binary PPM (P6) with deterministic pixel bytes. */
  def makePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val header = s"P6\n# graft fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) { out(header.length + i) = mix64(seed * 41 + i).toByte; i += 1 }
    out
  }

  /** REAL baseline JPEG built with the JDK encoder: deterministic RGB
    * pixels (mix64 of the seed and position) drawn into a BufferedImage
    * and encoded through `javax.imageio` — decodable by ANY JPEG decoder,
    * so pixel-level operators ([[Multimodal.channelStats]],
    * [[Multimodal.resizeImages]], feature histograms) work on actual
    * image content. [[makeJpeg]] (synthetic scan bytes) remains the
    * header-walk fixture; this is the pixel-path fixture.
    *
    * DETERMINISM BOUNDARY: the PIXELS are deterministic, but the encoded
    * BYTES depend on the JVM's JPEG writer (quantization/Huffman tables
    * are implementation details that have changed across JDK builds) —
    * unlike every mix64-byte fixture, this one is byte-stable only
    * within one JDK. Queries over it are rows-only for the driver, and
    * the determinism suite asserts within-JVM stability; cross-machine
    * byte comparisons of multimodal_* outputs are out of contract. */
  def makeRealJpeg(w: Int, h: Int, seed: Long): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = mix64(seed * 61 + y.toLong * w + x)
        img.setRGB(x, y, (m & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // the JDK always ships a JPEG writer; a missing writer here is a
    // broken JVM, not a data condition — let it throw in the fixture
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal baseline JPEG: SOI, JFIF APP0, SOF0 carrying the dimensions
    * (3 components, 8-bit), deterministic opaque bytes standing in for the
    * entropy-coded scan, EOI. Header-only parsing never inflates the scan
    * — the same stance as [[makePng]]'s fake IDAT. */
  def makeJpeg(w: Int, h: Int, seed: Long, scanBytes: Int = 12): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val app0 = Array[Int](0xFF, 0xE0, 0, 16, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Int](0xFF, 0xC0, 0, 17, 8,
      (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val out = new Array[Byte](2 + app0.length + sof0.length + scanBytes + 2)
    var pos = 0
    out(pos) = 0xFF.toByte; out(pos + 1) = 0xD8.toByte; pos += 2
    app0.foreach { v => out(pos) = v.toByte; pos += 1 }
    sof0.foreach { v => out(pos) = v.toByte; pos += 1 }
    var i = 0
    while (i < scanBytes) { out(pos + i) = mix64(seed * 53 + i).toByte; i += 1 }
    pos += scanBytes
    out(pos) = 0xFF.toByte; out(pos + 1) = 0xD9.toByte
    out
  }

  /** Minimal MJPEG-flavored AVI: RIFF(AVI ) with LIST hdrl (avih + one
    * vids/MJPG stream) and LIST movi holding `nFrames` 00dc chunks of
    * `frameBytes` deterministic payload each — or, with
    * `jpegFrames = true`, real [[makeRealJpeg]] frames at the container's
    * dimensions (the genuine MJPEG layout: each frame an independent,
    * FULLY DECODABLE baseline JPEG — [[parseJpeg]] reads its dims and
    * [[PixelCodecs]] its pixels; same single-JDK byte-determinism
    * boundary as [[makeRealJpeg]]). */
  def makeAvi(w: Int, h: Int, nFrames: Int, seed: Long,
      frameBytes: Int = 24, jpegFrames: Boolean = false): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val frames =
      if (jpegFrames) Array.tabulate(nFrames)(f => makeRealJpeg(w, h, seed * 59 + f))
      else Array.tabulate(nFrames)(f =>
        Array.tabulate(frameBytes)(i => mix64(seed * 47 + f * 131L + i).toByte))
    makeAviFromFrames(w, h, frames)
  }

  /** AVI assembly from explicit frame payloads (variable sizes allowed). */
  def makeAviFromFrames(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val nFrames = frames.length
    val strlSize = 4 + (8 + 56) + (8 + 40)          // "strl" + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)    // "hdrl" + avih + LIST strl
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val maxFrame = if (nFrames == 0) 0 else frames.map(_.length).max
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](total)
    var pos = 0
    def putTag(s: String): Unit = { var i = 0; while (i < 4) { out(pos + i) = s(i).toByte; i += 1 }; pos += 4 }
    def putU32(v: Long): Unit = {
      out(pos) = v.toByte; out(pos + 1) = (v >> 8).toByte
      out(pos + 2) = (v >> 16).toByte; out(pos + 3) = (v >> 24).toByte; pos += 4
    }
    putTag("RIFF"); putU32(total - 8L); putTag("AVI ")
    putTag("LIST"); putU32(hdrlSize.toLong); putTag("hdrl")
    putTag("avih"); putU32(56L)
    val avih = pos
    putU32(40000L)            // usec/frame (25 fps)
    putU32(0L); putU32(0L); putU32(0L)
    putU32(nFrames.toLong)    // dwTotalFrames @ avih+16
    putU32(0L); putU32(1L)    // initial frames, stream count
    putU32(maxFrame.toLong)   // suggested buffer
    putU32(w.toLong); putU32(h.toLong) // @ avih+32 / +36
    pos = avih + 56
    putTag("LIST"); putU32(strlSize.toLong); putTag("strl")
    putTag("strh"); putU32(56L)
    val strh = pos
    putTag("vids"); putTag("MJPG")
    putU32(0L); putU32(0L); putU32(0L)
    putU32(1L); putU32(25L)   // scale / rate = 25 fps
    putU32(0L); putU32(nFrames.toLong) // start, length
    pos = strh + 56
    putTag("strf"); putU32(40L)
    val strf = pos
    putU32(40L); putU32(w.toLong); putU32(h.toLong)
    out(pos) = 1; out(pos + 2) = 24 // planes 1, bpp 24
    pos += 4
    putTag("MJPG")            // biCompression
    pos = strf + 40
    putTag("LIST"); putU32(moviSize.toLong); putTag("movi")
    frames.foreach { f =>
      putTag("00dc"); putU32(f.length.toLong)
      System.arraycopy(f, 0, out, pos, f.length)
      pos += f.length + (f.length & 1)
    }
    out
  }

  /** Minimal PNG: signature + a CRC-correct IHDR (8-bit RGB) + deterministic
    * opaque payload bytes standing in for the IDAT stream (header-only
    * parsing never inflates them). */
  def makePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    import graft.functions.MinHash.mix64
    val out = new Array[Byte](33 + 16)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    System.arraycopy(sig, 0, out, 0, 8)
    def putU32be(o: Int, v: Long): Unit = {
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
    }
    putU32be(8, 13L)
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    putU32be(16, w.toLong); putU32be(20, h.toLong)
    out(24) = 8; out(25) = 2 // bit depth 8, color type 2 (truecolor)
    val crc = new java.util.zip.CRC32
    crc.update(out, 12, 17)
    putU32be(29, crc.getValue)
    var i = 0
    while (i < 16) { out(33 + i) = mix64(seed * 43 + i).toByte; i += 1 }
    out
  }
}
