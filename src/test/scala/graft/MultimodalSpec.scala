package graft

import graft.multimodal.{HeaderCodecs, Multimodal, PixelCodecs}

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.syntheticAssets(spark, 30)

  test("decodeMeta returns TRUE container metadata for the generated files") {
    val metas = Multimodal.decodeMeta(assets).collect()
    assert(metas.length == 30)
    // image rows are valid BMP/PPM: parsed dims match the generator args
    metas.filter(_.kind == "image").foreach { m =>
      val i = m.asset_id.toInt
      val (ew, eh) =
        if (i % 8 == 0) (2 + i % 11, 2 + i % 7)
        else if (i % 8 == 2) (2 + i % 10, 2 + i % 6)
        else if (i % 4 == 0) (2 + i % 7, 2 + i % 5)
        else (2 + i % 9, 2 + i % 6)
      assert(m.width == ew && m.height == eh && m.n_frames == 1,
        s"asset $i parsed (${m.width},${m.height}) expected ($ew,$eh)")
    }
    // audio rows are valid WAVs: n_frames = the generated PCM sample count
    metas.filter(_.kind == "audio").foreach { m =>
      assert(m.n_frames == 32 + (m.asset_id.toInt % 160),
        s"asset ${m.asset_id} frames ${m.n_frames}")
    }
    assert(metas.map(_.asset_id).distinct.length == 30)
    // deterministic: same input → same decode
    assert(Multimodal.decodeMeta(assets).collect().sortBy(_.asset_id)
      .sameElements(metas.sortBy(_.asset_id)))
  }

  test("header parsers: exact metadata from valid BMP/PPM/WAV bytes") {
    val bmp = HeaderCodecs.parseBmp(HeaderCodecs.makeBmp(17, 9, 1L)).get
    assert(bmp.format == "bmp" && bmp.width == 17 && bmp.height == 9 &&
      bmp.bitsPerSample == 24)
    val ppm = HeaderCodecs.parsePpm(HeaderCodecs.makePpm(5, 3, 2L)).get
    assert(ppm.format == "ppm" && ppm.width == 5 && ppm.height == 3)
    val wav = HeaderCodecs.parseWav(HeaderCodecs.makeWav(11000, 77, 3L)).get
    assert(wav.format == "wav" && wav.sampleRate == 11000 &&
      wav.nFrames == 77 && wav.channels == 1 && wav.bitsPerSample == 8)
    // sniffing dispatches on magic, not argument order
    assert(HeaderCodecs.parse(HeaderCodecs.makeWav(8000, 10, 4L)).get.format == "wav")
    val png = HeaderCodecs.parsePng(HeaderCodecs.makePng(12, 7, 4L)).get
    assert(png.format == "png" && png.width == 12 && png.height == 7 &&
      png.bitsPerSample == 8)
    assert(HeaderCodecs.parse(HeaderCodecs.makePng(3, 3, 5L)).get.format == "png")
  }

  test("PNG IHDR CRC is verified: a flipped dimension byte is rejected") {
    val good = HeaderCodecs.makePng(12, 7, 8L)
    assert(HeaderCodecs.parsePng(good).isDefined)
    val flipped = good.clone()
    flipped(19) = (flipped(19) ^ 1).toByte // width LSB — CRC now wrong
    assert(HeaderCodecs.parsePng(flipped).isEmpty)
    val (w, h, _) = HeaderCodecs.decodeHeader("image", flipped) // stub fallback
    assert(w > 0 && h > 0)
  }

  test("malformed headers fall back to the stub decoder, never throw") {
    val truncatedBmp = HeaderCodecs.makeBmp(4, 4, 5L).take(20)
    assert(HeaderCodecs.parseBmp(truncatedBmp).isEmpty)
    val badMagic = HeaderCodecs.makeWav(8000, 10, 6L)
    badMagic(0) = 'X'
    assert(HeaderCodecs.parseWav(badMagic).isEmpty)
    // absurd declared dims are corruption, not data
    val hugeDims = HeaderCodecs.makeBmp(4, 4, 7L)
    hugeDims(20) = 0x7F; hugeDims(21) = 0x7F // width bytes 2-3 → > 2^20
    assert(HeaderCodecs.parseBmp(hugeDims).isEmpty)
    // the seam degrades to the deterministic stub for all of them
    Seq(truncatedBmp, badMagic, hugeDims).foreach { b =>
      val (w, h, _) = HeaderCodecs.decodeHeader("image", b)
      assert(w > 0 && h > 0)
    }
  }

  test("pcmData extracts exactly the WAV data chunk; raw passes through") {
    val wav = HeaderCodecs.makeWav(8000, 50, 8L)
    val pcm = HeaderCodecs.pcmData(wav)
    assert(pcm.length == 50 && pcm.sameElements(wav.drop(44)))
    val raw = Array[Byte](1, 2, 3)
    assert(HeaderCodecs.pcmData(raw).sameElements(raw))
  }

  test("extractFeatures yields fixed-width L1-normalized histograms") {
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.feature.length == 16)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9)
    }
  }

  test("features for PPM/BMP/WAV derive from the REAL payload bytes") {
    import spark.implicits._
    val ppm = HeaderCodecs.makePpm(6, 4, 9L)
    val bmp = HeaderCodecs.makeBmp(5, 3, 10L)
    val wav = HeaderCodecs.makeWav(8000, 40, 11L)
    val df = Seq((1L, "image", ppm), (2L, "image", bmp), (3L, "audio", wav))
      .toDF("asset_id", "kind", "content")
    val feats = Multimodal.extractFeatures(df).collect()
      .map(f => f.asset_id -> f.feature).toMap
    def hist(payload: Array[Byte]): Seq[Double] = {
      val h = new Array[Double](16)
      payload.foreach(b => h((b & 0xFF) / 16) += 1.0)
      h.map(_ / payload.length).toSeq
    }
    // golden by construction: the histogram of exactly the pixel raster /
    // PCM chunk, headers excluded
    val ppmPixels = ppm.drop(ppm.length - 6 * 4 * 3)
    assert(feats(1L).toSeq == hist(ppmPixels))
    // BMP 5px rows pad 15 → 16 bytes; raster strips padding: 45 bytes
    assert(HeaderCodecs.bmpRaster(bmp).get.length == 5 * 3 * 3)
    assert(feats(2L).toSeq == hist(HeaderCodecs.bmpRaster(bmp).get))
    assert(feats(3L).toSeq == hist(wav.drop(44)))
  }

  test("resizeImages resamples REAL PPM pixels to luma bytes") {
    import spark.implicits._
    // 2x2 RGB image with known colors, resized to 2x2 → identity sampling
    val px = Array[Byte](
      10, 20, 30,   60, 60, 60,
      0, 0, 0,      -1, -1, -1) // (255,255,255) as signed bytes
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val img = header ++ px
    val df = Seq((7L, "image", img)).toDF("asset_id", "kind", "content")
    val out = Multimodal.resizeImages(df, targetW = 2, targetH = 2).collect().head
    assert(out.pixels.toSeq == Seq[Byte](20, 60, 0, -1))
  }

  test("channelStats: exact per-channel moments, BMP BGR order honored") {
    import spark.implicits._
    // 2x1 PPM, pixels (10,20,30) and (30,40,50): r mean 20 std 10, etc.
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 30, 40, 50)
    // 1x1 BMP stores BGR: bytes (1,2,3) must report b=1, g=2, r=3
    val bmp = HeaderCodecs.makeBmp(1, 1, 0L)
    bmp(54) = 1; bmp(55) = 2; bmp(56) = 3
    val jpeg = HeaderCodecs.makeJpeg(4, 4, 1L) // compressed → no rows
    val df = Seq((1L, "image", ppm), (2L, "image", bmp), (3L, "image", jpeg))
      .toDF("asset_id", "kind", "content")
    val got = Multimodal.channelStats(df).collect()
      .map(s => (s.asset_id, s.channel) -> ((s.n_pixels, s.mean, s.std))).toMap
    assert(got((1L, "r")) == ((2L, 20.0, 10.0)))
    assert(got((1L, "g")) == ((2L, 30.0, 10.0)))
    assert(got((1L, "b")) == ((2L, 40.0, 10.0)))
    assert(got((2L, "b")) == ((1L, 1.0, 0.0)))
    assert(got((2L, "g")) == ((1L, 2.0, 0.0)))
    assert(got((2L, "r")) == ((1L, 3.0, 0.0)))
    assert(!got.keys.exists(_._1 == 3L), "compressed payloads emit no rows")
  }

  test("JPEG pixels decode for REAL via the JDK decoder across the pixel operators") {
    import spark.implicits._
    // uniform-color JPEG: lossy compression preserves a solid color to
    // within a couple of 8-bit levels — a pixel-level golden gate on the
    // actual decoded content, impossible with header-byte stubs
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    // the container walk and the pixel decode agree on dimensions
    assert(HeaderCodecs.parseJpeg(jpeg).exists(m => m.width == 8 && m.height == 6))
    val (w, h, raster) = PixelCodecs.rgbRaster(jpeg).get
    assert(w == 8 && h == 6 && raster.length == 8 * 6 * 3)
    val df = Seq((1L, "image", jpeg)).toDF("asset_id", "kind", "content")
    val stats = Multimodal.channelStats(df).collect().map(s => s.channel -> s).toMap
    assert(stats.keySet == Set("r", "g", "b"))
    assert(stats("r").n_pixels == 48L)
    assert(math.abs(stats("r").mean - 200.0) < 4.0, s"r mean ${stats("r").mean}")
    assert(math.abs(stats("g").mean - 100.0) < 4.0, s"g mean ${stats("g").mean}")
    assert(math.abs(stats("b").mean - 50.0) < 4.0, s"b mean ${stats("b").mean}")
    assert(stats("r").std < 4.0) // solid color → near-zero variance
    // resize derives from the same pixels: every luma byte ≈ (200+100+50)/3
    val rz = Multimodal.resizeImages(df, targetW = 4, targetH = 4).collect().head
    rz.pixels.foreach(p => assert(math.abs((p & 0xFF) - 116) <= 6,
      s"luma ${p & 0xFF} far from 116"))
    // features histogram the DECODED raster: a solid (200,100,50) image
    // concentrates all mass in the three bins those values land in
    val feats = Multimodal.extractFeatures(df).collect().head.feature
    assert(feats(200 / 16) + feats(100 / 16) + feats(50 / 16) > 0.99,
      s"histogram mass not on decoded pixel bins: ${feats.toSeq}")
  }

  test("undecodable compressed payloads keep the stub degradation seam") {
    // fixture PNG carries synthetic IDAT bytes: header parses, pixels can't
    val png = HeaderCodecs.makePng(5, 4, 21L)
    assert(HeaderCodecs.parsePng(png).isDefined)
    assert(HeaderCodecs.compressedRaster(png).isEmpty)
    // synthetic-scan JPEG: SOF walk yields dims, ImageIO rejects the scan
    val fake = HeaderCodecs.makeJpeg(6, 4, 22L)
    assert(HeaderCodecs.parseJpeg(fake).isDefined)
    assert(HeaderCodecs.compressedRaster(fake).isEmpty)
    // payloadBytes then passes the container through whole, as documented
    assert(HeaderCodecs.payloadBytes(fake).sameElements(fake))
    // raw bytes never even attempt a decode
    assert(HeaderCodecs.compressedRaster(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("makeRealJpeg: deterministic fixture, self-decodable at declared dims") {
    val a = HeaderCodecs.makeRealJpeg(9, 5, 33L)
    assert(a.sameElements(HeaderCodecs.makeRealJpeg(9, 5, 33L)))
    assert(HeaderCodecs.parseJpeg(a).exists(m => m.width == 9 && m.height == 5))
    val (w, h, raster) = PixelCodecs.rgbRaster(a).get
    assert(w == 9 && h == 5 && raster.length == 9 * 5 * 3)
  }

  test("pcmSamples honors the WAV sample width (8-bit unsigned, 16-bit signed)") {
    val w8 = HeaderCodecs.makeWav(8000, 4, 12L)
    val expected8 = w8.drop(44).map(b => ((b & 0xFF) - 128) / 128.0).toSeq
    assert(HeaderCodecs.pcmSamples(w8).toSeq == expected8)
    val w16 = HeaderCodecs.makeWav(8000, 4, 13L, bits = 16)
    assert(HeaderCodecs.parseWav(w16).get.bitsPerSample == 16)
    assert(HeaderCodecs.parseWav(w16).get.nFrames == 4)
    val pcm = w16.drop(44)
    val expected16 = (0 until 4)
      .map(i => ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort / 32768.0)
    assert(HeaderCodecs.pcmSamples(w16).toSeq == expected16)
    // raw payloads keep the deterministic signed-byte stub reading
    val raw = Array[Byte](-128, 0, 127)
    assert(HeaderCodecs.pcmSamples(raw).toSeq == Seq(-1.0, 0.0, 127.0 / 128.0))
  }

  test("audioFrameEnergy: bounded rms/peak per frame, audio assets only, batch-size invariant") {
    val frames = Multimodal.audioFrameEnergy(assets, frameSamples = 32).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.rms >= 0.0 && f.rms <= 1.0 && f.peak >= f.rms)
    }
    val audioIds = assets.where(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.asset_id).toSet == audioIds)
    // chunked iteration must not change results (rowBatch is a memory knob)
    val single = Multimodal.audioFrameEnergy(assets, frameSamples = 32, rowBatch = 1)
      .collect().sortBy(f => (f.asset_id, f.frame_idx))
    assert(single.sameElements(frames.sortBy(f => (f.asset_id, f.frame_idx))))
  }

  test("keyFrames: topJ per video by diff energy, no frame 0, deterministic") {
    val kf = Multimodal.keyFrames(assets, topJ = 2).collect()
    assert(kf.nonEmpty)
    // frame 0 has no predecessor → never selected
    assert(kf.forall(_.frame_idx >= 1))
    kf.groupBy(_.asset_id).foreach { case (_, rows) => assert(rows.length <= 2) }
    val videoIds = assets.where(org.apache.spark.sql.functions.col("kind") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kf.map(_.asset_id).toSet.subsetOf(videoIds))
    val again = Multimodal.keyFrames(assets, topJ = 2).collect()
    assert(again.sortBy(f => (f.asset_id, f.frame_idx))
      .sameElements(kf.sortBy(f => (f.asset_id, f.frame_idx))))
  }

  test("sampleFrames: only video assets, every 2nd frame") {
    val frames = Multimodal.sampleFrames(assets, everyK = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val videoIds = assets.where(org.apache.spark.sql.functions.col("kind") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
  }

  test("AVI: header parse returns the generated dims/frame count; movi walk finds every frame") {
    val avi = HeaderCodecs.makeAvi(w = 32, h = 24, nFrames = 7, seed = 5L, frameBytes = 24)
    val m = HeaderCodecs.parseAvi(avi).get
    assert(m.format == "avi" && m.width == 32 && m.height == 24 && m.nFrames == 7)
    assert(HeaderCodecs.parse(avi).get.format == "avi") // sniffed, not WAV
    val bounds = HeaderCodecs.aviFrameBounds(avi).get
    assert(bounds.length == 7)
    assert(bounds.forall(_._2 == 24))
    // bounds are disjoint, in order, inside the payload
    bounds.sliding(2).foreach { case Array((o1, n1), (o2, _)) => assert(o1 + n1 <= o2) }
    assert(bounds.last._1 + bounds.last._2 <= avi.length)
  }

  test("AVI: truncated or corrupt containers degrade (None → stub), never throw") {
    val avi = HeaderCodecs.makeAvi(16, 12, 5, 9L)
    assert(HeaderCodecs.parseAvi(avi.take(40)).isEmpty)       // cut inside hdrl
    assert(HeaderCodecs.aviFrameBounds(avi.take(40)).isEmpty)
    val badForm = avi.clone(); badForm(8) = 'X'               // not "AVI "
    assert(HeaderCodecs.parseAvi(badForm).isEmpty)
    val lyingSize = avi.clone()
    lyingSize(4) = -1; lyingSize(5) = -1                       // RIFF size past EOF
    assert(HeaderCodecs.parseAvi(java.util.Arrays.copyOf(lyingSize, 30)).isEmpty)
    // decodeHeader's seam: all of them land on the stub with sane values
    Seq(avi.take(40), badForm).foreach { b =>
      val (w, h, f) = HeaderCodecs.decodeHeader("video", b)
      assert(w > 0 && h > 0 && f > 0)
    }
    // and the real path reports the REAL frame count, not the stub's
    assert(HeaderCodecs.decodeHeader("video", avi)._3 == 5)
  }

  test("keyFrames diff REAL AVI frame boundaries; raw payloads use chunk fallback") {
    val avi = Multimodal.syntheticAssets(spark, 30)
      .where(org.apache.spark.sql.functions.col("kind") === "video")
    val kf = Multimodal.keyFrames(avi, topJ = 100).collect() // topJ > frames: keep all
    val metas = Multimodal.decodeMeta(avi).collect().map(m => m.asset_id -> m).toMap
    // for parsed AVIs the diffable frame count is exactly n_frames - 1
    kf.groupBy(_.asset_id).foreach { case (id, rows) =>
      val i = id.toInt
      if (i % 5 != 4) // AVI-backed videos (generator layout)
        assert(rows.length == metas(id).n_frames - 1,
          s"asset $id: ${rows.length} diffs for ${metas(id).n_frames} frames")
    }
    // sampled frame payloads from plain-payload AVI rows (odd ids in the
    // generator layout) are the 24-byte movi chunks
    val sampled = Multimodal.sampleFrames(avi, everyK = 1).collect()
    sampled.filter(f => f.asset_id % 5 != 4 && f.asset_id % 2 == 1).foreach { f =>
      assert(f.frame_bytes.length == 24)
    }
  }

  test("JPEG SOF parse: round-trip dims, marker-walk rejects corruption") {
    val j = HeaderCodecs.parseJpeg(HeaderCodecs.makeJpeg(123, 45, 7L)).get
    assert(j.format == "jpeg" && j.width == 123 && j.height == 45 &&
      j.bitsPerSample == 8)
    assert(HeaderCodecs.parse(HeaderCodecs.makeJpeg(6, 4, 8L)).get.format == "jpeg")
    val good = HeaderCodecs.makeJpeg(8, 8, 9L)
    assert(HeaderCodecs.parseJpeg(good.take(10)).isEmpty)   // cut before SOF
    val notJpeg = good.clone(); notJpeg(1) = 0x00
    assert(HeaderCodecs.parseJpeg(notJpeg).isEmpty)
    val lyingLen = good.clone()
    lyingLen(4) = 0x7F.toByte // APP0 length now points past EOF
    assert(HeaderCodecs.parseJpeg(lyingLen).isEmpty)
    // the spec allows 0xFF fill bytes before a marker — real encoders emit
    // them, the walk must skip them
    val withFill = HeaderCodecs.makeJpeg(31, 17, 10L)
    val padded = withFill.take(2) ++ Array.fill(3)(0xFF.toByte) ++ withFill.drop(2)
    assert(HeaderCodecs.parseJpeg(padded).exists(m => m.width == 31 && m.height == 17))
    val (w, h, _) = HeaderCodecs.decodeHeader("image", good.take(10))
    assert(w > 0 && h > 0) // stub fallback, never a throw
  }

  test("frameMeta parses per-frame JPEG headers inside MJPEG AVIs") {
    val vids = Multimodal.syntheticAssets(spark, 30)
      .where(org.apache.spark.sql.functions.col("kind") === "video")
    val fm = Multimodal.frameMeta(vids).collect()
    assert(fm.nonEmpty)
    // jpeg-framed AVIs (even non-raw ids): every frame decodes to the
    // container's dimensions through the nested JPEG SOF walk
    val jpegFramed = fm.filter(f => f.asset_id % 5 != 4 && f.asset_id % 2 == 0)
    assert(jpegFramed.nonEmpty)
    jpegFramed.foreach { f =>
      val i = f.asset_id.toInt
      assert(f.format == "jpeg" && f.width == 16 + i % 16 && f.height == 12 + i % 8,
        s"asset $i frame ${f.frame_idx}: ${f.format} ${f.width}x${f.height}")
    }
    // plain-payload AVIs: frames are opaque → "raw" with zero dims
    val plain = fm.filter(f => f.asset_id % 5 != 4 && f.asset_id % 2 == 1)
    assert(plain.nonEmpty && plain.forall(f => f.format == "raw" && f.width == 0))
  }

  test("rasterDigests: independent driver-side recompute matches the Spark path") {
    import org.apache.spark.sql.functions.col
    val fixture = Multimodal.syntheticAssets(spark, 200)
    // recompute every digest WITHOUT Spark: same decoders, driver-local
    // loop — a disagreement means the distributed path (partitioning,
    // batching, encoder round-trip) corrupted payloads
    val local = fixture.where(col("kind") === "image")
      .select("asset_id", "content").collect()
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        HeaderCodecs.ppmRaster(bytes)
          .orElse(HeaderCodecs.bmpRaster(bytes))
          .orElse(HeaderCodecs.compressedRaster(bytes))
          .map { px =>
            val c = new java.util.zip.CRC32(); c.update(px)
            (r.getLong(0), px.length.toLong, c.getValue)
          }
      }.sortBy(_._1).toSeq
    val dist = Multimodal.rasterDigests(fixture).collect()
      .map(d => (d.asset_id, d.n_bytes, d.crc)).sortBy(_._1).toSeq
    assert(dist == local)
    // and the aggregates equal the pinned gate constants — if THIS fails
    // after an intended decoder/fixture change, repin via DevRasterGolden
    val n = local.size.toLong
    val crcSum = local.map(_._3).sum
    val crcXor = local.map(_._3).foldLeft(0L)(_ ^ _)
    val bytes = local.map(_._2).sum
    assert((n, crcSum, crcXor, bytes) ==
      ((SparkEntry.MultimodalGolden.nDecoded, SparkEntry.MultimodalGolden.crcSum,
        SparkEntry.MultimodalGolden.crcXor, SparkEntry.MultimodalGolden.rasterBytes)))
  }

  test("rasterDigestGate passes on the pinned constants and THROWS on drift") {
    val fixture = Multimodal.syntheticAssets(spark, 200)
    val ok = Multimodal.rasterDigestGate(fixture,
      SparkEntry.MultimodalGolden.nDecoded, SparkEntry.MultimodalGolden.crcSum,
      SparkEntry.MultimodalGolden.crcXor, SparkEntry.MultimodalGolden.rasterBytes)
      .collect()
    assert(ok.length == 1 &&
      ok.head.getLong(0) == SparkEntry.MultimodalGolden.nDecoded)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.rasterDigestGate(fixture,
        SparkEntry.MultimodalGolden.nDecoded,
        SparkEntry.MultimodalGolden.crcSum + 1,
        SparkEntry.MultimodalGolden.crcXor, SparkEntry.MultimodalGolden.rasterBytes)
    }
    assert(ex.getMessage.contains("digest drift"))
  }
}
