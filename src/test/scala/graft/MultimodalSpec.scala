package graft

import graft.multimodal.{HeaderCodecs, Multimodal}

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

  test("audioFrameEnergy: bounded rms/peak per frame, audio assets only, batch-size invariant") {
    val frames = Multimodal.audioFrameEnergy(assets, frameBytes = 32).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.rms >= 0.0 && f.rms <= 1.0 && f.peak >= f.rms)
    }
    val audioIds = assets.where(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.asset_id).toSet == audioIds)
    // chunked iteration must not change results (rowBatch is a memory knob)
    val single = Multimodal.audioFrameEnergy(assets, frameBytes = 32, rowBatch = 1)
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
}
