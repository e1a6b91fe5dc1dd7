package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.syntheticAssets(spark, 30)

  test("decodeMeta emits one typed row per asset with plausible dims") {
    val metas = Multimodal.decodeMeta(assets).collect()
    assert(metas.length == 30)
    metas.filter(_.kind == "image").foreach { m =>
      assert(m.width >= 16 && m.width < 80 && m.n_frames == 1)
    }
    assert(metas.map(_.asset_id).distinct.length == 30)
    // deterministic: same input → same decode
    assert(Multimodal.decodeMeta(assets).collect().sortBy(_.asset_id)
      .sameElements(metas.sortBy(_.asset_id)))
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
