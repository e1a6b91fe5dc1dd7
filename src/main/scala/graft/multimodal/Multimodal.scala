package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is the real deliverable — schema, partitioning,
  * batch iteration (`mapPartitions`, the JVM twin of Python's
  * `mapInPandas`), and the decode seam. The decoders themselves are
  * STUBS (deterministic fakes) because no image/audio codec library ships
  * in this environment; swap [[StubCodecs]] for a real codec and nothing
  * else changes.
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
    * stand-in for a real object-store-backed table). Payload bytes derive
    * from xxhash-mixed asset ids; sizes vary per row. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import graft.functions.MinHash.mix64
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 64 + (math.abs(mix64(i.toLong)) % 192).toInt
      val bytes = Array.tabulate(len)(j => mix64(i.toLong * 1000003L + j).toByte)
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
        val codec = StubCodecs
        batch.map { case (id, kind, bytes) =>
          val (w, h, frames) = codec.decodeHeader(kind, bytes)
          DecodedMeta(id, kind, w, h, frames, bytes.length.toLong)
        }
      }
  }

  /** Fixed-width feature vector per asset (16-bin byte histogram, L1
    * normalized — a stand-in for an embedding model's output with the same
    * dataflow shape: binary in, small dense vector out). */
  def extractFeatures(assets: DataFrame, bins: Int = 16): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val hist = new Array[Double](bins)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) * bins / 256) += 1.0; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          AssetFeature(id, hist.map(_ / n))
        }
      }
  }

  case class ResizedAsset(asset_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Resize image assets to `targetW`×`targetH` (stub codec: nearest-
    * neighbor over the payload bytes treated as a w×h byte raster). The
    * plumbing — decode dims, per-partition batch transform, fixed-size
    * typed output — is the real deliverable; swap the sampler for a real
    * scaler and nothing else changes. */
  def resizeImages(assets: DataFrame, targetW: Int = 8, targetH: Int = 8): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "image")
      .select("asset_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        val codec = StubCodecs
        batch.map { case (id, kind, bytes) =>
          val (w, h, _) = codec.decodeHeader(kind, bytes)
          val out = new Array[Byte](targetW * targetH)
          var y = 0
          while (y < targetH) {
            var x = 0
            while (x < targetW) {
              val sx = x * w / targetW
              val sy = y * h / targetH
              val idx = sy * w + sx
              out(y * targetW + x) =
                if (bytes.nonEmpty) bytes(math.abs(idx) % bytes.length) else 0
              x += 1
            }
            y += 1
          }
          ResizedAsset(id, targetW, targetH, out)
        }
      }
  }

  case class AudioFrame(asset_id: Long, frame_idx: Int, rms: Double, peak: Double)

  /** Per-frame audio energy: treat the payload as signed 8-bit PCM (stub —
    * a real pipeline decodes via a codec first), frame it into `frameBytes`
    * windows, and emit RMS + peak per frame — the feature extraction that
    * feeds VAD/silence trimming in an audio training pipeline.
    *
    * Batching shape: rows are processed in groups of `rowBatch` via a
    * chunked iterator — the JVM analog of Arrow record-batch processing
    * (`mapInPandas` batch semantics): peak memory is bounded by the chunk,
    * not the partition, and a real vectorized DSP kernel would run once per
    * chunk. The grouping is lazy (Iterator.grouped), so the partition
    * never materializes. */
  def audioFrameEnergy(assets: DataFrame, frameBytes: Int = 32,
      rowBatch: Int = 64): Dataset[AudioFrame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "audio")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(rowBatch).flatMap { chunk =>
          // per-chunk "kernel" invocation over a bounded batch
          chunk.iterator.flatMap { case (id, bytes) =>
            bytes.grouped(frameBytes).zipWithIndex.map { case (frame, idx) =>
              var sumSq = 0.0
              var peak = 0.0
              var i = 0
              while (i < frame.length) {
                val s = frame(i).toDouble / 128.0 // signed PCM8 → [-1, 1)
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

  /** Key-frame selection for video assets: score each frame by mean
    * absolute byte difference against its predecessor (a scene-change
    * proxy; a real pipeline diffs decoded luma planes — same dataflow) and
    * keep the `topJ` highest-energy frames per asset. Selection happens
    * INSIDE the per-row map — frames of one asset never leave the task, so
    * there is no shuffle at all; output is topJ rows per video. */
  def keyFrames(assets: DataFrame, frameBytes: Int = 32, topJ: Int = 3): Dataset[KeyFrame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "video")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = bytes.grouped(frameBytes).toArray
        val scored = (1 until frames.length).map { i =>
          val prev = frames(i - 1)
          val cur = frames(i)
          val n = math.min(prev.length, cur.length)
          var s = 0.0
          var j = 0
          while (j < n) { s += math.abs((cur(j) & 0xFF) - (prev(j) & 0xFF)); j += 1 }
          KeyFrame(id, i, if (n == 0) 0.0 else s / n)
        }
        scored.sortBy(f => (-f.diff_energy, f.frame_idx)).take(topJ)
      }
  }

  /** Sample every `everyK`-th frame of video assets (stub: fixed-size byte
    * chunks as "frames"). One output row per sampled frame. */
  def sampleFrames(assets: DataFrame, everyK: Int = 2, frameBytes: Int = 32): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.where(col("kind") === "video")
      .select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = bytes.grouped(frameBytes).toSeq
        frames.indices.collect { case i if i % everyK == 0 => Frame(id, i, frames(i)) }
      }
  }
}

/** STUB codecs — deterministic fakes standing in for libjpeg/ffmpeg/etc.
  * (not available in this environment). Replace with real decoders; the
  * dataflow above is codec-agnostic. */
object StubCodecs {
  /** "Decode" a header: width/height/frame-count derived deterministically
    * from the first payload bytes. A real implementation parses the actual
    * container format. */
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
