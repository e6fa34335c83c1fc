package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media object: binary payload + typed metadata. */
final case class MediaRecord(id: Long, mime: String, content: Array[Byte])

/** Decoded features for one media object. */
final case class MediaFeature(
    id: Long, mime: String, nBytes: Int, fingerprint: Long, feature: Array[Float])

/** One sampled "frame" (fixed-size byte window) of a media object. */
final case class MediaFrame(id: Long, frameIdx: Int, nBytes: Int, fingerprint: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame grab) are
  * NOT available in this environment, so [[fakeDecode]] is a STUB — a
  * deterministic rolling-hash "decoder" standing in for the real library
  * call. Everything around it is the real production shape and is pinned
  * by MultimodalSpec:
  *   - schema: (id, mime, content binary) in / typed case-class out, so
  *     Parquet round-trips and Catalyst prunes metadata without touching
  *     payloads;
  *   - execution: `mapPartitions` — one JVM-side batch per partition,
  *     exactly where a real decoder would amortize its init cost
  *     (per-partition codec handle, like a Pandas-UDF batch);
  *   - partitioning: results are row-local, so repartitioning never
  *     changes them (asserted), and payload bytes never shuffle.
  */
object MultimodalOps {

  /** STUB decoder ("???" placeholder for the real codec): deterministic
    * rolling hash over the payload, folded into a fixed-dim float vector.
    * Replace the body with the real image/audio feature extractor; the
    * signature and batch shape are what production code keeps.
    */
  def fakeDecode(content: Array[Byte], dim: Int): (Long, Array[Float]) = {
    val feature = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < content.length) {
      h = h * 31 + (content(i) & 0xff)
      feature(i % dim) += ((h >>> 33) % 1000).toInt / 1000.0f
      i += 1
    }
    (h, feature)
  }

  /** Wrap a DataFrame with a binary column into the typed media Dataset. */
  def toMedia(df: DataFrame, idCol: String, binCol: String, mime: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      lit(mime).as("mime"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
  }

  /** Per-partition batch feature extraction (decode → embed). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      // real codec init would happen once per partition, here:
      batch.map { m =>
        val (fp, feat) = fakeDecode(m.content, dim)
        MediaFeature(m.id, m.mime, m.content.length, fp, feat)
      }
    }
  }

  /** "Resize": average-pool a feature vector down to `targetDim` — the
    * codec-free analog of image resize/thumbnailing (a real pipeline calls
    * the imaging library inside the same mapPartitions batch; the pooling
    * arithmetic and the typed in/out shape are what it keeps). Pure
    * per-row arithmetic: no shuffle, partitioning-invariant like the rest
    * of the family.
    */
  def resizeFeatures(feats: Dataset[MediaFeature], targetDim: Int): Dataset[MediaFeature] = {
    require(targetDim > 0, "targetDim must be positive")
    val spark = feats.sparkSession
    import spark.implicits._
    feats.mapPartitions(_.map { f =>
      val src = f.feature
      // Pure pooling: an empty feature stays empty (never down-pool into a
      // fabricated length-1 zero vector — that would change shape).
      val out = new Array[Float](math.min(targetDim, src.length))
      if (src.nonEmpty) {
        var i = 0
        val counts = new Array[Int](out.length)
        while (i < src.length) {
          val j = (i.toLong * out.length / src.length).toInt
          out(j) += src(i); counts(j) += 1
          i += 1
        }
        var j = 0
        while (j < out.length) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      }
      f.copy(feature = out)
    })
  }

  /** Frame sampling: split the payload into fixed-size windows ("frames")
    * and keep every `stride`-th one, at most `maxFrames` — the video
    * analog of `explode`, but bounded so a pathological 10 GB payload
    * cannot fan out unboundedly.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   stride: Int = 1, maxFrames: Int = 16): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nWindows = (m.content.length + frameBytes - 1) / frameBytes
      Iterator.range(0, nWindows, stride).take(maxFrames).map { w =>
        val from = w * frameBytes
        val until = math.min(from + frameBytes, m.content.length)
        var h = 1125899906842597L
        var i = from
        while (i < until) { h = h * 31 + (m.content(i) & 0xff); i += 1 }
        MediaFrame(m.id, w, until - from, h)
      }
    }
  }
}
