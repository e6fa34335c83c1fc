package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal binary plumbing: typed schema, deterministic stub decode,
  * partitioning invariance, bounded frame fan-out.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = MultimodalOps.toMedia(
    Seq(
      (1L, "hello world"),
      (2L, "a longer payload with more bytes to window over"),
      (3L, "x")).toDF("id", "payload").withColumn("payload", col("payload").cast("binary")),
    "id", "payload", "application/octet-stream")

  test("extractFeatures: typed batch shape, fixed dim, deterministic") {
    val feats = MultimodalOps.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.feature.length == 8))
    assert(feats.map(_.nBytes).toSeq == Seq(11, 47, 1))
    val again = MultimodalOps.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(feats.map(_.fingerprint).toSeq == again.map(_.fingerprint).toSeq)
    assert(feats.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("results are partitioning-invariant (row-local decode, no payload shuffle)") {
    val one = MultimodalOps.extractFeatures(media.repartition(1), dim = 4)
      .collect().sortBy(_.id).map(f => (f.id, f.fingerprint, f.feature.toSeq)).toSeq
    val many = MultimodalOps.extractFeatures(media.repartition(7), dim = 4)
      .collect().sortBy(_.id).map(f => (f.id, f.fingerprint, f.feature.toSeq)).toSeq
    assert(one == many)
  }

  test("sampleFrames: windows payload, honors stride and maxFrames bound") {
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 10).collect()
      .groupBy(_.id).view.mapValues(_.sortBy(_.frameIdx)).toMap
    assert(frames(1L).map(_.nBytes).toSeq == Seq(10, 1)) // 11 bytes -> 10+1
    assert(frames(2L).length == 5) // 47 bytes -> 5 windows
    assert(frames(3L).map(_.nBytes).toSeq == Seq(1))
    val strided = MultimodalOps.sampleFrames(media, frameBytes = 10, stride = 2, maxFrames = 2)
      .collect().filter(_.id == 2L).map(_.frameIdx).sorted.toSeq
    assert(strided == Seq(0, 2)) // every 2nd window, capped at 2 frames
  }

  test("resizeFeatures average-pools to the target dim, invariant under partitioning") {
    val feats = MultimodalOps.extractFeatures(media, dim = 8)
    val small = MultimodalOps.resizeFeatures(feats, targetDim = 4).collect().sortBy(_.id)
    assert(small.forall(_.feature.length == 4))
    // pooling is mean-preserving per bucket: resize of a constant vector
    // is the same constant
    val const = MultimodalOps.extractFeatures(media, dim = 8).map(
      f => f.copy(feature = Array.fill(8)(2.5f)))(
      org.apache.spark.sql.Encoders.product[graft.operators.MediaFeature])
    val pooled = MultimodalOps.resizeFeatures(const, targetDim = 4).collect()
    assert(pooled.forall(_.feature.forall(v => math.abs(v - 2.5f) < 1e-6)))
    val repart = MultimodalOps.resizeFeatures(feats.repartition(7), targetDim = 4)
      .collect().sortBy(_.id).map(_.feature.toSeq).toSeq
    assert(repart == small.map(_.feature.toSeq).toSeq)
  }

  test("resizeFeatures leaves an empty feature vector empty (pure pooling, no shape change)") {
    val withEmpty = MultimodalOps.extractFeatures(media, dim = 8).map(
      f => if (f.id == 1L) f.copy(feature = Array.empty[Float]) else f)(
      org.apache.spark.sql.Encoders.product[graft.operators.MediaFeature])
    val out = MultimodalOps.resizeFeatures(withEmpty, targetDim = 4).collect().sortBy(_.id)
    assert(out.head.feature.isEmpty, "empty in, empty out")
    assert(out.tail.forall(_.feature.length == 4))
  }

  test("round-trips through parquet with payload intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(out)
    val back = MultimodalOps.toMedia(
      spark.read.parquet(out), "id", "content", "application/octet-stream")
    val a = MultimodalOps.extractFeatures(media, 4).collect().sortBy(_.id).map(_.fingerprint).toSeq
    val b = MultimodalOps.extractFeatures(back, 4).collect().sortBy(_.id).map(_.fingerprint).toSeq
    assert(a == b)
  }
}
