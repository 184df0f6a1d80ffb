package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** The binary pipeline's plumbing invariants — what must hold regardless
  * of which codec sits behind StubDecoder. */
class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = Multimodal.synthesizeAssets(spark, sfDir).cache()

  test("synthesized assets carry the contracted schema") {
    // names + types are the contract; nullability flags vary with how the
    // frame was derived and are not load-bearing here
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.map(f => (f.name, f.dataType.simpleString))
    assert(shape(assets.schema) == shape(Multimodal.assetSchema))
    assert(assets.count() == Tables.documents(spark, sfDir).count())
  }

  test("decode recovers the header metadata exactly") {
    val feats = Multimodal.decodeFeatures(assets)
    val joined = feats.join(assets, "asset_id")
      .where(col("width") =!= col("meta.width")
        || col("height") =!= col("meta.height")
        || col("n_frames") =!= col("meta.n_frames"))
    assert(joined.count() == 0)
  }

  test("byte histogram mass equals payload length") {
    val bad = Multimodal.decodeFeatures(assets)
      .withColumn("hist_mass", aggregate(col("byte_hist"), lit(0L), (a, x) => a + x))
      .where(col("hist_mass") =!= col("payload_bytes"))
    assert(bad.count() == 0)
  }

  test("frame sampling covers ceil(payload/64) frames with stride 2") {
    val frames = Multimodal.sampleFrames(assets, frameSize = 64, stride = 2)
    val counts = frames.groupBy("asset_id").agg(count(lit(1)).as("n_sampled"))
    val expected = Multimodal.decodeFeatures(assets)
      .select(col("asset_id"),
        ceil((ceil(col("payload_bytes") / lit(64.0)) / 2.0)).cast("long").as("n_expected"))
    val bad = counts.join(expected, "asset_id")
      .where(col("n_sampled") =!= col("n_expected"))
    assert(bad.count() == 0)
    // every sampled frame is non-empty and at most frameSize
    assert(frames.where(col("frame_bytes") <= 0 || col("frame_bytes") > 64).count() == 0)
  }

  test("resize fits within the bound and preserves aspect ordering") {
    val r = Multimodal.resizeMeta(assets, maxDim = 32)
    assert(r.where(col("new_w") > 32 || col("new_h") > 32).count() == 0)
    assert(r.where(col("new_w") <= 0 || col("new_h") <= 0).count() == 0)
  }

  test("decode runs partition-wise (no shuffle in the physical plan)") {
    val plan = Multimodal.decodeFeatures(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
  }
}
