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

  test("perceptual hash is deterministic and payload-identical ⇒ hash-identical") {
    val h1 = Multimodal.perceptualHash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.perceptualHash(assets.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2, "phash differs across runs/partitionings")
    // the hash ignores the 16-byte header: assets sharing payload bytes
    // (here: a manufactured copy with a different asset_id/header dims)
    // MUST collide at Hamming 0
    val copies = assets.limit(20)
      .select((col("asset_id") + 1000000L).as("asset_id"), col("media_type"),
        // rewrite the header (different fake dims), keep the payload
        concat(encode(lit("GRFT000100010001"), "UTF-8"),
          substring(col("content"), 17, Int.MaxValue)).as("content"),
        col("meta"))
    val hc = Multimodal.perceptualHash(copies).collect()
      .map(r => (r.getLong(0) - 1000000L) -> r.getLong(1)).toMap
    hc.foreach { case (id, h) =>
      assert(h == h1(id), s"asset $id: header-only change moved the phash")
    }
  }

  test("mm_phash_dedup finds the injected copy pairs (copy-pair floor)") {
    // the catalog entry runs over nearDupAssets; its recall contract
    // (8×8-bit bands cover Hamming ≤ 7 ⊇ verify ≤ 6) is pinned here
    // structurally: every pair of assets whose phash Hamming distance is
    // ≤ 6 (computed exactly, all-pairs at spec scale) must appear in the
    // entry's histogram totals — banding may not drop a single pair.
    val hashed = Multimodal.perceptualHash(Multimodal.nearDupAssets(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (ia, ha) <- hashed; (ib, hb) <- hashed if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield d).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Catalog.byKey("mm_phash_dedup").run(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exact,
      s"histogram mismatch: entry=$got exact=$exact")
  }
}
