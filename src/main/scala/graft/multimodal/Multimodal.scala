package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a large-scale training-data pipeline.
  *
  * Design: image/audio/video payloads are opaque `BINARY` columns riding
  * next to typed metadata — the table schema below is the contract. All
  * per-asset compute (decode, feature-extract, resize, frame-sample) runs
  * as `mapPartitions` over the binary column: one task per partition, zero
  * shuffles, which is exactly how this scales to 100 TB of media (the
  * bytes never leave the executor that scanned them; only small features /
  * metadata flow onward).
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `StubDecoder` parses the deterministic fake header produced
  * by `synthesizeAssets` and emits byte-level features. The Spark-side
  * plumbing — schema, binary encoding, partition-wise batch loop, feature
  * schema — is real and is what the tests exercise; swapping `StubDecoder`
  * for javacv/ffmpeg is a one-object change.
  */
object Multimodal {

  /** The multimodal table contract: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),    // opaque payload
    StructField("meta", StructType(Seq(                      // typed metadata
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))), nullable = false)))

  /** Deterministic synthetic assets derived from the documents corpus (no
    * media files ship with the testdata): payload = 16-byte fake header
    * (magic, width, height, n_frames) + the document text bytes. Every
    * field is a pure function of (doc_id, text), so the corpus is stable
    * across runs and engines. */
  def synthesizeAssets(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text"), col("n_chars"))
      .withColumn("width",  (col("asset_id") % 64 + 16).cast("int"))
      .withColumn("height", (col("asset_id") % 48 + 16).cast("int"))
      .withColumn("n_frames", (col("asset_id") % 8 + 1).cast("int"))
      .withColumn("sample_rate", lit(16000))
      .withColumn("content", concat(
        // 16-byte header: 'GRFT' ++ 3 × int32 (big-endian via overflow-free
        // small domains)
        encode(lit("GRFT"), "UTF-8"),
        encode(lpad(col("width").cast("string"), 4, "0"), "UTF-8"),
        encode(lpad(col("height").cast("string"), 4, "0"), "UTF-8"),
        encode(lpad(col("n_frames").cast("string"), 4, "0"), "UTF-8"),
        encode(col("text"), "UTF-8")))
      .select(col("asset_id"), col("media_type"), col("content"),
        struct(col("width"), col("height"), col("n_frames"), col("sample_rate")).as("meta"))
  }

  /** Near-dup asset corpus for the perceptual-hash entries/tests: asset i
    * carries the payload of asset (i mod 350) — so above 350 every asset is
    * a copy — and copied assets with an even id get a 1-byte tail edit.
    * That manufactures the two populations a phash dedup exists to find:
    * exact re-uploads (Hamming 0 by construction) and lightly-edited
    * re-encodes (the edit REPLACES the last payload byte in place — the
    * length is unchanged, so segment boundaries don't shift and only the
    * final aHash segment's mean moves: the distance is small, the
    * re-encode analog). The pool broadcast is corpus
    * SYNTHESIS (testdata ships no real media), not part of the operator —
    * a real asset store reads the near-dup corpus directly. */
  def nearDupAssets(spark: SparkSession, sfDir: String): DataFrame = {
    val base = synthesizeAssets(spark, sfDir)
    // join key is asset_id % 350 ∈ [0, 350), so only the first 350 assets
    // can ever match: filter BEFORE broadcast — the pool stays 350 rows at
    // any corpus size instead of shipping every payload to every executor
    val pool = base.where(col("asset_id") < 350)
      .select(col("asset_id").as("src_id"), col("content").as("src_content"))
    base.select(col("asset_id"), col("media_type"), col("meta"),
        (col("asset_id") % 350).as("src_id"))
      .join(broadcast(pool), "src_id")
      .select(col("asset_id"), col("media_type"),
        when(col("asset_id") >= 350 && col("asset_id") % 2 === 0,
          concat(
            col("src_content").substr(lit(1), octet_length(col("src_content")) - 1),
            encode(lit("~"), "UTF-8")))
          .otherwise(col("src_content")).as("content"),
        col("meta"))
  }

  /** The stubbed codec: parses the fake header and derives features from
    * raw bytes. Swap this object for a real decoder (javacv, soundfile)
    * to process genuine media — the pipeline around it is unchanged. */
  object StubDecoder {
    final case class Decoded(
        width: Int, height: Int, nFrames: Int,
        byteHistogram: Array[Long], payloadBytes: Int)

    def decode(content: Array[Byte]): Decoded = {
      require(content.length >= 16, "truncated header")
      require(new String(content, 0, 4, "UTF-8") == "GRFT", "bad magic")
      def intAt(off: Int) = new String(content, off, 4, "UTF-8").toInt
      val hist = new Array[Long](8) // 8 coarse bins over byte values
      var i = 16
      while (i < content.length) {
        hist((content(i) & 0xFF) >> 5) += 1
        i += 1
      }
      Decoded(intAt(4), intAt(8), intAt(12), hist, content.length - 16)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("payload_bytes", IntegerType, nullable = false),
    StructField("byte_hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Decode + feature-extract, partition-wise (the mapInPandas analog):
    * each task iterates its partition's binary payloads once and emits the
    * small feature rows. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { rows =>
        rows.map { r =>
          val d = StubDecoder.decode(r.getAs[Array[Byte]]("content"))
          Row(r.getLong(0), r.getString(1), d.width, d.height, d.nFrames,
            d.payloadBytes, d.byteHistogram.toSeq)
        }
      }(enc)
  }

  /** Frame-sampling analog: chop the payload into fixed 64-byte frames and
    * keep every `stride`-th — emitted long-form (asset_id, frame_idx,
    * frame_bytes). At scale this is the shape that feeds a training
    * shard-writer. */
  def sampleFrames(assets: DataFrame, frameSize: Int = 64, stride: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "content").mapPartitions { rows =>
      rows.flatMap { r =>
        val content = r.getAs[Array[Byte]]("content")
        val payload = content.length - 16
        val nFrames = (payload + frameSize - 1) / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          val sz = math.min(frameSize, payload - f * frameSize)
          Row(r.getLong(0), f, sz)
        }
      }
    }(enc)
  }

  /** 64-bit perceptual hash (aHash shape) over the decoded payload: 64
    * equal segments, bit i set when segment-i's mean byte value exceeds
    * the whole payload's mean. Identical payloads hash identically; small
    * local edits flip few bits — which is the property Hamming-banded
    * near-dup search needs. A real image pHash (DCT of the decoded
    * bitmap) swaps in here with the pipeline unchanged. */
  def perceptualHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val payload = content.length - 16
        var total = 0L
        var i = 16
        while (i < content.length) { total += (content(i) & 0xFF); i += 1 }
        val mean = if (payload > 0) total.toDouble / payload else 0.0
        var h = 0L
        var seg = 0
        while (seg < 64) {
          val from = 16 + (seg.toLong * payload / 64).toInt
          val until = 16 + ((seg + 1).toLong * payload / 64).toInt
          var s = 0L
          var j = from
          while (j < until) { s += (content(j) & 0xFF); j += 1 }
          val n = until - from
          if (n > 0 && s.toDouble / n > mean) h |= (1L << seg)
          seg += 1
        }
        Row(r.getLong(0), h)
      }
    }(enc)
  }

  /** "Resize" analog on the stub: recompute target dims preserving aspect
    * ratio — pure metadata math, the real version would transcode bytes in
    * the same mapPartitions slot. */
  def resizeMeta(assets: DataFrame, maxDim: Int = 32): DataFrame =
    assets.select(col("asset_id"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("w"), col("h"))))
      .select(col("asset_id"),
        floor(col("w") * col("scale")).cast("int").as("new_w"),
        floor(col("h") * col("scale")).cast("int").as("new_h"))
}
