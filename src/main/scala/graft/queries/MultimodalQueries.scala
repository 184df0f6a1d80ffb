package graft.queries

import graft.{CatalogEntry, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Category M — multimodal binary columns (SURVEY.md §2.1.I north-star
  * extension; see [[graft.multimodal.Multimodal]] for the design).
  *
  * The two oracle-checked entries exercise the binary column type end to
  * end in SQL terms (encode → BLOB → octet_length; metadata arithmetic);
  * the mapPartitions decode/frame paths are no-oracle (binary features are
  * not DuckDB-expressible) and are property-tested in MultimodalSpec.
  */
object MultimodalQueries {

  /** Binary payload stats per media type — the payload is synthesized
    * identically in both engines (UTF-8 bytes of the document text), so
    * BLOB lengths are comparable. */
  private val binaryStats = CatalogEntry.dialect(
    "mm_binary_stats",
    duckdb = """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
               |            WHEN doc_id % 3 = 1 THEN 'audio'
               |            ELSE 'video' END AS media_type,
               |       COUNT(*) AS n_assets,
               |       CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
               |       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
               |FROM documents
               |GROUP BY media_type ORDER BY media_type""".stripMargin,
    spark = """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              |            WHEN doc_id % 3 = 1 THEN 'audio'
              |            ELSE 'video' END AS media_type,
              |       COUNT(*) AS n_assets,
              |       SUM(CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT)) AS total_bytes,
              |       CAST(MAX(octet_length(encode(text, 'UTF-8'))) AS BIGINT) AS max_bytes
              |FROM documents
              |GROUP BY media_type ORDER BY media_type""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_type",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(octet_length(col("payload")).cast("long")).as("total_bytes"),
        max(octet_length(col("payload"))).cast("long").as("max_bytes"))
      .orderBy(col("media_type"))
  }

  /** Resize metadata math (aspect-preserving fit into 32px) — pure typed
    * arithmetic over the asset metadata, oracle-checked; the byte-level
    * transcode would ride the same mapPartitions slot as the decoder. */
  private val resizeMeta = CatalogEntry.ansi(
    "mm_resize_meta",
    """SELECT doc_id AS asset_id,
      |       CAST(floor((doc_id % 64 + 16) * least(CAST(1.0 AS DOUBLE),
      |            32 / CAST(greatest(doc_id % 64 + 16, doc_id % 48 + 16) AS DOUBLE))) AS INTEGER) AS new_w,
      |       CAST(floor((doc_id % 48 + 16) * least(CAST(1.0 AS DOUBLE),
      |            32 / CAST(greatest(doc_id % 64 + 16, doc_id % 48 + 16) AS DOUBLE))) AS INTEGER) AS new_h
      |FROM documents ORDER BY asset_id""".stripMargin) { (spark, sfDir) =>
    Multimodal.resizeMeta(Multimodal.synthesizeAssets(spark, sfDir), maxDim = 32)
      .orderBy(col("asset_id"))
  }

  /** mapPartitions decode + feature extraction over the binary payloads
    * (stubbed codec, real plumbing). Emits flattened features; the array
    * histogram is stringified for a flat, stable output. */
  private val decodeFeatures = CatalogEntry.noOracle("mm_decode_features") {
    (spark, sfDir) =>
      Multimodal.decodeFeatures(Multimodal.synthesizeAssets(spark, sfDir))
        .withColumn("byte_hist", array_join(col("byte_hist"), ","))
        .orderBy(col("asset_id"))
  }

  /** Frame sampling (every 2nd 64-byte frame) — the shard-feeder shape. */
  private val frameSample = CatalogEntry.noOracle("mm_frame_sample") { (spark, sfDir) =>
    Multimodal.sampleFrames(Multimodal.synthesizeAssets(spark, sfDir))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  /** Binary-asset exact dedup — content-hash the payload BLOB, group
    * identical assets, and report the copy-count distribution plus the
    * bytes a dedup pass would reclaim (the asset-store dedup every
    * multimodal corpus runs before feature extraction: the same image
    * arrives under many asset ids, and hashing is the only sane identity
    * for opaque bytes). Assets are manufactured with a shared content pool
    * (asset i carries the payload of document i mod 350, so 150 of 500
    * assets are copies). The whole operator is hash-keyed — linear scan,
    * one hash rollup, one distribution rollup; the oracle hashes the same
    * UTF-8 bytes via DuckDB's VARCHAR md5 (same digest, no BLOB overload
    * needed). */
  private val binaryDedup = CatalogEntry.dialect(
    "mm_binary_dedup",
    duckdb = """WITH a AS (
               |  SELECT d.doc_id AS asset_id, md5(s.text) AS h,
               |         CAST(octet_length(encode(s.text)) AS BIGINT) AS nb
               |  FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 350
               |), g AS (
               |  SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies,
               |         CAST(MIN(nb) AS BIGINT) AS bytes
               |  FROM a GROUP BY h
               |)
               |SELECT n_copies, CAST(COUNT(*) AS BIGINT) AS n_payloads,
               |       CAST(SUM(bytes * (n_copies - 1)) AS BIGINT) AS reclaimable_bytes
               |FROM g GROUP BY n_copies ORDER BY n_copies""".stripMargin,
    spark = """WITH a AS (
              |  SELECT d.doc_id AS asset_id, md5(encode(s.text, 'UTF-8')) AS h,
              |         CAST(octet_length(encode(s.text, 'UTF-8')) AS BIGINT) AS nb
              |  FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 350
              |), g AS (
              |  SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies,
              |         CAST(MIN(nb) AS BIGINT) AS bytes
              |  FROM a GROUP BY h
              |)
              |SELECT n_copies, CAST(COUNT(*) AS BIGINT) AS n_payloads,
              |       CAST(SUM(bytes * (n_copies - 1)) AS BIGINT) AS reclaimable_bytes
              |FROM g GROUP BY n_copies ORDER BY n_copies""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
    // join key is doc_id % 350, so only doc_ids < 350 can match: filter
    // before the broadcast so the pool is 350 payloads at any corpus size
    val pool = docs.where(col("doc_id") < 350)
      .select(col("doc_id").as("src_id"),
        encode(col("text"), "UTF-8").as("payload"))
    docs.select((col("doc_id") % 350).as("src_id"))
      .join(broadcast(pool), "src_id")
      .select(md5(col("payload")).as("h"),
        octet_length(col("payload")).cast("long").as("nb"))
      .groupBy(col("h"))
      .agg(count(lit(1)).cast("long").as("n_copies"), min(col("nb")).as("bytes"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).cast("long").as("n_payloads"),
        sum(col("bytes") * (col("n_copies") - 1)).cast("long").as("reclaimable_bytes"))
      .orderBy(col("n_copies"))
  }

  /** Perceptual-hash NEAR-dup discovery over the binary assets — the fuzzy
    * companion of `mm_binary_dedup`'s exact content hash (re-encoded or
    * lightly-edited media share a phash neighborhood, never an md5). Runs
    * over [[Multimodal.nearDupAssets]] — the manufactured corpus holding
    * exact re-uploads (Hamming 0) and tail-edited re-encodes (small
    * Hamming), so the histogram is non-trivially populated. The
    * pipeline is the full production shape: partition-parallel decode →
    * 64-bit aHash ([[Multimodal.perceptualHash]]) → Hamming-banded
    * candidate generation (8 × 8-bit bands; two hashes within distance 7
    * MUST agree on ≥1 band by pigeonhole — same trick as simhash banding,
    * and the band guarantee strictly covers the verify cut below) → exact
    * XOR+popcount verify ≤ 6, so EVERY qualifying pair is found: the
    * histogram is recall-complete, not a sample.
    *
    * Scale spelling (r17 100× fix — 443 s → see BASELINE.md): Hamming
    * distance depends ONLY on the two 64-bit values, and the output is a
    * pair-COUNT histogram, so the whole operator runs over DISTINCT phash
    * values carrying member counts — banding at the value level collapses
    * bucket occupancy from clone-clique depth (~700 deep at 100×: every
    * asset draws content from a 350-payload pool) to distinct-value
    * count, the same rewrite that fixed dedup_simhash in r16, and the
    * histogram weights are pure count algebra (n_a·n_b per cross-value
    * pair, C(n,2) at Hamming 0 per value), so no doc-level pair is ever
    * materialized: linear in assets + quadratic only in DISTINCT values
    * (~700, constant in corpus growth). Multi-band agreements dedup via
    * the first-agreeing-band filter (map-side bit math, no global
    * DISTINCT). Output is bit-identical to the doc-level spelling (A/B'd
    * at three SFs). No oracle by design — the decode is not
    * SQL-expressible; MultimodalSpec pins the copy-pair floor and hash
    * determinism. */
  private val phashDedup = CatalogEntry.noOracle("mm_phash_dedup") { (spark, sfDir) =>
    import org.apache.spark.sql.functions.{abs => _, _}
    val nBands = 8
    // cached: feeds both banded join sides AND the Hamming-0 rollup; the
    // harness sweep (Util.sweepEntryCaches) owns the unpersist
    val counts = DistinctValue.valueCounts(
        Multimodal.perceptualHash(Multimodal.nearDupAssets(spark, sfDir)), "phash", "n")
      .cache()
    val cross = DistinctValue.bandedValuePairs(counts, "phash", nBands,
        DistinctValue.bitBlock(8))
      .withColumn("hamming", bit_count(col("phash_a").bitwiseXOR(col("phash_b"))))
      .where(col("hamming") <= 6)
      .select(col("hamming"), (col("n_a") * col("n_b")).as("w"))
    // same-value members pair at Hamming 0: C(n, 2) per distinct value —
    // integer-safe div (double division loses exactness past n(n-1) > 2^53)
    val within = counts.where(col("n") >= 2)
      .select(lit(0).as("hamming"),
        shiftright(col("n") * (col("n") - 1), 1).cast("long").as("w"))
    cross.unionByName(within)
      .groupBy(col("hamming"))
      .agg(sum(col("w")).cast("long").as("n_pairs"))
      .orderBy(col("hamming"))
  }

  def entries: Seq[CatalogEntry] = Seq(binaryStats, resizeMeta, decodeFeatures, frameSample,
    binaryDedup, phashDedup)
}
