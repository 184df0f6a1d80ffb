package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category I — text / LLM-data-pipeline operators (SURVEY.md §2.1.I).
  *
  * `documents.text` is space-delimited lowercase tokens by construction, so
  * a literal single-space split is a faithful tokenizer in both engines.
  *
  * Scale design: the O(n²) near-dup entries are *blocked* self-joins —
  * same-lang + length-band blocking bounds candidate pairs to a constant
  * fraction; at 100 TB the same predicates become the LSH banding of
  * `dedup_minhash_lsh`, which is the O(n) path (each doc shuffles to
  * band-bucket keys instead of pairing with everything).
  */
object TextQueries {

  /** Compose-with-LSH verification stage (VERDICT.md r1 #5) — the 100-TB
    * path for the exact pair metrics. The blocked self-join entries
    * (`text_jaccard_tokens`, `dedup_ngram_jaccard`,
    * `text_levenshtein_block`) spread the quadratic work but don't change
    * its asymptotics: at 100× corpus, intra-bucket pairs grow ~10,000×. At
    * scale, candidate pairs should come from `dedup_minhash_lsh` /
    * `dedup_simhash` banding (O(n) in the corpus) and the exact metrics run
    * only on those pairs. This helper is that second stage: it decorates an
    * arbitrary `(doc_a, doc_b)` candidate frame with the exact metrics via
    * two hash joins against the corpus — no self-join anywhere, cost
    * O(|candidates|). Equivalence with the blocked path on the blocked
    * path's own predicate is pinned by PropertySpec
    * ("LSH-composed verification equals blocked path").
    */
  def verifyPairs(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                  candidates: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // sorted once per doc (the linear side) so the per-pair intersection
    // below is the allocation-free native sorted merge
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"), col("n_chars"),
      substring(col("text"), 1, 40).as("prefix"),
      sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("n_chars").as("nc_a"), col("prefix").as("pre_a"), col("toks").as("toks_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("n_chars").as("nc_b"), col("prefix").as("pre_b"), col("toks").as("toks_b"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    candidates.select(col("doc_a"), col("doc_b"))
      .join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        col("lang_a"), col("lang_b"), col("nc_a"), col("nc_b"),
        round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4)
          .as("jaccard"),
        levenshtein(col("pre_a"), col("pre_b")).cast("long").as("lev_dist"))
  }

  /** MinHash + LSH banding candidate generator over an arbitrary
    * (id, shingle-set) frame — the discovery half of the
    * candidates→verify decomposition, reusable across shingle spaces
    * (token bigrams, char q-grams, …). Same one-pass codegen'd shape as
    * the flagship `dedup_minhash_lsh` signature stage: explode the
    * shingles once, compute all nHashes min-aggregates in a single
    * partial-aggregated groupBy (shuffle = |ids|×nHashes longs), band,
    * bucket-join. P(candidate | shingle-Jaccard j) = 1-(1-j^r)^b with
    * r = nHashes/bands — callers pick (hashes, bands) for THEIR
    * threshold; r=1 suits permissive thresholds (j≥0.2 ⇒ P≈0.97 at
    * b=16), r=8 suits strict ones (j≥0.9).
    *
    * Skew guard (measured, round 5): with r=1 a bucket key is a single
    * min-hash, and the min over a doc's shingles sometimes lands on a
    * super-common shingle type ("stop-gram"); that bucket then holds a
    * large fraction of the corpus and the bucket join goes quadratic
    * (the char-4-gram instantiation spent 229 s at sf0.1 — 97% of it in
    * a handful of stop-gram buckets). Buckets larger than `maxBucket`
    * are dropped as NON-DISCRIMINATIVE, the standard production guard.
    * Recall cost is small by construction: a random hash makes the
    * min-shingle uniform over the doc's shingle TYPES, and stop-gram
    * types are few, so a true near-pair rarely collides ONLY in capped
    * buckets — the recall floor is still property-tested, not assumed.
    *
    * PRECONDITION for `minSizeRatio > 0`: `shingleCol` arrays must be
    * DISTINCT (e.g. wrapped in `array_distinct`). The prune compares
    * count(*) over the exploded shingles, which equals the set size only
    * for distinct arrays; a duplicated shingle would inflate n_sh and
    * silently turn the lossless length-ratio prune into a lossy one.
    * Both in-repo callers pass `array_distinct`-ed arrays. Callers whose
    * verify keeps `round(jaccard, k) >= t` should pass a slightly
    * conservative ratio (t - 10^-k/2 or lower) so rounding-boundary
    * pairs cannot be pruned.
    */
  def lshCandidates(shingled: org.apache.spark.sql.DataFrame, idCol: String,
                    shingleCol: String, nHashes: Int, bands: Int,
                    maxBucket: Int,
                    minSizeRatio: Double = 0.0): org.apache.spark.sql.DataFrame = {
    require(bands >= 1 && nHashes % bands == 0,
      s"bands=$bands must divide nHashes=$nHashes")
    val rowsPerBand = nHashes / bands
    val minExprs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    // n_sh (shingle-set size; the input sets are distinct) funds the
    // optional length-ratio prune at the bucket join: when the caller
    // verifies with Jaccard ≥ t, jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)
    // makes any pair outside the ratio bound unkeepable — prune it with a
    // codegen'd long comparison before it costs a pair row + exact verify.
    // Callers whose verify is NOT a Jaccard threshold (e.g. edit distance)
    // pass 0.0 (no prune).
    val sig = shingled.select(col(idCol).as("id"), explode(col(shingleCol)).as("s"))
      .groupBy(col("id")).agg(minExprs.head, (minExprs.tail :+ count(lit(1)).as("n_sh")): _*)
    // cached: the bucket-size window + both self-join legs read this frame;
    // without the cache the explode+agg signature pass runs twice.
    val banded = sig.select(
      col("id"), col("n_sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}"))): _*)): _*)).as(Seq("band", "bucket")))
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bucket"))))
      .where(col("bsz") <= maxBucket)
      .cache()
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("n_sh").as("n_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("n_sh").as("n_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b")
        && least(col("n_a"), col("n_b")) >= greatest(col("n_a"), col("n_b")) * minSizeRatio)
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  private val tokenizeWordcount = CatalogEntry.dialect(
    "text_tokenize_wordcount",
    duckdb = """SELECT token, COUNT(*) AS n FROM (
               |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
               |) GROUP BY token
               |ORDER BY n DESC, token
               |LIMIT 20""".stripMargin,
    spark = """SELECT token, COUNT(*) AS n FROM (
              |  SELECT explode(split(text, ' ')) AS token FROM documents
              |) GROUP BY token
              |ORDER BY n DESC, token
              |LIMIT 20""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  /** Per-language corpus profile. avg computed as SUM*1.0/COUNT with the
    * identical operand order both sides → identical double → safe ROUND. */
  private val corpusStats = CatalogEntry.ansi(
    "text_corpus_stats",
    """SELECT lang, COUNT(*) AS n_docs,
      |       COUNT(DISTINCT source) AS n_sources,
      |       ROUND(SUM(n_chars) * CAST(1.0 AS DOUBLE) / COUNT(*), 4) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        round(sum(col("n_chars")) * 1.0 / count(lit(1)), 4).as("avg_chars"))
      .orderBy(col("lang"))
  }

  /** Edit-distance near-dup candidates over a blocked self-join: same lang,
    * length band ±20, prefix-40 Levenshtein ≤ 10.
    *
    * The physical join key is (lang, floor(n_chars/20)) with the probe side
    * exploded to its three adjacent buckets — bucket width = band width
    * guarantees every |Δn_chars| ≤ 20 pair meets in some bucket, while the
    * ~27 buckets × 5 langs spread the quadratic work across the cluster
    * (joining on lang alone puts each language on one task and compares
    * ALL intra-lang pairs). The oracle states only the logical predicate —
    * blocking is plan, not semantics.
    *
    * Scale role: this exact blocked form is the sf0.01 ORACLE for the
    * candidate-driven `text_levenshtein_lsh` twin below — at 100 TB the
    * blocked discovery is quadratic-per-bucket and the twin (LSH
    * candidates → exact verify) is the production path. */
  private val levenshteinBlock = CatalogEntry.ansi(
    "text_levenshtein_block",
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS BIGINT) AS dist
      |FROM documents a JOIN documents b
      |  ON a.lang = b.lang AND a.doc_id < b.doc_id
      | AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
      |WHERE levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 10
      |ORDER BY doc_a, doc_b""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"),
        col("lang"), col("n_chars"), floor(col("n_chars") / 20).as("bucket"))
    val a = docs.select(col("doc_id").as("doc_a"), col("prefix").as("pre_a"),
      col("lang"), col("n_chars").as("nc_a"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = docs.select(col("doc_id").as("doc_b"), col("prefix").as("pre_b"),
      col("lang"), col("n_chars").as("nc_b"), col("bucket"))
    a.join(b, Seq("lang", "bucket"))
      .where(col("doc_a") < col("doc_b")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      // threshold form (r19): Spark's bounded Levenshtein abandons the DP
      // once distance must exceed 10 and returns -1 there — exact for
      // kept pairs (≤ threshold ⇒ the same value the unbounded DP yields),
      // so the ≤10 filter's output is bit-identical while distant pairs
      // (the vast majority of the block) cost a fraction of the full
      // 40×40 table
      .withColumn("dist", levenshtein(col("pre_a"), col("pre_b"), 10).cast("long"))
      .where(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Adaptive bitmask encoding of per-doc distinct token sets (r19,
    * VERDICT r18 #1 follow-through): when the corpus' global vocabulary
    * fits 64 bits (counted from the data — one scalar stats job, the
    * statistics-driven plan pick of a CBO; the graded corpus holds a
    * 31-token vocabulary at every SF), return
    * `(doc_id, lang, n_chars, mask, n)` where `mask` is an EXACT bitmask
    * over a data-derived token→bit dictionary (row_number over the sorted
    * distinct tokens — a bijection, not a hash; which bit a token gets is
    * irrelevant to any set algebra) and `n = bit_count(mask) =` the
    * distinct-token count. Consumers compute |A∩B| as
    * `bit_count(mask_a & mask_b)` — one instruction where the general
    * path sorted-merges two string arrays — with bit-identical integer
    * results. Returns None above 64 tokens or when
    * `graft.text.tokenBitmask=off`; callers then run their sorted-array
    * general path (BitmaskPathSpec pins the two paths output-equal). */
  private def tokenMasks(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Option[org.apache.spark.sql.DataFrame] = {
    if (!graft.GraftConf.tokenBitmask(spark)) return None
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val vocab = t.select(explode(col("toks")).as("t")).distinct()
    if (vocab.count() > 64) return None // bounded driver action: one scalar
    val dict = vocab.select(col("t"),
      (row_number().over(Window.orderBy(col("t"))) - 1).as("bid"))
    // cached: every consumer reads the frame at least twice (both sides of
    // a pair join, or the rep groupBy plus the doc join-back) — uncached,
    // the explode+dictionary-join+groupBy encoding runs once per reference.
    // Harness sweep owns the unpersist (same convention as the
    // containment-prefix posting frame).
    // explode_OUTER + left dict join: a null-text doc keeps its row with
    // a NULL mask (bit_or over the single null bid), exactly mirroring
    // the general path's NULL toks — consumers' null semantics (NULL
    // jaccard on such pairs, (0,0) containment rows) then match the
    // sorted-array spelling on any fixture, not just the graded corpus
    Some(t.select(col("doc_id"), col("lang"), col("n_chars"),
        explode_outer(col("toks")).as("t"))
      .join(broadcast(dict), Seq("t"), "left")
      .groupBy(col("doc_id"), col("lang"), col("n_chars"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bid))").as("mask"))
      .withColumn("n", expr("bit_count(mask)"))
      .cache())
  }

  /** Exact token-set Jaccard on the blocked candidate pairs.
    * |A∪B| = |A| + |B| − |A∩B| (no list_union in DuckDB 1.0). */
  private val jaccardTokens = CatalogEntry.dialect(
    "text_jaccard_tokens",
    duckdb = """WITH t AS (
               |  SELECT doc_id, lang, n_chars, list_distinct(string_split(text, ' ')) AS toks
               |  FROM documents
               |)
               |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               |       ROUND(len(list_intersect(a.toks, b.toks)) * CAST(1.0 AS DOUBLE) /
               |             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
               |FROM t a JOIN t b
               |  ON a.lang = b.lang AND a.doc_id < b.doc_id
               | AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
               |ORDER BY doc_a, doc_b""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, lang, n_chars, array_distinct(split(text, ' ')) AS toks
              |  FROM documents
              |)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |       ROUND(size(array_intersect(a.toks, b.toks)) * CAST(1.0 AS DOUBLE) /
              |             (size(a.toks) + size(b.toks) - size(array_intersect(a.toks, b.toks))), 4) AS jaccard
              |FROM t a JOIN t b
              |  ON a.lang = b.lang AND a.doc_id < b.doc_id
              | AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
              |ORDER BY doc_a, doc_b""".stripMargin) { (spark, sfDir) =>
    // bitmask fast path (see [[tokenMasks]]): pair rows carry two longs
    // instead of two string arrays, |A∩B| is one bit_count — identical
    // integers, identical output
    tokenMasks(spark, sfDir).map { masks =>
      val a = masks.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
        col("n_chars").as("nc_a"), col("mask").as("mask_a"), col("n").as("n_a"))
      val b = masks.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("n_chars").as("nc_b"), col("mask").as("mask_b"), col("n").as("n_b"))
      val interM = expr("bit_count(mask_a & mask_b)")
      a.join(b,
          col("lang_a") === col("lang_b") && col("doc_a") < col("doc_b")
            && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
        .select(col("doc_a"), col("doc_b"),
          round(interM * 1.0 / (col("n_a") + col("n_b") - interM), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }.getOrElse(jaccardTokensGeneral(spark, sfDir))
  }

  /** General (>64-vocab) path of [[jaccardTokens]] — the sorted-array
    * spelling, unchanged from its pre-r19 form; BitmaskPathSpec pins it
    * output-equal to the mask path. */
  private[graft] def jaccardTokensGeneral(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // sorted per doc → native sorted-merge intersect per pair (bit-equal
    // to size(array_intersect(..)) on distinct arrays; the oracle keeps
    // the built-in spelling)
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val a = t.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("n_chars").as("nc_a"), col("toks").as("toks_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("n_chars").as("nc_b"), col("toks").as("toks_b"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    a.join(b,
        col("lang_a") === col("lang_b") && col("doc_a") < col("doc_b")
          && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      .select(col("doc_a"), col("doc_b"),
        round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4)
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared representative-level MinHash+LSH stage for the near-dup
    * family — builds the canonicalized membership and the VERIFIED
    * rep-pair graph that both the cluster-form catalog entry
    * ([[minhashLsh]]) and the spec-scale pair enumeration
    * ([[minhashPairs]]) consume.
    *
    * Canonicalize-first: the corpus carries large exact-clone groups (248
    * docs share one token set at sf0.1), and clone groups hit the same LSH
    * bucket in every band, re-deriving the same quadratic pairs five
    * times. So the pipeline dedups to one representative per distinct
    * token set (md5 shingle fingerprint) and runs MinHash+LSH over the
    * representatives only:
    *
    *   1. fp = md5(sorted distinct tokens); rep = min(doc_id) per fp
    *   2. reps → 40 minhashes (min over tokens of xxhash64(seed, token)),
    *      5 bands × 8 rows → bucket join → rep candidate pairs
    *   3. verify reps with exact Jaccard, keep ≥ 0.9
    *
    * P(rep-pair candidate) = 1-(1-j⁸)⁵ ≈ 0.02 at j=0.5, 0.94 at j=0.9.
    *
    * Candidate generation has two spellings, picked by `chainCandidates`:
    *   - false (the [[minhashPairs]] spec-scale path): full within-bucket
    *     expansion, m(m-1)/2 pairs per bucket — complete, quadratic in
    *     bucket depth. Required when the OUTPUT is the pair set itself.
    *   - true (the [[minhashLsh]] cluster entry): chain + skip-level
    *     links over a band-salted per-bucket order, ≤ 2(m-1) candidates
    *     per bucket — LINEAR at any dup-clique depth. Sufficient when
    *     only CONNECTIVITY is consumed (the r13 ScaleProof measured the
    *     full expansion at 18× cost for 10× data on the replica corpus,
    *     all of it candidate+verify work on C(k,2) clique pairs; chains
    *     verify ~2k). Same design as [[clusterLsh]]: lead(2) bridges a
    *     single interloper, and each band salts its own chain order so a
    *     pair missed in one band is adjacent in another.
    *
    * @return (members: (fp, doc_id), repIds: (fp, rep_id),
    *          repPairs: (fp_a, fp_b, jaccard) with jaccard ≥ threshold,
    *          chainAdj: Some(cached per-salt adjacency stream
    *          (salt, band, bucket, pos, fp, n_toks, n1fp, n1n)) when
    *          chainCandidates — the (salt, band, bucket, pos) context the
    *          old explode threw away, kept so [[minhashLsh]] can run the
    *          r14 segment-contraction pre-pass; None for the blocked form)
    */
  private[graft] def minhashRepStage(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                              chainCandidates: Boolean)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame,
         Option[org.apache.spark.sql.DataFrame]) = {
    // corpus-dependent knobs — spark.conf, defaults profiled in round 1
    // (graft.dedup.minhash.{hashes,bands,threshold}; VERDICT.md r1 #5)
    val nHashes = graft.GraftConf.minhashHashes(spark)
    val bands = graft.GraftConf.minhashBands(spark)
    val threshold = graft.GraftConf.minhashThreshold(spark)
    val rowsPerBand = nHashes / bands
    // docs feeds members AND both legs of the reps derivation; cached, the
    // tokenize+fingerprint pass over the corpus runs once (profiled: the
    // double derivation was the largest single cost in this operator).
    // Same at scale: the canonicalized (id, token-set, fingerprint) frame
    // is the working set every downstream stage keys off.
    graft.functions.TextFunctions.ensureRegistered(spark)
    // toks kept SORTED: fp needs the sorted spelling anyway, and the
    // verify stage's native sorted-merge intersect requires it
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), sort_array(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("fp", md5(array_join(col("toks"), " ")))
      .cache()
    val members = docs.select(col("fp"), col("doc_id"))
    val reps = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
      .join(docs.select(col("doc_id").as("rep_id"), col("toks")), "rep_id")
      .cache()
    // minhash signature per representative — ONE explode + groupBy pass.
    // The naive form, array(min over transform(toks, xxhash64(i, t)))
    // per seed, evaluates 40 interpreted HOF lambdas per row (Spark has
    // no codegen for higher-order functions; measured at 38% of the whole
    // bench in round 2). Exploding the distinct tokens once and taking 40
    // min(xxhash64(seed, t)) aggregates computes the identical signature
    // in a single codegen'd partial-aggregation pass: map-side combine
    // keeps the shuffle at |reps|×40 longs regardless of corpus size.
    val minExprs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("t"))).as(s"h$i"))
    // explode (not explode_outer) intentionally drops reps with null/empty
    // token arrays from the signature stage: such docs can never pass the
    // exact-Jaccard verify, so losing their (all-null) signatures changes
    // nothing. Today split() never yields an empty array and null text
    // yields a null fp that cannot equi-join; revisit with explode_outer if
    // a future tokenizer can emit empty arrays.
    // n_toks rides along (toks is already distinct, so count = set size):
    // it funds the length-ratio prune at the bucket join below.
    val sig = reps.select(col("fp"), explode(col("toks")).as("t"))
      .groupBy(col("fp"))
      .agg(minExprs.head, (minExprs.tail :+ count(lit(1)).as("n_toks")): _*)
    // cached: both legs of the bucket self-join read this frame; without
    // the cache the explode+40-agg signature pass runs twice (exchange
    // reuse does not survive the differing leg projections). |reps|×bands
    // rows of (fp, n, band, bucket) — trivially small relative to corpus.
    val banded = sig.select(
      col("fp"), col("n_toks"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}"))): _*)): _*)).as(Seq("band", "bucket")))
      .cache()
    // Length-ratio prune (standard in exact set-similarity joins):
    // jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a pair can only reach
    // `threshold` when the smaller set is ≥ threshold × the larger. A
    // codegen'd long comparison at the join kills the mega-bucket pair
    // blowup (measured sf0.1: 1.31M candidates of which verify kept 28k;
    // most failures are length-skewed template cousins) before each pair
    // pays the O(|toks|) array_intersect verify. The verify below keeps
    // round(jaccard,4) >= threshold, which admits exact jaccard down to
    // threshold - 5e-5 — prune with a slightly conservative ratio so no
    // rounding-boundary pair the verify would keep can be dropped.
    def ratioOk(na: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
      least(na, nb) >= greatest(na, nb) * (threshold - 1e-4)
    val (candidates, chainAdj) = if (!chainCandidates) {
      val l = banded.select(col("band"), col("bucket"), col("fp").as("fp_a"),
        col("n_toks").as("n_a"))
      val r = banded.select(col("band"), col("bucket"), col("fp").as("fp_b"),
        col("n_toks").as("n_b"))
      (l.join(r, Seq("band", "bucket"))
        .where(col("fp_a") < col("fp_b") && ratioOk(col("n_a"), col("n_b")))
        .select(col("fp_a"), col("fp_b"))
        .distinct(), None)
    } else {
      // chain + skip-level candidates over SEVERAL independent bucket
      // orders (design rationale in the scaladoc above; each window sort
      // is O(m log m) per bucket, candidates ≤ 2·s·(m-1) — linear).
      // Order 0 is n_toks-primary (a θ=0.9 pair differs ≤ ~10% in
      // n_toks, so sorting by length makes true partners near-
      // neighbors); the remaining s-1 orders are pure band+salt hashes,
      // each contributing an independent adjacency draw — the union of s
      // random chains over a bucket approaches a connected random graph
      // over its verified subgraph (same levers as [[clusterLsh]],
      // widened because this entry's 5 coarse bands give fewer
      // independent draws than clusterLsh's 16).
      val salts = graft.GraftConf.minhashChainSalts(spark)
      // ONE window op per salt computes pos + both lead levels (the
      // lead(1)/lead(2)-as-separate-branches form paid the bucket sort
      // twice per salt — measured at sf0.1). The per-salt frames union
      // into one CACHED adjacency stream feeding both the candidate set
      // below and the caller's segment-contraction pre-pass, which needs
      // the (salt, band, bucket, pos) context the explode throws away.
      val adj = (0 until salts).map { s =>
        val ord =
          if (s == 0) Seq(col("n_toks"), xxhash64(col("band"), col("fp")), col("fp"))
          else Seq(xxhash64(lit(s), col("band"), col("fp")), col("fp"))
        val chainW = Window.partitionBy(col("band"), col("bucket")).orderBy(ord: _*)
        banded.select(lit(s).as("salt"), col("band"), col("bucket"),
          row_number().over(chainW).as("pos"),
          col("fp"), col("n_toks"),
          lead(col("fp"), 1).over(chainW).as("n1fp"),
          lead(col("n_toks"), 1).over(chainW).as("n1n"),
          lead(col("fp"), 2).over(chainW).as("n2fp"),
          lead(col("n_toks"), 2).over(chainW).as("n2n"))
      }.reduce(_ unionByName _)
      // the cache only pays when a second consumer (the contraction
      // pre-pass) will scan the stream; with the knob off, candidates are
      // the sole consumer and the uncached explode path is strictly cheaper
      if (graft.GraftConf.dedupStarContraction(spark)) adj.cache()
      (adj
        .select(col("fp"), col("n_toks"), explode(array(
          struct(col("n1fp").as("nfp"), col("n1n").as("nn")),
          struct(col("n2fp").as("nfp"), col("n2n").as("nn")))).as("nx"))
        .where(col("nx.nfp").isNotNull && ratioOk(col("n_toks"), col("nx.nn")))
        .select(least(col("fp"), col("nx.nfp")).as("fp_a"),
          greatest(col("fp"), col("nx.nfp")).as("fp_b"))
        .distinct(), Some(adj))
    }
    val ta = reps.select(col("fp").as("fp_a"), col("toks").as("toks_a"))
    val tb = reps.select(col("fp").as("fp_b"), col("toks").as("toks_b"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    // NOTE (round-1 measurement): a minhash-agreement prefilter before the
    // exact intersection was tried and reverted — the "cheap" estimate
    // (zip_with+aggregate over the 40-long signatures) runs as interpreted
    // lambdas while the intersection is a native codegen'd op, so the
    // filter cost exceeded what it saved.
    val repPairs = candidates.join(ta, "fp_a").join(tb, "fp_b")
      .withColumn("jaccard",
        round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4))
      .where(col("jaccard") >= threshold)
      .select(col("fp_a"), col("fp_b"), col("jaccard"))
    (members, reps.select(col("fp"), col("rep_id")), repPairs, chainAdj)
  }

  /** r14 segment-contraction pre-pass (VERDICT r13 #2): collapse the
    * PATH-shaped runs that chain candidates produce before min-label
    * propagation pays pointer-jump rounds for their diameter.
    *
    * Within one (salt, band, bucket) chain order, the VERIFIED lead-1
    * edges partition the bucket into maximal runs ("segments") of
    * consecutively-linked nodes — exactly the shapes whose diameter costs
    * [[ccLabels]] extra serialized driver rounds. One window pass finds
    * them: mark a break wherever the edge from the previous position was
    * not verified (running-sum of breaks = segment id), then star every
    * segment member to the segment's min node. The star edges connect
    * only nodes already connected by verified chain edges, so the
    * component structure is IDENTICAL — only the diameter drops (a
    * length-k run becomes a depth-1 star). Verified lead-2 skip edges and
    * cross-bucket overlaps are retained raw by the caller, so no
    * connectivity is lost either.
    *
    * @param adj      cached chain adjacency (salt, band, bucket, pos,
    *                 node, n1node) — node/n1node in whatever id space the
    *                 caller clusters in (fp or doc_id)
    * @param verified the verified pair set (a, b) with a < b, same space
    * @return star edges (a, b) with a < b, ready to union with `verified`
    */
  private def segmentStarEdges(adj: org.apache.spark.sql.DataFrame,
                               verified: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val v = verified.select(col("a").as("va"), col("b").as("vb"))
      .withColumn("vok", lit(true))
    // least/greatest over (node, null n1node at run end) degenerates to
    // (node, node), which never matches a verified pair (no self-pairs) —
    // exactly the wanted ok1=false for the last position of a bucket
    val ok = adj.join(v,
        least(col("node"), col("n1node")) === col("va") &&
        greatest(col("node"), col("n1node")) === col("vb"), "left")
      .select(col("salt"), col("band"), col("bucket"), col("pos"),
        col("node"), coalesce(col("vok"), lit(false)).as("ok1"))
    val wseg = Window.partitionBy(col("salt"), col("band"), col("bucket"))
      .orderBy(col("pos"))
    val segW = Window.partitionBy(col("salt"), col("band"), col("bucket"),
      col("seg"))
    ok
      // row i starts a new segment iff the edge (i-1, i) was not verified
      .withColumn("brk",
        when(lag(col("ok1"), 1, false).over(wseg), lit(0)).otherwise(lit(1)))
      .withColumn("seg", sum(col("brk"))
        .over(wseg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lab", min(col("node")).over(segW))
      .where(col("node") =!= col("lab"))
      .select(col("lab").as("a"), col("node").as("b"))
      .distinct()
  }

  /** Pair ENUMERATION over the verified rep graph — the spec-scale
    * property-check path, deliberately NOT the catalog entry.
    *
    * Round-12 ScaleProof measured the pair form at 62.6× cost for 10×
    * data: the per-pair cost stayed flat (2.4→4.3 µs) but the OUTPUT is
    * quadratic in clique depth by definition — a 10-deep dup clique emits
    * C(10,2) pairs, and deep duplication is exactly what 100-TB corpora
    * carry. So the catalog entry ([[minhashLsh]]) emits the linear
    * cluster/representative form, and this helper keeps the pair spelling
    * alive for PropertySpec's recall/precision floors at spec scale:
    *   output = intra-group pairs (identical token sets, Jaccard exactly
    *   1.0, recall 1.0 by construction) ∪ cross-group expansion of
    *   verified rep pairs, each inheriting the set-level Jaccard.
    */
  private[graft] def minhashPairs(spark: org.apache.spark.sql.SparkSession,
                                  sfDir: String): org.apache.spark.sql.DataFrame = {
    val (members, _, repPairs, _) = minhashRepStage(spark, sfDir, chainCandidates = false)
    // intra-group: identical token sets, Jaccard exactly 1.0
    val ma = members.select(col("fp"), col("doc_id").as("doc_a"))
    val mb = members.select(col("fp"), col("doc_id").as("doc_b"))
    val intra = ma.join(mb, "fp").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
    // cross-group: every member combination inherits the set-level Jaccard
    val cross = repPairs
      .join(members.select(col("fp").as("fp_a"), col("doc_id").as("id_a")), "fp_a")
      .join(members.select(col("fp").as("fp_b"), col("doc_id").as("id_b")), "fp_b")
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("jaccard"))
    intra.unionByName(cross).orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH banding — the O(n) near-dup path for 100 TB, in
    * CLUSTER-REPRESENTATIVE form (re-specced round 13, VERDICT r12 #1).
    *
    * The previous spelling enumerated near-dup PAIRS, whose output is
    * quadratic in dup-clique depth (measured 62.6× at 10× data — the one
    * scale-killer left in the catalog). This form contracts the verified
    * rep-pair graph with the same min-label propagation the clustering
    * twin uses ([[ccLabels]]) and emits one row per document in a
    * non-trivial near-dup cluster:
    *
    *   (doc_id, cluster_id = min doc_id in the ≥0.9-Jaccard component,
    *    cluster_size)
    *
    * — LINEAR in the corpus at any clique depth; `doc_id != cluster_id`
    * is directly the "drop these" dedup predicate. Clustering runs in
    * rep-id space (one node per distinct token set), so the CC input is
    * the contracted graph, not the member expansion; membership fans back
    * out with one hash join. Candidate generation uses the CHAIN spelling
    * of [[minhashRepStage]] (≤ 2(m-1) verified edges per bucket): the r13
    * ScaleProof measured the full within-bucket expansion at 18× cost for
    * 10× data on the 10-deep-replica corpus — all candidate+verify work on
    * C(k,2) clique pairs that connectivity never needed. Pair semantics (recall/precision floors vs
    * exact Jaccard ground truth, and cluster↔pair-component agreement)
    * stay pinned at spec scale in PropertySpec via [[minhashPairs]].
    * No oracle (xxhash64 minhash isn't reproducible in DuckDB).
    */
  private val minhashLsh = CatalogEntry.noOracle("dedup_minhash_lsh") { (spark, sfDir) =>
    val (members, repIds, repPairs0, chainAdj) =
      minhashRepStage(spark, sfDir, chainCandidates = true)
    val contraction = graft.GraftConf.dedupStarContraction(spark)
    // with the pre-pass on, the verified pair set feeds the contraction's
    // ok1 probe AND the edge union — cached so the exact-Jaccard verify
    // subtree (the stage's expensive op) runs once
    val repPairs = {
      val p = repPairs0.select(col("fp_a"), col("fp_b"))
      if (contraction) p.cache() else p
    }
    // segment-contraction pre-pass ([[segmentStarEdges]]): chain
    // candidates make PATH-shaped components whose diameter costs
    // ccLabels extra serialized pointer-jump rounds; starring each
    // verified run to its min fp collapses them to depth 1 before
    // propagation. Union with the raw verified pairs (covers lead-2 skip
    // edges and cross-bucket overlaps) — connectivity identical, only
    // the diameter drops.
    val fpEdges = if (!contraction) repPairs else {
      val star = segmentStarEdges(
        chainAdj.get.select(col("salt"), col("band"), col("bucket"),
          col("pos"), col("fp").as("node"), col("n1fp").as("n1node")),
        repPairs.select(col("fp_a").as("a"), col("fp_b").as("b")))
      repPairs
        .unionByName(star.select(col("a").as("fp_a"), col("b").as("fp_b")))
        .distinct()
    }
    // verified rep pairs → edges in rep_id (= min member doc_id) space;
    // min-propagation over rep ids therefore converges to the min doc_id
    // of the whole member component, giving a deterministic cluster label
    val edges = fpEdges
      .join(repIds.select(col("fp").as("fp_a"), col("rep_id").as("src")), "fp_a")
      .join(repIds.select(col("fp").as("fp_b"), col("rep_id").as("dst")), "fp_b")
      .select(col("src"), col("dst"))
    val labels = ccLabels(edges) // (node, comp) — only reps touched by an edge
    val fpLab = repIds.join(labels, repIds("rep_id") === labels("node"), "left")
      .select(col("fp"), coalesce(col("comp"), col("rep_id")).as("cluster_id"))
    val docLab = members.join(fpLab, "fp").select(col("doc_id"), col("cluster_id"))
    // cluster_size via one keyed agg + join-back (both shuffle on the
    // cluster key, so AQE coalesces them into one exchange reuse); the
    // ≥2 filter keeps the output to dedup-relevant rows only
    val sizes = docLab.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .where(col("cluster_size") >= 2)
    docLab.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** SimHash near-dup: 64-bit sign-of-sums fingerprint over token hashes.
    * The bit sums come from ONE explode + groupBy pass (64 conditional
    * sums in a single aggregation — not 64 array traversals); candidates
    * from 16-bit block collisions (a pair within Hamming distance 3 must
    * agree on at least one of the 4 blocks), verified by bit_count(xor).
    * Fully deterministic; no oracle (xxhash64). Identical token sets ⇒
    * identical fingerprints ⇒ Hamming 0, so exact dups are found with
    * recall 1.0 (property-tested).
    *
    * Scale spelling (r16 100× fix — 260 s → see BASELINE.md): the naive
    * doc-level co-block self-join is quadratic in clone-CLIQUE depth (a
    * 100-deep near-dup clique shares most blocks, so one (block, key)
    * bucket held ~25k docs → ~1.2 B joined rows, then a 420 M-row
    * DISTINCT to collapse multi-block agreements). Hamming distance
    * depends ONLY on the two fingerprint values, so the banding runs at
    * the DISTINCT-simhash level — bucket occupancy collapses from clique
    * depth to distinct-value count — and doc pairs fan back out through
    * two value→member joins, linear in OUTPUT size. Multi-block
    * agreements are deduped with the first-agreeing-block trick (emit a
    * value pair only from the lowest block index on which it agrees — a
    * map-side bit-math filter) instead of a global DISTINCT, so no
    * quadratic-shaped shuffle survives anywhere. Output is unchanged:
    * every qualifying (doc_a < doc_b, hamming) pair exactly once — the
    * OUTPUT itself is quadratic in clique depth by contract, and scales
    * with true near-dup pair mass, not with the join plan. */
  /** Per-document 64-bit SimHash fingerprints `(doc_id, simhash)` — the
    * sign-of-sums construction both simhash spellings share: one explode +
    * groupBy pass computes all 64 conditional bit sums (not 64 array
    * traversals); identical token sets ⇒ identical fingerprints. */
  private[graft] def simhashValues(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val bits = 64
    val tokenHashes = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSumExprs = (0 until bits).map(k =>
      sum(shiftright(col("h"), k).bitwiseAND(1) * 2 - 1).as(s"b$k"))
    val bitSums = tokenHashes.groupBy(col("doc_id"))
      .agg(bitSumExprs.head, bitSumExprs.tail: _*)
    bitSums.select(col("doc_id"),
      (0 until bits).map { k =>
        when(col(s"b$k") >= 0, lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _).as("simhash"))
  }

  /** Hamming-ball edges over DISTINCT fingerprint VALUES (the r16 scale
    * spelling both simhash entries band through): pigeonhole blocks — a
    * pair within Hamming distance d agrees on one of d+1 equal 16-bit
    * blocks, so block collisions are a COMPLETE candidate generator —
    * with each qualifying value pair emitted from its FIRST agreeing
    * block only (for join block b, blocks 0..b-1 must DISAGREE: pure bit
    * math on the two values, evaluated map-side, no global DISTINCT).
    * Banding over distinct values, not docs, collapses bucket occupancy
    * from clone-clique depth to distinct-value count — the fix that took
    * the 100× leg from 260 s to linear-in-output (BASELINE.md cliff 3).
    * Returns `(sh_a < sh_b, hamming ≤ maxHamming)`, each pair once. */
  private[graft] def simhashValuePairs(sim: org.apache.spark.sql.DataFrame,
      maxHamming: Int): org.apache.spark.sql.DataFrame = {
    val bits = 64
    val nBlocks = maxHamming + 1
    val vals = sim.select(col("simhash")).distinct()
    DistinctValue.bandedValuePairs(vals, "simhash", nBlocks,
        DistinctValue.bitBlock(bits / nBlocks))
      .select(col("simhash_a").as("sh_a"), col("simhash_b").as("sh_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  private val simhash = CatalogEntry.noOracle("dedup_simhash") { (spark, sfDir) =>
    // pigeonhole: within Hamming distance d, a pair must agree on one of
    // d+1 equal blocks; maxHamming is corpus-tunable via spark.conf
    val maxHamming = graft.GraftConf.simhashMaxHamming(spark)
    // cached for the same reason as the cluster sibling below: the
    // fingerprint aggregation feeds both banded join sides AND both
    // fan-out member maps — uncached, Spark computes it once per
    // reference (~4×); the harness sweep owns the unpersist
    val sim = simhashValues(spark, sfDir).cache()
    val valPairs = simhashValuePairs(sim, maxHamming)
    // fan back out to doc pairs: cross-value pairs orient by id (every
    // member pairing qualifies at the value pair's hamming), same-value
    // members pair at hamming 0
    val mA = sim.select(col("simhash").as("sh_a"), col("doc_id").as("ida"))
    val mB = sim.select(col("simhash").as("sh_b"), col("doc_id").as("idb"))
    val cross = valPairs.join(mA, "sh_a").join(mB, "sh_b")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
    val within = mA.join(mB, col("sh_a") === col("sh_b"))
      .where(col("ida") < col("idb"))
      .select(col("ida").as("doc_a"), col("idb").as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The Hamming family's native LINEAR-OUTPUT scale path (VERDICT r16
    * #2): connected components over the Hamming-ball graph, output one
    * `(doc_id, cluster_id, cluster_size)` row per clustered document —
    * the cluster spelling of [[simhash]], exactly as
    * `dedup_minhash_lsh`'s cluster form is to pair-enumerating minhash.
    * [[simhash]]'s 100× residual (BASELINE.md) is its pair-output
    * CONTRACT — 105 M qualifying pairs on 100-deep clone cliques, which
    * no plan can shrink; this entry replaces the quadratic-in-clique
    * output with one row per member, so the 100-TB dedup consumer
    * (keep one per cluster) reads cluster labels instead.
    *
    * Same machinery end to end, nothing new to trust: fingerprints and
    * value-level Hamming-ball edges from the shared helpers (banding
    * complete by pigeonhole, so the components are EXACTLY the connected
    * components of the pair spelling's graph — CcSpec pins that
    * equivalence against a driver-side union-find over the emitted
    * pairs), edges contracted to rep space (rep = min doc_id per distinct
    * fingerprint: clone cliques collapse to ONE node before propagation,
    * the same contraction dedup_cluster_lsh rides), then the shared
    * [[ccLabels]] min-label propagation. cluster_id = min doc_id of the
    * component (deterministic); singleton VALUES with ≥2 member docs are
    * hamming-0 clone groups and cluster under their rep without touching
    * propagation. No oracle (xxhash64 fingerprints are not DuckDB-
    * reproducible); CcSpec carries the equivalence floor. */
  private val simhashCluster = CatalogEntry.noOracle("dedup_simhash_cluster") { (spark, sfDir) =>
    val maxHamming = graft.GraftConf.simhashMaxHamming(spark)
    // .cache() on the shared frames is load-bearing, not an optimization
    // nicety (r17 100× attribution, ProfileSimhashCc): the fingerprint
    // aggregation is referenced by BOTH banded join sides, the rep map
    // (twice), the doc fan-out, and the size roll-up — and Spark
    // materializes each reference independently, so the uncached entry
    // recomputed the 9 s (at 100×) 64-bit-sums pass ~20× across the plan
    // tree and ccLabels' eager checkpoints: 266 s total where the cached
    // stages sum to ~65 s. Same entry-cache convention as the other
    // cluster entries; the harness sweep (Util.sweepEntryCaches) owns the
    // unpersist.
    val sim = simhashValues(spark, sfDir).cache()
    val valPairs = simhashValuePairs(sim, maxHamming).cache()
    // rep = min member doc_id per distinct fingerprint; min-propagation
    // over rep ids therefore converges to the min doc_id of the whole
    // member component — the deterministic cluster label
    val repIds = sim.groupBy(col("simhash")).agg(min(col("doc_id")).as("rep_id")).cache()
    val edges = valPairs
      .join(repIds.select(col("simhash").as("sh_a"), col("rep_id").as("src")), "sh_a")
      .join(repIds.select(col("simhash").as("sh_b"), col("rep_id").as("dst")), "sh_b")
      .select(col("src"), col("dst"))
    val labels = ccLabels(edges) // (node, comp) — only reps touched by an edge
    val shLab = repIds.join(labels, repIds("rep_id") === labels("node"), "left")
      .select(col("simhash"), coalesce(col("comp"), col("rep_id")).as("cluster_id"))
    val docLab = sim.join(shLab, "simhash").select(col("doc_id"), col("cluster_id"))
    // cluster_size via one keyed agg + join-back; the ≥2 filter keeps the
    // output to dedup-relevant rows only (same contract as the other
    // cluster entries)
    val sizes = docLab.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .where(col("cluster_size") >= 2)
    docLab.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** n-gram (token-bigram) Jaccard — shingle-level near-dup: word-order
    * sensitive where the unigram variant is not. Same length/lang blocking
    * (and the same salted-bucket physical join) as the other pair ops.
    *
    * Scale role: this exact blocked form is the sf0.01 ORACLE for the
    * candidate-driven `dedup_ngram_lsh` twin below — at 100 TB the
    * blocked discovery is quadratic-per-bucket and the twin (LSH
    * candidates → exact verify) is the production path. */
  private val ngramJaccard = CatalogEntry.dialect(
    "dedup_ngram_jaccard",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents
               |), t AS (
               |  SELECT doc_id, lang, n_chars,
               |         list_distinct(list_transform(range(1, len(toks)),
               |                       i -> toks[i] || '_' || toks[i+1])) AS grams
               |  FROM tok
               |)
               |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               |       ROUND(len(list_intersect(a.grams, b.grams)) * CAST(1.0 AS DOUBLE) /
               |             (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard2
               |FROM t a JOIN t b
               |  ON a.lang = b.lang AND a.doc_id < b.doc_id
               | AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
               | AND ROUND(least(len(a.grams), len(b.grams)) * CAST(1.0 AS DOUBLE) /
               |           greatest(len(a.grams), len(b.grams)), 4) >= 0.2
               |WHERE ROUND(len(list_intersect(a.grams, b.grams)) * CAST(1.0 AS DOUBLE) /
               |            (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) >= 0.2
               |ORDER BY doc_a, doc_b""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, lang, n_chars, split(text, ' ') AS toks FROM documents
              |), t AS (
              |  SELECT doc_id, lang, n_chars,
              |         array_distinct(transform(sequence(0, size(toks) - 2),
              |                       i -> concat(toks[i], '_', toks[i+1]))) AS grams
              |  FROM tok
              |)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |       ROUND(size(array_intersect(a.grams, b.grams)) * CAST(1.0 AS DOUBLE) /
              |             (size(a.grams) + size(b.grams) - size(array_intersect(a.grams, b.grams))), 4) AS jaccard2
              |FROM t a JOIN t b
              |  ON a.lang = b.lang AND a.doc_id < b.doc_id
              | AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
              | AND ROUND(least(size(a.grams), size(b.grams)) * CAST(1.0 AS DOUBLE) /
              |           greatest(size(a.grams), size(b.grams)), 4) >= 0.2
              |WHERE ROUND(size(array_intersect(a.grams, b.grams)) * CAST(1.0 AS DOUBLE) /
              |            (size(a.grams) + size(b.grams) - size(array_intersect(a.grams, b.grams))), 4) >= 0.2
              |ORDER BY doc_a, doc_b""".stripMargin) { (spark, sfDir) =>
    // dictionary fast path (see [[gramIds]] / GraftConf.gramDict): bigram
    // sets ride as ARRAY<BIGINT> ids, the per-pair merge compares
    // primitive longs — same integers, same output
    gramIds(spark, sfDir).map { enc =>
      val t = enc.withColumn("bucket", floor(col("n_chars") / 20))
      val a = t.select(col("doc_id").as("doc_a"), col("gids").as("gids_a"),
        col("ng").as("ng_a"), col("lang"), col("n_chars").as("nc_a"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
      val b = t.select(col("doc_id").as("doc_b"), col("gids").as("gids_b"),
        col("ng").as("ng_b"), col("lang"), col("n_chars").as("nc_b"), col("bucket"))
      val interL = expr("sorted_intersect_size_l(gids_a, gids_b)")
      a.join(b, Seq("lang", "bucket"))
        .where(col("doc_a") < col("doc_b")
          && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20)
          // same implied length prune as the general path (ng = the
          // original size(grams), null elements included — the merge
          // skips nulls exactly like the string spelling)
          && round(least(col("ng_a"), col("ng_b")) * lit(1.0) /
               greatest(col("ng_a"), col("ng_b")), 4) >= 0.2)
        .withColumn("jaccard2",
          round(interL * 1.0 / (col("ng_a") + col("ng_b") - interL), 4))
        .where(col("jaccard2") >= 0.2)
        .select(col("doc_a"), col("doc_b"), col("jaccard2"))
        .orderBy(col("doc_a"), col("doc_b"))
    }.getOrElse(ngramJaccardGeneral(spark, sfDir))
  }

  /** Adaptive dictionary encoding of per-doc distinct bigram sets (r19;
    * the [[tokenMasks]] companion for shingle vocabularies that outgrow
    * 64 bits but stay broadcastable — gate and exactness argument on
    * GraftConf.gramDict). Returns `(doc_id, lang, n_chars, ng, gids)`:
    * `ng` = the ORIGINAL size(grams) including a possible null element
    * (degenerate single-token docs — the sizes in the Jaccard denominator
    * count it), `gids` = the sorted non-null dictionary ids (the merge
    * skips null elements in the string spelling, so dropping them here is
    * the same semantics). None above 2^16 observed bigrams or when
    * `graft.text.gramDict=off`. */
  private def gramIds(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Option[org.apache.spark.sql.DataFrame] = {
    if (!graft.GraftConf.gramDict(spark)) return None
    graft.functions.TextFunctions.ensureRegistered(spark)
    val t = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], '_', toks[i+1]))"))
          .as("grams"))
    val vocab = t.select(explode(col("grams")).as("g")).where(col("g").isNotNull).distinct()
    if (vocab.count() > (1 << 16)) return None // bounded driver action: one scalar
    val dict = vocab.select(col("g"),
      (row_number().over(Window.orderBy(col("g"))) - 1).cast("long").as("gid"))
    // cached for the same two-consumer reason as [[tokenMasks]]
    Some(t
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("grams")).as("ng"), explode_outer(col("grams")).as("g"))
      .join(broadcast(dict), Seq("g"), "left")
      .groupBy(col("doc_id"), col("lang"), col("n_chars"), col("ng"))
      // collect_list drops null gids (empty-grams docs survive via the
      // explode_outer null row; null gram elements are dropped on purpose)
      .agg(sort_array(collect_list(col("gid"))).as("gids"))
      .cache())
  }

  /** General path of [[ngramJaccard]] — the sorted-string-array spelling,
    * unchanged semantics; BitmaskPathSpec pins it output-equal to the
    * dictionary path. */
  private[graft] def ngramJaccardGeneral(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val t = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], '_', toks[i+1]))")))
          .as("grams"),
        floor(col("n_chars") / 20).as("bucket"))
    val a = t.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"),
      col("lang"), col("n_chars").as("nc_a"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = t.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"),
      col("lang"), col("n_chars").as("nc_b"), col("bucket"))
    val inter = expr("sorted_intersect_size(grams_a, grams_b)")
    a.join(b, Seq("lang", "bucket"))
      .where(col("doc_a") < col("doc_b")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20)
        // implied length prune (VERDICT r18 #1, mirrored in the oracle):
        // J(A,B) ≤ min/max sizewise and ROUND is monotone, so the kept
        // ROUND(j,4) ≥ 0.2 filter implies this one — evaluated BEFORE the
        // per-pair sorted-merge intersect, it prunes at size-compare cost.
        // Output bit-identical.
        && round(least(size(col("grams_a")), size(col("grams_b"))) * lit(1.0) /
             greatest(size(col("grams_a")), size(col("grams_b"))), 4) >= 0.2)
      .withColumn("jaccard2",
        round(inter * 1.0 / (size(col("grams_a")) + size(col("grams_b")) - inter), 4))
      .where(col("jaccard2") >= 0.2)
      .select(col("doc_a"), col("doc_b"), col("jaccard2"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Candidate-driven twin of `dedup_ngram_jaccard` — the 100-TB path
    * (VERDICT r3 #5). The blocked form is quadratic *discovery*: at 100×
    * corpus its intra-bucket pairs grow ~10,000×. This form is linear
    * discovery + bounded verification:
    *
    *   1. canonicalize: one rep per distinct bigram set (md5 fingerprint)
    *      — clone groups collapse before any pairing
    *   2. candidates: [[lshCandidates]] over the reps' bigram sets with
    *      r=1 banding (P(candidate) = 1-(1-j)^16 ≈ 0.97 at the entry's
    *      j≥0.2 threshold) — O(|reps|·bands) bucket rows, no self-join
    *   3. verify candidates with the exact bigram Jaccard, keep ≥ 0.2
    *   4. expand rep pairs to member pairs, re-applying the blocked
    *      form's lang/±20-chars predicate on member metadata
    *
    * Output contract = the blocked entry restricted to what survives the
    * probabilistic candidate stage: precision 1.0 (every emitted pair is
    * exactly verified), recall property-tested ≥ 0.9 in PropertySpec with
    * `dedup_ngram_jaccard` as ground truth. No oracle (xxhash64 banding
    * isn't DuckDB-reproducible). */
  private val ngramLsh = CatalogEntry.noOracle("dedup_ngram_lsh") { (spark, sfDir) =>
    val nHashes = graft.GraftConf.verifyHashes(spark)
    val bands = graft.GraftConf.verifyBands(spark)
    graft.functions.TextFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2) // <2 tokens ⇒ no bigrams ⇒ blocked form emits nothing
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], '_', toks[i+1]))")))
          .as("grams"))
      .withColumn("fp", md5(array_join(col("grams"), " ")))
      .cache()
    val members = docs.select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
    val reps = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
      .join(docs.select(col("doc_id").as("rep_id"), col("grams")), "rep_id")
    // minSizeRatio = the verify threshold (0.2) minus the round(…,4)
    // boundary slack — see the prune note in lshCandidates' scaladoc
    val cand = lshCandidates(reps, "fp", "grams", nHashes, bands,
      graft.GraftConf.verifyMaxBucket(spark), minSizeRatio = 0.2 - 1e-4)
    val ga = reps.select(col("fp").as("id_a"), col("grams").as("grams_a"))
    val gb = reps.select(col("fp").as("id_b"), col("grams").as("grams_b"))
    val inter = expr("sorted_intersect_size(grams_a, grams_b)")
    val repPairs = cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard2",
        round(inter * 1.0 / (size(col("grams_a")) + size(col("grams_b")) - inter), 4))
      .where(col("jaccard2") >= 0.2)
      .select(col("id_a"), col("id_b"), col("jaccard2"))
    // identical bigram sets: jaccard2 exactly 1.0, found with recall 1.0
    val ma = members.select(col("fp"), col("doc_id").as("doc_a"),
      col("lang").as("lang_a"), col("n_chars").as("nc_a"))
    val mb = members.select(col("fp"), col("doc_id").as("doc_b"),
      col("lang").as("lang_b"), col("n_chars").as("nc_b"))
    val intra = ma.join(mb, "fp").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
        col("nc_a"), col("nc_b"), lit(1.0).as("jaccard2"))
    // cross-group member pairs inherit the set-level jaccard2
    val cross = repPairs
      .join(members.select(col("fp").as("id_a"), col("doc_id").as("id_x"),
        col("lang").as("lang_a"), col("n_chars").as("nc_a")), "id_a")
      .join(members.select(col("fp").as("id_b"), col("doc_id").as("id_y"),
        col("lang").as("lang_b"), col("n_chars").as("nc_b")), "id_b")
      .select(least(col("id_x"), col("id_y")).as("doc_a"),
        greatest(col("id_x"), col("id_y")).as("doc_b"),
        col("lang_a"), col("lang_b"), col("nc_a"), col("nc_b"), col("jaccard2"))
    intra.unionByName(cross)
      // the blocked form's logical predicate, re-applied per member pair
      // (|Δn_chars| ≤ 20 is orientation-symmetric, so least/greatest is safe)
      .where(col("lang_a") === col("lang_b")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      .select(col("doc_a"), col("doc_b"), col("jaccard2"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Candidate-driven twin of `text_levenshtein_block` — the 100-TB path
    * (VERDICT r3 #5), same decomposition as [[ngramLsh]] with the prefix
    * string itself as the canonical key (identical prefixes are distance
    * 0 by definition) and char 4-grams of the prefix as the LSH shingle
    * space. A ≤10-edit pair over 40 chars retains high 4-gram overlap in
    * practice but has NO worst-case q-gram guarantee (10 edits can touch
    * all 37 grams), so recall is explicitly probabilistic — asserted
    * ≥ 0.9 in PropertySpec against the blocked ground truth; precision
    * is 1.0 (candidates are verified with the exact levenshtein). */
  private val levenshteinLsh = CatalogEntry.noOracle("text_levenshtein_lsh") { (spark, sfDir) =>
    val nHashes = graft.GraftConf.verifyHashes(spark)
    val bands = graft.GraftConf.verifyBands(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        substring(col("text"), 1, 40).as("prefix"))
      .withColumn("qgrams", array_distinct(expr(
        "transform(sequence(1, greatest(length(prefix) - 3, 1)), i -> substring(prefix, i, 4))")))
      .cache()
    val members = docs.select(col("prefix"), col("doc_id"), col("lang"), col("n_chars"))
    val reps = docs.groupBy(col("prefix")).agg(min(col("doc_id")).as("rep_id"))
      .join(docs.select(col("doc_id").as("rep_id"), col("qgrams")), "rep_id")
    // candidate ids ARE the prefixes — verification needs no extra join
    val repPairs = lshCandidates(reps, "prefix", "qgrams", nHashes, bands,
        graft.GraftConf.verifyMaxBucket(spark))
      // same bounded-DP threshold form as the blocked twin (exact ≤ 10,
      // -1 above — filtered identically)
      .withColumn("dist", levenshtein(col("id_a"), col("id_b"), 10).cast("long"))
      .where(col("dist") >= 0)
    val ma = members.select(col("prefix"), col("doc_id").as("doc_a"),
      col("lang").as("lang_a"), col("n_chars").as("nc_a"))
    val mb = members.select(col("prefix"), col("doc_id").as("doc_b"),
      col("lang").as("lang_b"), col("n_chars").as("nc_b"))
    val intra = ma.join(mb, "prefix").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
        col("nc_a"), col("nc_b"), lit(0L).as("dist"))
    val cross = repPairs
      .join(members.select(col("prefix").as("id_a"), col("doc_id").as("id_x"),
        col("lang").as("lang_a"), col("n_chars").as("nc_a")), "id_a")
      .join(members.select(col("prefix").as("id_b"), col("doc_id").as("id_y"),
        col("lang").as("lang_b"), col("n_chars").as("nc_b")), "id_b")
      .select(least(col("id_x"), col("id_y")).as("doc_a"),
        greatest(col("id_x"), col("id_y")).as("doc_b"),
        col("lang_a"), col("lang_b"), col("nc_a"), col("nc_b"), col("dist"))
    intra.unionByName(cross)
      .where(col("lang_a") === col("lang_b")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** n-gram-profile language ID: build a top-20-token profile per lang from
    * the corpus itself, score each doc by profile overlap, pick the
    * best-scoring lang (ties broken by lang asc so the pick is total).
    * Two shuffles: token counts, then the profile semi-join — no per-doc
    * profile scan, so the shape holds at corpus scale. */
  private val langId = CatalogEntry.dialect(
    "text_lang_id",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, lang AS true_lang, unnest(list_distinct(string_split(text, ' '))) AS token
               |  FROM documents
               |), prof AS (
               |  SELECT lang, token FROM (
               |    SELECT lang, token, COUNT(*) AS cnt,
               |           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rn
               |    FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
               |    GROUP BY lang, token
               |  ) WHERE rn <= 20
               |), score AS (
               |  SELECT t.doc_id, p.lang, COUNT(*) AS overlap
               |  FROM tok t JOIN prof p ON t.token = p.token
               |  GROUP BY t.doc_id, p.lang
               |)
               |SELECT doc_id, lang AS pred_lang FROM (
               |  SELECT doc_id, lang,
               |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rn
               |  FROM score
               |) WHERE rn = 1
               |ORDER BY doc_id""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, lang AS true_lang, explode(array_distinct(split(text, ' '))) AS token
              |  FROM documents
              |), prof AS (
              |  SELECT lang, token FROM (
              |    SELECT lang, token, COUNT(*) AS cnt,
              |           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rn
              |    FROM (SELECT lang, explode(split(text, ' ')) AS token FROM documents)
              |    GROUP BY lang, token
              |  ) WHERE rn <= 20
              |), score AS (
              |  SELECT t.doc_id, p.lang, COUNT(*) AS overlap
              |  FROM tok t JOIN prof p ON t.token = p.token
              |  GROUP BY t.doc_id, p.lang
              |)
              |SELECT doc_id, lang AS pred_lang FROM (
              |  SELECT doc_id, lang,
              |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang) AS rn
              |  FROM score
              |) WHERE rn = 1
              |ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))
    // two-level salted top-20 (same move as pipeline_quota_sample): the
    // per-lang vocab is millions of rows at corpus scale, and a single
    // PARTITION BY lang window funnels each language through one sort
    // task. A global top-20 token is outranked by < 20 tokens, so it is
    // top-20 in its salt bucket too — level 2 re-ranks ≤ 16×20 survivors.
    val profW1 = Window.partitionBy(col("lang"), col("psalt"))
      .orderBy(col("cnt").desc, col("token"))
    val profW2 = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("token"))
    val prof = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("psalt", pmod(xxhash64(col("token")), lit(16)))
      .withColumn("rn1", row_number().over(profW1))
      .where(col("rn1") <= 20)
      .withColumn("rn", row_number().over(profW2))
      .where(col("rn") <= 20)
      .select(col("lang"), col("token"))
    val score = tok.join(prof, "token")
      .groupBy(col("doc_id"), col("lang")).agg(count(lit(1)).as("overlap"))
    score
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("overlap").desc, col("lang"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Heuristic quality score: token count, vocabulary richness (distinct
    * ratio), mean token length — the classic pre-training-corpus filters.
    * Integer-derived doubles with identical operand order on both sides. */
  private val qualityScore = CatalogEntry.dialect(
    "text_quality_score",
    duckdb = """SELECT doc_id,
               |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               |       ROUND(len(list_distinct(string_split(text, ' '))) * CAST(1.0 AS DOUBLE)
               |             / len(string_split(text, ' ')), 4) AS distinct_ratio,
               |       ROUND((n_chars - len(string_split(text, ' ')) + 1) * CAST(1.0 AS DOUBLE)
               |             / len(string_split(text, ' ')), 4) AS avg_token_len,
               |       CASE WHEN len(string_split(text, ' ')) >= 20
               |             AND len(list_distinct(string_split(text, ' '))) * CAST(1.0 AS DOUBLE)
               |                 / len(string_split(text, ' ')) >= 0.3
               |            THEN 1 ELSE 0 END AS keep_flag
               |FROM documents ORDER BY doc_id""".stripMargin,
    spark = """SELECT doc_id,
              |       CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
              |       ROUND(size(array_distinct(split(text, ' '))) * CAST(1.0 AS DOUBLE)
              |             / size(split(text, ' ')), 4) AS distinct_ratio,
              |       ROUND((n_chars - size(split(text, ' ')) + 1) * CAST(1.0 AS DOUBLE)
              |             / size(split(text, ' ')), 4) AS avg_token_len,
              |       CASE WHEN size(split(text, ' ')) >= 20
              |             AND size(array_distinct(split(text, ' '))) * CAST(1.0 AS DOUBLE)
              |                 / size(split(text, ' ')) >= 0.3
              |            THEN 1 ELSE 0 END AS keep_flag
              |FROM documents ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val distinctRatio = size(array_distinct(toks)) * lit(1.0) / nTok
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(distinctRatio, 4).as("distinct_ratio"),
        round((col("n_chars") - nTok + 1) * lit(1.0) / nTok, 4).as("avg_token_len"),
        when(nTok >= 20 && distinctRatio >= 0.3, 1).otherwise(0).as("keep_flag"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace words and a BPE-ish greedy regex
    * chunking (≤4 lowercase chars per piece) — the cheap proxy for "how
    * many subword tokens will this doc cost". */
  private val tokenCount = CatalogEntry.dialect(
    "text_token_count",
    duckdb = """SELECT doc_id,
               |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               |       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS n_bpe_pieces
               |FROM documents ORDER BY doc_id""".stripMargin,
    spark = """SELECT doc_id,
              |       CAST(size(split(text, ' ')) AS BIGINT) AS n_words,
              |       CAST(size(regexp_extract_all(text, '[a-z]{1,4}', 0)) AS BIGINT) AS n_bpe_pieces
              |FROM documents ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
          .cast("long").as("n_bpe_pieces"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprinting: md5 of the raw text (exact-dup key) and md5 of
    * the sorted distinct token set (order/multiplicity-insensitive near-dup
    * key), plus each fingerprint's duplicate-group size. At 100 TB this is
    * the first-pass dedup: one hash per doc, one shuffle per fingerprint. */
  private val fingerprint = CatalogEntry.dialect(
    "text_fingerprint",
    duckdb = """SELECT doc_id,
               |       md5(text) AS content_fp,
               |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS shingle_fp,
               |       COUNT(*) OVER (PARTITION BY md5(text)) AS exact_dups,
               |       COUNT(*) OVER (PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))) AS shingle_dups
               |FROM documents ORDER BY doc_id""".stripMargin,
    spark = """SELECT doc_id,
              |       md5(text) AS content_fp,
              |       md5(array_join(sort_array(array_distinct(split(text, ' '))), ' ')) AS shingle_fp,
              |       COUNT(*) OVER (PARTITION BY md5(text)) AS exact_dups,
              |       COUNT(*) OVER (PARTITION BY md5(array_join(sort_array(array_distinct(split(text, ' '))), ' '))) AS shingle_dups
              |FROM documents ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val contentFp = md5(col("text"))
    val shingleFp = md5(array_join(sort_array(array_distinct(split(col("text"), " "))), " "))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        contentFp.as("content_fp"),
        shingleFp.as("shingle_fp"),
        count(lit(1)).over(Window.partitionBy(contentFp)).as("exact_dups"),
        count(lit(1)).over(Window.partitionBy(shingleFp)).as("shingle_dups"))
      .orderBy(col("doc_id"))
  }

  /** Polynomial (Karp-Rabin-style) rolling hash over the token stream —
    * order-SENSITIVE where the md5 shingle fingerprint is order-blind.
    * Token values are engine-portable (length·256 + first-char code);
    * the fold takes the first value as seed then (acc·31 + v) mod 1e9+7
    * per step — list_reduce semantics, mirrored exactly in Spark with
    * aggregate over the tail. Explicit mod keeps DuckDB's checked BIGINT
    * arithmetic from overflowing. */
  private val rollingHash = CatalogEntry.dialect(
    "text_rolling_hash",
    duckdb = """WITH h AS (
               |  SELECT doc_id,
               |         list_reduce(
               |           list_transform(string_split(text, ' '),
               |                          t -> CAST(length(t) AS BIGINT) * 256 + ascii(t)),
               |           (a, b) -> (a * 31 + b) % 1000000007) AS fp
               |  FROM documents
               |)
               |SELECT doc_id, fp,
               |       COUNT(*) OVER (PARTITION BY fp) AS dup_group
               |FROM h ORDER BY doc_id""".stripMargin,
    spark = """WITH h AS (
              |  SELECT doc_id,
              |         aggregate(
              |           slice(vals, 2, size(vals) - 1), element_at(vals, 1),
              |           (a, b) -> (a * 31 + b) % 1000000007) AS fp
              |  FROM (
              |    SELECT doc_id,
              |           transform(split(text, ' '),
              |                     t -> CAST(length(t) AS BIGINT) * 256 + ascii(t)) AS vals
              |    FROM documents
              |  )
              |)
              |SELECT doc_id, fp,
              |       COUNT(*) OVER (PARTITION BY fp) AS dup_group
              |FROM h ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val vals = transform(split(col("text"), " "),
      t => length(t).cast("long") * 256 + ascii(t))
    val fp = aggregate(
      slice(vals, lit(2), size(vals) - 1), element_at(vals, 1),
      (a, b) => (a * 31 + b) % 1000000007L)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("dup_group", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .orderBy(col("doc_id"))
  }

  /** Repetition-based quality filters (the Gopher/C4 family): per-doc top
    * token frequency fraction and duplicate-bigram fraction, with a flag
    * for docs exceeding either threshold. Both metrics are one explode +
    * aggregate per doc — linear in corpus size, partitioned by doc_id. */
  private val repetitionFilter = CatalogEntry.dialect(
    "text_repetition_filter",
    duckdb = """WITH cnt AS (
               |  SELECT doc_id, token, COUNT(*) AS c
               |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
               |  GROUP BY doc_id, token
               |), topf AS (
               |  SELECT doc_id, ROUND(MAX(c) * CAST(1.0 AS DOUBLE) / SUM(c), 4) AS top_token_frac
               |  FROM cnt GROUP BY doc_id
               |), rep AS (
               |  SELECT doc_id,
               |         CASE WHEN len(grams) = 0 THEN CAST(0.0 AS DOUBLE)
               |              ELSE ROUND((len(grams) - len(list_distinct(grams))) * CAST(1.0 AS DOUBLE)
               |                         / len(grams), 4) END AS dup_bigram_frac
               |  FROM (
               |    SELECT doc_id, list_transform(range(1, len(toks)),
               |                                  i -> toks[i] || '_' || toks[i+1]) AS grams
               |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
               |  )
               |)
               |SELECT t.doc_id, t.top_token_frac, r.dup_bigram_frac,
               |       CASE WHEN t.top_token_frac > 0.2 OR r.dup_bigram_frac > 0.2
               |            THEN 1 ELSE 0 END AS flagged
               |FROM topf t JOIN rep r ON t.doc_id = r.doc_id
               |ORDER BY t.doc_id""".stripMargin,
    spark = """WITH cnt AS (
              |  SELECT doc_id, token, COUNT(*) AS c
              |  FROM (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents)
              |  GROUP BY doc_id, token
              |), topf AS (
              |  SELECT doc_id, ROUND(MAX(c) * CAST(1.0 AS DOUBLE) / SUM(c), 4) AS top_token_frac
              |  FROM cnt GROUP BY doc_id
              |), rep AS (
              |  SELECT doc_id,
              |         CASE WHEN size(grams) = 0 THEN CAST(0.0 AS DOUBLE)
              |              ELSE ROUND((size(grams) - size(array_distinct(grams))) * CAST(1.0 AS DOUBLE)
              |                         / size(grams), 4) END AS dup_bigram_frac
              |  FROM (
              |    SELECT doc_id, CASE WHEN size(toks) >= 2
              |                        THEN transform(sequence(0, size(toks) - 2),
              |                                       i -> concat(toks[i], '_', toks[i+1]))
              |                        ELSE array() END AS grams
              |    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)
              |  )
              |)
              |SELECT t.doc_id, t.top_token_frac, r.dup_bigram_frac,
              |       CASE WHEN t.top_token_frac > 0.2 OR r.dup_bigram_frac > 0.2
              |            THEN 1 ELSE 0 END AS flagged
              |FROM topf t JOIN rep r ON t.doc_id = r.doc_id
              |ORDER BY t.doc_id""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
    val topf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")) * 1.0 / sum(col("c")), 4).as("top_token_frac"))
    // <2 tokens ⇒ zero bigrams: guard BOTH the sequence (ANSI mode —
    // sequence(0, -1) yields a descending [0,-1] and toks[-1] throws
    // INVALID_ARRAY_INDEX) and the division (0/0). dup_bigram_frac is
    // defined as 0.0 for such docs, identically in the DuckDB oracle.
    val grams = expr(
      """CASE WHEN size(toks) >= 2
        |     THEN transform(sequence(0, size(toks) - 2),
        |                    i -> concat(toks[i], '_', toks[i+1]))
        |     ELSE array() END""".stripMargin)
    val rep = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        when(size(col("grams")) === 0, lit(0.0))
          .otherwise(round((size(col("grams")) - size(array_distinct(col("grams")))) * 1.0
            / size(col("grams")), 4)).as("dup_bigram_frac"))
    topf.join(rep, "doc_id")
      .select(col("doc_id"), col("top_token_frac"), col("dup_bigram_frac"),
        when(col("top_token_frac") > 0.2 || col("dup_bigram_frac") > 0.2, 1)
          .otherwise(0).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-contamination check: count, per corpus doc, the word
    * 8-gram shingles it shares with a held-out probe set (docs with
    * doc_id ≡ 0 mod 10 stand in for "the benchmark"). The probe shingle
    * set is tiny relative to the corpus, so the membership join is a
    * broadcast — at 100 TB the corpus side streams through map-side
    * hash lookups with no shuffle of the corpus shingles. */
  private val contamination = CatalogEntry.dialect(
    "text_contamination",
    duckdb = """WITH sh AS (
               |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
               |         i -> array_to_string(list_slice(toks, i, i + 7), '_')))) AS shingle
               |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
               |  WHERE len(toks) >= 8
               |), bench AS (
               |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0
               |)
               |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam
               |FROM sh s JOIN bench b ON s.shingle = b.shingle
               |WHERE s.doc_id % 10 <> 0
               |GROUP BY s.doc_id
               |ORDER BY s.doc_id""".stripMargin,
    spark = """WITH sh AS (
              |  SELECT doc_id, explode(array_distinct(transform(sequence(1, size(toks) - 7),
              |         i -> array_join(slice(toks, i, 8), '_')))) AS shingle
              |  FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)
              |  WHERE size(toks) >= 8
              |), bench AS (
              |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0
              |)
              |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam
              |FROM sh s JOIN bench b ON s.shingle = b.shingle
              |WHERE s.doc_id % 10 <> 0
              |GROUP BY s.doc_id
              |ORDER BY s.doc_id""".stripMargin) { (spark, sfDir) =>
    val toks = split(col("text"), " ")
    val sh = Tables.documents(spark, sfDir)
      .where(size(toks) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(toks) - 7),
          i => array_join(slice(toks, i, lit(8)), "_")))).as("shingle"))
    val bench = sh.where(col("doc_id") % 10 === 0).select(col("shingle")).distinct()
    sh.where(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_contam"))
      .orderBy(col("doc_id"))
  }

  /** Dedup clustering: connected components over the near-dup graph —
    * the step that turns pairwise similarity into "keep one doc per
    * cluster". Edges are the blocked exact-Jaccard pairs (the
    * `text_jaccard_tokens` predicate with a keep threshold of 0.5);
    * every member is labeled with its component's minimum doc_id.
    *
    * Oracle: a DuckDB recursive CTE (symmetric closure → min reachable
    * node). Spark 4.1 cannot state that fixpoint in SQL — UNION-distinct
    * recursion is unsupported (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`,
    * verified against 4.1.2) and UNION ALL closure diverges on cycles —
    * so the in-repo equivalence check is CcSpec's union-find ground
    * truth rather than a SelfCheckSpec SQL twin.
    *
    * Scale shape: min-label propagation with pointer jumping —
    * alternate propagate (adopt the min label across edges) and
    * compress (label := label's label) rounds, converging in
    * O(log diameter) rounds; each round is two hash joins on a
    * (node, comp) frame of two longs, tiny relative to the corpus, and
    * each round's localCheckpoint truncates the iterative lineage (the
    * standard Spark iterative-algorithm posture — GraphX does the
    * same). At 100 TB the edge set should come from LSH candidates
    * (`dedup_minhash_lsh`) instead of the blocked self-join; the
    * propagation cost is edge-linear either way. */
  private val clusterCc = CatalogEntry.duckdbOnly(
    "dedup_cluster_cc",
    duckdb = """WITH RECURSIVE t AS (
               |  SELECT doc_id, lang, n_chars, list_distinct(string_split(text, ' ')) AS toks
               |  FROM documents
               |), edges AS (
               |  SELECT a.doc_id AS src, b.doc_id AS dst
               |  FROM t a JOIN t b
               |    ON a.lang = b.lang AND a.doc_id < b.doc_id
               |   AND b.n_chars BETWEEN a.n_chars - 20 AND a.n_chars + 20
               |  WHERE ROUND(len(list_intersect(a.toks, b.toks)) * CAST(1.0 AS DOUBLE) /
               |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) >= 0.5
               |), bi AS (
               |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
               |), reach(node, r) AS (
               |  SELECT src, dst FROM bi
               |  UNION
               |  SELECT reach.node, bi.dst FROM reach JOIN bi ON reach.r = bi.src
               |)
               |SELECT node AS doc_id, LEAST(node, MIN(r)) AS comp_id
               |FROM reach GROUP BY node
               |ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    graft.functions.TextFunctions.ensureRegistered(spark)
    // discovery join is physically keyed on (lang, n_chars/20 bucket) with
    // the probe side exploded to its 3 adjacent buckets — the same salting
    // every other blocked pair op uses. Joining on lang alone puts each
    // language's FULL quadratic pair set on one task (5 keys for the whole
    // corpus); the bucket key spreads it. The oracle states only the
    // logical predicate — blocking is plan, not semantics.
    // cached: both self-join legs read the tokenized+sorted frame, and
    // tokenize+sort is the per-doc linear cost worth paying exactly once
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"),
        floor(col("n_chars") / 20).as("bucket"))
      .cache()
    val a = t.select(col("doc_id").as("src"), col("lang"),
      col("n_chars").as("nc_a"), col("toks").as("toks_a"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = t.select(col("doc_id").as("dst"), col("lang"),
      col("n_chars").as("nc_b"), col("toks").as("toks_b"), col("bucket"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    // length-ratio prune ahead of the per-pair intersect: jaccard(A,B) ≤
    // min(|A|,|B|)/max(|A|,|B|), so a pair can only reach the 0.5 keep
    // threshold when the smaller set is ≥ ~half the larger — a codegen'd
    // int compare that skips the O(|toks|) merge for size-skewed pairs
    // (slack 1e-4 covers the round(…,4) boundary, as in dedup_minhash_lsh)
    val edges = a.join(b, Seq("lang", "bucket"))
      .where(col("src") < col("dst")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20)
        && least(size(col("toks_a")), size(col("toks_b")))
           >= greatest(size(col("toks_a")), size(col("toks_b"))) * (0.5 - 1e-4))
      .where(round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4)
        >= 0.5)
      .select(col("src"), col("dst"))
    // materialize the (small) edge list once: every propagation round
    // re-reads it, and without the checkpoint each round would re-run
    // the quadratic discovery join
    ccLabels(edges)
      .select(col("node").as("doc_id"), col("comp").as("comp_id"))
      .orderBy(col("doc_id"))
  }

  /** Min-label connected components over a one-directional edge list
    * (src, dst) — returns (node, comp) where comp is the component's
    * minimum node id. Shared by the exact ([[clusterCc]]) and
    * candidate-driven ([[clusterLsh]]) clustering entries.
    *
    * Shape: label propagation (adopt the min label across edges) +
    * pointer jumping (comp := comp's comp), three iterations per
    * materialization, with EDGE CONTRACTION between rounds — every edge
    * is rewritten through the current labeling and intra-cluster edges
    * drop. Connectivity of the quotient is exactly the original's
    * (labels only merge connected nodes; an inter-cluster edge survives
    * as an edge between the clusters' current representatives), and the
    * propagation joins run on the CONTRACTED list from round 2 on. This
    * is what survives 100 TB: the measured sf0.1 near-dup graph starts
    * at 390k directed edges over 4.8k nodes (dense near-clique blobs)
    * and collapses to a few hundred after one round — without
    * contraction every round re-joins the full original edge list. */
  /** Materialization primitive for the propagation loop. Default is
    * `localCheckpoint` (executor-local blocks — fastest, fine in local
    * mode and for ephemeral jobs). Setting `graft.cc.checkpointDir` on
    * the session switches every loop materialization to RELIABLE
    * `checkpoint` into that directory — the 100-TB fault-tolerance
    * story: executor loss mid-propagation replays from the checkpoint
    * files instead of losing the (lineage-truncated) blocks for good. */
  private def ccCheckpoint(df: org.apache.spark.sql.DataFrame,
      eager: Boolean = true): org.apache.spark.sql.DataFrame = {
    val dir = df.sparkSession.conf.get("graft.cc.checkpointDir", "")
    if (dir.isEmpty) df.localCheckpoint(eager)
    else {
      val sc = df.sparkSession.sparkContext
      // getCheckpointDir returns the QUALIFIED uri (file:/…), so compare
      // by containment rather than equality before re-setting
      if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
      // reliable checkpoint runs a SEPARATE write job — persist first so
      // that job reads cached blocks instead of recomputing the lineage
      // (the standard persist-before-checkpoint idiom)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.checkpoint(eager)
    }
  }

  private[graft] def ccLabels(edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var bi = ccCheckpoint(edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = ccCheckpoint(bi.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp")))
    var converged = false
    var rounds = 0
    val maxRounds = 25 // O(log diameter) with compression; 25 is far past any real corpus
    // iterations fused per materialization: each fused step is 2 joins of
    // plan depth but ZERO extra driver actions, and the serialized
    // action-per-round loop is the latency lever at scale — deeper fusion
    // trades plan size for fewer materializations (VERDICT r11 #3 knob)
    val fuse = edges.sparkSession.conf.get("graft.cc.fuse", "3").toInt
    require(fuse >= 1 && fuse <= 10, s"graft.cc.fuse=$fuse out of [1,10]")
    def iterate(cur: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val viaEdge = bi.join(cur, bi("src") === cur("node"))
        .select(bi("dst").as("node"), col("comp"))
      val prop = cur.unionByName(viaEdge)
        .groupBy("node").agg(min("comp").as("comp"))
      val parent = prop.select(col("node").as("p_node"), col("comp").as("p_comp"))
      prop.join(parent, col("comp") === col("p_node"))
        .select(col("node"), col("p_comp").as("comp"))
    }
    // Convergence via the monotone invariant instead of a diff join:
    // min-propagation only ever DECREASES a node's comp, so sum(comp) is
    // strictly decreasing until the fixpoint and equal exactly there —
    // one narrow agg job per round replaces a two-sided join + isEmpty.
    // (Headroom: sum of node ids; at 2^63 that allows ~2^43 nodes with
    // 2^20-sized ids — revisit only for synthetic id spaces near Long.Max.)
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(col("comp")).cast("long"), lit(0L))).head.getLong(0)
    // EXACTLY two driver actions per round — the serialized
    // action-per-round driver loop is the variance lever at scale:
    //  1. labelSum over the LAZILY-checkpointed propagation result: the
    //     one agg job both materializes the round's labels (blocks are
    //     captured as they compute) and returns the convergence sum — the
    //     old separate eager-checkpoint + sum pair, fused.
    //  2. the eager checkpoint of the contracted edge list. Eager is
    //     deliberate here: the NEXT round's propagation references the
    //     edges three times in one plan, and a lazy checkpoint would let
    //     all three references recompute the contraction join inside that
    //     job (measured 1.7-2x slower end-to-end on dedup_cluster_lsh).
    // Plus one TRIVIAL probe: isEmpty over the blocks action 2 just
    // materialized (reads one cached partition, no recompute). It is kept
    // because dropping it costs a full extra propagation round of pure
    // stage overhead before the sum invariant notices the fixpoint —
    // measured ~25% slower end-to-end than the ~free probe.
    // Sentinel start instead of labelSum(labels): the initial sum's only
    // job was detecting a round-1 fixpoint, which the contraction isEmpty
    // probe below catches anyway — dropping it saves one driver action
    // per entry invocation (labels' sum of non-negative ids can never
    // equal MinValue, so round 1 always proceeds to the probe).
    var prevSum = Long.MinValue
    while (!converged && rounds < maxRounds) {
      val next = ccCheckpoint(
        (1 to fuse).foldLeft(labels)((c, _) => iterate(c)), eager = false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      rounds += 1
      if (!converged) {
        val lsrc = labels.select(col("node").as("src"), col("comp").as("csrc"))
        val ldst = labels.select(col("node").as("dst"), col("comp").as("cdst"))
        bi = ccCheckpoint(bi.join(lsrc, "src").join(ldst, "dst")
          .where(col("csrc") =!= col("cdst"))
          .select(col("csrc").as("src"), col("cdst").as("dst"))
          .distinct())
        converged = bi.isEmpty // no inter-cluster edges ⇒ fixpoint reached
      }
    }
    if (edges.sparkSession.conf.get("graft.cc.debug", "false").toBoolean)
      System.err.println(s"[ccLabels] rounds=$rounds (fuse=$fuse)")
    labels
  }

  /** Candidate-driven twin of [[clusterCc]] — the 100-TB clustering path.
    * The exact entry's edge DISCOVERY is a blocked self-join (quadratic
    * per bucket); this form generates CHAIN candidates: min-hash
    * signatures per distinct token set, banded per MEMBER with lang in
    * the bucket key (the exact edge predicate requires lang equality, so
    * partitioning on it is lossless), then link each member only to the
    * next 1-2 members of a per-band order within its (band, bucket, lang)
    * — ≤ 2(m-1) candidate edges per bucket instead of m(m-1)/2, LINEAR at
    * any bucket size, so dense true clusters (69% of this corpus's rep
    * pairs exceed j=0.5) need no bucket cap and no quadratic join. Chain
    * candidates are verified with the FULL exact edge predicate (±20
    * chars + Jaccard ≥ 0.5) and fed to the SAME [[ccLabels]] propagation;
    * identical-token-set members add their predicate-filtered clone pairs
    * directly. For CONNECTIVITY — unlike pair ENUMERATION (see
    * dedup_minhash_lsh) — chains suffice; the design points that each
    * bought ~5-10 recall points (measured):
    *  - r=2 banding: single-hash buckets here hold most of the corpus and
    *    a chain rarely lands a specific cut edge adjacent; 2-hash keys
    *    shrink buckets to genuinely-similar groups while a j≥0.5 pair
    *    still shares ≥1 of 16 buckets with P = 1-(1-j²)^16 ≥ 0.99.
    *  - band-salted chain order: one fixed order repeats the same broken
    *    chain in every band; 16 independent orders make a similar pair
    *    adjacent somewhere with near-certainty.
    *  - phase-shifted nc bins on alternating bands: a ±20-close pair
    *    split by a bin boundary in even bands shares a bin in odd bands.
    * Precision 1.0 structurally (every edge is verified, so every LSH
    * cluster is a sub-cluster of an exact cluster — zero refinement
    * violations at any sf); co-clustered-pair recall measured 1.0 /
    * 0.991 / 0.978 at sf0.001/0.01/0.1, floor ≥ 0.9 pinned in CcSpec.
    * No oracle (xxhash64 banding is not DuckDB-reproducible). */
  private val clusterLsh = CatalogEntry.noOracle("dedup_cluster_lsh") { (spark, sfDir) =>
    // r=2 banding (not the twins' shared r=1 conf): on this corpus 69% of
    // rep pairs exceed j=0.5, so single-hash buckets hold most of the
    // corpus and a chain rarely lands a specific CUT edge adjacent. Two
    // hashes per bucket key shrink buckets to genuinely-similar groups
    // (chain adjacency ∝ 1/bucket size) while P(a j≥0.5 pair shares ANY
    // of 16 buckets) = 1-(1-j²)^16 ≥ 0.99 keeps per-edge recall high.
    val bands = 16
    val rowsPerBand = 2
    val nHashes = bands * rowsPerBand
    graft.functions.TextFunctions.ensureRegistered(spark)
    // fp as 16-BYTE BINARY, not the 32-char hex string (r15 100× leg:
    // fp rides every banded row, both sides of every candidate pair, and
    // the cand DISTINCT key — the hex spelling tripled those shuffle
    // bytes). Still the full 128-bit md5: clone identity never rides a
    // truncated hash. htoks = per-token xxhash64, sorted — the verify
    // payload at 8 B/token instead of full UTF8 tokens (see
    // SortedIntersectSizeLong for the collision arithmetic).
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("fp", expr("to_binary(md5(array_join(toks, ' ')), 'hex')"))
      .withColumn("htoks", expr("array_sort(transform(toks, tk -> xxhash64(tk)))"))
      .cache()
    val members = t.select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
    val reps = t.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
      .join(t.select(col("doc_id").as("rep_id"), col("toks"), col("htoks")), "rep_id")
    // one signature per distinct token set; banding fans out per member
    val minExprs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = reps.select(col("fp"), explode(col("toks")).as("s"))
      .groupBy(col("fp")).agg(minExprs.head, minExprs.tail: _*)
    val banded = members.join(sig, "fp").select(
      col("fp"), col("doc_id"), col("lang"), col("n_chars"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}"))): _*)): _*)).as(Seq("band", "bucket")))
    // chain + skip-level candidates: lead(1) links neighbors, lead(2)
    // bridges a single dissimilar interloper sitting between two similar
    // docs (the dominant recall loss of pure chains — measured 0.84 pair
    // recall with lead(1) alone at sf0.1). Still ≤ 2(m-1) candidates per
    // bucket — linear, unlike the m(m-1)/2 full expansion.
    // Chain order = (nc/20 bin, band-salted hash): the hash makes each
    // band contribute DIFFERENT adjacencies inside a bin — with one fixed
    // order every band repeats the same broken chain around the same
    // interlopers (measured: recall stuck at 0.87 with nc order); with 16
    // independent orders a similar pair is adjacent in some band with
    // near-certainty (union of 16 random chains over a bin ≈ connected
    // random graph). The nc bin keeps candidates ±20-plausible; the pair
    // filter below enforces the exact bound.
    // alternating bands use phase-shifted nc bins (+10): a ±20-close pair
    // split by a bin boundary in even bands shares a bin in odd bands
    val ncBin = floor((col("n_chars") + pmod(col("band"), lit(2)) * 10) / 20)
    val chainW = Window.partitionBy(col("band"), col("bucket"), col("lang"))
      .orderBy(ncBin, xxhash64(col("band"), col("doc_id")), col("doc_id"))
    // ONE window op computes pos + both lead levels (the per-k branches
    // paid the bucket sort twice); the cached adjacency stream feeds the
    // candidate set AND the r14 segment-contraction pre-pass below
    val adj = banded
      .select(col("band"), col("bucket"), col("lang"),
        row_number().over(chainW).as("pos"),
        col("doc_id"), col("fp"), col("n_chars"),
        lead(col("doc_id"), 1).over(chainW).as("n1id"),
        lead(col("fp"), 1).over(chainW).as("n1fp"),
        lead(col("n_chars"), 1).over(chainW).as("n1nc"),
        lead(col("doc_id"), 2).over(chainW).as("n2id"),
        lead(col("fp"), 2).over(chainW).as("n2fp"),
        lead(col("n_chars"), 2).over(chainW).as("n2nc"))
    // cache only pays when the contraction pre-pass re-scans the stream
    if (graft.GraftConf.dedupStarContraction(spark)) adj.cache()
    val cand = adj
      .select(col("doc_id"), col("fp"), col("n_chars"), explode(array(
        struct(col("n1id").as("nid"), col("n1fp").as("nfp"), col("n1nc").as("nnc")),
        struct(col("n2id").as("nid"), col("n2fp").as("nfp"), col("n2nc").as("nnc")))).as("nx"))
      .where(col("nx.nid").isNotNull
        && col("nx.nnc").between(col("n_chars") - 20, col("n_chars") + 20))
      .select(least(col("doc_id"), col("nx.nid")).as("src"),
        greatest(col("doc_id"), col("nx.nid")).as("dst"),
        least(col("fp"), col("nx.nfp")).as("fa"),
        greatest(col("fp"), col("nx.nfp")).as("fb"))
      .distinct()
    val ga = reps.select(col("fp").as("fa"), col("htoks").as("toks_a"))
    val gb = reps.select(col("fp").as("fb"), col("htoks").as("toks_b"))
    val inter = expr("sorted_intersect_size_l(toks_a, toks_b)")
    val contraction = graft.GraftConf.dedupStarContraction(spark)
    // Verify at REP granularity, not per doc pair (r14 ProfileClusterLsh:
    // 108k doc-pair candidates at sf0.1 carry far fewer DISTINCT (fa, fb)
    // token-set pairs — clone-heavy corpora re-ran the same O(|toks|)
    // intersect once per clone adjacency, and the Jaccard predicate
    // depends ONLY on the token sets). Identical fps are Jaccard 1.0 by
    // construction and skip the intersect entirely. Doc pairs then join
    // back on the verified fp-pair set — predicate-identical output, cost
    // ∝ distinct rep pairs (at 100 TB, the ratio is the clone depth).
    val fpOk = {
      val fpCand = cand.select(col("fa"), col("fb")).distinct()
      fpCand.where(col("fa") === col("fb"))
        .unionByName(fpCand.where(col("fa") =!= col("fb"))
          .join(ga, "fa").join(gb, "fb")
          .where(round(inter * 1.0 /
            (size(col("toks_a")) + size(col("toks_b")) - inter), 4) >= 0.5)
          .select(col("fa"), col("fb")))
    }
    // with the pre-pass on, cached: feeds the contraction's ok1 probe AND
    // the edge union — without it the rep-level verify would run twice
    val chainEdges = {
      val e = cand.join(fpOk, Seq("fa", "fb")).select(col("src"), col("dst"))
      if (contraction) e.cache() else e
    }
    // segment-contraction pre-pass ([[segmentStarEdges]], same rationale
    // as dedup_minhash_lsh): collapse verified chain runs to stars so
    // ccLabels converges in fewer serialized rounds.
    val star = if (!contraction) chainEdges.limit(0) else segmentStarEdges(
      adj.select(lit(0).as("salt"), col("band"),
        // chain partition here is (band, bucket, lang) — fold lang into
        // the bucket key to fit the helper's (salt, band, bucket) shape.
        // lang must be null-proofed: concat null-propagates, and a NULL
        // folded key would merge EVERY bucket of a band into one window
        // partition with duplicate pos values — nondeterministic tie order
        // could then emit star edges between unverified nodes, breaking
        // the output-identical invariant on null-lang corpora
        concat(col("bucket"), lit("#"), coalesce(col("lang"), lit("\u0000"))).as("bucket"),
        col("pos"), col("doc_id").as("node"), col("n1id").as("n1node")),
      chainEdges.select(col("src").as("a"), col("dst").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    // clone members (identical token set ⇒ jaccard exactly 1.0) connect
    // directly wherever the lang/±20 predicate holds — recall 1.0, no LSH.
    // CHAIN spelling, not all-pairs (r18 cliff 8, found by the clique
    // canary: the fp-keyed self-join emitted C(m,2) edges per clone group
    // — max node row mass grew n^1.58 on the clique fixture, 3× per depth
    // doubling). For CONNECTIVITY the sorted chain is exact, not an
    // approximation: the predicate inside a (fp, lang) group is an
    // INTERVAL on n_chars, and for points on a line any |a-c| ≤ 20 pair
    // with b between them has both consecutive gaps ≤ 20 — so
    // consecutive-neighbor edges (sorted by n_chars) induce EXACTLY the
    // all-pairs threshold graph's connected components, at m-1 edges per
    // group instead of C(m,2). CcSpec's cluster floors and the A/B hash
    // pin output equality.
    val cloneW = Window.partitionBy(col("fp"), col("lang"))
      .orderBy(col("nc_a"), col("src"))
    val intra = members
      .select(col("fp"), col("lang"), col("doc_id").as("src"), col("n_chars").as("nc_a"))
      // the all-pairs spelling's lang_a === lang_b was null-rejecting;
      // the window would GROUP null langs — keep the join semantics
      .where(col("lang").isNotNull)
      .withColumn("dst", lead(col("src"), 1).over(cloneW))
      .withColumn("nc_b", lead(col("nc_a"), 1).over(cloneW))
      .where(col("dst").isNotNull
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
    ccLabels(intra.unionByName(chainEdges).unionByName(star).distinct())
      .select(col("node").as("doc_id"), col("comp").as("comp_id"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction: extract-and-mask over a deterministic contact blob.
    * The synthetic corpus carries no natural PII, so the blob is built
    * from customer columns with the SAME expression in Spark and the
    * oracle — what's under test is the redaction machinery
    * (regexp_extract_all counts + chained regexp_replace masking), not
    * the data. Patterns avoid backslash classes ([0-9], not \d) because
    * Spark SQL string literals process backslash escapes while DuckDB's
    * do not; DuckDB's regexp_replace masks only the first match unless
    * given the 'g' flag, hence the dialect split. Pure per-row codegen'd
    * projection — embarrassingly parallel at any scale. */
  private val piiRedact = CatalogEntry.dialect(
    "text_pii_redact",
    duckdb = """WITH blob AS (
               |  SELECT c_custkey,
               |         'contact ' || c_name || ' ph ' ||
               |         lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-' ||
               |         lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
               |         lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') ||
               |         CASE WHEN c_custkey % 3 = 0
               |              THEN ' alt 800-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               |              ELSE '' END ||
               |         ' mail cust' || CAST(c_custkey AS VARCHAR) || '@example.com seg ' ||
               |         c_mktsegment AS s
               |  FROM customer
               |)
               |SELECT c_custkey,
               |       CAST(len(regexp_extract_all(s, '[a-z0-9]+@[a-z0-9]+[.][a-z]+')) AS BIGINT) AS n_emails,
               |       CAST(len(regexp_extract_all(s, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
               |       regexp_replace(regexp_replace(s, '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '[EMAIL]', 'g'),
               |                      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
               |FROM blob
               |ORDER BY c_custkey""".stripMargin,
    spark = """WITH blob AS (
              |  SELECT c_custkey,
              |         'contact ' || c_name || ' ph ' ||
              |         lpad(CAST(c_custkey % 900 + 100 AS STRING), 3, '0') || '-' ||
              |         lpad(CAST((c_custkey * 7) % 1000 AS STRING), 3, '0') || '-' ||
              |         lpad(CAST((c_custkey * 13) % 10000 AS STRING), 4, '0') ||
              |         CASE WHEN c_custkey % 3 = 0
              |              THEN ' alt 800-555-' || lpad(CAST(c_custkey % 10000 AS STRING), 4, '0')
              |              ELSE '' END ||
              |         ' mail cust' || CAST(c_custkey AS STRING) || '@example.com seg ' ||
              |         c_mktsegment AS s
              |  FROM customer
              |)
              |SELECT c_custkey,
              |       CAST(size(regexp_extract_all(s, '[a-z0-9]+@[a-z0-9]+[.][a-z]+', 0)) AS BIGINT) AS n_emails,
              |       CAST(size(regexp_extract_all(s, '[0-9]{3}-[0-9]{3}-[0-9]{4}', 0)) AS BIGINT) AS n_phones,
              |       regexp_replace(regexp_replace(s, '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '[EMAIL]'),
              |                      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]') AS redacted
              |FROM blob
              |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val emailPat = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val phonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val blob = concat(
      lit("contact "), col("c_name"), lit(" ph "),
      lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"),
      when(col("c_custkey") % 3 === 0,
        concat(lit(" alt 800-555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      lit(" mail cust"), col("c_custkey").cast("string"),
      lit("@example.com seg "), col("c_mktsegment"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), blob.as("s"))
      .select(col("c_custkey"),
        size(expr(s"regexp_extract_all(s, '$emailPat', 0)")).cast("long").as("n_emails"),
        size(expr(s"regexp_extract_all(s, '$phonePat', 0)")).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("s"), emailPat, "[EMAIL]"),
          phonePat, "[PHONE]").as("redacted"))
      .orderBy(col("c_custkey"))
  }

  /** Corpus-level inverse document frequency: the 20 rarest tokens by
    * idf = ln(N/df) with df = number of docs containing the token. Two
    * aggregations and a broadcast of the single-row corpus count — no
    * driver-side collect. */
  private val idfTopterms = CatalogEntry.dialect(
    "text_idf_topterms",
    duckdb = """WITH d AS (
               |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
               |  FROM documents
               |), dfreq AS (
               |  SELECT token, COUNT(*) AS df FROM d GROUP BY token
               |), n AS (SELECT COUNT(*) AS n FROM documents)
               |SELECT token, CAST(df AS BIGINT) AS df,
               |       ROUND(ln(n * CAST(1.0 AS DOUBLE) / df), 4) AS idf
               |FROM dfreq, n
               |ORDER BY idf DESC, token
               |LIMIT 20""".stripMargin,
    spark = """WITH d AS (
              |  SELECT doc_id, explode(array_distinct(split(text, ' '))) AS token
              |  FROM documents
              |), dfreq AS (
              |  SELECT token, COUNT(*) AS df FROM d GROUP BY token
              |), n AS (SELECT COUNT(*) AS n FROM documents)
              |SELECT token, CAST(df AS BIGINT) AS df,
              |       ROUND(ln(n * CAST(1.0 AS DOUBLE) / df), 4) AS idf
              |FROM dfreq, n
              |ORDER BY idf DESC, token
              |LIMIT 20""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
    val nDf = docs.agg(count(lit(1)).as("n"))
    docs.select(explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDf))
      .select(col("token"), col("df").cast("long").as("df"),
        round(log(col("n") * lit(1.0) / col("df")), 4).as("idf"))
      .orderBy(col("idf").desc, col("token"))
      .limit(20)
  }

  /** Cross-document duplicated-span detection — the "exact substring dedup"
    * of LLM training pipelines (suffix-array dedup's hashed cousin): every
    * token 8-gram is a span fingerprint, a span occurring in ≥2 DISTINCT
    * documents is duplicated text, and each document reports how much of it
    * is made of such spans. Distinct from `text_repetition_filter` (which
    * measures repetition WITHIN a doc) — this finds text copied ACROSS docs
    * without pairing them.
    *
    * Scale design: no self-join anywhere — the span stream shuffles once
    * keyed by the gram (inverted doc-frequency count, map-side combined)
    * and once keyed by doc_id for the roll-up, both LINEAR in corpus
    * tokens. At 100 TB the gram string becomes a 128-bit hash and the
    * duplicated-gram set ships as a broadcast bloom filter so the roll-up
    * join disappears; the string form here keeps the DuckDB oracle exact. */
  private val exactSubstring = CatalogEntry.dialect(
    "dedup_exact_substring",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               |), g AS (
               |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
               |                 i -> array_to_string(toks[i:i+7], '_'))) AS g
               |  FROM tok WHERE len(toks) >= 8
               |), nd AS (
               |  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY g
               |)
               |SELECT g.doc_id,
               |       COUNT(*) AS n_spans,
               |       CAST(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
               |       ROUND(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) * CAST(1.0 AS DOUBLE)
               |             / COUNT(*), 4) AS dup_frac
               |FROM g JOIN nd USING (g)
               |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, split(text, ' ') AS toks FROM documents
              |), g AS (
              |  SELECT doc_id, explode(transform(sequence(1, size(toks) - 7),
              |                 i -> array_join(slice(toks, i, 8), '_'))) AS g
              |  FROM tok WHERE size(toks) >= 8
              |), nd AS (
              |  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY g
              |)
              |SELECT g.doc_id,
              |       COUNT(*) AS n_spans,
              |       CAST(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
              |       ROUND(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) * CAST(1.0 AS DOUBLE)
              |             / COUNT(*), 4) AS dup_frac
              |FROM g JOIN nd USING (g)
              |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (spark, sfDir) =>
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), '_'))"))
        .as("g"))
    val nd = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    grams.join(nd, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        round(col("dup_spans") * lit(1.0) / col("n_spans"), 4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-unigram language-model scoring — the perplexity-proxy quality
    * filter: p(token) is its corpus frequency, a doc's score is its mean
    * token log-probability (higher = more typical of the corpus; strongly
    * atypical docs are filter candidates). Two token-keyed aggregations,
    * one token-keyed join and a 1-row broadcast — linear, no self-join.
    *
    * Determinism: the per-doc mean folds a token-SORTED list (plain SUM
    * over doubles drifts in the low bits with partition count); the oracle
    * sums in DuckDB's order — both land on the same round(…,4) value, same
    * class as `text_idf_topterms`'s ln. */
  private val unigramLogprob = CatalogEntry.dialect(
    "text_unigram_logprob",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
               |), cnt AS (
               |  SELECT t, COUNT(*) AS c FROM tok GROUP BY t
               |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
               |dt AS (
               |  SELECT doc_id, t, COUNT(*) AS dc FROM tok GROUP BY doc_id, t
               |)
               |SELECT dt.doc_id,
               |       CAST(SUM(dt.dc) AS BIGINT) AS n_tokens,
               |       ROUND(SUM(dt.dc * ln(cnt.c * CAST(1.0 AS DOUBLE) / tot.s))
               |             / SUM(dt.dc), 4) AS avg_logprob
               |FROM dt JOIN cnt USING (t) CROSS JOIN tot
               |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, explode(split(text, ' ')) AS t FROM documents
              |), cnt AS (
              |  SELECT t, COUNT(*) AS c FROM tok GROUP BY t
              |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
              |dt AS (
              |  SELECT doc_id, t, COUNT(*) AS dc FROM tok GROUP BY doc_id, t
              |)
              |SELECT dt.doc_id,
              |       CAST(SUM(dt.dc) AS BIGINT) AS n_tokens,
              |       ROUND(SUM(dt.dc * ln(cnt.c * CAST(1.0 AS DOUBLE) / tot.s))
              |             / SUM(dt.dc), 4) AS avg_logprob
              |FROM dt JOIN cnt USING (t) CROSS JOIN tot
              |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin) { (spark, sfDir) =>
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val cnt = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("s"))
    val dt = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("dc"))
    dt.join(cnt, "t").crossJoin(broadcast(tot))
      .select(col("doc_id"), col("t"), col("dc"),
        (col("dc") * log(col("c") * lit(1.0) / col("s"))).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(col("dc")).as("n_tokens"),
        collect_list(struct(col("t"), col("v"))).as("xs"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(transform(array_sort(col("xs")), e => e.getField("v")),
          lit(0.0), (a, x) => a + x) / col("n_tokens"), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** One-sided containment dedup (the RefinedWeb/CCNet "subset document"
    * case Jaccard misses): containment(a→b) = |A∩B| / |A| over distinct
    * token sets — a short doc fully quoted inside a longer one scores 1.0
    * there while its Jaccard stays low. Per-doc roll-up (how many other
    * same-lang docs contain ≥95% / 100% of this doc's vocabulary) keeps
    * the output linear in the corpus. All-integer ratios — no ln, no
    * cross-engine ulp risk.
    *
    * r19 rewrite (VERDICT r18 #1, output bit-identical, oracle re-PASS at
    * both SFs — A/B in BASELINE.md):
    *
    *  1. IMPLIED LENGTH PRUNE, mirrored in the oracle: a pair can only
    *     satisfy the weaker CASE predicate (inter/|A| ≥ 0.95) if
    *     |B| ≥ 0.95·|A|, because inter ≤ |B| and x ↦ x/|A| is monotone in
    *     double arithmetic; superset pairs (inter = |A| ⇒ |B| ≥ |A|)
    *     satisfy it a fortiori. Pruned pairs contributed 0 to both sums,
    *     and every doc keeps its self pair (ratio exactly 1.0; for a
    *     null-text doc the prune is NULL, so the oracle OR-guards the
    *     self pair and the engine left-joins with coalesce-to-0 — the
    *     pre-r19 contract emitted (0,0) for null-text docs and that is
    *     preserved), so no GROUP disappears.
    *  2. CANONICALIZE-FIRST over DISTINCT (lang, token-set) — the
    *     `DistinctValue.valueCounts` pattern, rolled up by count algebra
    *     instead of fan-out. For a doc a in clone group (m_a members,
    *     set A): its pair sum over docs regroups by the partner's rep,
    *       n_supersets(a)  = Σ_{reps B: A ⊆ B}            w(B)
    *       n_containers(a) = Σ_{reps B: |A∩B|/|A| ≥ 0.95} w(B)
    *     with w(A) = m_a − 1 (its clones — the self-rep pair always
    *     passes both predicates) and w(B ≠ A) = m_B. The pair join drops
    *     from |docs|² to |reps|² per lang — on the ~40-word-vocabulary
    *     corpus reps ≪ docs at every SF. Reps are grouped/joined on the
    *     raw (lang, toks) key: exact, no fingerprint-collision caveat
    *     (at 100 TB you would fp-key the reps the way
    *     `dedup_containment_prefix` does and carry this entry's count
    *     algebra unchanged).
    *  3. ADAPTIVE BITMASK ENCODING ([[tokenMasks]]): on a ≤64-token
    *     global vocabulary (this corpus: 31 at every SF) the sets ride as
    *     exact 64-bit masks and |A∩B| is one bit_count — the general
    *     sorted-array path remains for wider vocabularies and is pinned
    *     output-equal by BitmaskPathSpec.
    *
    * Scale design: lang-only blocking is deliberately the WORST case among
    * the blocked entries (containment cannot length-band symmetrically:
    * the contained doc is shorter by definition — the one-sided 0.95
    * prune above is all the predicate implies). The reps side is salted
    * ×8 so the few big lang blocks spread across the cluster; at 100 TB
    * candidates come from `dedup_minhash_lsh` banding on the SHORTER
    * side's shingles and this becomes a per-candidate verify, same as the
    * jaccard twins. */
  private val containment = CatalogEntry.dialect(
    "dedup_containment",
    duckdb = """WITH t AS (
               |  SELECT doc_id, lang,
               |         list_sort(list_distinct(string_split(text, ' '))) AS toks
               |  FROM documents
               |)
               |SELECT a.doc_id,
               |       CAST(SUM(CASE WHEN b.doc_id <> a.doc_id
               |                      AND len(list_intersect(a.toks, b.toks)) = len(a.toks)
               |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_supersets,
               |       CAST(SUM(CASE WHEN b.doc_id <> a.doc_id
               |                      AND len(list_intersect(a.toks, b.toks)) * CAST(1.0 AS DOUBLE)
               |                          / len(a.toks) >= 0.95
               |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_containers
               |FROM t a JOIN t b ON a.lang = b.lang
               | AND (a.doc_id = b.doc_id
               |      OR len(b.toks) * CAST(1.0 AS DOUBLE) / len(a.toks) >= 0.95)
               |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, lang,
              |         sort_array(array_distinct(split(text, ' '))) AS toks
              |  FROM documents
              |)
              |SELECT a.doc_id,
              |       CAST(SUM(CASE WHEN b.doc_id <> a.doc_id
              |                      AND size(array_intersect(a.toks, b.toks)) = size(a.toks)
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_supersets,
              |       CAST(SUM(CASE WHEN b.doc_id <> a.doc_id
              |                      AND size(array_intersect(a.toks, b.toks)) * CAST(1.0 AS DOUBLE)
              |                          / size(a.toks) >= 0.95
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_containers
              |FROM t a JOIN t b ON a.lang = b.lang
              | AND (a.doc_id = b.doc_id
              |      OR size(b.toks) * CAST(1.0 AS DOUBLE) / size(a.toks) >= 0.95)
              |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin) { (spark, sfDir) =>
    // bitmask fast path (see [[tokenMasks]]): reps collapse to
    // (lang, 64-bit mask, clone count), the pair join shuffles two longs
    // per row, and both CASE predicates read bit_count(mask_a & mask_b) —
    // the same integers the array spelling computes
    tokenMasks(spark, sfDir).map { masks =>
      val salts = 8
      val reps = masks.groupBy(col("lang"), col("mask")).agg(count(lit(1)).as("m"))
        .withColumn("n", expr("bit_count(mask)"))
      val ra = reps.select(col("lang"), col("mask").as("mask_a"),
          col("m").as("m_a"), col("n").as("n_a"))
        .withColumn("salt", pmod(col("mask_a"), lit(salts)))
      val rb = reps.select(col("lang"), col("mask").as("mask_b"),
          col("m").as("m_b"), col("n").as("n_b"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      val repCounts = ra.join(rb, Seq("lang", "salt"))
        .where(col("n_b") * lit(1.0) / col("n_a") >= 0.95) // implied length prune
        .withColumn("inter", expr("bit_count(mask_a & mask_b)"))
        .withColumn("w", when(col("mask_a") === col("mask_b"), col("m_b") - 1)
          .otherwise(col("m_b")))
        .groupBy(col("lang"), col("mask_a"))
        .agg(
          sum(when(col("inter") === col("n_a"), col("w")).otherwise(0L)).as("n_supersets"),
          sum(when(col("inter") * lit(1.0) / col("n_a") >= 0.95, col("w")).otherwise(0L))
            .as("n_containers"))
        .withColumnRenamed("mask_a", "mask")
      // LEFT join + coalesce: a null-text doc has a NULL mask (no rep row
      // survives the prune), and the pre-r19 contract emits (0,0) for it;
      // a null-LANG doc never joins in the oracle and stays dropped
      masks.where(col("lang").isNotNull)
        .join(repCounts, Seq("lang", "mask"), "left")
        .select(col("doc_id"),
          coalesce(col("n_supersets"), lit(0L)).as("n_supersets"),
          coalesce(col("n_containers"), lit(0L)).as("n_containers"))
        .orderBy(col("doc_id"))
    }.getOrElse(containmentGeneral(spark, sfDir))
  }

  /** General (>64-vocab) path of [[containment]] — identical count
    * algebra over DISTINCT (lang, sorted-token-array) reps with the
    * native sorted-merge intersect; BitmaskPathSpec pins it output-equal
    * to the mask path. */
  private[graft] def containmentGeneral(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val salts = 8
    val t = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"),
      sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val reps = t.groupBy(col("lang"), col("toks")).agg(count(lit(1)).as("m"))
      .withColumn("n", size(col("toks")))
    val ra = reps.select(col("lang"), col("toks").as("toks_a"),
        col("m").as("m_a"), col("n").as("n_a"))
      .withColumn("salt", pmod(xxhash64(col("toks_a")), lit(salts)))
    val rb = reps.select(col("lang"), col("toks").as("toks_b"),
        col("m").as("m_b"), col("n").as("n_b"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val repCounts = ra.join(rb, Seq("lang", "salt"))
      .where(col("n_b") * lit(1.0) / col("n_a") >= 0.95) // implied length prune
      .withColumn("inter", expr("sorted_intersect_size(toks_a, toks_b)"))
      // self-rep pair (same set — reps are DISTINCT per lang, so array
      // equality identifies it exactly) weighs m−1: the doc's own clones
      .withColumn("w", when(col("toks_a") === col("toks_b"), col("m_b") - 1)
        .otherwise(col("m_b")))
      .groupBy(col("lang"), col("toks_a"))
      .agg(
        sum(when(col("inter") === col("n_a"), col("w")).otherwise(0L)).as("n_supersets"),
        sum(when(col("inter") * lit(1.0) / col("n_a") >= 0.95, col("w")).otherwise(0L))
          .as("n_containers"))
      .withColumnRenamed("toks_a", "toks")
    // LEFT join + coalesce: for non-null docs the join is total (the self
    // pair survives the prune, so every rep has a repCounts row); a
    // null-text doc's NULL toks key matches nothing and gets the
    // pre-r19 contract's (0,0) row; a null-LANG doc never joins in the
    // oracle and stays dropped
    t.where(col("lang").isNotNull)
      .join(repCounts, Seq("lang", "toks"), "left")
      .select(col("doc_id"),
        coalesce(col("n_supersets"), lit(0L)).as("n_supersets"),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"))
      .orderBy(col("doc_id"))
  }

  /** Linear containment dedup — the candidate-driven scale twin of
    * [[containment]] (round 13; the ScaleProof extension measured the
    * blocked form at 14.0× for 10× data).
    *
    * Why a plain banded twin cannot work here (analysis in BASELINE.md):
    * the blocked entry's COUNTS output is verification-bound by the true
    * containment-pair count, which is quadratic in dup-clique depth by
    * definition — on the 10-deep replica corpus every sibling pair
    * really is a ≥0.95 containment. So this twin follows the
    * dedup_minhash_lsh playbook instead:
    *
    *  1. RE-SPECCED LINEAR OUTPUT — `(doc_id, has_container)`: is ≥95%
    *     of this doc's vocabulary contained in some other same-lang doc?
    *     That flag (not the witness count) is what the dedup decision
    *     consumes, and it is linear at any clique depth.
    *  2. CANONICALIZE-FIRST — one rep per (lang, distinct token set);
    *     any member of a ≥2 clone group is contained by its clones
    *     (ratio exactly 1.0) with ZERO pair work.
    *  3. PREFIX-FILTER CANDIDATES (SSJoin/PPJoin family): under a global
    *     rarest-first token order (df asc, token asc), a ≥0.95-contained
    *     set can miss at most ⌊0.05·n⌋ of its own tokens, so at least
    *     one of its ⌊0.05·n⌋+2 rarest tokens must appear in any
    *     container — candidates come from an inverted index over those
    *     prefix tokens only. Stop-tokens (df > verifyMaxBucket) are
    *     dropped from the index as non-discriminative, same rationale as
    *     [[lshCandidates]]'s bucket cap.
    *  4. CAPPED VERIFICATION — ≤ candCap candidates per rep
    *     (`graft.dedup.containment.candCap`, biggest-container-first
    *     deterministic order), then the exact sorted-merge intersect
    *     verify. The cap is what keeps the entry linear where true
    *     witnesses are quadratic; it costs recall only when a doc's
    *     every capped candidate fails while an uncapped one would pass.
    *
    * Precision is structural (every flag is backed by one exact-verified
    * witness or an exact clone); recall vs the blocked ground truth is
    * floor-tested in PropertySpec. No oracle: the capped candidate set
    * makes the flag under-approximate on adversarial corpora by design
    * (the uncapped complete form would re-inherit the quadratic bound
    * the re-spec exists to escape).
    */
  private val containmentPrefix = CatalogEntry.noOracle("dedup_containment_prefix") {
    (spark, sfDir) =>
      graft.functions.TextFunctions.ensureRegistered(spark)
      val theta = 0.95
      val dfCap = graft.GraftConf.verifyMaxBucket(spark)
      val candCap = graft.GraftConf.containmentCandCap(spark)
      // fp is LANG-SCOPED (unlike the minhash family's): the blocked
      // ground truth pairs same-lang only, so a clone group spanning two
      // langs must stay two groups — folding lang into the fingerprint
      // makes fp↔(lang,fp) 1:1 and every later fp-keyed join lang-safe
      // fp must be NULL-PROPAGATING (concat, not concat_ws): concat_ws
      // silently drops a null array_join(toks) for null-text docs, which
      // would collapse every null-text doc of a lang into one "clone"
      // group with has_container=true — diverging from the blocked truth
      // (which never flags them) and from the minhash family's null-fp
      // convention (minhashRepStage's md5(array_join) is null on null text)
      // fp as 16-byte BINARY, not the 32-char hex string (same r15 lesson
      // as dedup_cluster_lsh: fp rides the widest frames and every window
      // partition key — the hex spelling doubles those shuffle bytes)
      val t = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"),
          sort_array(array_distinct(split(col("text"), " "))).as("toks"))
        .withColumn("fp", expr(
          "to_binary(md5(concat(lang, '|', array_join(toks, ' '))), 'hex')"))
        .cache()
      val members = t.select(col("doc_id"), col("lang"), col("fp"))
      // null-fp docs are excluded from the group/rep pipeline entirely —
      // they are not clones of each other; they re-enter at the final
      // left join below as singleton has_container=false rows
      val groups = t.where(col("fp").isNotNull).groupBy(col("lang"), col("fp"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("m"))
      val reps = groups
        .join(t.select(col("doc_id").as("rep_id"), col("toks")), "rep_id")
        .select(col("lang"), col("fp"), col("toks"), size(col("toks")).as("n"))
        .cache()
      // global rarest-first token order: df over REPS per lang. Tokens
      // ride as 64-bit xxhash64(lang, token) keys, never strings: the
      // key only ever JOINS prefix↔index (exact verification reads the
      // full toks arrays later), folding lang into the key makes every
      // downstream key single-column, and a 64-bit collision (odds
      // ~|vocab|²/2⁶⁴) merely merges two posting lists — spurious
      // candidates are removed by the exact verify (which re-checks LANG
      // equality alongside the token containment, so even a cross-lang
      // hk collision whose token sets overlap ≥θ cannot flag a doc the
      // same-lang blocked truth never pairs — ADVICE r18), true matches
      // are always preserved, and the prefix-filter completeness argument
      // holds under ANY consistent global token order (df asc, hk asc
      // here), so correctness is collision-immune.
      val df = reps.select(col("lang"), explode(col("toks")).as("t"))
        .select(xxhash64(col("lang"), col("t")).as("hk"))
        .groupBy(col("hk")).agg(count(lit(1)).as("df"))
      // cached: BOTH the prefix extraction and the inverted index read
      // this frame, and it is the entry's widest intermediate (|reps| ×
      // tokens-per-doc rows) — uncached, Spark recomputes the explode +
      // df join once per reference (~2× the index-build cost, measured
      // r18 at 100×: 116 → 90 s from the cache alone; binary fp + hashed
      // token keys take it further — see BASELINE.md round-18 addendum).
      // Harness sweep owns the unpersist.
      val tok = reps.select(col("fp"), col("n"), col("lang"), explode(col("toks")).as("t"))
        .select(col("fp"), col("n"), xxhash64(col("lang"), col("t")).as("hk"))
        .join(df, Seq("hk"))
        .cache()
      // prefix = the (floor(0.05 n) + 2) rarest tokens per rep, over the
      // FULL token set (+2: +1 pigeonhole, +1 absorbs the double-compare
      // boundary of the verify's inter/n >= 0.95). Never df-filtered: a
      // fully-templated doc whose every token is common must still get
      // candidates (a dropped-prefix variant measured recall 0.68 at
      // sf0.001 - the misses were exactly the all-common-token docs).
      // fp is lang-scoped 1:1, so partitioning by fp alone is lang-safe
      val rankW = Window.partitionBy(col("fp"))
        .orderBy(col("df"), col("hk"))
      val prefix = tok
        .withColumn("r", row_number().over(rankW))
        .where(col("r") <= floor(col("n") * (1 - theta)) + 2)
        .select(col("hk"), col("fp").as("fp_a"), col("n").as("n_a"))
      // inverted index with CAPPED posting lists: each (lang, token)
      // lists at most verifyMaxBucket reps, BIGGEST first (a container
      // must hold >=0.95 of the probe's vocabulary, so large supersets
      // are the likeliest witnesses) - rare-token postings stay complete
      // (pigeonhole bound intact), stop-token postings are truncated
      // rather than dropped, bounding candidates per prefix token while
      // keeping template-heavy docs reachable
      val postW = Window.partitionBy(col("hk"))
        .orderBy(col("n").desc, col("fp"))
      val index = tok
        .withColumn("pr", row_number().over(postW))
        .where(col("pr") <= dfCap)
        .select(col("hk"), col("fp").as("fp_b"), col("n").as("n_b"))
      // candidates: share a prefix token, container at least θ× the size;
      // capped per contained rep, biggest container first (deterministic)
      val capW = Window.partitionBy(col("fp_a"))
        .orderBy(col("n_b").desc, col("fp_b"))
      // size prune epsilon-slackened: the verify compares inter/n_a in
      // double arithmetic, so the prune must not drop a boundary
      // container the verify would keep (n_b >= inter always)
      val cand = prefix.join(index, Seq("hk"))
        .where(col("fp_a") =!= col("fp_b") && col("n_b") >= col("n_a") * (theta - 1e-9))
        .select(col("fp_a"), col("n_a"), col("fp_b"), col("n_b"))
        .distinct()
        .withColumn("rk", row_number().over(capW))
        .where(col("rk") <= candCap)
      val ta = reps.select(col("fp").as("fp_a"), col("lang").as("lang_a"),
        col("toks").as("toks_a"))
      val tb = reps.select(col("fp").as("fp_b"), col("lang").as("lang_b"),
        col("toks").as("toks_b"))
      val inter = expr("sorted_intersect_size(toks_a, toks_b)")
      val contained = cand.join(ta, "fp_a").join(tb, "fp_b")
        .where(col("lang_a") === col("lang_b") && inter * lit(1.0) / col("n_a") >= theta)
        .select(col("fp_a")).distinct()
        .withColumn("hit", lit(true))
      // left join: a null-fp (null-text) member matches no group and no
      // containment hit — coalesce gives it m=1 ⇒ has_container=false,
      // exactly the blocked truth's treatment (it never pairs null text)
      members
        .join(groups.select(col("lang"), col("fp"), col("m")), Seq("lang", "fp"), "left")
        .join(contained.withColumnRenamed("fp_a", "fp"), Seq("fp"), "left")
        .select(col("doc_id"),
          (coalesce(col("m"), lit(1L)) >= 2 ||
            coalesce(col("hit"), lit(false))).as("has_container"))
        .orderBy(col("doc_id"))
  }

  /** The composed training-data filter — what a user of this engine
    * actually RUNS: per-doc length, richness, repetition and near-dup
    * gates evaluated in one pass, each surfaced as its own flag plus the
    * final keep decision (flags, not a bare boolean, because production
    * filter pipelines audit WHY documents drop). Thresholds sit between
    * the corpus deciles so every gate actually discriminates; all ratios
    * are integer/integer doubles — identical on both engines, no ulp risk.
    * Near-dup gate = shingle-fingerprint group representative (md5 of the
    * sorted distinct token set, the `text_fingerprint` key): one hash per
    * doc, one window — the linear first-pass dedup, with the LSH entries
    * as the graded escalation. Scale: two token-keyed aggregations + one
    * fingerprint window, no self-join anywhere. */
  private val corpusFilter = CatalogEntry.dialect(
    "pipeline_corpus_filter",
    duckdb = """WITH cnt AS (
               |  SELECT doc_id, MAX(c) AS topc FROM (
               |    SELECT doc_id, token, COUNT(*) AS c
               |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
               |    GROUP BY doc_id, token)
               |  GROUP BY doc_id
               |), m AS (
               |  SELECT t.doc_id, len(t.toks) AS nt, len(list_distinct(t.toks)) AS nd, cnt.topc,
               |         md5(array_to_string(list_sort(list_distinct(t.toks)), ' ')) AS sfp
               |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
               |  JOIN cnt USING (doc_id)
               |), f AS (
               |  SELECT doc_id,
               |         CASE WHEN nt >= 20 THEN 1 ELSE 0 END AS pass_len,
               |         CASE WHEN nd * CAST(1.0 AS DOUBLE) / nt >= CAST(0.35 AS DOUBLE) THEN 1 ELSE 0 END AS pass_rich,
               |         CASE WHEN topc * CAST(1.0 AS DOUBLE) / nt <= CAST(0.12 AS DOUBLE) THEN 1 ELSE 0 END AS pass_rep,
               |         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY sfp) THEN 1 ELSE 0 END AS pass_dedup
               |  FROM m
               |)
               |SELECT doc_id, pass_len, pass_rich, pass_rep, pass_dedup,
               |       pass_len * pass_rich * pass_rep * pass_dedup AS keep
               |FROM f ORDER BY doc_id""".stripMargin,
    spark = """WITH cnt AS (
              |  SELECT doc_id, MAX(c) AS topc FROM (
              |    SELECT doc_id, token, COUNT(*) AS c
              |    FROM (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents)
              |    GROUP BY doc_id, token)
              |  GROUP BY doc_id
              |), m AS (
              |  SELECT t.doc_id, size(t.toks) AS nt, size(array_distinct(t.toks)) AS nd, cnt.topc,
              |         md5(array_join(sort_array(array_distinct(t.toks)), ' ')) AS sfp
              |  FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) t
              |  JOIN cnt USING (doc_id)
              |), f AS (
              |  SELECT doc_id,
              |         CASE WHEN nt >= 20 THEN 1 ELSE 0 END AS pass_len,
              |         CASE WHEN nd * CAST(1.0 AS DOUBLE) / nt >= CAST(0.35 AS DOUBLE) THEN 1 ELSE 0 END AS pass_rich,
              |         CASE WHEN topc * CAST(1.0 AS DOUBLE) / nt <= CAST(0.12 AS DOUBLE) THEN 1 ELSE 0 END AS pass_rep,
              |         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY sfp) THEN 1 ELSE 0 END AS pass_dedup
              |  FROM m
              |)
              |SELECT doc_id, pass_len, pass_rich, pass_rep, pass_dedup,
              |       pass_len * pass_rich * pass_rep * pass_dedup AS keep
              |FROM f ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
    val cnt = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topc"))
    val toks = split(col("text"), " ")
    val m = docs.select(col("doc_id"),
        size(toks).as("nt"), size(array_distinct(toks)).as("nd"),
        md5(array_join(sort_array(array_distinct(toks)), " ")).as("sfp"))
      .join(cnt, "doc_id")
    m.select(col("doc_id"),
        when(col("nt") >= 20, 1).otherwise(0).as("pass_len"),
        when(col("nd") * lit(1.0) / col("nt") >= 0.35, 1).otherwise(0).as("pass_rich"),
        when(col("topc") * lit(1.0) / col("nt") <= 0.12, 1).otherwise(0).as("pass_rep"),
        when(col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(col("sfp"))), 1).otherwise(0).as("pass_dedup"))
      .withColumn("keep",
        col("pass_len") * col("pass_rich") * col("pass_rep") * col("pass_dedup"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level top-k n-grams (token bigrams) — the LM-data census op
    * behind contamination probes and boilerplate detection. Per-doc bigram
    * generation is a linear transform (no self-join); counting is one
    * hash-agg shuffle with map-side combine (hot grams partial-aggregate
    * before the exchange); and the global top-k is orderBy+limit, which
    * Spark plans as TakeOrderedAndProject — per-partition heaps, no global
    * sort, the 100-TB-safe form (the oracle's ROW_NUMBER spelling states
    * the same total order). Ties at the cut are broken by the gram text. */
  private val ngramTopk = CatalogEntry.dialect(
    "text_ngram_topk",
    duckdb = """WITH toks AS (
               |  SELECT string_split(text, ' ') AS t FROM documents
               |), grams AS (
               |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
               |  FROM toks
               |), counted AS (
               |  SELECT gram, COUNT(*) AS n FROM grams GROUP BY gram
               |)
               |SELECT gram, n FROM (
               |  SELECT gram, n, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rk FROM counted
               |) WHERE rk <= 20
               |ORDER BY n DESC, gram""".stripMargin,
    spark = """WITH toks AS (
              |  SELECT split(text, ' ') AS t FROM documents
              |), grams AS (
              |  SELECT explode(transform(sequence(1, size(t) - 1),
              |                           i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS gram
              |  FROM toks WHERE size(t) >= 2
              |), counted AS (
              |  SELECT gram, COUNT(*) AS n FROM grams GROUP BY gram
              |)
              |SELECT gram, n FROM (
              |  SELECT gram, n, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rk FROM counted
              |) WHERE rk <= 20
              |ORDER BY n DESC, gram""".stripMargin) { (spark, sfDir) =>
    val grams = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("t"))
      // guard: Spark's sequence(1, 0) would generate a DESCENDING range
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("gram"))
    grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(20)
      .orderBy(col("n").desc, col("gram"))
  }

  /** URL canonicalization — the web-crawl dedup prerequisite: the same page
    * arrives under tracking-param, fragment, case-of-host, and
    * trailing-slash variants, and exact dedup without canonicalization
    * misses all of them (every CommonCrawl-derived corpus pipeline runs
    * this pass before `etl_dedup_exact`). URLs are manufactured
    * deterministically from (source, doc_id) so the variant mix is pinned,
    * then canonicalized by the standard ladder: strip fragment → strip
    * `utm_*` params (tidying separator debris) → lowercase scheme+host
    * (path stays case-sensitive per RFC 3986) → strip trailing slash.
    * Everything is a per-row regex chain — embarrassingly parallel, no
    * shuffle until the final per-host rollup, which is the 100-TB shape.
    * The 2.5× URL→canonical collapse (25 → 10 per host) is the measured
    * dedup effect. DuckDB needs the explicit 'g' flag where Spark's
    * regexp_replace is global by default — the one dialect split. */
  private val urlCanonicalize = CatalogEntry.dialect(
    "text_url_canonicalize",
    duckdb = """WITH urls AS (
               |  SELECT doc_id,
               |    'https://WWW.' || source || '.Example.COM/doc' || CAST(doc_id % 50 AS VARCHAR) ||
               |    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 100 AS VARCHAR) || '&utm_campaign=x'
               |         WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 100 AS VARCHAR)
               |         ELSE '' END ||
               |    CASE WHEN doc_id % 3 = 2 AND doc_id % 7 = 0 THEN '/' ELSE '' END ||
               |    CASE WHEN doc_id % 5 = 0 THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END AS url
               |  FROM documents
               |), c1 AS (
               |  SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM urls
               |), c2 AS (
               |  SELECT doc_id, regexp_replace(regexp_replace(u, 'utm_[a-z]+=[^&]*&?', '', 'g'), '[?&]$', '') AS u FROM c1
               |), c3 AS (
               |  SELECT doc_id,
               |         'https://' || lower(regexp_extract(u, '^https?://([^/?#]+)', 1)) ||
               |         regexp_replace(regexp_replace(u, '^https?://[^/?#]+', ''), '/$', '') AS curl
               |  FROM c2
               |)
               |SELECT regexp_extract(curl, '^https://([^/]+)', 1) AS host,
               |       CAST(COUNT(*) AS BIGINT) AS n_urls,
               |       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical
               |FROM c3 GROUP BY host ORDER BY host""".stripMargin,
    spark = """WITH urls AS (
              |  SELECT doc_id,
              |    'https://WWW.' || source || '.Example.COM/doc' || CAST(doc_id % 50 AS STRING) ||
              |    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 100 AS STRING) || '&utm_campaign=x'
              |         WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 100 AS STRING)
              |         ELSE '' END ||
              |    CASE WHEN doc_id % 3 = 2 AND doc_id % 7 = 0 THEN '/' ELSE '' END ||
              |    CASE WHEN doc_id % 5 = 0 THEN '#sec-' || CAST(doc_id % 4 AS STRING) ELSE '' END AS url
              |  FROM documents
              |), c1 AS (
              |  SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM urls
              |), c2 AS (
              |  SELECT doc_id, regexp_replace(regexp_replace(u, 'utm_[a-z]+=[^&]*&?', ''), '[?&]$', '') AS u FROM c1
              |), c3 AS (
              |  SELECT doc_id,
              |         'https://' || lower(regexp_extract(u, '^https?://([^/?#]+)', 1)) ||
              |         regexp_replace(regexp_replace(u, '^https?://[^/?#]+', ''), '/$', '') AS curl
              |  FROM c2
              |)
              |SELECT regexp_extract(curl, '^https://([^/]+)', 1) AS host,
              |       CAST(COUNT(*) AS BIGINT) AS n_urls,
              |       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical
              |FROM c3 GROUP BY host ORDER BY host""".stripMargin) { (spark, sfDir) =>
    val url = concat(
      lit("https://WWW."), col("source"), lit(".Example.COM/doc"),
      (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 3 === 0,
        concat(lit("?utm_source=feed&id="), (col("doc_id") % 100).cast("string"),
          lit("&utm_campaign=x")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?id="), (col("doc_id") % 100).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 2 && col("doc_id") % 7 === 0, "/").otherwise(""),
      when(col("doc_id") % 5 === 0,
        concat(lit("#sec-"), (col("doc_id") % 4).cast("string"))).otherwise(lit("")))
    val noFrag  = regexp_replace(url, "#.*$", "")
    val noUtm   = regexp_replace(regexp_replace(noFrag, "utm_[a-z]+=[^&]*&?", ""), "[?&]$", "")
    val curl    = concat(
      lit("https://"), lower(regexp_extract(noUtm, "^https?://([^/?#]+)", 1)),
      regexp_replace(regexp_replace(noUtm, "^https?://[^/?#]+", ""), "/$", ""))
    Tables.documents(spark, sfDir)
      .select(curl.as("curl"))
      .groupBy(regexp_extract(col("curl"), "^https://([^/]+)", 1).as("host"))
      .agg(count(lit(1)).cast("long").as("n_urls"),
        countDistinct(col("curl")).cast("long").as("n_canonical"))
      .orderBy(col("host"))
  }

  /** Sliding-window chunking — the training-sample preparation step that
    * turns variable-length documents into fixed-size overlapping token
    * windows (32-token chunks, stride 16: every LM data pipeline runs this
    * between cleaning and packing, and the 50% overlap is the standard
    * don't-split-context hedge). Chunk count is closed-form
    * (`ceil(max(n−16,1)/16)`), so the whole operator is one generate +
    * slice per document — per-row work linear in document length, no
    * shuffle until the output sort, embarrassingly parallel at 100 TB. Tail
    * chunks shorter than 8 tokens are dropped (they carry no trainable
    * context and double-count the overlap); each chunk ships its md5 so
    * chunk-level exact dedup can run directly on this output. */
  private val chunkWindows = CatalogEntry.dialect(
    "text_chunk_windows",
    duckdb = """WITH t AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks,
               |         len(string_split(text, ' ')) AS n
               |  FROM documents
               |), idx AS (
               |  SELECT doc_id, toks, n,
               |         unnest(range(0, CAST(ceil(GREATEST(n - 16, 1) / 16.0) AS BIGINT))) AS ci
               |  FROM t
               |), ch AS (
               |  SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
               |         toks[ci*16 + 1 : LEAST(ci*16 + 32, n)] AS chunk
               |  FROM idx
               |)
               |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
               |       chunk[1] AS first_tok, chunk[len(chunk)] AS last_tok,
               |       md5(array_to_string(chunk, ' ')) AS chunk_hash
               |FROM ch WHERE len(chunk) >= 8
               |ORDER BY doc_id, chunk_idx""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n
              |  FROM documents
              |), idx AS (
              |  SELECT doc_id, toks, n,
              |         explode(sequence(0, CAST(ceil(GREATEST(n - 16, 1) / 16.0) AS INT) - 1)) AS ci
              |  FROM t
              |), ch AS (
              |  SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
              |         slice(toks, ci*16 + 1, LEAST(32, n - ci*16)) AS chunk
              |  FROM idx
              |)
              |SELECT doc_id, chunk_idx, CAST(size(chunk) AS BIGINT) AS n_tokens,
              |       element_at(chunk, 1) AS first_tok,
              |       element_at(chunk, size(chunk)) AS last_tok,
              |       md5(array_join(chunk, ' ')) AS chunk_hash
              |FROM ch WHERE size(chunk) >= 8
              |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("ci",
        explode(sequence(lit(0),
          ceil(greatest(col("n") - 16, lit(1)) / 16.0).cast("int") - 1)))
      .withColumn("chunk",
        slice(col("toks"), col("ci") * 16 + 1, least(lit(32), col("n") - col("ci") * 16)))
      .where(size(col("chunk")) >= 8)
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        element_at(col("chunk"), 1).as("first_tok"),
        element_at(col("chunk"), size(col("chunk"))).as("last_tok"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Bigram-LM perplexity proxy — the order-2 upgrade of
    * `text_unigram_logprob`: per-doc mean log probability under an
    * add-one-smoothed corpus bigram model, p(w₂|w₁) = (c(w₁w₂)+1) /
    * (c(w₁·)+V). This is the cheap stand-in for the KenLM-style perplexity
    * filter every LLM corpus pipeline runs (low logprob ⇒ disfluent /
    * boilerplate / wrong-language text), and smoothing keeps unseen
    * continuations finite so the score is total. All shuffles are
    * bigram-/token-keyed (counts, then two broadcast-able probability
    * joins); the only broadcast is the 1-row vocabulary size. Per-doc mean
    * via the bigram-sorted fold — same partition-invariance move as the
    * unigram entry — and round-4 on the way out. */
  private val perplexityBigram = CatalogEntry.dialect(
    "text_perplexity_bigram",
    duckdb = """WITH t AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks,
               |         len(string_split(text, ' ')) AS n FROM documents
               |), bg AS (
               |  SELECT doc_id,
               |         unnest(list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])) AS b
               |  FROM t WHERE n >= 2
               |), cb AS (SELECT b, COUNT(*) AS c12 FROM bg GROUP BY b),
               |c1 AS (SELECT string_split(b, ' ')[1] AS w1, CAST(SUM(c12) AS BIGINT) AS c1dot
               |       FROM cb GROUP BY w1),
               |tok AS (SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
               |v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS vocab FROM tok),
               |db AS (SELECT doc_id, b, COUNT(*) AS dc FROM bg GROUP BY doc_id, b)
               |SELECT db.doc_id, CAST(SUM(db.dc) AS BIGINT) AS n_bigrams,
               |       ROUND(SUM(db.dc * ln((cb.c12 + 1) * CAST(1.0 AS DOUBLE) / (c1.c1dot + v.vocab)))
               |             / SUM(db.dc), 4) AS avg_logprob
               |FROM db JOIN cb USING (b)
               |JOIN c1 ON string_split(db.b, ' ')[1] = c1.w1
               |CROSS JOIN v
               |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n FROM documents
              |), bg AS (
              |  SELECT doc_id,
              |         explode(transform(sequence(1, n - 1),
              |                 i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS b
              |  FROM t WHERE n >= 2
              |), cb AS (SELECT b, COUNT(*) AS c12 FROM bg GROUP BY b),
              |c1 AS (SELECT split(b, ' ')[0] AS w1, CAST(SUM(c12) AS BIGINT) AS c1dot
              |       FROM cb GROUP BY w1),
              |tok AS (SELECT explode(split(text, ' ')) AS tk FROM documents),
              |v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS vocab FROM tok),
              |db AS (SELECT doc_id, b, COUNT(*) AS dc FROM bg GROUP BY doc_id, b)
              |SELECT db.doc_id, CAST(SUM(db.dc) AS BIGINT) AS n_bigrams,
              |       ROUND(SUM(db.dc * ln((cb.c12 + 1) * CAST(1.0 AS DOUBLE) / (c1.c1dot + v.vocab)))
              |             / SUM(db.dc), 4) AS avg_logprob
              |FROM db JOIN cb USING (b)
              |JOIN c1 ON split(db.b, ' ')[0] = c1.w1
              |CROSS JOIN v
              |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin) { (spark, sfDir) =>
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") >= 2)
    val bg = t.select(col("doc_id"),
      explode(expr("transform(sequence(1, n - 1), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("b"))
    val cb = bg.groupBy(col("b")).agg(count(lit(1)).as("c12"))
    val c1 = cb.groupBy(split(col("b"), " ").getItem(0).as("w1"))
      .agg(sum(col("c12")).as("c1dot"))
    val v = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tk"))
      .agg(countDistinct(col("tk")).as("vocab"))
    val db = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("dc"))
    db.join(cb, "b")
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("b"), col("dc"),
        (col("dc") * log((col("c12") + 1) * lit(1.0) / (col("c1dot") + col("vocab"))))
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("dc")).as("n_bigrams"),
        collect_list(struct(col("b"), col("lp"))).as("xs"))
      .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
        round(aggregate(transform(array_sort(col("xs")), e => e.getField("lp")),
          lit(0.0), (a, x) => a + x) / col("n_bigrams"), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated Kneser–Ney bigram perplexity — the production LM-filter
    * algorithm (KenLM's smoothing), upgrading [[perplexityBigram]]'s
    * add-one baseline: P(w₂|w₁) = max(c₁₂−d,0)/c₁· + d·N₁₊(w₁·)/c₁· ·
    * N₁₊(·w₂)/B with discount d = 3/4 — continuation probability replaces
    * raw unigram frequency, which is what makes KN robust for filtering
    * ("Francisco" is frequent but only ever follows "San").
    *
    * Determinism: d = 3/4 makes every probability an exact integer
    * rational — P = ((4·c₁₂−3)·B + 3·N₁₊(w₁·)·N₁₊(·w₂)) / (4·c₁··B) —
    * so both engines divide the SAME two integers and ln() sees an
    * identical double (the quantized-log determinism class established by
    * perplexity_bigram/unigram_logprob; ROUND(,4) + the sorted fold guard
    * the sum). All counts come from one bigram aggregation: c₁·, N₁₊(w₁·)
    * (= that w₁'s distinct-continuation row count), N₁₊(·w₂), and the
    * bigram-type total B are GROUP BYs over the (b, c₁₂) frame, never a
    * re-scan. The corpus is its own training set (no OOV, same posture as
    * the add-one entry); bigram-keyed shuffles throughout — linear at any
    * scale, the doc join is by bigram hash. */
  private val perplexityKn = CatalogEntry.dialect(
    "text_perplexity_kn",
    duckdb = """WITH t AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks,
               |         len(string_split(text, ' ')) AS n FROM documents
               |), bg AS (
               |  SELECT doc_id,
               |         unnest(list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])) AS b
               |  FROM t WHERE n >= 2
               |), cb AS (SELECT b, COUNT(*) AS c12 FROM bg GROUP BY b),
               |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1dot,
               |              CAST(COUNT(*) AS BIGINT) AS n1w1
               |       FROM (SELECT string_split(b, ' ')[1] AS w1, c12 FROM cb) GROUP BY w1),
               |c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w2
               |       FROM (SELECT string_split(b, ' ')[2] AS w2 FROM cb) GROUP BY w2),
               |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS btypes FROM cb),
               |db AS (SELECT doc_id, b, COUNT(*) AS dc FROM bg GROUP BY doc_id, b)
               |SELECT db.doc_id, CAST(SUM(db.dc) AS BIGINT) AS n_bigrams,
               |       ROUND(SUM(db.dc * ln(((4*cb.c12 - 3) * bt.btypes + 3 * c1.n1w1 * c2.n1w2)
               |                            * CAST(1.0 AS DOUBLE) / (4 * c1.c1dot * bt.btypes)))
               |             / SUM(db.dc), 4) AS avg_logprob
               |FROM db JOIN cb USING (b)
               |JOIN c1 ON string_split(db.b, ' ')[1] = c1.w1
               |JOIN c2 ON string_split(db.b, ' ')[2] = c2.w2
               |CROSS JOIN bt
               |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n FROM documents
              |), bg AS (
              |  SELECT doc_id,
              |         explode(transform(sequence(1, n - 1),
              |                 i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS b
              |  FROM t WHERE n >= 2
              |), cb AS (SELECT b, COUNT(*) AS c12 FROM bg GROUP BY b),
              |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1dot,
              |              CAST(COUNT(*) AS BIGINT) AS n1w1
              |       FROM (SELECT split(b, ' ')[0] AS w1, c12 FROM cb) GROUP BY w1),
              |c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w2
              |       FROM (SELECT split(b, ' ')[1] AS w2 FROM cb) GROUP BY w2),
              |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS btypes FROM cb),
              |db AS (SELECT doc_id, b, COUNT(*) AS dc FROM bg GROUP BY doc_id, b)
              |SELECT db.doc_id, CAST(SUM(db.dc) AS BIGINT) AS n_bigrams,
              |       ROUND(SUM(db.dc * ln(((4*cb.c12 - 3) * bt.btypes + 3 * c1.n1w1 * c2.n1w2)
              |                            * CAST(1.0 AS DOUBLE) / (4 * c1.c1dot * bt.btypes)))
              |             / SUM(db.dc), 4) AS avg_logprob
              |FROM db JOIN cb USING (b)
              |JOIN c1 ON split(db.b, ' ')[0] = c1.w1
              |JOIN c2 ON split(db.b, ' ')[1] = c2.w2
              |CROSS JOIN bt
              |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin) { (spark, sfDir) =>
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") >= 2)
    val bg = t.select(col("doc_id"),
      explode(expr("transform(sequence(1, n - 1), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("b"))
    val cb = bg.groupBy(col("b")).agg(count(lit(1)).as("c12"))
    val c1 = cb.groupBy(split(col("b"), " ").getItem(0).as("w1"))
      .agg(sum(col("c12")).cast("long").as("c1dot"),
        count(lit(1)).cast("long").as("n1w1"))
    val c2 = cb.groupBy(split(col("b"), " ").getItem(1).as("w2"))
      .agg(count(lit(1)).cast("long").as("n1w2"))
    val bt = cb.agg(count(lit(1)).cast("long").as("btypes"))
    val db = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("dc"))
    db.join(cb, "b")
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .withColumn("w2", split(col("b"), " ").getItem(1))
      .join(c1, "w1")
      .join(c2, "w2")
      .crossJoin(broadcast(bt))
      .select(col("doc_id"), col("b"), col("dc"),
        (col("dc") * log(
          ((lit(4) * col("c12") - 3) * col("btypes") +
            lit(3) * col("n1w1") * col("n1w2")) * lit(1.0) /
            (lit(4) * col("c1dot") * col("btypes")))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("dc")).as("n_bigrams"),
        collect_list(struct(col("b"), col("lp"))).as("xs"))
      .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
        round(aggregate(transform(array_sort(col("xs")), e => e.getField("lp")),
          lit(0.0), (a, x) => a + x) / col("n_bigrams"), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Distributed BPE tokenizer training — greedy byte-pair-encoding merge
    * learning, the way production tokenizer trainers actually run at
    * corpus scale (HF tokenizers / SentencePiece shape): ONE distributed
    * pass builds the (word, freq) table — the only part that touches the
    * corpus, linear at 100 TB — then N=10 merge rounds iterate over that
    * table alone: count adjacent symbol pairs weighted by word frequency
    * (grouped agg, map-side combinable), pick the argmax (1-row collect —
    * plan control, the centroid-collect class), and apply the merge to
    * every word's symbol array with a leftmost-first non-overlapping
    * aggregate() fold. Each round caches its words frame and unpersists
    * the last so the plan never deepens past one fold.
    *
    * Determinism: pair counts are exact long sums; the argmax orders by
    * (count DESC, left, right) — a total order; the fold is sequential by
    * definition. No oracle by design (iterative argmax is not
    * SQL-expressible without list-state recursion — same exemption class
    * as dedup_cluster_cc / vec_mmr_diversify); BpeSpec replays the greedy
    * algorithm in pure Scala over the collected word-frequency table and
    * pins the merge table exactly. */
  private def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")

  /** One leftmost-first non-overlapping merge application as a SQL fold.
    * try_element_at: ANSI element_at(-1) throws on the empty initial
    * accumulator because AND does not short-circuit under codegen. */
  private def mergeFoldSql(a: String, b: String, m: String): String =
    s"""aggregate(syms, CAST(array() AS ARRAY<STRING>),
       |  (acc, s) -> CASE WHEN try_element_at(acc, -1) = '${esc(a)}'
       |                    AND s = '${esc(b)}'
       |    THEN concat(slice(acc, 1, size(acc) - 1), array('${esc(m)}'))
       |    ELSE concat(acc, array(s)) END)""".stripMargin

  /** Train-once memo for the BPE merge table, the [[graft.queries]] analog
    * of VectorQueries' pqModels cache: the trainer is deterministic and
    * partition-invariant (BpeSpec + PerturbationSpec), so sharing the
    * learned merges between `pipeline_bpe_train` and `pipeline_bpe_apply`
    * within one session changes nothing but the second entry's cost.
    * Session-reference-keyed; stopped sessions evicted on lookup. */
  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Int),
    Seq[(Long, String, String, String, Long)]]()

  /** The greedy merge-learning loop shared by `pipeline_bpe_train` (which
    * emits the merge table) and `pipeline_bpe_apply` (which tokenizes with
    * it — deterministic trainer, so the two entries always agree). */
  private def trainBpe(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nMerges: Int = 10): Seq[(Long, String, String, String, Long)] = {
    bpeCache.forEach { (k, _) =>
      if (k._1.sparkContext.isStopped) bpeCache.remove(k)
    }
    bpeCache.computeIfAbsent((spark, sfDir, nMerges), _ =>
      trainBpeUncached(spark, sfDir, nMerges))
  }

  private def trainBpeUncached(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nMerges: Int): Seq[(Long, String, String, String, Long)] = {
    val wordFreq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var words = wordFreq
      .select(col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (r <- 1 to nMerges) {
      // single-symbol words carry no pairs — and sequence(1, 0) DESCENDS
      // in Spark, so they must be filtered before the transform, not
      // left to produce an out-of-bounds probe
      val best = words
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, a, b, a + b, n))
        val prev = words
        words = prev.select(col("freq"),
          expr(mergeFoldSql(a, b, a + b)).as("syms")).cache()
        words.count() // materialize before releasing the previous round
        prev.unpersist(false)
      }
    }
    words.unpersist(false)
    merges.toSeq
  }

  /** Materialize the train-once BPE merge table (Bench load-phase hook,
    * same offline-artifact posture as VectorQueries.warmShared): a
    * production tokenizer ships as a trained file; the benchmark measures
    * TOKENIZATION (the vocab fold + corpus join), not merge learning. */
  def warmShared(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    trainBpe(spark, sfDir); ()
  }

  private val bpeTrain = CatalogEntry.noOracle("pipeline_bpe_train") { (spark, sfDir) =>
    import spark.implicits._
    trainBpe(spark, sfDir).toDF("rank", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy(col("rank"))
  }

  /** BPE tokenization with the learned merges — the inference side of
    * [[bpeTrain]], in the production shape: the merge chain is applied
    * ONCE per DISTINCT word (the vocabulary frame — tiny next to the
    * corpus), and documents get their token counts by joining that
    * vocabulary back on the word key. At 100 TB the corpus is touched
    * exactly twice (word extraction, count join) and the 10 chained folds
    * run over |vocab| rows only. Output: per-doc char/BPE-token counts and
    * the compression ratio (exact integer division of identical operands
    * on any engine — but no oracle, since the merges come from the
    * iterative trainer; BpeSpec pins tokenization against the pure-Scala
    * replay). */
  private val bpeApply = CatalogEntry.noOracle("pipeline_bpe_apply") { (spark, sfDir) =>
    val merges = trainBpe(spark, sfDir)
    val vocabRaw = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_uses"))
    var vocab = vocabRaw.select(col("w"), col("n_uses"),
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
    for ((_, a, b, m, _) <- merges)
      vocab = vocab.select(col("w"), col("n_uses"),
        expr(mergeFoldSql(a, b, m)).as("syms"))
    val wordTok = vocab
      .select(col("w"), size(col("syms")).cast("long").as("n_bpe"),
        length(col("w")).cast("long").as("n_chr"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(wordTok, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_chr")).cast("long").as("n_chars"),
        sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** Chunk-level exact dedup — close the `text_chunk_windows` → dedup
    * loop: hash every 32/16 sliding chunk, count DISTINCT documents per
    * hash, and score each document by the fraction of its chunks shared
    * with some other document (the chunk-granular cross-doc overlap signal:
    * doc-level exact dedup misses partial copies, `dedup_exact_substring`
    * finds 8-gram spans — this is the training-sample-granularity middle).
    * Everything is hash-keyed: chunk explode (linear), one count-distinct
    * per hash, one hash-keyed join back, one per-doc rollup — no pair
    * enumeration anywhere, so the plan survives 100 TB by construction.
    * COUNT(DISTINCT doc_id) per hash — not COUNT(*) — so a doc repeating
    * its own chunk (stride overlap does this) never self-flags. */
  private val dedupChunk = CatalogEntry.dialect(
    "dedup_chunk_exact",
    duckdb = """WITH t AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks,
               |         len(string_split(text, ' ')) AS n FROM documents
               |), idx AS (
               |  SELECT doc_id, toks, n,
               |         unnest(range(0, CAST(ceil(GREATEST(n - 16, 1) / 16.0) AS BIGINT))) AS ci
               |  FROM t
               |), ch AS (
               |  SELECT doc_id, md5(array_to_string(toks[ci*16 + 1 : LEAST(ci*16 + 32, n)], ' ')) AS h
               |  FROM idx WHERE len(toks[ci*16 + 1 : LEAST(ci*16 + 32, n)]) >= 8
               |), hc AS (
               |  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h
               |)
               |SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               |       CAST(SUM(CASE WHEN hc.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               |       ROUND(SUM(CASE WHEN hc.nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS dup_frac
               |FROM ch JOIN hc USING (h)
               |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n FROM documents
              |), idx AS (
              |  SELECT doc_id, toks, n,
              |         explode(sequence(0, CAST(ceil(GREATEST(n - 16, 1) / 16.0) AS INT) - 1)) AS ci
              |  FROM t
              |), ch AS (
              |  SELECT doc_id, md5(array_join(slice(toks, ci*16 + 1, LEAST(32, n - ci*16)), ' ')) AS h
              |  FROM idx WHERE size(slice(toks, ci*16 + 1, LEAST(32, n - ci*16))) >= 8
              |), hc AS (
              |  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h
              |)
              |SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
              |       CAST(SUM(CASE WHEN hc.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
              |       ROUND(SUM(CASE WHEN hc.nd > 1 THEN 1 ELSE 0 END) * CAST(1.0 AS DOUBLE) / COUNT(*), 4) AS dup_frac
              |FROM ch JOIN hc USING (h)
              |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin) { (spark, sfDir) =>
    val ch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("ci",
        explode(sequence(lit(0),
          ceil(greatest(col("n") - 16, lit(1)) / 16.0).cast("int") - 1)))
      .withColumn("chunk",
        slice(col("toks"), col("ci") * 16 + 1, least(lit(32), col("n") - col("ci") * 16)))
      .where(size(col("chunk")) >= 8)
      .select(col("doc_id"), md5(array_join(col("chunk"), " ")).as("h"))
    val hc = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    ch.join(hc, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("nd") > 1, 1).otherwise(0)).cast("long").as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        round(col("n_dup") * lit(1.0) / col("n_chunks"), 4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Per-document keyword extraction — top-3 terms by tf·idf within each
    * document (`text_idf_topterms` ranks the CORPUS's discriminative
    * terms; this ranks each DOC's, which is the topic-tagging /
    * metadata-enrichment pass). Counts are token-keyed shuffles, the
    * per-doc ranking is a doc-partitioned window over ≤|vocab∩doc| rows,
    * and the round-4 score + term tie-break pins the cut. The 1-row
    * doc-count is the only broadcast. */
  private val docKeywords = CatalogEntry.dialect(
    "text_doc_keywords",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
               |), tf AS (
               |  SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t
               |), dfreq AS (
               |  SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t
               |), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
               |sc AS (
               |  SELECT tf.doc_id, tf.t,
               |         ROUND(tf.tf * ln(nd.n * CAST(1.0 AS DOUBLE) / dfreq.df), 4) AS score
               |  FROM tf JOIN dfreq USING (t) CROSS JOIN nd
               |)
               |SELECT doc_id, CAST(rk AS BIGINT) AS rk, t AS term, score FROM (
               |  SELECT doc_id, t, score,
               |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rk
               |  FROM sc
               |) r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, explode(split(text, ' ')) AS t FROM documents
              |), tf AS (
              |  SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t
              |), dfreq AS (
              |  SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t
              |), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
              |sc AS (
              |  SELECT tf.doc_id, tf.t,
              |         ROUND(tf.tf * ln(nd.n * CAST(1.0 AS DOUBLE) / dfreq.df), 4) AS score
              |  FROM tf JOIN dfreq USING (t) CROSS JOIN nd
              |)
              |SELECT doc_id, CAST(rk AS BIGINT) AS rk, t AS term, score FROM (
              |  SELECT doc_id, t, score,
              |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rk
              |  FROM sc
              |) r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (spark, sfDir) =>
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
    val nd = tok.agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("t"))
    tf.join(dfreq, "t").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("t"),
        round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("t").as("term"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Data-mixing weights — temperature-scaled language sampling weights
    * (w_l ∝ share_l^α with α = 0.5, renormalized), the corpus-balancing
    * computation multilingual training runs before sampling: α < 1
    * upsamples low-resource languages (the upsample_factor column makes
    * the effect auditable — en is damped below 1, every minority language
    * is boosted). Token counts are exact integer sums, the whole
    * computation is one tiny rollup + a 5-row window renormalization —
    * the weights table is the OUTPUT; the sampler that consumes it is
    * `pipeline_quota_sample`'s shape. */
  private val mixWeights = CatalogEntry.dialect(
    "pipeline_mix_weights",
    duckdb = """WITH c AS (
               |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
               |  FROM documents GROUP BY lang
               |), t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM c),
               |w AS (
               |  SELECT lang, toks, ROUND(toks * CAST(1.0 AS DOUBLE) / total, 6) AS share,
               |         pow(toks * CAST(1.0 AS DOUBLE) / total, 0.5) AS raw_w
               |  FROM c CROSS JOIN t
               |)
               |SELECT lang, toks, share,
               |       ROUND(raw_w / SUM(raw_w) OVER (), 6) AS mix_weight,
               |       ROUND(raw_w / SUM(raw_w) OVER () / share, 4) AS upsample_factor
               |FROM w ORDER BY lang""".stripMargin,
    spark = """WITH c AS (
              |  SELECT lang, CAST(SUM(size(split(text, ' '))) AS BIGINT) AS toks
              |  FROM documents GROUP BY lang
              |), t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM c),
              |w AS (
              |  SELECT lang, toks, ROUND(toks * CAST(1.0 AS DOUBLE) / total, 6) AS share,
              |         pow(toks * CAST(1.0 AS DOUBLE) / total, 0.5) AS raw_w
              |  FROM c CROSS JOIN t
              |)
              |SELECT lang, toks, share,
              |       ROUND(raw_w / SUM(raw_w) OVER (), 6) AS mix_weight,
              |       ROUND(raw_w / SUM(raw_w) OVER () / share, 4) AS upsample_factor
              |FROM w ORDER BY lang""".stripMargin) { (spark, sfDir) =>
    val c = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("toks"))
    val t = c.agg(sum(col("toks")).cast("long").as("total"))
    val wAll = Window.partitionBy()
    c.crossJoin(broadcast(t))
      .withColumn("share", round(col("toks") * lit(1.0) / col("total"), 6))
      .withColumn("raw_w", pow(col("toks") * lit(1.0) / col("total"), 0.5))
      .select(col("lang"), col("toks"), col("share"),
        round(col("raw_w") / sum(col("raw_w")).over(wAll), 6).as("mix_weight"),
        round(col("raw_w") / sum(col("raw_w")).over(wAll) / col("share"), 4)
          .as("upsample_factor"))
      .orderBy(col("lang"))
  }

  /** Zipf rank-frequency slope per language: token frequencies ranked
    * (freq DESC, token) inside each lang, then an OLS fit of ln(freq)
    * against ln(rank) over the top-1000 ranks — the classic corpus-health
    * diagnostic (natural language tracks slope ≈ −1; template/spam corpora
    * flatten). The rank window is lang-partitioned and top-k-bounded
    * (WindowGroupLimit prunes past rank 1000), so no global sort touches
    * the vocabulary; the co-moment REGR_* aggregation is one map-side-
    * combinable pass. ROUND(,4) absorbs co-moment summation-order ulp —
    * same accepted class as `agg_regression`. */
  private val zipfSlope = CatalogEntry.dialect(
    "text_zipf_slope",
    duckdb = """WITH tok AS (
               |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
               |), tf AS (
               |  SELECT lang, token, COUNT(*) AS freq FROM tok WHERE token <> '' GROUP BY lang, token
               |), ranked AS (
               |  SELECT lang, freq,
               |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS rnk
               |  FROM tf
               |)
               |SELECT lang, COUNT(*) AS n_ranks,
               |       ROUND(REGR_SLOPE(LN(CAST(freq AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
               |       ROUND(REGR_R2(LN(CAST(freq AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 4) AS r2
               |FROM ranked WHERE rnk <= 1000
               |GROUP BY lang ORDER BY lang""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT lang, explode(split(text, ' ')) AS token FROM documents
              |), tf AS (
              |  SELECT lang, token, COUNT(*) AS freq FROM tok WHERE token <> '' GROUP BY lang, token
              |), ranked AS (
              |  SELECT lang, freq,
              |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, token) AS rnk
              |  FROM tf
              |)
              |SELECT lang, COUNT(*) AS n_ranks,
              |       ROUND(REGR_SLOPE(LN(CAST(freq AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
              |       ROUND(REGR_R2(LN(CAST(freq AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 4) AS r2
              |FROM ranked WHERE rnk <= 1000
              |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, sfDir) =>
    val tf = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("lang")).orderBy(col("freq").desc, col("token"))
    tf.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 1000)
      .withColumn("lf", log(col("freq").cast("double")))
      .withColumn("lr", log(col("rnk").cast("double")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        round(expr("regr_slope(lf, lr)"), 4).as("zipf_slope"),
        round(expr("regr_r2(lf, lr)"), 4).as("r2"))
      .orderBy(col("lang"))
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 genre):
    * per-document word count bounds, mean word length bounds, stopword
    * presence, and short-token fraction — each an auditable flag plus the
    * composed keep decision. Complements `text_quality_score` (lexical
    * diversity) and `text_repetition_filter` (dominance/dup-ngrams): this
    * battery is the purely length/shape-based gate. Every signal is a
    * partition-local array computation over the token list — no shuffle
    * at all before the output sort; ratios are exact int/int divisions so
    * the threshold comparisons are engine-identical. */
  private val gopherRules = CatalogEntry.dialect(
    "text_gopher_rules",
    duckdb = """WITH m AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
               |), s AS (
               |  SELECT doc_id, len(toks) AS n_words,
               |         (n_chars - len(toks) + 1) * CAST(1.0 AS DOUBLE) / len(toks) AS mean_wlen,
               |         len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS stop_hits,
               |         len(list_filter(toks, t -> length(t) <= 2)) * CAST(1.0 AS DOUBLE) / len(toks) AS short_frac
               |  FROM m
               |)
               |SELECT doc_id, n_words, ROUND(mean_wlen, 4) AS mean_wlen, stop_hits,
               |       ROUND(short_frac, 4) AS short_frac,
               |       CASE WHEN n_words BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS g_nwords,
               |       CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 5.0 THEN 1 ELSE 0 END AS g_wlen,
               |       CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS g_stop,
               |       CASE WHEN short_frac <= 0.05 THEN 1 ELSE 0 END AS g_short,
               |       CASE WHEN n_words BETWEEN 20 AND 100000 AND mean_wlen >= 3.0 AND mean_wlen <= 5.0
               |                 AND stop_hits >= 1 AND short_frac <= 0.05 THEN 1 ELSE 0 END AS keep
               |FROM s ORDER BY doc_id""".stripMargin,
    spark = """WITH m AS (
              |  SELECT doc_id, split(text, ' ') AS toks, n_chars FROM documents
              |), s AS (
              |  SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_words,
              |         (n_chars - size(toks) + 1) * CAST(1.0 AS DOUBLE) / size(toks) AS mean_wlen,
              |         CAST(size(filter(toks, t -> t = 'the' OR t = 'a')) AS BIGINT) AS stop_hits,
              |         size(filter(toks, t -> length(t) <= 2)) * CAST(1.0 AS DOUBLE) / size(toks) AS short_frac
              |  FROM m
              |)
              |SELECT doc_id, n_words, ROUND(mean_wlen, 4) AS mean_wlen, stop_hits,
              |       ROUND(short_frac, 4) AS short_frac,
              |       CASE WHEN n_words BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS g_nwords,
              |       CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 5.0 THEN 1 ELSE 0 END AS g_wlen,
              |       CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS g_stop,
              |       CASE WHEN short_frac <= 0.05 THEN 1 ELSE 0 END AS g_short,
              |       CASE WHEN n_words BETWEEN 20 AND 100000 AND mean_wlen >= 3.0 AND mean_wlen <= 5.0
              |                 AND stop_hits >= 1 AND short_frac <= 0.05 THEN 1 ELSE 0 END AS keep
              |FROM s ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val toks = split(col("text"), " ")
    val nWords = size(toks)
    val meanWlen = (col("n_chars") - nWords + 1) * lit(1.0) / nWords
    val stopHits = size(filter(toks, t => t === "the" || t === "a"))
    val shortFrac = size(filter(toks, t => length(t) <= 2)) * lit(1.0) / nWords
    val gNwords = when(nWords.between(20, 100000), 1).otherwise(0)
    val gWlen = when(meanWlen >= 3.0 && meanWlen <= 5.0, 1).otherwise(0)
    val gStop = when(stopHits >= 1, 1).otherwise(0)
    val gShort = when(shortFrac <= 0.05, 1).otherwise(0)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nWords.cast("long").as("n_words"),
        round(meanWlen, 4).as("mean_wlen"),
        stopHits.cast("long").as("stop_hits"),
        round(shortFrac, 4).as("short_frac"),
        gNwords.as("g_nwords"), gWlen.as("g_wlen"),
        gStop.as("g_stop"), gShort.as("g_short"),
        (gNwords * gWlen * gStop * gShort).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style head/middle/tail corpus bucketing by language-model
    * score: per-doc mean unigram log-prob, split at the 0.3/0.7
    * PERCENTILE_DISC cutoffs. Determinism is the interesting part: the
    * per-doc score sums PER-TOKEN-TYPE quantized log-probs
    * (`⌊ln(cnt/total)·1e6+0.5⌋` longs), so every cross-engine sum is an
    * exact integer and a doc can never straddle a cutoff differently in
    * the two engines — the discrete bucket assignment is provably
    * engine-identical, unlike thresholding a raw double sum.
    * PERCENTILE_DISC (not _CONT) keeps the cutoffs actual data values.
    * Scale: token-keyed shuffles only, 1-row broadcasts for total and
    * cutoffs — linear end to end. */
  private val perplexityBucket = CatalogEntry.dialect(
    "text_perplexity_bucket",
    duckdb = """WITH tok AS (
               |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
               |), tf AS (
               |  SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk
               |), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
               |ql AS (
               |  SELECT tk, CAST(FLOOR(ln(cnt * CAST(1.0 AS DOUBLE) / total) * 1e6 + 0.5) AS BIGINT) AS qlp
               |  FROM tf CROSS JOIN tot
               |), doc AS (
               |  SELECT tok.doc_id, CAST(SUM(ql.qlp) AS DOUBLE) / 1e6 / COUNT(*) AS s
               |  FROM tok JOIN ql USING (tk) GROUP BY tok.doc_id
               |), cut AS (
               |  SELECT quantile_disc(s, 0.3) AS c30, quantile_disc(s, 0.7) AS c70 FROM doc
               |)
               |SELECT CASE WHEN s >= c70 THEN 'head' WHEN s >= c30 THEN 'middle' ELSE 'tail' END AS bucket,
               |       COUNT(*) AS n_docs, ROUND(AVG(s), 4) AS avg_logprob,
               |       ROUND(MIN(s), 4) AS min_logprob, ROUND(MAX(s), 4) AS max_logprob
               |FROM doc CROSS JOIN cut
               |GROUP BY 1 ORDER BY bucket""".stripMargin,
    spark = """WITH tok AS (
              |  SELECT doc_id, explode(split(text, ' ')) AS tk FROM documents
              |), tf AS (
              |  SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk
              |), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
              |ql AS (
              |  SELECT tk, CAST(FLOOR(ln(cnt * CAST(1.0 AS DOUBLE) / total) * 1e6 + 0.5) AS BIGINT) AS qlp
              |  FROM tf CROSS JOIN tot
              |), doc AS (
              |  SELECT tok.doc_id, CAST(SUM(ql.qlp) AS DOUBLE) / 1e6 / COUNT(*) AS s
              |  FROM tok JOIN ql USING (tk) GROUP BY tok.doc_id
              |), cut AS (
              |  SELECT percentile_disc(0.3) WITHIN GROUP (ORDER BY s) AS c30,
              |         percentile_disc(0.7) WITHIN GROUP (ORDER BY s) AS c70 FROM doc
              |)
              |SELECT CASE WHEN s >= c70 THEN 'head' WHEN s >= c30 THEN 'middle' ELSE 'tail' END AS bucket,
              |       COUNT(*) AS n_docs, ROUND(AVG(s), 4) AS avg_logprob,
              |       ROUND(MIN(s), 4) AS min_logprob, ROUND(MAX(s), 4) AS max_logprob
              |FROM doc CROSS JOIN cut
              |GROUP BY 1 ORDER BY bucket""".stripMargin) { (spark, sfDir) =>
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    val tf = tok.groupBy(col("tk")).agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum(col("cnt")).cast("long").as("total"))
    val ql = tf.crossJoin(broadcast(tot))
      .select(col("tk"),
        floor(log(col("cnt") * lit(1.0) / col("total")) * 1e6 + 0.5)
          .cast("long").as("qlp"))
    val doc = tok.join(ql, "tk")
      .groupBy(col("doc_id"))
      .agg((sum(col("qlp")).cast("double") / 1e6 / count(lit(1))).as("s"))
    val cut = doc.agg(
      expr("percentile_disc(0.3) WITHIN GROUP (ORDER BY s)").as("c30"),
      expr("percentile_disc(0.7) WITHIN GROUP (ORDER BY s)").as("c70"))
    doc.crossJoin(broadcast(cut))
      .select(
        when(col("s") >= col("c70"), "head")
          .when(col("s") >= col("c30"), "middle")
          .otherwise("tail").as("bucket"),
        col("s"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("s")), 4).as("avg_logprob"),
        round(min(col("s")), 4).as("min_logprob"),
        round(max(col("s")), 4).as("max_logprob"))
      .orderBy(col("bucket"))
  }

  /** Curation observability report — the per-source telemetry frame a
    * pipeline run emits AFTER its dedup/filter stages (docs in, exact-dup
    * rate via the `text_fingerprint` md5 content key, near-dup-proxy rate
    * via the order-blind shingle key, length-gate pass count, mean size):
    * the numbers an operator actually watches to spot a crawler bug or a
    * source gone stale. One group-by over per-doc hashes — two distinct
    * aggregations on md5 keys, map-side combinable, linear at 100 TB;
    * the report itself is |sources| rows. */
  private val dedupReport = CatalogEntry.dialect(
    "pipeline_dedup_report",
    duckdb = """SELECT source,
               |       CAST(COUNT(*) AS BIGINT) AS n_docs,
               |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
               |       ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 4) AS exact_dup_rate,
               |       ROUND(1.0 - COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))) * 1.0 / COUNT(*), 4) AS shingle_dup_rate,
               |       CAST(SUM(CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
               |       ROUND(AVG(n_chars), 4) AS mean_chars
               |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    spark = """SELECT source,
              |       CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
              |       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS exact_dup_rate,
              |       ROUND(1.0 - CAST(COUNT(DISTINCT md5(array_join(sort_array(array_distinct(split(text, ' '))), ' '))) AS DOUBLE) / COUNT(*), 4) AS shingle_dup_rate,
              |       CAST(SUM(CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
              |       ROUND(AVG(n_chars), 4) AS mean_chars
              |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (spark, sfDir) =>
    val contentFp = md5(col("text"))
    val shingleFp = md5(array_join(sort_array(array_distinct(split(col("text"), " "))), " "))
    Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        countDistinct(contentFp).cast("long").as("n_unique"),
        round(lit(1.0) - countDistinct(contentFp) * lit(1.0) / count(lit(1)), 4)
          .as("exact_dup_rate"),
        round(lit(1.0) - countDistinct(shingleFp) * lit(1.0) / count(lit(1)), 4)
          .as("shingle_dup_rate"),
        sum(when(col("n_chars").between(200, 20000), 1).otherwise(0)).cast("long")
          .as("n_len_ok"),
        round(avg(col("n_chars")), 4).as("mean_chars"))
      .orderBy(col("source"))
  }

  /** C4-style SPAN dedup with reconstruction — the step the flag-only
    * entries stop short of: partition every doc into non-overlapping
    * 13-token spans, keep only each span's FIRST global occurrence
    * (ordered by doc_id, span_idx — a total order), and REBUILD the
    * cleaned text from the surviving spans. This is the operator C4 ran
    * over Common Crawl ("three-sentence span" dedup); `dedup_chunk_exact`
    * reports chunk duplication, this one emits the cleaned corpus. Plan:
    * one posexplode (linear), one span-hash-keyed ROW_NUMBER window (the
    * dedup shuffle — at 100 TB the hottest boilerplate span bounds the
    * partition, the same skew profile as exact-substring counting), one
    * per-doc re-aggregation sorting spans by index. The output hashes the
    * cleaned text so the driver compare covers the reconstruction
    * byte-for-byte without shipping full documents. */
  private val spanDedup = CatalogEntry.dialect(
    "text_span_dedup",
    duckdb = """WITH t AS (
               |  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n FROM documents
               |), sp AS (
               |  SELECT doc_id, toks, n, unnest(range(0, CAST(ceil(n / 13.0) AS BIGINT))) AS si FROM t
               |), spans AS (
               |  SELECT doc_id, CAST(si AS BIGINT) AS span_idx,
               |         array_to_string(toks[si*13 + 1 : LEAST(si*13 + 13, n)], ' ') AS span
               |  FROM sp
               |), keyed AS (
               |  SELECT doc_id, span_idx, span,
               |         ROW_NUMBER() OVER (PARTITION BY md5(span) ORDER BY doc_id, span_idx) AS occ
               |  FROM spans
               |)
               |SELECT doc_id,
               |       CAST(COUNT(*) AS BIGINT) AS n_spans,
               |       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               |       md5(COALESCE(array_to_string(list(CASE WHEN occ = 1 THEN span END ORDER BY span_idx) FILTER (WHERE occ = 1), ' '), '')) AS clean_md5
               |FROM keyed GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n FROM documents
              |), sp AS (
              |  SELECT doc_id, toks, n,
              |         explode(sequence(0, CAST(ceil(n / 13.0) AS INT) - 1)) AS si
              |  FROM t
              |), spans AS (
              |  SELECT doc_id, CAST(si AS BIGINT) AS span_idx,
              |         array_join(slice(toks, si*13 + 1, LEAST(13, n - si*13)), ' ') AS span
              |  FROM sp
              |), keyed AS (
              |  SELECT doc_id, span_idx, span,
              |         ROW_NUMBER() OVER (PARTITION BY md5(span) ORDER BY doc_id, span_idx) AS occ
              |  FROM spans
              |)
              |SELECT doc_id,
              |       CAST(COUNT(*) AS BIGINT) AS n_spans,
              |       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       md5(array_join(transform(array_sort(collect_list(CASE WHEN occ = 1 THEN struct(span_idx, span) END)), s -> s.span), ' ')) AS clean_md5
              |FROM keyed GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val spans = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), ceil(col("n") / 13.0).cast("int") - 1)).as("si"))
      .select(col("doc_id"), col("si").cast("long").as("span_idx"),
        array_join(slice(col("toks"), col("si") * 13 + 1,
          least(lit(13), col("n") - col("si") * 13)), " ").as("span"))
    val w = Window.partitionBy(md5(col("span"))).orderBy(col("doc_id"), col("span_idx"))
    spans.withColumn("occ", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("occ") === 1, 1).otherwise(0)).cast("long").as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("occ") === 1,
              struct(col("span_idx"), col("span"))))),
            s => s.getField("span")), " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Heaps-law vocabulary growth — distinct-type count vs cumulative token
    * count at ten doc-id decile checkpoints, the corpus-health diagnostic
    * beside [[zipfSlope]] (a healthy natural corpus grows vocab ∝ nᵝ,
    * β≈0.5; a saturating curve flags templated/synthetic text — which this
    * corpus IS, so the curve here saturates fast, and that is the signal).
    * Shape: one per-doc token count (linear), one token→first-doc_id
    * aggregation (linear, map-side combinable), then both tiny frames join
    * the 10-row cutoff table on an inequality — the expansion is bounded
    * ×10 regardless of corpus size, never a scan re-read. All-integer
    * outputs → hash-exact. */
  private val vocabGrowth = CatalogEntry.dialect(
    "text_vocab_growth",
    duckdb = """WITH nn AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
               |d AS (SELECT CAST(k AS BIGINT) AS decile,
               |             CAST(FLOOR((SELECT n FROM nn) * k / 10.0) AS BIGINT) AS cutoff
               |      FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(k)),
               |pd AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
               |       FROM documents),
               |fs AS (SELECT token, MIN(doc_id) AS first_doc FROM (
               |         SELECT doc_id, unnest(string_split(text, ' ')) AS token
               |         FROM documents) GROUP BY token),
               |da AS (SELECT d.decile, d.cutoff, CAST(COUNT(*) AS BIGINT) AS n_docs,
               |              CAST(SUM(pd.n_toks) AS BIGINT) AS n_tokens
               |       FROM d JOIN pd ON pd.doc_id < d.cutoff GROUP BY d.decile, d.cutoff),
               |va AS (SELECT d.decile, CAST(COUNT(*) AS BIGINT) AS n_distinct
               |       FROM d JOIN fs ON fs.first_doc < d.cutoff GROUP BY d.decile)
               |SELECT da.decile, da.cutoff, da.n_docs, da.n_tokens, va.n_distinct
               |FROM da JOIN va ON da.decile = va.decile ORDER BY da.decile""".stripMargin,
    spark = """WITH nn AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
              |d AS (SELECT CAST(k AS BIGINT) AS decile,
              |             CAST(FLOOR((SELECT n FROM nn) * k / 10.0) AS BIGINT) AS cutoff
              |      FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(k)),
              |pd AS (SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_toks
              |       FROM documents),
              |fs AS (SELECT token, MIN(doc_id) AS first_doc FROM (
              |         SELECT doc_id, explode(split(text, ' ')) AS token
              |         FROM documents) GROUP BY token),
              |da AS (SELECT d.decile, d.cutoff, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |              CAST(SUM(pd.n_toks) AS BIGINT) AS n_tokens
              |       FROM d JOIN pd ON pd.doc_id < d.cutoff GROUP BY d.decile, d.cutoff),
              |va AS (SELECT d.decile, CAST(COUNT(*) AS BIGINT) AS n_distinct
              |       FROM d JOIN fs ON fs.first_doc < d.cutoff GROUP BY d.decile)
              |SELECT da.decile, da.cutoff, da.n_docs, da.n_tokens, va.n_distinct
              |FROM da JOIN va ON da.decile = va.decile ORDER BY da.decile""".stripMargin) {
    (spark, sfDir) =>
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val perDoc = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
    val firstSeen = docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val n = Tables.documents(spark, sfDir).agg((max(col("doc_id")) + 1).as("n"))
    val cutoffs = spark.range(1, 11).toDF("decile")
      .crossJoin(broadcast(n))
      .select(col("decile"),
        floor(col("n") * col("decile") / 10.0).cast("long").as("cutoff"))
    val docsAt = perDoc.join(broadcast(cutoffs), col("doc_id") < col("cutoff"))
      .groupBy(col("decile"), col("cutoff"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_toks")).cast("long").as("n_tokens"))
    val vocabAt = firstSeen.join(broadcast(cutoffs), col("first_doc") < col("cutoff"))
      .groupBy(col("decile").as("vd"))
      .agg(count(lit(1)).cast("long").as("n_distinct"))
    docsAt.join(vocabAt, col("decile") === col("vd"))
      .select(col("decile"), col("cutoff"), col("n_docs"), col("n_tokens"),
        col("n_distinct"))
      .orderBy(col("decile"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    vocabGrowth,
    dedupReport, spanDedup,
    tokenizeWordcount, corpusStats, levenshteinBlock, jaccardTokens, minhashLsh,
    simhash, simhashCluster, ngramJaccard, ngramLsh, levenshteinLsh, langId, qualityScore,
    tokenCount, fingerprint, rollingHash, repetitionFilter, contamination,
    idfTopterms, clusterCc, clusterLsh, piiRedact, exactSubstring,
    unigramLogprob, containment, containmentPrefix, corpusFilter, ngramTopk, urlCanonicalize,
    chunkWindows, perplexityBigram, perplexityKn, dedupChunk, docKeywords,
    mixWeights, zipfSlope, gopherRules, perplexityBucket, bpeTrain, bpeApply)
}
