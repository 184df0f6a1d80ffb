package graft

import org.apache.spark.sql.SparkSession

/** Runtime-tunable knobs for the scale-sensitive operators, read from
  * `spark.conf` (settable per session / per job, no recompile) with the
  * round-1-profiled values as defaults.
  *
  * Why these are config and not constants (VERDICT.md r1, "Performance"):
  * LSH banding (`P(candidate) = 1-(1-j^r)^b`), SimHash block count, IVF
  * nprobe, and the pair-verifier blocking width are all corpus-dependent —
  * the right values at 100 TB depend on the dup-rate and length
  * distribution of THAT corpus, so a deployment must be able to retune
  * them without patching the engine.
  */
object GraftConf {
  private def get(spark: SparkSession, key: String, default: String): String =
    spark.conf.getOption(key).getOrElse(default)

  /** MinHash signature length. More hashes → tighter Jaccard estimate. */
  def minhashHashes(spark: SparkSession): Int =
    get(spark, "graft.dedup.minhash.hashes", "40").toInt

  /** LSH band count b (rows per band r = hashes/b). The (b, r) pair sets
    * the S-curve: candidate probability 1-(1-j^r)^b. Defaults (5, 8)
    * target threshold ~0.9: P≈0.94 at j=0.9, P≈0.02 at j=0.5. */
  def minhashBands(spark: SparkSession): Int =
    get(spark, "graft.dedup.minhash.bands", "5").toInt

  /** Exact-Jaccard verification threshold applied to LSH candidates. */
  def minhashThreshold(spark: SparkSession): Double =
    get(spark, "graft.dedup.minhash.threshold", "0.9").toDouble

  /** Independent chain orders per band for dedup_minhash_lsh's linear
    * candidate spelling (cluster form). Each salt contributes one more
    * O(m log m) window pass and ≤ 2(m-1) candidates per bucket — still
    * linear in bucket depth; more salts → higher connectivity recall on
    * the verified pair graph (measured at sf0.001 vs the quadratic
    * expansion's components: co-clustered pair recall 0.91 at s=4,
    * 0.94 at s=6 — the default; precision is structurally 1.0). */
  def minhashChainSalts(spark: SparkSession): Int = {
    val v = get(spark, "graft.dedup.minhash.chainSalts", "6").toInt
    // mirrors containmentCandCap's guard: 0/negative would make the
    // (0 until salts).map(...).reduce in minhashRepStage throw an opaque
    // empty-collection UnsupportedOperationException far from the knob
    require(v >= 1, s"graft.dedup.minhash.chainSalts=$v must be >= 1")
    v
  }

  /** Shared-frame memos (graph edge frames, vector index artifacts,
    * Tables.load): pure perf caches over immutable inputs — results are
    * identical either way; off only for memory-starved diagnostics. */
  def graphMemo(spark: SparkSession): Boolean =
    get(spark, "graft.graph.memo", "true").toBoolean

  /** Storage level for the graph family's cached frames (the shared edge
    * memos and the entry-local degree / oriented-edge / top-k-neighbor
    * frames). Default MEMORY_AND_DISK_SER — the r18 posture experiment
    * (ProfileGraphStorage, min-of-2 interleaved reps, one JVM, clean
    * calib) tested the r17 heap attribution for the one-box 100× graph
    * residuals and CONFIRMED it: triangle 287.5 → 201.8 s (×0.70),
    * jaccard 246.8 → 190.1 s (×0.77) at 100×, and neutral-to-faster at
    * sf0.1 too (label_prop 5.2 → 3.8 s, others −0.3-0.4 s, none slower)
    * — the serialized blocks relieve exactly the GC tax the exponent was
    * attributed to, at no small-scale cost. MEMORY_ONLY restores the
    * plain `.cache()` posture for A/B. Results identical either way. */
  def graphStorageLevel(spark: SparkSession): org.apache.spark.storage.StorageLevel =
    org.apache.spark.storage.StorageLevel.fromString(
      get(spark, "graft.graph.storageLevel", "MEMORY_AND_DISK_SER"))

  /** r19 one-box graph-residual experiment (VERDICT r18 #5): localCheckpoint
    * the oriented-edge / top-w-neighbor frames instead of persist-with-
    * lineage, truncating the lineage that keeps the upstream wide frames
    * (union'd edge list, degree joins) referenced through the closure's
    * heavy phase. Default FALSE — measured NEGATIVE-to-neutral at 100×
    * (ProfileGraphStorage, best-of-2 interleaved reps in one JVM, with
    * the r19 memo-eviction fix so each measurement rebuilds the shared
    * memo at its own posture: triangle 248.6 → 299.9 s (×1.21 worse),
    * jaccard 268.7 → 251.0 s (×0.93, inside the window's noise — rep
    * calibs swung 0.065-0.123 across the leg): localCheckpoint pins
    * deserialized MEMORY_AND_DISK blocks, surrendering exactly the
    * serialized-block GC relief the shipped SER default buys, and the
    * lineage it truncates holds plans, not rows, so there was no
    * liveness to reclaim on one box. Knob retained for true
    * multi-executor deployments, where checkpoint also shortens recovery
    * lineage. Full leg in BASELINE.md round-19 addendum. */
  def graphCheckpoint(spark: SparkSession): Boolean =
    get(spark, "graft.graph.checkpoint", "false").toBoolean

  /** r14 segment-contraction pre-pass toggle for the chain-candidate
    * propagation entries (dedup_minhash_lsh, dedup_cluster_lsh): star
    * verified chain runs to their min node before ccLabels so PATH-shaped
    * components cost fewer serialized pointer-jump rounds. Connectivity
    * is identical either way (star edges only connect already-connected
    * nodes — output row-identical, checked by ProfileContraction).
    *
    * Default FALSE — measured negative at sf0.1 (ProfileContraction,
    * same-JVM interleaved ×3): ccLabels converges in 2 rounds with OR
    * without the pre-pass (the union of 6 salted chain orders already
    * gives near-random-graph connectivity, so component diameter is
    * small), and 2 rounds is the loop's floor (propagate + confirm). The
    * pre-pass therefore bought zero rounds and cost +1.5–2.5 s/entry in
    * adjacency caching + ok1 join + two extra window passes. Turn it on
    * for corpora whose verified chains DO form long paths (e.g. few
    * salts, heavily ordered near-dup chains — watch `graft.cc.debug`
    * round counts exceed 2-3). */
  def dedupStarContraction(spark: SparkSession): Boolean =
    get(spark, "graft.dedup.starContraction", "false").toBoolean

  /** SimHash: max Hamming distance accepted as near-dup. Block count for
    * candidate generation is derived: maxHamming+1 blocks (pigeonhole —
    * a pair within the bound must agree on at least one block).
    *
    * Validated: maxHamming+1 must divide the 64 fingerprint bits, so the
    * legal values are 1, 3, 7, 15, 31, 63. Without the check, 0 derives
    * blockBits=64 → blockMask=(1L<<64)-1==0 → every doc lands in ONE
    * bucket and the "blocked" join silently degrades to a full O(n²)
    * self-join; a non-divisor leaves the high bits out of every block, so
    * near-dup pairs differing only there would be silently missed. */
  def simhashMaxHamming(spark: SparkSession): Int = {
    val v = get(spark, "graft.dedup.simhash.maxHamming", "3").toInt
    require(v >= 1 && 64 % (v + 1) == 0,
      s"graft.dedup.simhash.maxHamming=$v invalid: maxHamming+1 must divide 64 " +
        "(legal values: 1, 3, 7, 15, 31, 63)")
    v
  }

  /** Candidate-generator banding for the exact-verify twins
    * (`dedup_ngram_lsh`, `text_levenshtein_lsh`): signature length and
    * band count for [[graft.queries.TextQueries.lshCandidates]].
    * r = hashes/bands sets the S-curve 1-(1-j^r)^b; the defaults (16, 16)
    * give r=1 — the right shape for the twins' permissive thresholds
    * (bigram j ≥ 0.2 ⇒ P ≈ 0.97). Validated: bands must divide hashes. */
  def verifyHashes(spark: SparkSession): Int =
    get(spark, "graft.dedup.verify.hashes", "16").toInt

  def verifyBands(spark: SparkSession): Int = {
    val h = verifyHashes(spark)
    val b = get(spark, "graft.dedup.verify.bands", "16").toInt
    require(b >= 1 && h % b == 0,
      s"graft.dedup.verify.bands=$b invalid: must be >= 1 and divide hashes=$h")
    b
  }

  /** LSH bucket-size cap for the candidate generator: buckets larger than
    * this hold a stop-gram (a super-common shingle that happened to be the
    * min-hash) and are dropped as non-discriminative rather than joined
    * quadratically. An ABSOLUTE count on purpose — at any corpus size a
    * bucket this large carries no similarity signal, while the quadratic
    * cost of joining it grows without bound. */
  /** r19 adaptive physical path for the token-set pair entries
    * (dedup_containment, text_jaccard_tokens): when the corpus' GLOBAL
    * distinct-token count is ≤ 64 — counted from the data, one scalar
    * stats job, the same statistics-driven plan choice a CBO makes — each
    * doc's distinct token set is encoded as an exact 64-bit bitmask over
    * a data-derived dictionary (no hashing, a bijection), and the
    * per-pair |A∩B| collapses from a sorted-merge over string arrays to
    * ONE bit_count(mask_a & mask_b). Outputs are bit-identical to the
    * sorted-array spelling by construction (both compute the same integer
    * set sizes); the array spelling remains the >64-vocab general path
    * and the BitmaskPathSpec pins the two paths equal. "auto" (default)
    * picks by the counted vocab; "off" pins the general path (also the
    * 100-TB default posture, where the vocab-count job over raw text is
    * itself a full scan you may not want to pay twice). */
  def tokenBitmask(spark: SparkSession): Boolean = {
    val v = get(spark, "graft.text.tokenBitmask", "auto")
    require(v == "auto" || v == "off",
      s"graft.text.tokenBitmask=$v invalid: auto|off")
    v == "auto"
  }

  /** Companion adaptive path for the BIGRAM pair entry
    * (dedup_ngram_jaccard), where the shingle vocabulary outgrows 64 bits
    * (31-token corpus ⇒ ≤961 observed bigrams) but stays broadcastable:
    * when the counted distinct-bigram vocabulary is ≤ 2^16, bigrams ride
    * as dictionary-assigned ARRAY<BIGINT> ids (a bijection — row_number
    * over the sorted distinct bigrams, no hashing) and the per-pair
    * intersect is the primitive-long sorted merge
    * (`sorted_intersect_size_l`) over 8 B/element arrays instead of the
    * UTF8String merge over ~11 B string elements. Same exactness posture
    * as tokenBitmask (BitmaskPathSpec pins path equality); "off" pins the
    * general string path. */
  def gramDict(spark: SparkSession): Boolean = {
    val v = get(spark, "graft.text.gramDict", "auto")
    require(v == "auto" || v == "off", s"graft.text.gramDict=$v invalid: auto|off")
    v == "auto"
  }

  def verifyMaxBucket(spark: SparkSession): Int = {
    val v = get(spark, "graft.dedup.verify.maxBucket", "64").toInt
    require(v >= 2, s"graft.dedup.verify.maxBucket=$v invalid: must be >= 2")
    v
  }

  /** Streaming shuffle partitions = state-store instances per stateful
    * operator. Sized to sustained input rate, not to cores: every store
    * pays per-micro-batch checkpoint commit IO, so oversizing taxes each
    * batch. Safe to vary per deployment because each of our streaming
    * entries starts from a fresh checkpoint (the count is pinned only for
    * the life of a checkpoint). */
  def streamShufflePartitions(spark: SparkSession): Int =
    get(spark, "graft.stream.shufflePartitions", "8").toInt

  /** IVF probe width: how many coarse cells the query scans. */
  def ivfNprobe(spark: SparkSession): Int =
    get(spark, "graft.ann.ivf.nprobe", "3").toInt

  /** PQ Lloyd-training sample modulus: rounds train on vectors with
    * `vec_id % mod == 1` (ids are dense, so a uniform 1/mod draw); 1 =
    * train on the full corpus. Only training is sampled — the final
    * encode always covers every vector. */
  def pqTrainSampleMod(spark: SparkSession): Int =
    get(spark, "graft.ann.pq.trainSampleMod", "4").toInt

  /** SRP-LSH ANN (`vec_lsh_ann`): number of hash tables and bits per
    * table. Recall rises with tables, candidate count falls with bits —
    * scale nBits ≈ log2(corpus / target_bucket_size) as data grows; the
    * defaults suit the ~10³-vector test corpus. */
  def lshAnnTables(spark: SparkSession): Int =
    get(spark, "graft.ann.lsh.tables", "8").toInt

  def lshAnnBits(spark: SparkSession): Int = {
    val v = get(spark, "graft.ann.lsh.bits", "4").toInt
    require(v >= 1 && v <= 30, s"graft.ann.lsh.bits=$v out of [1,30]")
    v
  }

  /** Target SRP bucket occupancy: the effective bits per table are raised
    * above `graft.ann.lsh.bits` to ceil(log2(n / target)) as the corpus
    * grows, keeping expected bucket size — and with it the co-bucket
    * candidate count per point — CONSTANT in n. Without this the bucket
    * population grows linearly and co-bucket pair enumeration goes
    * quadratic: the round-12 10× scale proof measured vec_knn_graph_lsh
    * at 77× cost for 10× data under fixed 4-bit tables, vs candidate
    * counts linear in n once the occupancy is pinned. */
  def lshAnnTargetBucket(spark: SparkSession): Int = {
    val v = get(spark, "graft.ann.lsh.targetBucket", "128").toInt
    require(v >= 2, s"graft.ann.lsh.targetBucket=$v invalid: must be >= 2")
    v
  }

  /** Per-representative candidate cap for dedup_containment_prefix (the
    * linear containment twin): each contained-side rep verifies at most
    * this many prefix-filter candidates. An ABSOLUTE count like
    * verifyMaxBucket — the cap is what bounds the entry linear on
    * dup-heavy corpora where true witnesses (and so uncapped candidates)
    * grow quadratically in clique depth; recall under the cap is
    * floor-tested against the blocked ground truth. */
  def containmentCandCap(spark: SparkSession): Int = {
    val v = get(spark, "graft.dedup.containment.candCap", "64").toInt
    require(v >= 1, s"graft.dedup.containment.candCap=$v invalid: must be >= 1")
    v
  }

  /** Pair-verifier blocking: char-length band half-width (docs pair only
    * within ±width chars) and the derived bucket width. At 100 TB this is
    * the knob that bounds intra-bucket quadratic cost — narrow it as the
    * corpus grows, or skip blocking entirely and feed LSH candidates
    * (see TextQueries.verifyCandidates, the compose-with-LSH path). */
  def pairLengthBand(spark: SparkSession): Int =
    get(spark, "graft.dedup.pair.lengthBand", "20").toInt
}
