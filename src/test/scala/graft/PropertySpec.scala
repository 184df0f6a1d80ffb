package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.3.3 — property tests for the sketch/no-oracle operators and
  * algebraic invariants. */
class PropertySpec extends SparkSpecBase {

  test("agg_approx_hll within 5% of exact distinct counts") {
    val approx = Catalog.byKey("agg_approx_hll").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"HLL for $k: approx=$a exact=$n (>5% off)")
    }
  }

  test("agg_hll_sketch_union: union of per-nation sketches == direct sketch; ±5% of exact") {
    val rows = Catalog.byKey("agg_hll_sketch_union").run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val all = rows.filter(_._1 == "ALL")
    assert(all.length == 1, "exactly one ALL row")
    // mergeability is EXACT: HLL registers are max-of-hashes, so the union
    // of per-group sketches has identical registers to sketching the whole
    // column in one pass — same estimate to the last bit, not just close
    val direct = Tables.customer(spark, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("est"))
      .collect()(0).getLong(0)
    assert(all.head._2 == direct,
      s"union-of-sketches estimate ${all.head._2} != direct estimate $direct")
    // every scope (nations + ALL) estimates within 5% of its exact count
    rows.foreach { case (scope, est, exact) =>
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"HLL sketch for $scope: est=$est exact=$exact (>5% off)")
    }
  }

  test("dedup_minhash_lsh recall >= 0.9 against exact Jaccard >= 0.9 pairs") {
    // pair recall/precision are spec-scale properties of the shared rep
    // graph; the catalog entry emits the linear cluster form (r13 re-spec)
    // and is validated against these pairs in the cluster-agreement test
    val lsh = queries.TextQueries.minhashPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact >= 0.9 pairs over ALL pairs (no blocking — ground truth)
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val a = t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter))
      .where(col("j") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth unexpectedly empty")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (|exact|=${exact.size}, |lsh|=${lsh.size})")
    // precision is 1.0 by construction (candidates are verified exactly)
    assert((lsh -- exact).isEmpty, "LSH emitted a pair below the threshold")
  }

  test("dedup_minhash_lsh clusters refine + recall pair-graph components") {
    // Contract of the linear cluster form vs the spec-scale pair
    // enumeration's connected components (driver union-find ground
    // truth) — the same floor-based contract as dedup_cluster_lsh's
    // CcSpec, because the entry's candidates are CHAIN-sampled (≤
    // 2·s·(m-1) per bucket, linear at any clique depth) while the truth
    // expands every within-bucket pair. Chains recover connectivity with
    // high probability, not certainty, so:
    //  - REFINEMENT is exact (hard assert): every emitted cluster is a
    //    subset of one truth component and its label is that component's
    //    reachable min — every chain edge passes the same exact-Jaccard
    //    verify, so a false merge is structurally impossible.
    //  - RECALL is floored: ≥ 0.9 of truth's co-clustered doc pairs are
    //    co-clustered here, and ≥ 0.9 of truth's clustered docs appear.
    //  - cluster_size is internally consistent and ≥ 2.
    val pairs = queries.TextQueries.minhashPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(d => d -> find(d)).toMap // doc -> min of component
    val got = Catalog.byKey("dedup_minhash_lsh").run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotMap = got.map { case (d, c, _) => d -> c }.toMap
    // refinement: emitted docs are truth docs, co-emitted ⇒ co-truth
    gotMap.foreach { case (d, c) =>
      assert(truth.contains(d), s"doc $d clustered here but a singleton in truth")
      assert(truth(d) == truth(c), s"cluster $c merges truth components: doc $d")
    }
    // membership recall
    val memberRecall = gotMap.size.toDouble / truth.size
    // co-clustered pair recall (over truth's intra-component pairs)
    def coPairs(m: Map[Long, Long]): Set[(Long, Long)] =
      m.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }.toSet
    val truthPairs = coPairs(truth)
    val gotPairs = coPairs(gotMap)
    val pairRecall = (truthPairs intersect gotPairs).size.toDouble / truthPairs.size
    info(f"member recall $memberRecall%.4f (${gotMap.size}/${truth.size}), " +
      f"co-clustered pair recall $pairRecall%.4f (${truthPairs.size} truth pairs)")
    assert(memberRecall >= 0.9, f"member recall $memberRecall%.4f below floor")
    assert(pairRecall >= 0.9, f"pair recall $pairRecall%.4f below floor")
    // precision side of pairs: co-clustered here ⇒ co-clustered in truth
    assert((gotPairs diff truthPairs).isEmpty, "refinement violated at pair level")
    // cluster_size consistency
    val sizesGot = gotMap.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    got.foreach { case (d, c, sz) =>
      assert(sz == sizesGot(c), s"cluster_size for doc $d cluster $c: got $sz want ${sizesGot(c)}")
      assert(sz >= 2, s"singleton cluster leaked: doc $d")
    }
  }

  test("dedup_containment_prefix: precision 1.0 + recall floor vs blocked truth") {
    // Ground truth flags from the blocked-quadratic entry: a doc "has a
    // container" iff its n_containers count (>=0.95 containment over all
    // same-lang pairs) is positive. The prefix twin's flag must be a
    // subset (precision 1.0 - every flag is backed by an exact-verified
    // witness or an exact same-lang clone) with recall >= 0.9 under its
    // candidate cap.
    val truth = Catalog.byKey("dedup_containment").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) > 0)).toMap
    val got = Catalog.byKey("dedup_containment_prefix").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == truth.keySet, "per-doc output must cover every document")
    val flagged = got.filter(_._2).keySet
    val truthFlagged = truth.filter(_._2).keySet
    assert((flagged diff truthFlagged).isEmpty,
      s"precision violated: ${(flagged diff truthFlagged).take(5)} flagged but not in truth")
    val recall = (flagged intersect truthFlagged).size.toDouble / truthFlagged.size
    info(f"containment flag recall $recall%.4f (${truthFlagged.size} truth-flagged docs)")
    assert(recall >= 0.9, f"recall $recall%.4f below floor")
  }

  test("dedup_containment_prefix: null-text docs are singletons, never flagged (r14 fix)") {
    // Regression for the concat_ws fp bug: concat_ws silently DROPS a null
    // array_join(toks), so every null-text doc of a lang shared one fp and
    // got collapsed into a fake clone group with has_container=true. The
    // blocked truth never pairs null text, so precision 1.0 broke — latent
    // only because the real fixtures have no null text. Synthesize a corpus
    // with two null-text docs in one lang and assert both stay unflagged
    // while a genuine clone pair still is flagged.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = java.util.Arrays.asList(
      Row(1L, "alpha beta gamma", "en", "web", 16L),
      Row(2L, "alpha beta gamma", "en", "web", 16L), // exact clone of 1
      Row(3L, null, "en", "web", 0L),                // null text
      Row(4L, null, "en", "web", 0L),                // null text, same lang
      Row(5L, "delta epsilon", "en", "web", 13L))
    val dir = java.nio.file.Files.createTempDirectory("graft_nulltext_sf").toString
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Catalog.byKey("dedup_containment_prefix").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "every doc present exactly once")
    assert(got(1L) && got(2L), "the genuine clone pair must be flagged")
    assert(!got(3L) && !got(4L), "null-text docs must never be flagged as clones")
    assert(!got(5L), "unrelated doc unflagged")
  }

  test("LSH-composed verification: precision 1.0, recall >= 0.9 vs blocked path (VERDICT r1 #5)") {
    // Scale story: the blocked self-join pair metrics are quadratic in
    // their buckets; at 100 TB they run as a *verification stage* over
    // LSH-emitted candidates (O(|candidates|), two hash joins — see
    // TextQueries.verifyPairs). Restricted to the blocked path's own
    // predicate (same lang, ±20 chars), the composition's guarantees are:
    //   precision 1.0 — every composed pair passes the exact-Jaccard
    //     verify, so it must also appear in the exact blocked path;
    //   recall < 1.0 BY CONSTRUCTION — 5×8 banding has single-pair
    //     candidate probability 1-(1-j^8)^5 ≈ 0.89–0.97 on the j∈[0.9,0.94]
    //     shoulder of the S-curve, so set-equality cannot hold (round-2
    //     red test). Assert a recall floor instead, matching the adjacent
    //     ground-truth recall property above.
    val threshold = graft.GraftConf.minhashThreshold(spark)
    val band = graft.GraftConf.pairLengthBand(spark)
    val lshPairs = queries.TextQueries.minhashPairs(spark, sfDir)
    val composed = queries.TextQueries.verifyPairs(spark, sfDir, lshPairs)
      .where(col("jaccard") >= threshold
        && col("lang_a") === col("lang_b")
        && col("nc_b").between(col("nc_a") - band, col("nc_a") + band))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    // compare on (doc_a, doc_b) KEYS, with jaccard agreement asserted
    // separately (ADVICE r3): folding jaccard into the compared rows would
    // turn any future rounding drift into a confusing recall+precision
    // failure instead of a clear per-pair jaccard mismatch
    def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val composedMap = pairMap(composed)
    val blockedMap = pairMap(
      Catalog.byKey("text_jaccard_tokens").run(spark, sfDir)
        .where(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
    assert(blockedMap.nonEmpty, "blocked ground truth unexpectedly empty")
    val extras = composedMap.keySet -- blockedMap.keySet
    assert(extras.isEmpty, s"composed emitted pairs the exact path rejects: $extras")
    val common = composedMap.keySet & blockedMap.keySet
    common.foreach { p =>
      assert(composedMap(p) == blockedMap(p),
        s"jaccard mismatch on $p: composed=${composedMap(p)} blocked=${blockedMap(p)}")
    }
    val recall = common.size.toDouble / blockedMap.size
    assert(recall >= 0.9,
      s"composed recall $recall < 0.9 (|blocked|=${blockedMap.size}, |composed|=${composedMap.size})")
  }

  test("dedup_ngram_lsh: precision 1.0, recall >= 0.9 vs blocked discovery (VERDICT r3 #5)") {
    // the candidate-driven twin must emit ONLY pairs the exact blocked
    // form emits (precision 1.0 — every candidate is exactly verified
    // under the same lang/±20-chars predicate), and find ≥ 90% of them
    // (recall is probabilistic: r=1 banding, P = 1-(1-j)^16)
    def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val twin = pairMap(Catalog.byKey("dedup_ngram_lsh").run(spark, sfDir))
    val blocked = pairMap(Catalog.byKey("dedup_ngram_jaccard").run(spark, sfDir))
    assert(blocked.nonEmpty, "blocked ground truth unexpectedly empty")
    val extras = twin.keySet -- blocked.keySet
    assert(extras.isEmpty, s"twin emitted pairs the blocked path rejects: $extras")
    val common = twin.keySet & blocked.keySet
    common.foreach { p =>
      assert(twin(p) == blocked(p),
        s"jaccard2 mismatch on $p: twin=${twin(p)} blocked=${blocked(p)}")
    }
    val recall = common.size.toDouble / blocked.size
    assert(recall >= 0.9,
      s"twin recall $recall < 0.9 (|blocked|=${blocked.size}, |twin|=${twin.size})")
  }

  test("text_levenshtein_lsh: precision 1.0, recall >= 0.9 vs blocked discovery (VERDICT r3 #5)") {
    def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val twin = pairMap(Catalog.byKey("text_levenshtein_lsh").run(spark, sfDir))
    val blocked = pairMap(Catalog.byKey("text_levenshtein_block").run(spark, sfDir))
    assert(blocked.nonEmpty, "blocked ground truth unexpectedly empty")
    val extras = twin.keySet -- blocked.keySet
    assert(extras.isEmpty, s"twin emitted pairs the blocked path rejects: $extras")
    val common = twin.keySet & blocked.keySet
    common.foreach { p =>
      assert(twin(p) == blocked(p),
        s"dist mismatch on $p: twin=${twin(p)} blocked=${blocked(p)}")
    }
    val recall = common.size.toDouble / blocked.size
    assert(recall >= 0.9,
      s"twin recall $recall < 0.9 (|blocked|=${blocked.size}, |twin|=${twin.size})")
  }

  test("verify banding knobs reject non-divisor bands and degenerate bucket caps") {
    val key = "graft.dedup.verify.bands"
    try {
      spark.conf.set(key, "5") // 16 % 5 != 0
      intercept[IllegalArgumentException] { GraftConf.verifyBands(spark) }
      spark.conf.set(key, "8")
      assert(GraftConf.verifyBands(spark) == 8)
    } finally spark.conf.unset(key)
    assert(GraftConf.verifyBands(spark) == 16)
    val capKey = "graft.dedup.verify.maxBucket"
    try {
      spark.conf.set(capKey, "1") // cap < 2 can never emit a pair
      intercept[IllegalArgumentException] { GraftConf.verifyMaxBucket(spark) }
    } finally spark.conf.unset(capKey)
    assert(GraftConf.verifyMaxBucket(spark) == 64)
  }

  test("simhash maxHamming knob rejects degenerate and non-divisor values") {
    val key = "graft.dedup.simhash.maxHamming"
    try {
      // 0 would derive blockMask=0 (one bucket, full O(n²) self-join)
      spark.conf.set(key, "0")
      intercept[IllegalArgumentException] { GraftConf.simhashMaxHamming(spark) }
      // 5 → 6 blocks: 64 % 6 != 0 leaves high bits unbanded
      spark.conf.set(key, "5")
      intercept[IllegalArgumentException] { GraftConf.simhashMaxHamming(spark) }
      spark.conf.set(key, "7")
      assert(GraftConf.simhashMaxHamming(spark) == 7)
    } finally spark.conf.unset(key)
    assert(GraftConf.simhashMaxHamming(spark) == 3)
  }

  test("etl_dedup_latest is idempotent (f(f(x)) == f(x))") {
    val once = Catalog.byKey("etl_dedup_latest").run(spark, sfDir)
    once.createOrReplaceTempView("events_deduped")
    // re-apply the same keep-latest over the already-deduped view
    val twice = spark.sql(
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events_deduped
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin)
    assert(rowsOf(once) == rowsOf(twice))
  }

  test("FK join preserves fact cardinality (orders ⋈ customer)") {
    val o = Tables.orders(spark, sfDir)
    val joined = o.join(Tables.customer(spark, sfDir),
      col("o_custkey") === col("c_custkey"))
    assert(joined.count() == o.count())
  }

  test("win_running_sum final row per partition equals the group sum") {
    val rs = Catalog.byKey("win_running_sum").run(spark, sfDir)
    val lastPerCust = rs.groupBy(col("o_custkey"))
      .agg(max(col("running_total")).as("final_total"))
    val direct = Tables.orders(spark, sfDir).groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("decimal(18,4)").as("direct_total"))
    val mismatches = lastPerCust.join(direct, "o_custkey")
      .where(col("final_total") =!= col("direct_total")).count()
    assert(mismatches == 0)
  }

  test("set-op algebra: A union A distinct = A; A except A = empty") {
    val a = Tables.customer(spark, sfDir).select(col("c_custkey"))
    assert(a.union(a).distinct().count() == a.count())
    assert(a.except(a).count() == 0)
  }

  test("vec_ivf_knn recall vs brute-force top-10") {
    val ivf = Catalog.byKey("vec_ivf_knn").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = Catalog.byKey("vec_cosine_knn").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10 && brute.size == 10)
    val recall = (ivf & brute).size.toDouble / brute.size
    // labels-as-cells with nprobe 3/10: the true neighbours concentrate in
    // the query's own cell; anything under half overlap means the probe
    // ranking or the in-cell scan is broken
    assert(recall >= 0.5, s"IVF recall $recall too low (ivf=$ivf, brute=$brute)")
  }

  test("vec_lsh_ann recall vs brute-force top-10") {
    val lsh = Catalog.byKey("vec_lsh_ann").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = Catalog.byKey("vec_cosine_knn").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.size == 10 && brute.size == 10)
    val recall = (lsh & brute).size.toDouble / brute.size
    // same floor as the IVF entry: this corpus's neighbours sit at ~70°
    // (near-orthogonal), the hard regime for any ANN; under half overlap
    // means the hashing or the candidate join is broken, not the physics
    assert(recall >= 0.5, s"SRP-LSH recall $recall too low (lsh=$lsh, brute=$brute)")
  }

  test("vec_pq_ann recall vs brute-force top-10") {
    val pq = Catalog.byKey("vec_pq_ann").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = Catalog.byKey("vec_cosine_knn").run(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pq.size == 10 && brute.size == 10)
    val recall = (pq & brute).size.toDouble / brute.size
    // same floor as IVF/SRP: near-orthogonal neighbours are the hard ANN
    // regime; under half overlap means the codebooks or ADC are broken
    assert(recall >= 0.5, s"PQ recall $recall too low (pq=$pq, brute=$brute)")
  }

  test("vec_knn_graph_lsh: mean per-node edge recall vs the exact twin") {
    // the LSH-bucketed kNN graph must recover a solid fraction of the
    // exact graph's edges ON AVERAGE; per-node recall varies with bucket
    // luck on this near-orthogonal corpus (same physics note as the ANN
    // trio), so the floor is on the mean, not per node
    val exact = Catalog.byKey("vec_knn_graph").run(spark, sfDir)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Catalog.byKey("vec_knn_graph_lsh").run(spark, sfDir)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (src, nbrs) =>
      (lsh.getOrElse(src, Set.empty) & nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"mean kNN-graph edge recall $mean%.3f < 0.5 " +
      s"(nodes=${exact.size}, lsh nodes=${lsh.size})")
    // every ranked list the LSH graph does emit is exactly top-5-of-
    // candidates: rn must be dense 1..k with k <= 5
    val rns = Catalog.byKey("vec_knn_graph_lsh").run(spark, sfDir)
      .select("src", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    rns.foreach { case (src, l) =>
      assert(l == (1L to l.size.toLong), s"src=$src has non-dense ranks $l")
      assert(l.size <= 5, s"src=$src has ${l.size} > 5 edges")
    }
  }

  test("vec_knn_graph_lsh: duplicate-ratio gate + group-branch sibling guarantee (r16)") {
    // The r16 dup-ratio probe routes all-distinct corpora down the direct
    // SRP pipeline and duplicate-bearing corpora down the canonicalize-
    // first branch. The fixture corpus is all-distinct (gate = true);
    // synthesize a 30-group × 10-replica corpus (distinct ratio 0.1,
    // gate = false) and assert the group branch's core guarantee: every
    // member's top-5 is exactly its 5 smallest-id duplicate siblings at
    // cosine 1.0 (a member's true top-k starts with its siblings; tie-
    // break dst asc) — the property the 413 s→9.8 s 100× fix must keep.
    assert(queries.VectorQueries.embAllDistinct(spark, sfDir),
      "fixture embeddings should read as all-distinct")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new java.util.Random(20260816L)
    val dim = 16; val nGroups = 30; val depth = 10
    val base = Array.fill(nGroups)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = new java.util.ArrayList[Row]()
    // interleave ids across groups (id = m * nGroups + g) so sibling ids
    // are NON-contiguous — the guarantee must not depend on id layout
    for (m <- 0 until depth; g <- 0 until nGroups)
      rows.add(Row((m * nGroups + g).toLong, base(g).toSeq, g))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_dupvec_sf").toString
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(!queries.VectorQueries.embAllDistinct(spark, dir),
      "10-deep duplicate corpus must fail the all-distinct gate")
    val got = Catalog.byKey("vec_knn_graph_lsh").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bySrc = got.groupBy(_._1)
    assert(bySrc.size == nGroups * depth, "every member emits a ranked list")
    for (g <- 0 until nGroups) {
      val members = (0 until depth).map(m => (m * nGroups + g).toLong).sorted
      members.foreach { src =>
        val edges = bySrc(src).sortBy(_._2)
        assert(edges.map(_._2).toSeq == (1L to 5L), s"src=$src ranks not dense 1..5")
        assert(edges.forall(_._4 == 1.0), s"src=$src has a non-sibling (<1.0) edge")
        val want = members.filter(_ != src).take(5)
        assert(edges.map(_._3).toSeq == want,
          s"src=$src neighbors ${edges.map(_._3).toSeq} != 5 smallest siblings $want")
      }
    }
  }

  test("vec_ivf_pq MEAN recall over 10 queries vs brute force") {
    // mean over 10 query ids, not one: single-query recall@10 swings ±0.2
    // on this near-orthogonal corpus (measured in RecallAB), so a one-query
    // floor passes or fails on noise. Observed mean 0.44 (residual ≡ raw
    // here — labels are unclustered so cell centroids ≈ 0); floor 0.35
    // with the recall ceiling itself set by nprobe cell-miss.
    val qids = Seq(0L, 17L, 59L, 101L, 167L, 234L, 301L, 334L, 408L, 455L)
    val recalls = qids.map { q =>
      val got = graft.queries.VectorQueries.ivfPqTopK(spark, sfDir, q, residual = true)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val brute = graft.queries.VectorQueries.bruteTopK(spark, sfDir, q)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got.size == 10 && brute.size == 10)
      (got & brute).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.35, s"IVF-PQ mean recall $mean too low ($recalls)")
  }

  test("dedup_simhash finds every exact-duplicate pair at Hamming 0") {
    val sim = Catalog.byKey("dedup_simhash").run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ground truth: docs sharing an identical distinct token set
    val fp = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(array_join(sort_array(array_distinct(split(col("text"), " "))), " ")).as("fp"))
    val a = fp.select(col("fp"), col("doc_id").as("doc_a"))
    val b = fp.select(col("fp"), col("doc_id").as("doc_b"))
    val clones = a.join(b, "fp").where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clones.nonEmpty, "corpus unexpectedly has no exact dups")
    clones.foreach { p =>
      assert(sim.get(p).contains(0L), s"clone pair $p missing or hamming != 0")
    }
  }

  test("agg_hll_sketch_merge within 5% of exact after the union") {
    val merged = Catalog.byKey("agg_hll_sketch_merge").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n <= 0.05,
        s"merged sketch for $k: ${merged(k)} vs exact $n")
    }
  }

  test("hash-sampled quantiles land within 10% of full-data quantiles") {
    val est = Catalog.byKey("agg_sampled_quantiles").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val exact = Catalog.byKey("agg_percentile_exact").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // at sf0.001 each status group yields only ~60-90 sampled rows, so the
    // sampling error of a long-tailed price median is substantial; the
    // bound here checks the machinery, the error shrinks as 1/sqrt(n)
    exact.foreach { case (k, (m, p90)) =>
      val (me, p90e) = est(k)
      assert(math.abs(me - m) / m <= 0.30, s"median for $k: est $me vs $m")
      assert(math.abs(p90e - p90) / p90 <= 0.30, s"p90 for $k: est $p90e vs $p90")
    }
  }

  test("etl_quality_audit reports zero violations on the clean corpus") {
    val audit = Catalog.byKey("etl_quality_audit").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit("orders_null_custkey") == 0)
    assert(audit("lineitem_bad_discount") == 0)
    assert(audit("lineitem_orphan_orders") == 0)
    assert(audit("orders_orphan_customer") == 0)
    assert(audit("lineitem_rows") > 0 && audit("orders_rows") > 0)
  }
}
