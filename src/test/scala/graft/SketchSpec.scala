package graft

import graft.functions.{KllSketch, TopKSketch}
import org.apache.spark.sql.functions._

/** Properties of the mergeable KLL-style quantile sketch (VERDICT r2 #7):
  * rank-error bound, weight conservation, merge-topology independence of
  * the bound, and the Spark entry's accuracy vs exact percentiles. */
class SketchSpec extends SparkSpecBase {

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Deterministic pseudo-shuffle of 1..n (LCG-driven Fisher-Yates) — a
    * fixed adversarial-ish insertion order without java.util.Random. */
  private def shuffled(n: Int): Array[Double] = {
    val a = Array.tabulate(n)(i => (i + 1).toDouble)
    var state = 0x5DEECE66DL
    var i = n - 1
    while (i > 0) {
      state = state * 6364136223846793005L + 1442695040888963407L
      val j = ((state >>> 33) % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  /** True rank (fraction ≤ est) of an estimate within 1..n. */
  private def rankErr(est: Double, n: Int, p: Double): Double =
    math.abs(math.min(est, n) / n - p)

  test("rank error <= 2% at k=256 over 100k values (single sketch)") {
    val n = 100000
    val sk = new KllSketch(256)
    shuffled(n).foreach(sk.update)
    assert(sk.n == n)
    probs.foreach { p =>
      val err = rankErr(sk.quantile(p), n, p)
      assert(err <= 0.02, s"p=$p est=${sk.quantile(p)} rank error $err > 2%")
    }
  }

  test("exact (zero rank error) while n < k — no compaction has happened") {
    val sk = new KllSketch(256)
    shuffled(200).foreach(sk.update)
    probs.foreach { p =>
      // walk semantics: smallest value whose cumulative weight >= p*n,
      // which for unit weights is the exact ceiling-rank order statistic
      val expected = math.max(1, math.ceil(p * 200).toInt).toDouble
      assert(sk.quantile(p) == expected, s"p=$p: ${sk.quantile(p)} != $expected")
    }
  }

  test("merge conserves count exactly and keeps the bound across topologies") {
    val n = 100000
    val data = shuffled(n)
    val chunks = data.grouped(n / 10).toArray

    def sketchOf(xs: Array[Double]): KllSketch = {
      val s = new KllSketch(256); xs.foreach(s.update); s
    }
    // topology A: left fold
    val foldLeft = chunks.map(sketchOf).reduceLeft { (a, b) => a.merge(b); a }
    // topology B: balanced tree
    def tree(ss: Array[KllSketch]): KllSketch =
      if (ss.length == 1) ss.head
      else tree(ss.grouped(2).map { g =>
        if (g.length == 2) { g(0).merge(g(1)); g(0) } else g(0)
      }.toArray)
    val balanced = tree(chunks.map(sketchOf))
    // topology C: reversed fold
    val foldRight = chunks.reverse.map(sketchOf).reduceLeft { (a, b) => a.merge(b); a }

    Seq("foldLeft" -> foldLeft, "balanced" -> balanced, "foldRight" -> foldRight)
      .foreach { case (name, sk) =>
        assert(sk.n == n, s"$name lost weight: ${sk.n} != $n")
        probs.foreach { p =>
          val err = rankErr(sk.quantile(p), n, p)
          assert(err <= 0.02, s"$name p=$p rank error $err > 2%")
        }
      }
  }

  test("merging sketches built with different k stays within the coarser bound") {
    val n = 50000
    val data = shuffled(n)
    val a = new KllSketch(256); data.take(n / 2).foreach(a.update)
    val b = new KllSketch(64); data.drop(n / 2).foreach(b.update)
    a.merge(b)
    assert(a.n == n)
    probs.foreach { p =>
      val err = rankErr(a.quantile(p), n, p)
      assert(err <= 0.05, s"mixed-k p=$p rank error $err > 5%")
    }
  }

  test("serialize/deserialize round-trips the sketch bit-exactly") {
    val sk = new KllSketch(64)
    shuffled(10000).foreach(sk.update)
    val back = KllSketch.deserialize(sk.serialize())
    assert(back.n == sk.n && back.k == sk.k)
    probs.foreach(p => assert(back.quantile(p) == sk.quantile(p)))
  }

  // ---- TopKSketch (Misra–Gries heavy hitters) ----

  /** Deterministic Zipf-ish key stream: key i appears ~n/i times, emitted
    * in an interleaved (worst-ish) order via the same LCG shuffle. */
  private def zipfKeys(nKeys: Int, scale: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 to nKeys).foreach { i =>
      val reps = math.max(1, scale / i)
      (0 until reps).foreach(_ => out += f"k$i%03d")
    }
    // LCG Fisher-Yates on indices
    val a = out.toArray
    var state = 0x2545F4914F6CDD1DL
    var i = a.length - 1
    while (i > 0) {
      state = state * 6364136223846793005L + 1442695040888963407L
      val j = ((state >>> 33) % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  test("topk exact regime: distinct <= capacity means exact counts, any topology") {
    val keys = zipfKeys(nKeys = 20, scale = 1000) // 20 distinct
    val truth = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // single sketch
    val one = new TopKSketch(32)
    keys.foreach(one.update)
    truth.foreach { case (k, c) => assert(one.estimate(k).contains(c), s"single $k") }
    // merged from 7 chunks
    val chunks = keys.grouped(keys.length / 7 + 1).toArray
    val merged = chunks.map { ch =>
      val s = new TopKSketch(32); ch.foreach(s.update); s
    }.reduceLeft { (a, b) => a.merge(b); a }
    assert(merged.n == keys.length)
    truth.foreach { case (k, c) => assert(merged.estimate(k).contains(c), s"merged $k") }
  }

  test("topk MG bound: undercount <= n/(cap+1), heavy keys always present") {
    val keys = zipfKeys(nKeys = 500, scale = 2000) // ~500 distinct, skewed
    val truth = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = keys.length
    val cap = 64
    val chunks = keys.grouped(n / 8 + 1).toArray
    val merged = chunks.map { ch =>
      val s = new TopKSketch(cap); ch.foreach(s.update); s
    }.reduceLeft { (a, b) => a.merge(b); a }
    val bound = n.toDouble / (cap + 1)
    merged.entries.foreach { case (k, est) =>
      val t = truth(k)
      assert(est <= t, s"$k overcounts: $est > $t")
      assert(t - est <= bound, s"$k undercount ${t - est} > bound $bound")
    }
    // guarantee: every key with true count > n/(cap+1) survives
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(merged.estimate(k).nonEmpty, s"heavy key $k evicted (true=${truth(k)})")
    }
  }

  test("topk serialize/deserialize round-trips and top() order is total") {
    val sk = new TopKSketch(16)
    zipfKeys(nKeys = 10, scale = 100).foreach(sk.update)
    val back = TopKSketch.deserialize(sk.serialize())
    assert(back.n == sk.n && back.capacity == sk.capacity)
    assert(back.top(10) == sk.top(10))
    // ties broken by key asc: craft two equal-count keys
    val t = new TopKSketch(8)
    Seq("b", "a", "b", "a").foreach(t.update)
    assert(t.top(2) == Seq(("a", 2L), ("b", 2L)))
  }

  test("agg_topk_sketch matches exact groupBy top-3 at sf (exact regime)") {
    val got = Catalog.byKey("agg_topk_sketch").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val truth = Tables.events(spark, sfDir)
      .select(((year(col("ts")) * 100) + month(col("ts"))).cast("long").as("ym"),
        col("event_type"))
      .groupBy(col("ym"), col("event_type")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3)
      }.sortBy(r => (r._1, -r._3, r._2))
    assert(got.toSeq == truth, s"got=${got.toSeq}\ntruth=$truth")
  }

  test("cms never undercounts; overcount within the epsilon-N bound") {
    // adversarially small width (16) over 400 distinct keys with a zipf-ish
    // skew — collisions guaranteed, the bounds must still hold
    val sk = new graft.functions.CountMinSketch(4, 16)
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
    for (i <- 0 until 400; _ <- 0 to (400 / (i + 1))) {
      val k = s"key_$i"
      sk.update(k)
      truth.update(k, truth.getOrElse(k, 0L) + 1)
    }
    val n = sk.n
    assert(n == truth.values.sum)
    val eps = math.E / 16 // e/width
    truth.foreach { case (k, c) =>
      val est = sk.estimate(k)
      assert(est >= c, s"$k undercounted: est=$est true=$c")
      // depth-4 failure probability per key ~ e^-4; with 400 keys allow a
      // generous 3x slack so the test is deterministic, not probabilistic
      assert(est <= c + 3 * eps * n,
        s"$k overcounted past bound: est=$est true=$c n=$n")
    }
  }

  test("cms merge is pointwise-sum exact: any merge topology is bit-identical") {
    def build(keys: Seq[String]): graft.functions.CountMinSketch = {
      val sk = new graft.functions.CountMinSketch(4, 64)
      keys.foreach(sk.update)
      sk
    }
    val keys = (0 until 2000).map(i => s"k${i % 137}")
    val flat = build(keys)
    val chunks = keys.grouped(300).map(build).toSeq
    // left-fold chain
    val chain = new graft.functions.CountMinSketch(4, 64)
    chunks.foreach(chain.merge)
    // two-level tree
    val tree = new graft.functions.CountMinSketch(4, 64)
    chunks.grouped(3).foreach { g =>
      val mid = new graft.functions.CountMinSketch(4, 64)
      g.foreach(mid.merge)
      tree.merge(mid)
    }
    assert(java.util.Arrays.equals(flat.serialize(), chain.serialize()))
    assert(java.util.Arrays.equals(flat.serialize(), tree.serialize()))
  }

  test("agg_cms_freq sits in the exact regime: estimates equal exact counts") {
    val got = Catalog.byKey("agg_cms_freq").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth, s"got=$got\ntruth=$truth")
  }

  test("theta estimation mode: union/intersection within 5x RSE of exact sets") {
    // 100k and 80k member sets with 40k overlap, lgK=10 (k=1024) — deep in
    // estimation mode; fixed hash seed makes the assertion deterministic
    import graft.functions.ThetaSketchOps
    val a = ThetaSketchOps.emptyUnion(10)
    val b = ThetaSketchOps.emptyUnion(10)
    (0L until 100000L).foreach(a.update)
    (60000L until 140000L).foreach(b.update)
    val rse = 5.0 / math.sqrt(1 << 10)
    def ok(est: Double, truth: Double): Boolean = math.abs(est - truth) <= rse * truth
    assert(ok(a.getResult().getEstimate, 100000), s"a=${a.getResult().getEstimate}")
    assert(ok(b.getResult().getEstimate, 80000), s"b=${b.getResult().getEstimate}")
    val u = ThetaSketchOps.emptyUnion(10)
    u.union(a.getResult()); u.union(b.getResult())
    assert(ok(u.getResult().getEstimate, 140000), s"u=${u.getResult().getEstimate}")
    val inter = org.apache.datasketches.theta.SetOperation.builder().buildIntersection()
    inter.intersect(a.getResult()); inter.intersect(b.getResult())
    // intersection error compounds (estimated over the union's theta) —
    // allow 3x the union tolerance
    assert(math.abs(inter.getResult().getEstimate - 40000) <= 3 * rse * 40000,
      s"inter=${inter.getResult().getEstimate}")
  }

  test("theta exact regime below saturation: estimates equal set algebra") {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), col("user_id")).collect()
    val views = ev.filter(_.getString(0) == "view").map(_.getLong(1)).toSet
    val purch = ev.filter(_.getString(0) == "purchase").map(_.getLong(1)).toSet
    val got = Catalog.byKey("agg_theta_sets").run(spark, sfDir).collect().head
    assert(got.getLong(0) == views.size && got.getLong(1) == purch.size
      && got.getLong(2) == (views & purch).size && got.getLong(3) == (views | purch).size,
      s"got=$got views=${views.size} purch=${purch.size}")
  }

  test("agg_kll_quantiles estimates within 5% rank error of each group's data") {
    val est = Catalog.byKey("agg_kll_quantiles").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val groups = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("price"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(est.keySet == groups.keySet)
    groups.foreach { case (flag, values) =>
      val n = values.length
      val (p50, p90, p99) = est(flag)
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (p, e) =>
        val rank = values.count(_ <= e).toDouble / n
        assert(math.abs(rank - p) <= 0.05,
          s"$flag p=$p est=$e true rank $rank (n=$n)")
      }
    }
  }

  test("agg_approx_pctl: GK rank error within 1/accuracy of the exact sort") {
    // approx_percentile's contract: the returned value's true rank is within
    // n/accuracy of p·n. The returned value is always a group MEMBER, so we
    // check the rank interval [count(<v), count(<=v)] against p ± ε with
    // ε = 1/accuracy + 1/n (the +1/n absorbs discreteness at small groups).
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    // long-form (o_orderstatus, q, value) rows since round 11 — regroup to
    // per-status quantile vectors ordered by q
    val est = Catalog.byKey("agg_approx_pctl").run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val groups = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_totalprice").cast("double").as("v"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(est.keySet == groups.keySet)
    groups.foreach { case (st, values) =>
      val n = values.length
      val eps = 1.0 / 10000 + 1.0 / n
      probs.zip(est(st)).foreach { case (p, v) =>
        assert(values.contains(v), s"$st p=$p: $v is not a group member")
        val lo = values.count(_ < v).toDouble / n
        val hi = values.count(_ <= v).toDouble / n
        assert(lo <= p + eps && hi >= p - eps,
          s"$st p=$p est=$v rank interval [$lo,$hi] outside ±$eps (n=$n)")
      }
    }
  }

  test("bitmap distinct: OR is merge-topology invariant and popcount exact") {
    import graft.functions.BitmapOps
    val maxId = 4096
    val ids = (0 until 3000).map(i => (i * 37L) % maxId) // collides on purpose
    // flat
    val flat = BitmapOps.alloc(maxId)
    ids.foreach(BitmapOps.set(flat, _, maxId))
    // two-level merge of 7 shards
    val shards = ids.grouped(450).map { g =>
      val b = BitmapOps.alloc(maxId); g.foreach(BitmapOps.set(b, _, maxId)); b
    }.toSeq
    val merged = shards.reduce(BitmapOps.or)
    assert(java.util.Arrays.equals(flat, merged))
    assert(BitmapOps.cardinality(flat) == ids.distinct.length)
  }

  test("bitmap distinct: out-of-domain ids fail fast, never undercount") {
    import graft.functions.BitmapOps
    val b = BitmapOps.alloc(64)
    intercept[IllegalArgumentException] { BitmapOps.set(b, 64L, 64) }
    intercept[IllegalArgumentException] { BitmapOps.set(b, -1L, 64) }
  }

  test("agg_bitmap_distinct equals COUNT(DISTINCT) per segment and overall") {
    val got = Catalog.byKey("agg_bitmap_distinct").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val truthSeg = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truthAll = orders.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(got == truthSeg + ("ALL" -> truthAll), s"got=$got truth=$truthSeg ALL=$truthAll")
  }
}
