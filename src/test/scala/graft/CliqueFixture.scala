package graft

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Clique-heavy synthetic corpus for the cliff canary (VERDICT r17 #1):
  * the adversarial regime where every 100×-only cliff lived — deep clone
  * cliques and constant value domains, at sf0.001-like size so the spec
  * runs in seconds.
  *
  * Structure: `cliques` near-dup cliques; each clique holds `variants`
  * DISTINCT payloads (one token / one coordinate apart — near-dups that
  * band together but fingerprint apart), each repeated `reps` times as
  * EXACT clones. Scaling `reps` (variants fixed) is the discriminating
  * experiment: value-level machinery sees a CONSTANT distinct-value
  * population (intermediates grow linearly, with the scan), while
  * doc-level pairing grows quadratically — the canary doubles `reps` and
  * bounds the growth of the largest per-node output-row count.
  *
  * Fully deterministic (index arithmetic, no RNG). Tables carry the exact
  * driver schemas; lineitem keeps the constant ≤50-value quantity domain
  * and in-window shipdates that made join_theta_range/join_range_bucketed
  * cliff at 100×.
  */
object CliqueFixture {

  /** Total documents (= embeddings rows) a build produces. */
  def docCount(cliques: Int, variants: Int, reps: Int): Int =
    cliques * variants * reps

  def build(spark: SparkSession, dir: String,
      cliques: Int, variants: Int, reps: Int): Unit = {
    val sc = spark.sparkContext
    val nDocs = docCount(cliques, variants, reps)

    // --- documents: 40-token base text per clique from a shared pool (so
    // shingle/minhash buckets collide across cliques too), plus one
    // variant-marker token => variants are near-dups (Jaccard ~ 40/41)
    val langs = Array("en", "de", "fr", "es")
    def baseText(c: Int): String =
      (0 until 40).map(i => s"tok${(c * 31 + i * 7) % 140}").mkString(" ")
    val docRows = (0 until nDocs).map { id =>
      val c = id / (variants * reps)
      val v = (id / reps) % variants
      val text = baseText(c) + s" var${c}_$v"
      Row(id.toLong, text, langs(c % langs.length), "synth", text.length.toLong)
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(sc.parallelize(docRows, 4), docSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    // --- embeddings: per clique a deterministic 64-dim base vector;
    // variant v bumps coordinate (v mod 64) => tiny angular spread inside
    // the clique; clones identical => deep identical-vector buckets
    val vecRows = (0 until nDocs).map { id =>
      val c = id / (variants * reps)
      val v = (id / reps) % variants
      val base = (0 until 64).map { d =>
        (((c * 131 + d * 17) % 19) - 9) / 9.0f + (if (d == v % 64) 0.25f else 0.0f)
      }
      Row(id.toLong, base, (c % 10))
    }
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(sc.parallelize(vecRows, 4), vecSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")

    // --- part: p_size cycles 1..10 (all pass the <=10 filter), row count
    // scales with the corpus — the band-join build side
    val partRows = (0 until nDocs).map { k =>
      Row(k.toLong, s"part$k", s"B${k % 5}", s"T${k % 7}", (k % 10) + 1, 100.0 + k % 50)
    }
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
    spark.createDataFrame(sc.parallelize(partRows, 4), partSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/part.parquet")

    // --- lineitem: 4 rows per doc, quantity domain FIXED at 1..50 while
    // rows grow (the theta/range degeneracy), shipdates inside the
    // entries' Jan-1997 window
    val liRows = (0 until nDocs * 4).map { k =>
      Row(k.toLong, (k % nDocs).toLong, (k % 97).toLong, (k % 7) + 1,
        ((k % 50) + 1).toDouble, 1000.0 + k % 100, 0.05, 0.02, "N", "O",
        java.sql.Timestamp.valueOf(s"1997-01-${(k % 28) + 1} 00:00:00"))
    }
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(sc.parallelize(liRows, 4), liSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")

    // --- customer / supplier: keys scale with the corpus while the
    // %1000 modular coordinate space join_spatial_grid derives from them
    // stays FIXED — per-grid-cell density grows with data on both sides
    val custRows = (0 until nDocs).map { k =>
      Row(k.toLong, s"cust$k", k % 25, 100.0 + k % 900, "BUILDING")
    }
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(sc.parallelize(custRows, 4), custSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    val suppRows = (0 until math.max(nDocs / 10, 1)).map { k =>
      Row(k.toLong, s"supp$k", k % 25, 500.0 + k % 400)
    }
    val suppSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
    spark.createDataFrame(sc.parallelize(suppRows, 4), suppSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/supplier.parquet")

    // --- events: sessions ∝ corpus inside a FIXED 24-hour window (the
    // join_interval_overlap degeneracy: concurrent sessions per hour grow
    // with data). 4 events per user, 2 sessions (10-min gaps, 2-h jump).
    val users = nDocs / 4
    val evRows = (0 until users * 4).map { k =>
      val u = k / 4; val j = k % 4
      val usMicros = 800000000000000L + (u % 24) * 3600000000L +
        (j % 2) * 600000000L + (j / 2) * 7200000000L
      // ts is TIMESTAMP_NTZ (naive µs) — the encoding Tables.doLoad
      // requires for events; a session-tz TimestampType is rejected
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        usMicros / 1000000L, ((usMicros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      Row(k.toLong, ldt, u.toLong,
        if (j % 2 == 0) "view" else "click", (k % 10).toDouble, "{}")
    }
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(sc.parallelize(evRows, 4), evSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
  }
}
