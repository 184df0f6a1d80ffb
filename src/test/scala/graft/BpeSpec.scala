package graft

import org.apache.spark.sql.functions._

/** Ground-truth replay for `pipeline_bpe_train` (no SQL oracle possible —
  * iterative argmax; same exemption class as CcSpec/MmrSpec): run greedy
  * BPE in pure Scala over the collected (word, freq) table with the exact
  * rules the entry declares — pair counts weighted by word frequency,
  * argmax by (count DESC, left, right), leftmost-first non-overlapping
  * merge application — and pin the merge table row for row. */
class BpeSpec extends SparkSpecBase {

  private def greedyBpe(wordFreq: Seq[(String, Long)], nMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (r <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r.toLong, a, b, a + b, n))
        words = words.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          }
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  test("pipeline_bpe_train merge table equals the pure-Scala greedy replay") {
    val wordFreq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = greedyBpe(wordFreq, 10)
    val got = Catalog.byKey("pipeline_bpe_train").run(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expected,
      s"merge tables differ:\n entry: $got\n replay: $expected")
  }

  test("applying the learned merges compresses the symbol stream") {
    // sanity on the artifact's usefulness: tokenizing the corpus with the
    // 10 merges must strictly reduce total symbol count vs raw chars
    val merges = Catalog.byKey("pipeline_bpe_train").run(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0))
    def tokenize(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b, m) =>
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { s =>
          if (acc.nonEmpty && acc.last == a && s == b) acc(acc.size - 1) = m
          else acc += s
        }
        syms = acc.toVector
      }
      syms
    }
    val raw = words.map(_.length.toLong).sum
    val merged = words.map(w => tokenize(w).size.toLong).sum
    assert(merged < raw, s"merges did not compress: $merged vs $raw symbols")
  }

  test("pipeline_bpe_apply per-doc token counts equal the replay tokenizer") {
    val merges = Catalog.byKey("pipeline_bpe_train").run(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    def tokenize(w: String): Long = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b, m) =>
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { s =>
          if (acc.nonEmpty && acc.last == a && s == b) acc(acc.size - 1) = m
          else acc += s
        }
        syms = acc.toVector
      }
      syms.size.toLong
    }
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(ws => ws.map(w => tokenize(w._2)).sum).toMap
    val got = Catalog.byKey("pipeline_bpe_apply").run(spark, sfDir)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "per-doc BPE token counts differ from the replay")
  }
}
