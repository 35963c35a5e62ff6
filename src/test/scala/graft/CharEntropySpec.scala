package graft

import graft.functions.TextKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** q194's entropy kernel: hand-computed values, the whitespace strip,
  * the order-free integer-micros sum, and the keep-gate fail branch
  * the uniform synthetic corpus never fires (its entropy sits at
  * 2.5–3.0 nats, all above the 2-nat gate). */
class CharEntropySpec extends SparkSuite {
  import spark.implicits._

  private def ce(s: String) = {
    val r = TextKernels.charEntropy(UTF8String.fromString(s))
    (r.getInt(0), r.getInt(1), r.getLong(2))
  }

  test("hand-computed entropies: uniform, constant, and empty inputs") {
    // "ab": p = 0.5 each, term = -(0.5 * ln 0.5) = 0.3465735... ->
    // 346574 micros each (the PER-TERM snap rounds each term, so the
    // sum is 693148, one micro above ln 2 — the documented grammar)
    assert(ce("ab") === ((2, 2, 693148L)))
    // constant run: p = 1, ln 1 = 0 -> entropy 0 (the gibberish case)
    assert(ce("aaaaaaaa") === ((8, 1, 0L)))
    // whitespace-only and empty -> zeros
    assert(ce("") === ((0, 0, 0L)))
    assert(ce(" \t\n\r\f") === ((0, 0, 0L)))
    // whitespace is stripped before counting
    assert(ce("a b") === ((2, 2, 693148L)))
  }

  test("four uniform symbols give 2 ln 2 nats") {
    // p = 0.25 x4: term = -(0.25 * ln 0.25) = 0.25 * 1.38629... ->
    // 346574 micros x4 = 1386294 (2 ln 2, to the snap)
    val (_, d, m) = ce("abcd")
    assert(d === 4)
    assert(m === 4 * 346574L)
  }

  test("the keep gate fails low-diversity boilerplate and passes prose-like text") {
    val docs = Seq(
      (1L, "aaaa aaaa aaaa aaaa"),           // ~0 nats -> fail
      (2L, "ababab ababab ababab"),          // 1 bit = ln 2 nats -> fail
      (3L, "the quick brown fox jumps over the lazy dog")) // > 2 nats
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.charEntropy(col("text")).as("e"))
      .select(col("doc_id"), (col("e.entropy_micros") >= 2000000L).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("the kernel survives codegen and matches an independent double-sum") {
    val texts = Seq("mixed content 123", "zzz yyy xxx", "a")
    val fromSpark = texts.toDF("text")
      .select(graft.functions.TextFunctions.charEntropy(col("text")).as("e"))
      .select("e.n_chars", "e.entropy_micros")
      .as[(Int, Long)].collect().toSeq
    val expected = texts.map { t =>
      val cs = t.filterNot(" \t\n\f\r".contains(_))
      val n = cs.length
      val micros = cs.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / n
        math.floor(-(p * math.log(p)) * 1e6 + 0.5).toLong
      }.sum
      (n, micros)
    }
    assert(fromSpark === expected)
  }
}
