package graft

import graft.functions.{HashFunctions, TextFunctions, TextKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The q191 repetition-rule semantics: [[TextKernels.runStats]] run
  * accounting (incl. the tie rule and the dup mass the synthetic
  * corpus never exercises at sf0.01 — no repeated 5-grams in random
  * 40-word text, so the planted fixtures here are the dup branch's
  * real gate), and the Rae Table A1 keep flag firing in both
  * directions on planted boilerplate. */
class RepetitionRulesSpec extends SparkSuite {
  import spark.implicits._

  private def rs(elems: String*) = {
    val arr = new GenericArrayData(
      elems.map(UTF8String.fromString).toArray[Any])
    val r = TextKernels.runStats(arr)
    (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))
  }

  test("runStats: counts, chars, and dup mass on a mixed multiset") {
    // "aa" x3 (6 chars mass), "b" x2 (2 chars mass), "cccc" x1
    assert(rs("aa", "b", "cccc", "aa", "b", "aa") === ((3, 2, 5L, 8L)))
  }

  test("runStats: top tie breaks to the binary-smallest element") {
    // "zz" and "aa" both occur twice -> top is "aa" (2 chars), and both
    // contribute to dup mass
    assert(rs("zz", "aa", "zz", "aa") === ((2, 2, 4L, 8L)))
  }

  test("runStats: all-distinct input has top run 1 and zero dup mass") {
    assert(rs("x", "yy", "zzz") === ((1, 1, 0L, 0L)))
  }

  test("runStats: empty input is all zeros; null element nulls the row") {
    assert(rs() === ((0, 0, 0L, 0L)))
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null))
    assert(TextKernels.runStats(withNull) === null)
  }

  test("runStats survives codegen composed with word_spans") {
    val got = Seq("a b a b a b", "c d e f")
      .toDF("text")
      .select(TextFunctions.runStats(
        HashFunctions.wordSpans(graft.text.Text.tokens(col("text")), 2)).as("r"))
      .select("r.top_count", "r.dup_chars")
      .as[(Int, Long)].collect().toSet
    // doc1 2-grams: "a b" x3, "b a" x2 -> top 3, dup 3*3 + 2*3 = 15
    // doc2 2-grams: all distinct -> top 1, dup 0
    assert(got === Set((3, 15L), (1, 0L)))
  }

  test("q191 keep flag fires on planted boilerplate and passes clean text") {
    val loop = Seq.fill(12)("one two three four five").mkString(" ") // 5-gram x12
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, loop), (2L, clean)).toDF("doc_id", "text")
    val gotMap = graft.text.GopherRules.repetitionReport(df, "doc_id", "text")
      .select("doc_id", "keep", "dup_5gram_char_frac")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getDouble(2)))).toMap
    assert(!gotMap(1L)._1, "looped boilerplate must fail the keep gate")
    assert(gotMap(1L)._2 > 0.5, "looped text should have high dup 5-gram mass")
    assert(gotMap(2L)._1, "clean all-distinct text must pass")
    assert(gotMap(2L)._2 === 0.0)
  }

  test("empty and whitespace-only docs are dropped (no char denominator)") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val ids = graft.text.GopherRules.repetitionReport(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }
}
