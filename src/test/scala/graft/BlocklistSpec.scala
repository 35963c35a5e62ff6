package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.{Blocklist, PhraseAutomaton}
import org.apache.spark.unsafe.types.UTF8String

/** Phrase-blocklist gate (text.Blocklist): the C4 bad-words filter
  * with whole-token multi-word phrases over one Aho–Corasick pass. */
class BlocklistSpec extends SparkSuite {
  import spark.implicits._

  private val phrases = Seq("slow table", "table table", "agg",
    "scan slow fast", "vector stream", "data vector warehouse")

  test("hand fixture: multi-word, overlap, priority, clean, empty") {
    val docs = Seq(
      (0L, "the slow table won"),            // phrase 0 only
      (1L, "table table table agg"),         // 1 (twice, counted once) + 2
      (2L, "big scan slow fast scan"),       // 3; NOT 0 ("slow fast" != "slow table")
      (3L, "aggregate the aggs"),            // "agg" inside a token -> clean
      (4L, ""),                              // empty text -> clean
      (5L, "vector stream data vector stream") // 4 (overlapping occurrences, once)
    ).toDF("doc_id", "text")
    val got = Blocklist.report(docs, "doc_id", "text", phrases)
      .orderBy("doc_id").collect()
    assert(got === Array(
      Row(0L, 1, "slow table", false),
      Row(1L, 2, "table table", false),
      Row(2L, 1, "scan slow fast", false),
      Row(3L, 0, null, true),
      Row(4L, 0, null, true),
      Row(5L, 1, "vector stream", false)))
  }

  test("shared-boundary overlap: adjacent phrases both match") {
    // padded " a slow table table c ": "slow table" [ends at one
    // 'table'] and "table table" share the middle token — AC reports
    // both (substring semantics), like two independent position() calls.
    val docs = Seq((0L, "a slow table table c")).toDF("doc_id", "text")
    val got = Blocklist.report(docs, "doc_id", "text", phrases).collect()
    assert(got === Array(Row(0L, 2, "slow table", false)))
  }

  test("randomized property: AC ≡ per-phrase locate() disjunction") {
    val vocab = Array("slow", "table", "agg", "scan", "fast", "vector",
      "stream", "data", "the", "big")
    val rnd = new scala.util.Random(7)
    val docs = (0L until 300L).map { i =>
      val n = rnd.nextInt(12)
      (i, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")

    val padded = Blocklist.padded(col("text"))
    val present = phrases.map(p =>
      (locate(" " + p + " ", padded) > 0).cast("int"))
    val nMatched = present.reduce(_ + _)
    val firstIdx = phrases.indices.reverse.foldLeft(lit(-1)) { (acc, i) =>
      when(present(i) === 1, lit(i)).otherwise(acc)
    }
    val expect = docs.select(col("doc_id"), nMatched.as("n_matched"),
        when(firstIdx >= 0, element_at(typedLit(phrases), firstIdx + 1))
          .as("first_phrase"),
        (nMatched === 0).as("keep"))
      .orderBy("doc_id").collect()
    val got = Blocklist.report(docs, "doc_id", "text", phrases)
      .orderBy("doc_id").collect()
    assert(got === expect)
  }

  test("automaton: inside-token hits rejected, 64-pattern cap enforced") {
    val a = new PhraseAutomaton(Array(" agg ", " slow table "))
    val r = a.matchStats(UTF8String.fromString(" aggregate slowtable "))
    assert(r.getInt(0) === 0 && r.getInt(1) === -1)
    intercept[IllegalArgumentException] {
      new PhraseAutomaton(Array.fill(65)("x"))
    }
    intercept[IllegalArgumentException] { new PhraseAutomaton(Array("")) }
  }

  test("plan: one scan, zero shuffles, codegen'd kernel") {
    val q = SparkEntry.queries("q198_blocklist_filter")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).isEmpty)
    assert("file:[^\\]\\s]*\\.parquet".r.findAllMatchIn(
      q.queryExecution.sparkPlan.toString).size == 1)
    assert(plan.contains("phrase_hits"))
    assert(q.where(!col("keep")).count() > 0) // list actually fires at sf0.001
  }
}
