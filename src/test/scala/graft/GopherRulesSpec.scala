package graft

import graft.text.GopherRules

/** Gopher quality rules (q177). The driver gate pins the arithmetic
  * hash-exact against DuckDB on the corpus; this spec drives each of
  * the seven rules over hand-built documents so every mask bit is
  * exercised in BOTH directions (the corpus only trips bits 0 and 6).
  */
class GopherRulesSpec extends SparkSuite {
  import spark.implicits._

  private val prose =
    "the cat sat of the mat and it was a fine day to sit " +
      "with a book that he did have for a while and then some " +
      "more words follow here to pass the word count band easily"

  private def maskOf(text: String, minWords: Int = 5, maxWords: Int = 200): Int =
    GopherRules.flags(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords, maxWords)
      .collect().head.getAs[Int]("fail_mask")

  test("clean prose passes every rule") {
    assert(maskOf(prose) === 0)
  }

  test("word-count band (bit 0) fires low and high") {
    assert((maskOf("the of and that short", minWords = 10) & 1) === 1)
    assert((maskOf(prose, minWords = 1, maxWords = 10) & 1) === 1)
  }

  test("mean word length (bit 1) fires on runs of long tokens") {
    val longWords = Seq.fill(20)("pneumonoultramicroscopic").mkString(" ") +
      " the of and that"
    assert((maskOf(longWords) & 2) === 2)
    val shortWords = Seq.fill(40)("a b").mkString(" ") + " the of"
    assert((maskOf(shortWords) & 2) === 2)
  }

  test("symbol ratio (bit 2) fires on hash/ellipsis spam") {
    val spam = prose + " " + Seq.fill(10)("###").mkString(" ")
    assert((maskOf(spam) & 4) === 4)
    val dots = prose + " " + Seq.fill(12)("...").mkString(" ")
    assert((maskOf(dots) & 4) === 4)
  }

  test("bullet lines (bit 3) fires when >90% of lines are bullets") {
    val bullets = (Seq(prose) ++ Seq.fill(20)("- item like this one")).mkString("\n")
    assert((maskOf(bullets) & 8) === 8)
    val fewBullets = (Seq.fill(3)(prose) ++ Seq("- one item")).mkString("\n")
    assert((maskOf(fewBullets) & 8) === 0)
  }

  test("ellipsis-terminated lines (bit 4) fires above 30%") {
    val trailing = Seq(prose, "this line trails off...", "and so does this...")
      .mkString("\n")
    assert((maskOf(trailing) & 16) === 16)
  }

  test("alpha-word fraction (bit 5) fires on numeric noise") {
    val numeric = prose + " " + (1 to 60).map(_.toString).mkString(" ")
    assert((maskOf(numeric) & 32) === 32)
  }

  test("stopword rule (bit 6) needs two DISTINCT hits") {
    val oneStop = Seq.fill(30)("the").mkString(" ") + " word word word"
    assert((maskOf(oneStop) & 64) === 64)
    val twoStops = "the of " + Seq.fill(30)("word").mkString(" ")
    assert((maskOf(twoStops) & 64) === 0)
  }

  test("keep is exactly mask == 0 over the corpus") {
    val df = SparkEntry.queries("q177_gopher_rules")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Int]("fail_mask") == 0))
    }
  }
}
