package graft.text

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Phrase-blocklist filtering — the C4 "bad words" gate (Raffel et
  * al. 2020, §2.2: "we removed any page that contained any word on
  * the 'List of Dirty, Naughty, Obscene or Otherwise Bad Words'"),
  * generalized to multi-word phrases with whole-token boundaries.
  *
  * Matching semantics are defined on the PADDED token join:
  * `" " + tokens(text).mkString(" ") + " "` contains
  * `" " + phrase + " "` — i.e. a phrase matches iff it appears as a
  * contiguous whole-token subsequence (never inside a token). This
  * makes the oracle a plain `position(' '||phrase||' ' IN padded)`
  * per phrase, while the engine side scans the padded string ONCE
  * through an Aho–Corasick automaton ([[PhraseAutomaton]]) shipped
  * as a single codegen reference object — per-row cost is
  * O(|text| + hits) regardless of the phrase-list size, vs the
  * m × substring-search a `contains` disjunction pays.
  *
  * Scale shape: one documents scan, one codegen'd kernel projection,
  * zero shuffles — the whole gate lives inside WholeStageCodegen
  * exactly like the q191/q194 quality gates.
  */
object Blocklist {

  /** Padded token join matching the oracle's
    * `' ' || array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ') || ' '`.
    * Empty text pads to `"  "` (two spaces), which no padded phrase
    * can match (phrases are non-empty). */
  def padded(text: Column): Column =
    concat(lit(" "), array_join(Text.tokens(text), " "), lit(" "))

  /** Per-doc blocklist report: `n_matched` distinct phrases present,
    * `first_phrase` = the present phrase earliest in LIST order
    * (blocklists are priority-ordered; null when clean), and the C4
    * `keep` = no phrase matched. */
  def report(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, phrases: Seq[String]): org.apache.spark.sql.DataFrame = {
    val hits = BlocklistFunctions.phraseHits(padded(col(textCol)), phrases)
    docs.select(col(idCol), hits.as("h"))
      .select(col(idCol), col("h.n_matched").as("n_matched"),
        when(col("h.first_idx") >= 0,
          element_at(typedLit(phrases), col("h.first_idx") + 1))
          .as("first_phrase"),
        (col("h.n_matched") === 0).as("keep"))
  }
}

/** Aho–Corasick automaton (Aho & Corasick 1975, CACM 18(6)) over the
  * padded phrase patterns. Built once on the driver, shipped to
  * executors as ONE serialized reference object (the [[graft.text
  * .BpeSegmentAll]] pattern), so plan size and per-row cost are
  * independent of the list size. Pattern count is capped at 64 so
  * per-row match state is a single Long bitmask. */
final class PhraseAutomaton(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.length <= 64,
    s"phrase list must have 1..64 entries, got ${patterns.length}")
  require(patterns.forall(_.nonEmpty), "empty phrase in blocklist")

  // Trie with goto maps; fail links + merged output masks via BFS.
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
  private val endMask = scala.collection.mutable.ArrayBuffer(0L)

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var st = 0
    p.foreach { ch =>
      st = gotoMaps(st).getOrElseUpdate(ch, {
        gotoMaps += scala.collection.mutable.HashMap.empty[Char, Int]
        endMask += 0L
        gotoMaps.length - 1
      })
    }
    endMask(st) |= (1L << idx)
  }

  private val fail = new Array[Int](gotoMaps.length)
  /** outMask(s) = patterns ending at s OR anywhere along its fail chain. */
  private val outMask: Array[Long] = {
    val out = endMask.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) |= out(fail(s))
      gotoMaps(s).foreach { case (ch, c) =>
        var f = fail(s)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(c) = gotoMaps(f).getOrElse(ch, 0)
        if (fail(c) == c) fail(c) = 0
        queue += c
      }
    }
    out
  }

  /** One left-to-right scan; returns
    * struct(n_matched, first_idx or -1) where "first" is LIST order
    * (lowest pattern index), not text order. */
  def matchStats(padded: UTF8String): InternalRow = {
    val s = padded.toString
    var st = 0
    var mask = 0L
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (st != 0 && !gotoMaps(st).contains(ch)) st = fail(st)
      st = gotoMaps(st).getOrElse(ch, 0)
      mask |= outMask(st)
      i += 1
    }
    InternalRow(java.lang.Long.bitCount(mask),
      if (mask == 0L) -1 else java.lang.Long.numberOfTrailingZeros(mask))
  }
}

/** phrase_hits(padded) -> struct<n_matched:int, first_idx:int>;
  * `first_idx` is -1 when no phrase matches. */
case class PhraseHits(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_matched", IntegerType, nullable = false),
    StructField("first_idx", IntegerType, nullable = false)))
  override def prettyName: String = "phrase_hits"

  @transient private lazy val auto =
    new PhraseAutomaton(phrases.map(p => " " + p + " ").toArray)

  override def nullSafeEval(v: Any): Any =
    auto.matchStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseAuto", auto,
      classOf[PhraseAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchStats($c)")
  }

  override protected def withNewChildInternal(c: Expression): PhraseHits =
    copy(child = c)
}

object BlocklistFunctions {
  def phraseHits(padded: Column, phrases: Seq[String]): Column =
    GraftBridge.column(PhraseHits(GraftBridge.expression(padded), phrases))
}
