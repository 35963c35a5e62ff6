package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge induction (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-training counterpart of the
  * token-counting stack: learn the `rounds` highest-frequency adjacent
  * symbol merges from the corpus.
  *
  * Scale design — the iteration NEVER re-reads the corpus: the corpus
  * is scanned once into the frequency-weighted word VOCABULARY
  * (dictionary-sized — millions of distinct words at 100 TB, not
  * billions of documents), which is cached; each merge round is then
  * one pair-explode over the cached vocab into a map-side-combined
  * groupBy(pair) weighted count, a single-row top-1 collect
  * (deterministic tie-break: highest count, then lexicographic pair),
  * and a map-side greedy merge application via a codegen'd native
  * expression ([[BpeApplyMerge]]). Driver state is the merge list —
  * `rounds` entries.
  */
object Bpe {

  /** Character symbols of a word — Spark's split on the empty pattern
    * keeps a trailing empty string (limit = -1), which would poison
    * pair counts with ("c", "") pairs; filter it out. */
  private def chars(word: Column): Column =
    filter(split(word, ""), x => length(x) > 0)

  /** Learn `rounds` merges. Returns (rank, left, right, merged,
    * pair_count) — rank 1 is the most frequent pair before any merge,
    * rank k counts pairs AFTER the first k-1 merges were applied
    * greedily left-to-right (the standard sequential-merge
    * semantics). Stops early if no pair remains.
    *
    * Lineage stays BOUNDED at real vocabulary scale (32k merges): the
    * per-round projection chain over the cached vocab is truncated
    * every `checkpointEvery` rounds via an eager `localCheckpoint`
    * (plan becomes a LogicalRDD — analysis/codegen cost per round is
    * O(checkpointEvery), not O(r)), and the PREVIOUS checkpoint's
    * blocks are freed once the new one is materialized, so at most
    * one extra vocab-sized copy is ever live. */
  def merges(docs: DataFrame, textCol: String, rounds: Int,
             checkpointEvery: Int = 64): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(chars(col("word")).as("syms"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // id of the live checkpoint's cached RDD (bounded-state bookkeeping:
    // localCheckpoint persists at the RDD layer, where Dataset.unpersist
    // cannot reach — freed via SparkContext by id)
    var liveCheckpoint: Option[Int] = None
    try {
      var syms = vocab
      val acc = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        if (r % checkpointEvery == 0) {
          val before = spark.sparkContext.getPersistentRDDs.keySet
          syms = syms.localCheckpoint(true) // eager: materializes now
          val added = spark.sparkContext.getPersistentRDDs.keySet -- before
          liveCheckpoint.foreach(id =>
            spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
          liveCheckpoint = added.headOption
        }
        val top = syms
          .select(col("freq"), explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
          .groupBy(col("p").getField("0").as("l"),
            col("p").getField("1").as("r"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).collect() // ONE row — bounded driver state
        if (top.isEmpty) exhausted = true
        else {
          val (l, rr, n) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          acc += ((r, l, rr, l + rr, n))
          syms = syms.select(
            BpeFunctions.applyMerge(col("syms"), l, rr).as("syms"), col("freq"))
          r += 1
        }
      }
      import spark.implicits._
      acc.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
    } finally {
      vocab.unpersist()
      liveCheckpoint.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
  }

  /** Greedy left-to-right segmentation of every document's words under
    * a learned merge list — one map-side pass per merge over the
    * tokenized corpus (no shuffle; merges are expression literals). */
  def segment(docs: DataFrame, textCol: String, idCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val base = docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .select(col(idCol), chars(col("word")).as("syms"))
    val merged = merges.foldLeft(base) { case (df, (l, r)) =>
      df.select(col(idCol), BpeFunctions.applyMerge(col("syms"), l, r).as("syms"))
    }
    merged.select(col(idCol), explode(col("syms")).as("token"))
  }
}

object BpeKernels {
  /** One greedy left-to-right non-overlapping merge pass: every
    * adjacent (left, right) becomes the concatenation; "aaa" under
    * (a,a) yields [aa, a]. */
  def applyMerge(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && l.equals(arr.getUTF8String(i))
          && r.equals(arr.getUTF8String(i + 1))) {
        out += UTF8String.concat(l, r)
        i += 2
      } else {
        out += arr.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** bpe_apply_merge(syms, left, right) -> array<string>: one greedy
  * merge pass (see [[BpeKernels.applyMerge]]); codegen'd static call,
  * merge literals shipped as reference objects. */
case class BpeApplyMerge(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply_merge"

  private lazy val leftU = UTF8String.fromString(left)
  private lazy val rightU = UTF8String.fromString(right)

  override def nullSafeEval(v: Any): Any =
    BpeKernels.applyMerge(v.asInstanceOf[ArrayData], leftU, rightU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", leftU, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeRight", rightU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.text.BpeKernels.applyMerge($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(c: Expression): BpeApplyMerge =
    copy(child = c)
}

object BpeFunctions {
  def applyMerge(syms: Column, left: String, right: String): Column =
    GraftBridge.column(BpeApplyMerge(GraftBridge.expression(syms), left, right))
}
