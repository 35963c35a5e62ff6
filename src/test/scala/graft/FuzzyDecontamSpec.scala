package graft

import org.apache.spark.sql.functions._

import graft.curation.Curate

/** md5-MinHash fuzzy benchmark decontamination (q202). */
class FuzzyDecontamSpec extends SparkSuite {
  import spark.implicits._

  // Local reference: md5 hex like both engines compute it.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // the q45-family md5-slice permutation: hex digits 8·(i%4)+1..+8 of
  // md5(shingle ':' i/4) — Dedup.md5Slice's formula (round 18 unified
  // the fuzzy-decontam arithmetic with the signature family's)
  private def permHash(shingle: String, i: Int): Long =
    java.lang.Long.parseLong(
      md5hex(shingle + ":" + (i / 4)).substring(8 * (i % 4), 8 * (i % 4) + 8), 16)

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.size < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Reference pipeline: signatures, band keys, candidates, exact
    * Jaccard, best-pair pick — plain Scala collections. */
  private def reference(docs: Seq[(Long, String)], n: Int, k: Int,
      bands: Int, tau: Long): Map[Long, (Long, Long, Long, Boolean)] = {
    val r = k / bands
    val sh = docs.map { case (id, t) => id -> shingleSet(t, n) }.toMap
    val sig = sh.map { case (id, ss) =>
      id -> (0 until k).map(i => ss.map(permHash(_, i)).min)
    }
    def bandKeys(id: Long): Seq[String] = (0 until bands).map(b =>
      (Seq(b.toString) ++ (b * r until (b + 1) * r).map(j =>
        sig(id)(j).toString)).mkString("|"))
    val evalIds = docs.map(_._1).filter(_ % 89 == 0)
    val trainIds = docs.map(_._1).filterNot(_ % 89 == 0)
    val evalBands = evalIds.flatMap(e => bandKeys(e).map(_ -> e))
      .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2) }
    val pairs = for {
      t <- trainIds
      bk <- bandKeys(t).distinct
      e <- evalBands.getOrElse(bk, Nil).distinct
    } yield (t, e)
    pairs.distinct.groupBy(_._1).map { case (t, ps) =>
      val scored = ps.map { case (_, e) =>
        val inter = (sh(t) & sh(e)).size.toLong
        val j = inter * 1000000L / (sh(t).size + sh(e).size - inter)
        (j, e)
      }.sortBy { case (j, e) => (-j, e) }
      val (bj, be) = scored.head
      t -> (ps.size.toLong, be, bj, bj >= tau)
    }
  }

  test("randomized corpus matches the local reference end-to-end") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "join", "scan", "fast", "slow", "table")
    // base docs plus planted near-dup/exact-dup copies across the
    // id % 89 eval boundary (ids 0 and 89 are eval)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = base ++ Seq(
      (89L, base(3)._2),                       // eval exact-dup of 3
      (90L, base.head._2),                     // train exact-dup of eval 0
      (91L, base.head._2 + " extra"),          // train near-dup of eval 0
      (92L, "totally different content here"))
    val got = Curate.fuzzyDecontam(docs.toDF("doc_id", "text"),
        isEval = col("doc_id") % 89 === 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val want = reference(docs, n = 3, k = 8, bands = 4, tau = 500000L)
    assert(got === want)
    // the planted cross-boundary dups must actually be flagged
    assert(want(90L)._4 && want(3L)._4)
    assert(want(90L)._3 === 1000000L)
  }

  test("plan: corpus-scale side never shuffles whole; eval side broadcasts") {
    val qe = SparkEntry.queries("q202_fuzzy_decontam")(
      spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "eval/candidate sides must broadcast")
    assert("SortMergeJoin".r.findAllIn(plan).isEmpty,
      "no corpus-scale sort-merge join")
  }
}
