package graft

import graft.pipelines.CorpusIngest

/** One ingestion round: each pruning rule removes exactly its target. */
class CorpusIngestSpec extends SparkSuite {
  import spark.implicits._

  test("quality gate, both dedup stages and decontamination each prune") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val batch = Seq(
      (1L, "tiny text", "en", "web"),                          // below token floor
      (2L, "one two three four five six seven", "en", "web"),  // survivor
      (3L, "one two three four five six seven", "en", "web"),  // exact dup of 2
      (4L, "Alpha beta GAMMA delta epsilon zeta eta theta", "en", "web"), // dup of corpus (normalized)
      (5L, "this document leaks the secret benchmark question answer verbatim", "en", "web"), // contaminated
      (6L, "completely clean and genuinely novel content here", "en", "web")) // survivor
      .toDF("doc_id", "text", "lang", "source")
    val bench = Seq((900L, "the secret benchmark question answer"))
      .toDF("doc_id", "text")

    val got = CorpusIngest.ingest(corpus, batch, bench, minTokens = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(100L, 2L, 6L))
  }

  test("rejectionReasons names each doc's first failing gate; admitted ≡ ingest (q227)") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val batch = Seq(
      (1L, "tiny text", "en", "web"),
      (2L, "one two three four five six seven", "en", "web"),
      (3L, "one two three four five six seven", "en", "web"),
      (4L, "Alpha beta GAMMA delta epsilon zeta eta theta", "en", "web"),
      (5L, "this document leaks the secret benchmark question answer verbatim", "en", "web"),
      (6L, "completely clean and genuinely novel content here", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val bench = Seq((900L, "the secret benchmark question answer"))
      .toDF("doc_id", "text")
    val reasons = CorpusIngest.rejectionReasons(corpus, batch, bench, minTokens = 5)
      .as[(Long, String)].collect().toMap
    assert(reasons === Map(
      1L -> "quality", 2L -> "admitted", 3L -> "dup_in_batch",
      4L -> "dup_of_corpus", 5L -> "contaminated", 6L -> "admitted"))
    // admitted is EXACTLY what ingest appends
    val appended = CorpusIngest.ingest(corpus, batch, bench, minTokens = 5)
      .select("doc_id").as[Long].collect().toSet -- Set(100L)
    assert(reasons.filter(_._2 == "admitted").keySet === appended)
  }
}
