package graft.ops

import graft.SparkSpec

/** [[Tokenize.bpeMergesBatched]] — the batched trainer's single contract
  * is BIT-IDENTICAL output to the sequential [[Tokenize.bpeMerges]]
  * gate. These corpora are chosen adversarially: each would make a
  * naive "apply the top-k pairs" batcher diverge, so equality here
  * proves the safety rules (rank-prefix disjointness, new-pair count
  * ceiling, merged-symbol collision stop) actually bind.
  */
class BpeBatchedSpec extends SparkSpec {

  private def both(text: Seq[String], rounds: Int, batchK: Int = 64) = {
    import spark.implicits._
    val df = text.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val seqM = Tokenize.bpeMerges(df, "text", rounds)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val batM = Tokenize.bpeMergesBatched(df, "text", rounds, batchK)
      .orderBy("round").collect().map(_.toSeq).toSeq
    (seqM, batM)
  }

  test("new-symbol takeover: 'abababab' — (ab,ab) outranks every original pair after round 1") {
    // naive batching would emit round 2 = the original table's #2 pair;
    // sequential (and the safe batcher) must emit (ab,ab)
    val (s, b) = both(Seq("abababab abababab", "abab"), 4)
    assert(s.nonEmpty && s == b)
    assert(s(1)(1) == "ab" && s(1)(2) == "ab")
  }

  test("overlapping tops: run-heavy corpus where top pairs share symbols") {
    val (s, b) = both(Seq("aaaa aaab aab", "bbbb abba bab"), 6)
    assert(s.nonEmpty && s == b)
  }

  test("tie-break-sensitive corpus (equal counts decided by pair string)") {
    val (s, b) = both(Seq("aaab aaab b", "banana bandana"), 5)
    assert(s.nonEmpty && s == b)
  }

  test("batchK=1 degenerates to the sequential trainer exactly") {
    val (s, b) = both(Seq("lower newest widest low new wide"), 6, batchK = 1)
    assert(s.nonEmpty && s == b)
  }

  test("rounds beyond exhaustion: both stop at the same merge count") {
    // tiny corpus runs out of pairs before the requested rounds
    val (s, b) = both(Seq("ab cd"), 10)
    assert(s == b)
    assert(s.length < 10)
  }

  test("mixed natural text, many rounds, small batchK truncation") {
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "the five boxing wizards jump quickly",
      "jived fox nymph grabs quick waltz")
    // batchK=3 forces heavy truncation — the new-pair ceiling must
    // guard candidates whose straddling pairs fall outside the top-3
    val (s, b) = both(corpus, 12, batchK = 3)
    assert(s.length == 12 && s == b)
  }

  test("equivalence on the driver fixture corpus (t50's gate shape)") {
    val d = graft.io.Tables.documents(spark, sf0001)
    val s = Tokenize.bpeMerges(d, "text", 8).orderBy("round")
      .collect().map(_.toSeq).toSeq
    val b = Tokenize.bpeMergesBatched(d, "text", 8).orderBy("round")
      .collect().map(_.toSeq).toSeq
    assert(s.length == 8 && s == b)
  }
}
