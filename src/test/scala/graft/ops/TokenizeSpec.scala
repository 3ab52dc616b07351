package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Tokenize]] — BPE merge training + segmentation. */
class TokenizeSpec extends SparkSpec {

  test("bpeMerges learns the hand-computed merge sequence") {
    import spark.implicits._
    // corpus: "aaab" ×2, "b" ×1 (token split keeps [a-z0-9]+ runs)
    val df = Seq((1L, "aaab aaab b")).toDF("doc_id", "text")
    val m = Tokenize.bpeMerges(df, "text", 3).orderBy("round").collect()
    // round 1: pairs over " a a a b "×2 → aa:4 (two positions per word),
    //          ab:2 → merge (a,a)
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a" &&
      m(0).getString(3) == "aa" && m(0).getLong(4) == 4L)
    // round 2: " aa a b "×2 → "aa a":2 and "a b":2 TIE → lexicographic
    //          ascending pair string: "a b" < "aa a" → merge (a,b)
    assert(m(1).getString(1) == "a" && m(1).getString(2) == "b" &&
      m(1).getString(3) == "ab" && m(1).getLong(4) == 2L)
    // round 3: " aa ab "×2 → merge (aa,ab)
    assert(m(2).getString(1) == "aa" && m(2).getString(2) == "ab" &&
      m(2).getString(3) == "aaab" && m(2).getLong(4) == 2L)
  }

  test("bpeMerges: leftmost non-overlapping merge — 'aaaa' becomes two 'aa' symbols") {
    import spark.implicits._
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = Tokenize.bpeMerges(df, "text", 2).orderBy("round").collect()
    // " a a a a ": aa counted at 3 adjacent positions; merge consumes
    // leftmost pairs → " aa aa " (NOT " aa a a " or an overlapped mess)
    assert(m(0).getString(3) == "aa" && m(0).getLong(4) == 3L)
    // round 2: " aa aa " → the only pair is (aa,aa), once
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "aa" &&
      m(1).getString(3) == "aaaa" && m(1).getLong(4) == 1L)
  }

  test("bpeMerges is bit-stable across partitionings") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (i.toLong, s"lower banana band bandana item$i"))
    val df = rows.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Tokenize.bpeMerges(d, "text", 4).collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(13)))
  }

  test("bpeSegment replays merges in priority order") {
    import spark.implicits._
    val df = Seq(("banana"), ("bandana"), ("x")).toDF("w")
    val pieces = Tokenize.bpeSegment(df, "w", Seq("a" -> "n", "b" -> "an"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // merge 1: a+n → "b an an a"; merge 2: b+an → "ban an a"
    assert(pieces("banana") == List("ban", "an", "a"))
    assert(pieces("bandana") == List("ban", "d", "an", "a"))
    assert(pieces("x") == List("x"))
  }
}
