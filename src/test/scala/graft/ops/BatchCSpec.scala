package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Curation.bigramSurprisal]], [[Layout.compactionBins]],
  * [[Multimodal.audioFeatures]].
  */
class BatchCSpec extends SparkSpec {

  test("bigramSurprisal: hand-checked probabilities, short docs dropped") {
    import spark.implicits._
    // corpus: "a b" x3, "a c", "a" -> c(a)=5, c(b)=3, c(c)=1, N=9
    // bigrams: (a,b) x3, (a,c) x1
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "a"))
      .toDF("doc_id", "text")
    val out = Curation.bigramSurprisal(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(5L)) // single-token doc has no bigram
    // p(b|a) = .7*3/5 + .3*3/9 = 0.52 ; p(c|a) = .7*1/5 + .3*1/9
    def surp(p: Double) = math.round(-math.log(p) * 1e6).toDouble / 1e6
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - surp(0.52)) < 1e-9, out(1L))
    val pc = 700000.0 * 1 / 5 + 300000.0 * 1 / 9
    assert(math.abs(out(4L)._2 - surp(pc / 1000000.0)) < 1e-9, out(4L))
  }

  test("bigramSurprisal is partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 80L).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 7} w${i % 5} w${(i + 1) % 3}")).toDF("doc_id", "text")
    val a = Curation.bigramSurprisal(docs, "text", "doc_id").collect().toSet
    val b = Curation.bigramSurprisal(docs.repartition(11), "text", "doc_id").collect().toSet
    assert(a == b)
  }

  test("compactionBins: greedy running-total assignment, no file split, deterministic") {
    import spark.implicits._
    val files = Seq(("a", 60L), ("b", 50L), ("c", 10L), ("d", 100L), ("e", 5L))
      .toDF("path", "bytes")
    val out = Layout.compactionBins(files, Seq("path"), "bytes", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // cum: a=60 b=110 c=120 d=220 e=225; bin = (cum-size) div 100
    assert(out == Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 1L, "e" -> 2L))
    // each bin except the last reaches the target once its boundary file lands
    val out2 = Layout.compactionBins(files.repartition(3), Seq("path"), "bytes", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2 == out)
  }

  test("audioFeatures: generated WAV matches the generation arithmetic; corrupt row channels") {
    import spark.implicits._
    val df = Seq(0L, 13L).toDF("doc_id")
    val out = Multimodal.audioFeatures(Multimodal.withGeneratedWav(df))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    for (id <- Seq(0L, 13L)) {
      val n = (400 + id % 100).toInt
      val cs = (0 until n).map(i => ((id + 7L * i) % 256).toInt - 128)
      val sumSq = cs.map(c => c.toLong * c).sum
      val zc = cs.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      val peak = cs.map(math.abs).max
      assert(out(id) == ((n.toLong, sumSq, zc.toLong, peak)), s"doc $id")
    }
    val junk = Seq((7L, "nope".getBytes("UTF-8"))).toDF("doc_id", "media")
    val bad = Multimodal.audioFeatures(junk).collect()(0)
    assert(bad.getLong(1) == -1L && bad.getInt(4) == -1)
  }
}
