package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlDedupSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Dedup.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalUrl: every variant class folds; non-variants survive") {
    // scheme/host case, www., default port, dup+trailing slash,
    // tracking params, param order, fragment — all fold to one form
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&id=3#frag",
      "https://example.com/a/b?id=3&utm_campaign=y",
      "https://www.example.com/a/b/?id=3"
    ).distinct == Seq("https://example.com/a/b?id=3"))
    // root path canonicalizes to the bare host; empty query drops the ?
    assert(canon("http://Example.com:80/?utm_source=a") ==
      Seq("http://example.com"))
    // param ORDER folds but distinct params do NOT
    assert(canon("https://h.io/p?b=2&a=1", "https://h.io/p?a=1&b=2")
      .distinct.size == 1)
    assert(canon("https://h.io/p?a=1", "https://h.io/p?a=2")
      .distinct.size == 2)
    // :8080 is NOT a default port; sub.host is NOT www-stripped;
    // %2F is NOT percent-decoded
    assert(canon("https://h.io:8080/p") == Seq("https://h.io:8080/p"))
    assert(canon("https://sub.h.io/p") == Seq("https://sub.h.io/p"))
    assert(canon("https://h.io/a%2Fb") == Seq("https://h.io/a%2Fb"))
    // ref= is tracking; pref= / xref= are not (anchored match)
    assert(canon("https://h.io/p?ref=rss") == Seq("https://h.io/p"))
    assert(canon("https://h.io/p?pref=1") == Seq("https://h.io/p?pref=1"))
  }

  test("urlCanonicalDedup: min-id survivor, variant counts, dup flags") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://a.io/x?id=1&utm_source=s"),
      (2L, "HTTPS://WWW.A.IO/x/?id=1"),
      (3L, "https://a.io/x?id=9"),
      (4L, "https://b.io/y")
    ).toDF("doc_id", "url")
    val out = Dedup.urlCanonicalDedup(df.repartition(3), "url", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "https://a.io/x?id=1", 1L, 2L, false),
      (2L, "https://a.io/x?id=1", 1L, 2L, true),
      (3L, "https://a.io/x?id=9", 3L, 1L, false),
      (4L, "https://b.io/y", 4L, 1L, false)), out.toString)
  }

  test("canonicalUrl stays codegen-compiled (no UDF, no fallback)") {
    import spark.implicits._
    val plan = Seq("https://a.io/x").toDF("url")
      .select(Dedup.canonicalUrl(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
