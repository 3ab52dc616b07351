package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Semistructured]] — VARIANT parse + typed path extraction with the
  * malformed-row quarantine channel.
  */
class SemistructuredSpec extends SparkSpec {

  test("parseWithQuarantine: malformed rows flagged (not dropped, not " +
      "thrown), null raw is absent not malformed, good rows parse") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": "x"}}"""),
      (2L, """{"a": 2"""),            // truncated → malformed
      (3L, null.asInstanceOf[String]), // absent → NOT malformed
      (4L, """not json at all"""),     // malformed
      (5L, """[1, 2, 3]""")            // valid non-object JSON
    ).toDF("id", "raw")
    val p = Semistructured.parseWithQuarantine(df, "raw")
    // every input row survives
    assert(p.count() == 5)
    val flags = p.select("id", "is_malformed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false))
    // the absent row has a null variant but is not quarantined
    assert(p.filter(col("id") === 3L && col("variant").isNull &&
      !col("is_malformed")).count() == 1)
  }

  test("typedPath: nested object, array index, wrong-type and missing " +
      "paths are null-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"meta": {"k": 7, "tag": "en"}, "vals": [10, 20]}"""),
      (2L, """{"meta": {"k": "not-a-number"}, "vals": []}""")
    ).toDF("id", "raw")
    val p = Semistructured.parseWithQuarantine(df, "raw")
    val got = p.select(col("id"),
      Semistructured.typedPath(col("variant"), "$.meta.k", "long").as("k"),
      Semistructured.typedPath(col("variant"), "$.meta.tag", "string").as("tag"),
      Semistructured.typedPath(col("variant"), "$.vals[1]", "long").as("v1"),
      Semistructured.typedPath(col("variant"), "$.missing.path", "long").as("m"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 7L && got(0).getString(2) == "en" &&
      got(0).getLong(3) == 20L && got(0).isNullAt(4))
    // wrong-type extraction is null, not a throw (try_variant_get)
    assert(got(1).isNullAt(1) && got(1).isNullAt(3) && got(1).isNullAt(4))
  }

  test("typedPath composes with aggregation over a mixed good/malformed " +
      "frame — the q77 shape in miniature") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      val raw =
        if (i % 10 == 0) """{"oops": """
        else s"""{"meta": {"k": $i}}"""
      (i.toLong, if (i % 2 == 0) "a" else "b", raw)
    }.toDF("id", "g", "raw")
    val p = Semistructured.parseWithQuarantine(df, "raw")
    val agg = p.groupBy("g").agg(
        count(lit(1)).as("n"),
        sum(when(col("is_malformed"), 1L).otherwise(0L)).as("n_bad"),
        sum(Semistructured.typedPath(col("variant"), "$.meta.k", "long"))
          .as("sum_k"))
      .orderBy("g").collect()
    // g=a: evens 2..50 (25 rows), malformed = multiples of 10 (5),
    // sum_k = sum(evens) - sum(10,20,30,40,50) = 650 - 150 = 500
    assert(agg(0).getString(0) == "a" && agg(0).getLong(1) == 25 &&
      agg(0).getLong(2) == 5 && agg(0).getLong(3) == 500)
    // g=b: odds (25 rows), none malformed, sum of odds 1..49 = 625
    assert(agg(1).getString(0) == "b" && agg(1).getLong(1) == 25 &&
      agg(1).getLong(2) == 0 && agg(1).getLong(3) == 625)
  }

  test("shred: declared paths become typed columns, missing paths NULL, " +
      "variant residual intact alongside") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"meta": {"k": 7, "tag": "en"}, "vals": [10]}"""),
      (2L, """{"meta": {"tag": "de"}, "vals": [20]}"""), // k missing
      (3L, """{"meta": {"k": 9, "tag": "fr", "extra": 5}, "vals": [30]}""")
    ).toDF("id", "raw")
    val sh = Semistructured.shred(
      Semistructured.parseWithQuarantine(df, "raw"), "variant",
      Seq(("k", "$.meta.k", "long"), ("tag", "$.meta.tag", "string"),
        ("v0", "$.vals[0]", "long")))
    val rows = sh.select("id", "k", "tag", "v0").orderBy("id").collect()
    assert(rows(0).getLong(1) == 7L && rows(0).getString(2) == "en" &&
      rows(0).getLong(3) == 10L)
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "de") // NULL, no throw
    assert(rows(2).getLong(1) == 9L && rows(2).getLong(3) == 30L)
    // the variant residual still answers paths nobody shredded
    assert(sh.filter(col("id") === 3L)
      .select(Semistructured.typedPath(col("variant"), "$.meta.extra", "long"))
      .head().getLong(0) == 5L)
  }

  test("shapeProfile: one row per distinct inferred payload schema — " +
      "the drift monitor") {
    import spark.implicits._
    val df = Seq.tabulate(30) { i =>
      val raw =
        if (i % 3 == 0) s"""{"a": $i}"""
        else if (i % 3 == 1) s"""{"a": $i, "b": "x"}"""
        else s"""{"a": $i}"""
      (i.toLong, raw)
    }.toDF("id", "raw")
    val prof = Semistructured.shapeProfile(
      Semistructured.parseWithQuarantine(df, "raw"), "variant")
    val shapes = prof.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shapes.size == 2 && shapes.values.sum == 30)
    // the drifted shape (extra "b") is its own bucket with 10 rows
    assert(shapes.exists { case (k, n) => k.contains("b") && n == 10 })
  }
}
