package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  test("kAnonymityAudit flags exactly the under-k groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // group of 3
      ("b", 1L), ("b", 1L),            // group of 2 — violates k=3
      ("a", 2L)                        // singleton — violates
    ).toDF("seg", "bkt")
    val got = Privacy.kAnonymityAudit(df, Seq("seg", "bkt"), 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(("a", 1L) -> ((3L, false)), ("b", 1L) -> ((2L, true)),
      ("a", 2L) -> ((1L, true))))
  }

  test("generalizeUntilK: first satisfying level chosen, finer audited, coarser unchosen") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L), ("a", 11L), ("a", 12L),
      ("b", 20L), ("b", 21L), ("b", 29L)
    ).toDF("seg", "v")
    val levels = Seq(
      ("exact", Seq("seg" -> col("seg"), "v" -> col("v"))),       // all singletons
      ("decade", Seq("seg" -> col("seg"),
        "v" -> floor(col("v") / lit(10.0)).cast("long"))),        // groups of 3
      ("seg_only", Seq("seg" -> col("seg"))))                     // groups of 3
    val rows = Privacy.generalizeUntilK(df, levels, 3L)
      .orderBy("level").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows == Seq(
      (0L, "exact", 6L, 6L, 1L, false),
      (1L, "decade", 2L, 0L, 3L, true),   // FIRST satisfying level
      (2L, "seg_only", 2L, 0L, 3L, false) // satisfies too, but not first
    ), rows.toString)
    // no level satisfies -> no chosen row, audit still complete
    val none = Privacy.generalizeUntilK(df, levels.take(1), 3L).collect()
    assert(none.length == 1 && !none(0).getBoolean(5))
  }
}
