package graft.expr

import graft.SparkSpec
import graft.functions.SkillFunctions
import graft.nlp.SkillMatcher
import org.apache.spark.sql.functions._

class ExprSpec extends SparkSpec {

  test("ExtractSkillsExpr == UDF path on real documents (mini gazetteer)") {
    val phrases = Seq("spark", "filter", "window", "stream", "join", "hash join")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaUdf = SkillFunctions.extractSkillsWith(spark, phrases)(col("text"))
    val viaExpr = SkillFunctions.extractSkillsNative(
      spark, SkillMatcher.fromPhrases(phrases), "extract_skills_test")(col("text"))
    val diff = docs.select(col("doc_id"), viaUdf.as("a"), viaExpr.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("extract_skills usable from plain SQL after registration") {
    ExtractSkillsExpr.register(spark, SkillMatcher.fromPhrases(Seq("python", "machine learning")))
    val r = spark.sql(
      "SELECT extract_skills('We use Python for machine learning') AS sk")
      .collect().head.getAs[scala.collection.Seq[String]]("sk").toSeq
    assert(r == Seq("python", "machine learning"))
  }

  test("full reference gazetteer via expression: TEXT patterns + scale") {
    val matcher = SkillMatcher.fromJsonlFile("/root/reference/assets/skills_no_en.jsonl")
    val sk = SkillFunctions.extractSkillsNative(spark, matcher, "extract_skills_full_test") _
    import spark.implicits._
    val r = Seq("requires .NET and Apache Spark experience", "requires .net experience")
      .toDF("t").select(sk(col("t")).as("sk")).collect()
      .map(_.getAs[scala.collection.Seq[String]]("sk").toSeq)
    assert(r(0).contains(".net"))          // TEXT exact-case '.NET' hit, lowercased output
    assert(r(0).contains("apache spark"))
    assert(!r(1).contains(".net"))         // '.net' does not match TEXT '.NET'
  }

  test("nfc_normalize composes decomposed sequences; NFC input passes through") {
    import spark.implicits._
    VecExpressions.register(spark)
    val decomposed = "cafe\u0301 A\u030a"     // e+acute, A+ring
    val composed = "caf\u00e9 \u00c5"          // é, Å precomposed
    val r = Seq(decomposed, composed, "plain ascii")
      .toDF("t").select(call_function("nfc_normalize", col("t")).as("n"))
      .as[String].collect()
    assert(r(0) == composed)
    assert(r(1) == composed)
    assert(r(0).length == decomposed.length - 2) // two pairs folded
    assert(r(2) == "plain ascii")
  }

  test("vec expressions reject wrong types at analysis") {
    import spark.implicits._
    VecExpressions.register(spark)
    val bad = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(call_function("vec_dot", col("a"), col("b"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("array<float>"))
  }
}
