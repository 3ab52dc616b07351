package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests lifted from the reference's literal semantics
  * (`/root/reference/main.py:142-171`; cases from FIXTURES.md §1.1).
  */
class EtlFunctionsSpec extends SparkSpec {

  private def pay(desc: String): Option[Double] = {
    import spark.implicits._
    Seq(desc).toDF("description")
      .select(EtlFunctions.extractPay(col("description")).as("pay"))
      .collect().head.getValuesMap[Any](Seq("pay")).get("pay") match {
      case Some(null) => None
      case Some(v: Double) => Some(v)
      case _ => None
    }
  }

  test("E1: £..K form") { assert(pay("salary £55K pa") == Some(55000.0)) }
  test("E1: plain £ with commas") { assert(pay("pays £65,000 annually") == Some(65000.0)) }
  test("E1: GBP with space") { assert(pay("comp 60000 GBP total") == Some(60000.0)) }
  test("E1: GBP no space") { assert(pay("comp 50000GBP total") == Some(50000.0)) }
  test("E1: K-before-comma substitution order — £1,5K → 15000") {
    // reference replaces K→000 BEFORE removing commas (`main.py:146`)
    assert(pay("bonus £1,5K yearly") == Some(15000.0))
  }
  test("E1: last match wins") {
    assert(pay("range £50K to £70K") == Some(70000.0))
  }
  test("E1: no match → null") { assert(pay("competitive salary") == None) }
  test("E1: null-safe") {
    import spark.implicits._
    val r = Seq[String](null).toDF("description")
      .select(EtlFunctions.extractPay(col("description"))).collect()
    assert(r.head.isNullAt(0))
  }

  private def sen(title: String): Option[String] = {
    import spark.implicits._
    val r = Seq(title).toDF("title")
      .select(EtlFunctions.seniority(col("title"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("E3: each branch, case-insensitive") {
    assert(sen("SENIOR engineer") == Some("Senior"))
    assert(sen("graduate analyst") == Some("Junior"))
    assert(sen("Head of Data") == Some("Manager"))
    assert(sen("Tech Lead") == Some("Lead"))
    assert(sen("Engineer") == None)
  }
  test("E3: first-match precedence — Senior Manager → Senior (`main.py:164-171`)") {
    assert(sen("Senior Manager") == Some("Senior"))
    assert(sen("Junior Manager") == Some("Junior"))
    assert(sen("Principal Head") == Some("Manager")) // manager|head branch fires before principal|lead
  }

  test("E6: jobid from URN") {
    import spark.implicits._
    val r = Seq("urn:li:jobPosting:3990123456").toDF("urn")
      .select(EtlFunctions.jobIdFromUrn(col("urn"))).collect().head.getString(0)
    assert(r == "3990123456")
  }

  test("E8: html strip") {
    import spark.implicits._
    val r = Seq("<div><b>Great</b> &amp; big <br/>role</div>").toDF("h")
      .select(EtlFunctions.htmlToText(col("h"))).collect().head.getString(0)
    assert(r == "Great & big role")
  }
}
