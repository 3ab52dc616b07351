package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Reference-parity column expressions (SURVEY.md §2.3). All pure
  * compositions of Catalyst built-ins → whole-stage codegen, no UDFs, no
  * Python/IPC hop (the reference runs these row-at-a-time in Python,
  * `/root/reference/main.py:142-171`).
  */
object EtlFunctions {

  /** E1 — pay extraction (`/root/reference/main.py:142-149`):
    * find all `£[\d,]+K?|[\d,]+ ?GBP` matches, take the LAST, then apply the
    * reference's substitution chain in order — `£`→``, `GBP`→``, `K`→`000`,
    * `,`→``, ` `→`` (order matters: `"£1,5K"` → 15000.0) — and cast to
    * double. No match → null (`element_at` on the empty array yields null,
    * which the cast propagates).
    */
  val PayRegex = "£[\\d,]+K?|[\\d,]+ ?GBP"

  def extractPay(description: Column): Column = {
    val last = try_element_at(regexp_extract_all(description, lit(PayRegex), lit(0)), lit(-1))
    val cleaned = Seq("£" -> "", "GBP" -> "", "K" -> "000", "," -> "", " " -> "")
      .foldLeft(last) { case (c, (from, to)) => regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
    cleaned.cast(DoubleType)
  }

  /** E3 — seniority classification (`/root/reference/main.py:164-171`):
    * first-match-wins cascaded CASE WHEN over the title. `"Senior Manager"`
    * → `"Senior"`; no hit → null.
    */
  def seniority(title: Column): Column =
    when(title.rlike("(?i)senior"), "Senior")
      .when(title.rlike("(?i)junior|graduate"), "Junior")
      .when(title.rlike("(?i)manager|head"), "Manager")
      .when(title.rlike("(?i)principal|lead"), "Lead")
      .otherwise(lit(null))

  /** E6 — jobid from a LinkedIn entity URN: `split(':')[-1]`
    * (`/root/reference/main.py:98-100`).
    */
  def jobIdFromUrn(urn: Column): Column = element_at(split(urn, ":"), -1)

  /** E8 — HTML → text approximation (`/root/reference/main.py:29-32` uses
    * BeautifulSoup `get_text(strip=True)`): strip tags, decode the common
    * entities, collapse whitespace.
    */
  def htmlToText(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]+>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
