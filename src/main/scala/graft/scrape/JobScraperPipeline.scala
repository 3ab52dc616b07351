package graft.scrape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{EtlFunctions, SkillFunctions}
import graft.nlp.SkillMatcher

/** EP1 — the production pipeline end-to-end (reference
  * `/root/reference/main.py:39-190`), Spark-first: scrape source →
  * one lazily-composed transform chain → partitioned parquet sink.
  *
  * Deliberate upgrades over the reference (SURVEY.md §7): typed error on a
  * missing job title instead of a latent NameError; injectable clock
  * instead of wall-clock `datetime.today()`; real directory partitioning
  * `partitionBy(job_type, date)` instead of filename-encoded partitioning;
  * deterministic first-occurrence skill order instead of Python set order.
  */
final class JobScraperPipeline(scraper: LinkedInScraper, matcher: SkillMatcher) {

  /** Transform tier (`main.py:152-175`): dropna(description) → pay → skills
    * → seniority → run date → drop raw text columns. One Catalyst plan, all
    * narrow maps.
    */
  def transform(spark: SparkSession, scraped: DataFrame,
      runDate: java.sql.Timestamp): DataFrame = {
    val skills = SkillFunctions.extractSkills(
      SkillFunctions.broadcastMatcher(spark, matcher)) _
    scraped
      .na.drop(Seq("description"))
      .withColumn("pay", EtlFunctions.extractPay(col("description")))
      .withColumn("skills", skills(col("description")))
      .withColumn("seniority", EtlFunctions.seniority(col("title")))
      .withColumn("date", lit(runDate))
      .drop("title", "description")
  }

  /** Full run for one (possibly URL-encoded) job title; returns the final
    * frame and optionally writes it. Empty scrape → None (the reference
    * logs "no new jobs" and writes nothing, `main.py:189-190`).
    */
  def run(spark: SparkSession, encodedJobTitle: String,
      runDate: java.sql.Timestamp, outputPath: Option[String],
      sleeper: Long => Unit = Thread.sleep): Option[DataFrame] = {
    require(encodedJobTitle.nonEmpty, "job_title attribute is required")
    val jobTitle = java.net.URLDecoder.decode(encodedJobTitle, "UTF-8")
    val cards = scraper.fetchJobCards(jobTitle)
    if (cards.isEmpty) None
    else {
      val scraped = scraper.enrich(spark, cards, jobTitle, sleeper)
      val out = transform(spark, scraped, runDate)
      outputPath.foreach(p =>
        out.write.mode("append").partitionBy("job_type", "date").parquet(p))
      Some(out)
    }
  }
}
