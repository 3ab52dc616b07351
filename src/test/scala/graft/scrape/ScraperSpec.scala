package graft.scrape

import graft.SparkSpec

/** Fixture-driven scraper tests — HTML snippets carrying exactly the
  * selectors the reference hard-codes (FIXTURES.md §1.3); no live HTTP.
  */
class ScraperSpec extends SparkSpec {

  private def card(id: Long, title: String) =
    s"""<div class="base-card job-search-card" data-entity-urn="urn:li:jobPosting:$id">
       |  <h3 class="base-search-card__title"> $title </h3>
       |  <div class="other">noise</div>
       |</div>""".stripMargin

  private def listPage(n: Int): String =
    s"<html><body><ul>${(1 to n).map(i => card(1000L + i, s"Engineer $i")).mkString("\n")}</ul></body></html>"

  private def postingPage(desc: String): String =
    s"""<html><section><div class="show-more-less-html__markup description__text description__text--rich">
       |<p>$desc</p><ul><li>perk</li></ul></div></section></html>""".stripMargin

  test("jobCards parses urn tail + title, document order") {
    val cards = HtmlExtract.jobCards(listPage(3))
    assert(cards.map(_.jobid) == Seq("1001", "1002", "1003"))
    assert(cards.head.title == Some("Engineer 1"))
  }

  test("card without urn is skipped; missing title → None") {
    val html =
      """<div class="job-search-card"><h3 class="base-search-card__title">No Urn</h3></div>
        |<div class="job-search-card" data-entity-urn="urn:li:jobPosting:7"><p>untitled</p></div>""".stripMargin
    val cards = HtmlExtract.jobCards(html)
    assert(cards == Seq(JobCard("7", None)))
  }

  test("25-card cap applied before enrichment (`main.py:97`)") {
    val fetcher = new Fetcher {
      def get(url: String): Either[String, String] =
        if (url.contains("/jobs/search")) Right(listPage(40)) else Left("404")
    }
    val cards = new LinkedInScraper(fetcher).fetchJobCards("Data Engineer")
    assert(cards.size == 25)
  }

  test("list retry: malformed page then success") {
    var calls = 0
    val fetcher = new Fetcher {
      def get(url: String): Either[String, String] = {
        calls += 1
        if (calls < 3) Right("<html>rate limited</html>") else Right(listPage(2))
      }
    }
    val cards = new LinkedInScraper(fetcher).fetchJobCards("X")
    assert(cards.size == 2 && calls == 3)
  }

  test("list retry exhaustion → empty") {
    val scraper = new LinkedInScraper(new MapFetcher(Map.empty), maxRetries = 3)
    assert(scraper.fetchJobCards("X").isEmpty)
  }

  test("description extraction strips markup") {
    assert(HtmlExtract.description(postingPage("Great role &amp; team")) ==
      Some("Great role & team perk"))
    assert(HtmlExtract.description("<html><div class='other'>x</div></html>") == None)
  }

  test("end-to-end: scrape → enrich → transform over fixtures") {
    // MapFetcher (a top-level serializable class) rather than an anonymous
    // Fetcher: the enrich closure ships the fetcher to executors, and an
    // anonymous class here would drag the whole spec along
    val listUrl = new LinkedInScraper(new MapFetcher(Map.empty)).listUrl("Data Engineer")
    val e2eListPage = s"<html><body>${card(1001, "Senior Data Engineer")}${card(1002, "Data Engineer")}${card(1003, "Junior Developer")}</body></html>"
    val pages: Map[String, String] = Map(
      listUrl -> e2eListPage,
      // posting pages; job 1002's description is missing → null → dropped
      "https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/1001" ->
        postingPage("Senior role using Python and Spark, pays £65K"),
      "https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/1003" ->
        postingPage("Junior role with SQL, 40000 GBP"))
    val scraper = new LinkedInScraper(new MapFetcher(pages), maxRetries = 2, retryDelayMs = 0)

    val matcher = graft.nlp.SkillMatcher.fromPhrases(Seq("python", "spark", "sql"))
    val pipeline = new JobScraperPipeline(scraper, matcher)
    val out = pipeline.run(spark, "Data%20Engineer",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), None, _ => ()).get
      .orderBy("jobid").collect()

    assert(out.length == 2) // 1002 dropped by dropna(description)
    val r1 = out(0)
    assert(r1.getAs[String]("jobid") == "1001")
    assert(r1.getAs[String]("job_type") == "Data Engineer") // url-decoded
    assert(r1.getAs[Double]("pay") == 65000.0)
    assert(r1.getAs[scala.collection.Seq[String]]("skills").toSeq == Seq("python", "spark"))
    assert(r1.getAs[String]("seniority") == "Senior")
    val r2 = out(1)
    assert(r2.getAs[String]("jobid") == "1003")
    assert(r2.getAs[Double]("pay") == 40000.0)
    assert(r2.getAs[scala.collection.Seq[String]]("skills").toSeq == Seq("sql"))
    assert(r2.getAs[String]("seniority") == "Junior") // from title "Junior Developer"
    // output contract (FIXTURES.md §1.5): raw text columns dropped
    assert(!out.head.schema.fieldNames.contains("description"))
    assert(!out.head.schema.fieldNames.contains("title"))
  }
}
