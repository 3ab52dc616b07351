package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.scrape.{Fetcher, LinkedInScraper, MapFetcher}

/** Counting fixture fetcher: tracks list-page vs posting-page GETs so the
  * specs can observe scan pushdown (local mode — executors share the JVM,
  * so the counters are visible to the test).
  */
final class CountingFetcher(pages: Map[String, String]) extends Fetcher {
  val listGets = new AtomicInteger(0)
  val postingGets = new AtomicInteger(0)
  private val inner = new MapFetcher(pages)
  def get(url: String): Either[String, String] = {
    if (url.contains("jobs-guest/jobs/api/jobPosting")) postingGets.incrementAndGet()
    else listGets.incrementAndGet()
    inner.get(url)
  }
}

class JobsDataSourceSpec extends SparkSpec {

  private def card(id: Long, title: String) =
    s"""<div class="base-card job-search-card" data-entity-urn="urn:li:jobPosting:$id">
       |  <h3 class="base-search-card__title"> $title </h3>
       |</div>""".stripMargin

  private def postingPage(desc: String) =
    s"""<html><div class="description__text description__text--rich"><p>$desc</p></div></html>"""

  private def fixturePages(n: Int): Map[String, String] = {
    val listUrl = new LinkedInScraper(new MapFetcher(Map.empty)).listUrl("Data Engineer")
    val list = s"<html>${(1 to n).map(i => card(1000L + i, s"Engineer $i")).mkString}</html>"
    Map(listUrl -> list) ++ (1 to n).map { i =>
      s"https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/${1000 + i}" ->
        postingPage(s"Role $i with Spark")
    }
  }

  private def read(name: String, extra: (String, String)*) = {
    val r = spark.read.format("linkedin-jobs")
      .option("job_title", "Data Engineer")
      .option("fetcher", name)
      .option("retry_delay_ms", "0")
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("full scan returns all cards with descriptions") {
    val f = new CountingFetcher(fixturePages(6))
    Fetchers.register("full", f)
    // no orderBy here: a global sort adds a range-partitioning SAMPLING pass
    // that executes the scan a second time (12 fetches for 6 cards) — for a
    // side-effecting source, sort downstream of a materialization instead
    val rows = read("full").collect().sortBy(_.getAs[String]("jobid"))
    assert(rows.length == 6)
    assert(rows.head.getAs[String]("jobid") == "1001")
    assert(rows.head.getAs[String]("title") == "Engineer 1")
    assert(rows.head.getAs[String]("description") == "Role 1 with Spark")
    assert(rows.head.getAs[String]("job_type") == "Data Engineer")
    assert(f.postingGets.get() == 6)
  }

  test("limit pushdown caps enrichment fetches (main.py:97 semantics)") {
    val f = new CountingFetcher(fixturePages(12))
    Fetchers.register("lim", f)
    val rows = read("lim").limit(3).collect()
    assert(rows.length == 3)
    // only the 3 surviving cards were enriched — the other 9 never hit S2
    assert(f.postingGets.get() == 3)
  }

  test("column pruning skips the description fetch entirely") {
    val f = new CountingFetcher(fixturePages(5))
    Fetchers.register("prune", f)
    val rows = read("prune").select("jobid", "title").collect()
    assert(rows.length == 5)
    assert(f.postingGets.get() == 0)
    assert(rows.map(_.getString(0)).sorted.head == "1001")
  }

  test("count(*) reads zero-field rows, no enrichment") {
    val f = new CountingFetcher(fixturePages(4))
    Fetchers.register("cnt", f)
    assert(read("cnt").count() == 4)
    assert(f.postingGets.get() == 0)
  }

  test("max_cards option bounds the scan like the reference's 25-cap") {
    val f = new CountingFetcher(fixturePages(30))
    Fetchers.register("cap", f)
    assert(read("cap").count() == 25)
  }

  test("missing description page degrades to null, not failure") {
    val pages = fixturePages(3) - "https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/1002"
    val f = new CountingFetcher(pages)
    Fetchers.register("nulls", f)
    val rows = read("nulls", "max_retries" -> "2").orderBy("jobid").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(rows(1).fieldIndex("description")))
  }

  test("pushed limit is visible in the scan description") {
    val f = new CountingFetcher(fixturePages(4))
    Fetchers.register("desc", f)
    val plan = read("desc").limit(2).queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit=2"), s"plan:\n$plan")
  }
}
