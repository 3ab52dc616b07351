package graft.scrape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One job card from a search list page (`div.job-search-card`):
  * id from the `data-entity-urn` attribute tail, optional title from
  * `h3.base-search-card__title` (reference: `/root/reference/main.py:97-104`).
  */
final case class JobCard(jobid: String, title: Option[String])

/** One fully-enriched posting row — the scrape source's output relation
  * (`/root/reference/main.py:108-112`).
  */
final case class JobPosting(jobid: String, title: Option[String],
    description: Option[String], job_type: String)

/** Pluggable transport so the source is deterministic under test: live
  * HTTP in production, HTML fixtures in specs (SURVEY.md §5 — the
  * reference hard-codes selectors; we test against fixture pages carrying
  * exactly those selectors, never the live site).
  */
trait Fetcher extends Serializable {
  /** Right(body) on HTTP 200, Left(reason) otherwise. */
  def get(url: String): Either[String, String]
}

/** Fixture-backed fetcher for tests. */
final class MapFetcher(pages: Map[String, String]) extends Fetcher {
  def get(url: String): Either[String, String] =
    pages.get(url).toRight(s"404: $url")
}

/** Minimal HTML extraction for the exact selectors the reference relies on.
  * Regex-based on purpose: the dependency budget has no HTML parser, the
  * selector surface is three fixed patterns, and malformed pages degrade to
  * "no match" — the same observable behavior as the reference's
  * BeautifulSoup `find(...) or None`.
  */
object HtmlExtract {

  private val CardTag =
    """(?s)<div[^>]*class="[^"]*\bjob-search-card\b[^"]*"[^>]*>""".r
  private val UrnAttr = """data-entity-urn="([^"]+)"""".r
  private val TitleTag =
    """(?s)<h3[^>]*class="[^"]*\bbase-search-card__title\b[^"]*"[^>]*>(.*?)</h3>""".r
  private val DescriptionTag =
    """(?s)<div[^>]*class="[^"]*\bdescription__text description__text--rich\b[^"]*"[^>]*>(.*)""".r
  // A real opening <div> tag: "<div" must be followed by whitespace, '/',
  // or '>' (so <divider> doesn't count), through the tag's closing '>'.
  // Matches ending in "/>" are self-closing and depth-neutral.
  private val OpenDivTag = """(?s)<div(?=[\s/>])[^>]*>""".r

  /** BeautifulSoup `get_text(strip=True)` approximation: drop tags, decode
    * common entities, collapse whitespace.
    */
  def htmlToText(html: String): String = {
    val noTags = html.replaceAll("<[^>]+>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (s, (from, to)) => s.replace(from, to) }
    decoded.replaceAll("\\s+", " ").trim
  }

  /** All job cards in document order (caller applies the 25-card cap —
    * `main.py:97`). The urn tail after the last ':' is the jobid
    * (`main.py:98-100`).
    */
  def jobCards(listPageHtml: String): Seq[JobCard] = {
    val starts = CardTag.findAllMatchIn(listPageHtml).toVector
    starts.zipWithIndex.flatMap { case (m, i) =>
      val segEnd = if (i + 1 < starts.length) starts(i + 1).start else listPageHtml.length
      val cardTag = m.matched
      val segment = listPageHtml.substring(m.start, segEnd)
      UrnAttr.findFirstMatchIn(cardTag).map { urn =>
        val jobid = urn.group(1).split(':').last
        val title = TitleTag.findFirstMatchIn(segment)
          .map(t => htmlToText(t.group(1))).filter(_.nonEmpty)
        JobCard(jobid, title)
      }
    }
  }

  /** Description text from a posting page, None when the rich-text div is
    * absent (`main.py:29-33`).
    */
  def description(postingHtml: String): Option[String] =
    DescriptionTag.findFirstMatchIn(postingHtml).map { m =>
      // close at the MATCHED </div>, tracking nesting depth — real
      // LinkedIn rich-text divs contain nested <div>s, and cutting at the
      // first close tag would truncate the description (BeautifulSoup in
      // the reference pairs tags properly, main.py:29-33)
      val body = m.group(1)
      // Opens are REAL <div ...> tags only (OpenDivTag: "<div" + [\s/>],
      // so <divider> and raw "<div" inside attribute text don't count),
      // and self-closing <div/> is depth-neutral — a bare substring scan
      // over-counted and could over-extend or truncate the description.
      var opens = OpenDivTag.findAllMatchIn(body)
        .filterNot(_.matched.endsWith("/>"))
        .map(_.start).toList
      var closes = Iterator.iterate(body.indexOf("</div>"))(p => body.indexOf("</div>", p + 1))
        .takeWhile(_ >= 0).toList
      var depth = 0
      var idx = -1
      while (idx < 0 && closes.nonEmpty) {
        if (opens.nonEmpty && opens.head < closes.head) { depth += 1; opens = opens.tail }
        else if (depth > 0) { depth -= 1; closes = closes.tail }
        else idx = closes.head
      }
      htmlToText(if (idx >= 0) body.substring(0, idx) else body)
    }.filter(_.nonEmpty)
}

/** The scrape source (S1 list page + S2 per-job enrichment), Spark-first:
  * the ≤25-card list fetch is driver-side (honest about its cardinality —
  * SURVEY §2.1 S1), while the per-job description fetch distributes via
  * `mapPartitions` with per-partition retry + rate limiting, which is the
  * piece that matters when the id list is large.
  */
final class LinkedInScraper(fetcher: Fetcher, maxRetries: Int = 5,
    retryDelayMs: Long = 3000, maxCards: Int = 25) extends Serializable {

  def listUrl(jobTitle: String): String = {
    val enc = java.net.URLEncoder.encode("\"" + jobTitle + "\"", "UTF-8")
    s"https://www.linkedin.com/jobs/search?keywords=$enc&location=London%20Area%2C%20United%20Kingdom&geoId=90009496&f_TPR=r86400&position=1&pageNum=0"
  }

  def postingUrl(jobid: String): String =
    s"https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/$jobid"

  /** S1: fetch + parse the list page with ≤maxRetries attempts, cap at
    * maxCards (`main.py:79-125`). Returns empty after exhaustion (the
    * reference logs and ends the run).
    */
  def fetchJobCards(jobTitle: String, backoffMs: Int => Long = _ => 0L): Seq[JobCard] = {
    val url = listUrl(jobTitle)
    var attempt = 0
    while (attempt < maxRetries) {
      fetcher.get(url) match {
        case Right(html) =>
          val cards = HtmlExtract.jobCards(html)
          if (cards.nonEmpty) return cards.take(maxCards)
        case Left(_) =>
      }
      attempt += 1
      if (attempt < maxRetries && backoffMs(attempt) > 0) Thread.sleep(backoffMs(attempt))
    }
    Seq.empty
  }

  /** S2: distribute description fetches. Each partition shares one fetcher
    * and sleeps `retryDelayMs` between requests (the reference's
    * politeness floor, `main.py:27,36`); per-job ≤maxRetries attempts
    * degrading to null description (`main.py:37`), which the downstream
    * dropna removes.
    */
  def enrich(spark: SparkSession, cards: Seq[JobCard], jobTitle: String,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    import spark.implicits._
    val f = fetcher
    val retries = maxRetries
    val delay = retryDelayMs
    val postings = spark.createDataset(cards.map(c => (c.jobid, c.title)))
      .repartition(math.max(1, math.min(cards.size, 8)))
      .mapPartitions { it =>
        it.map { case (jobid, title) =>
          var desc: Option[String] = None
          var attempt = 0
          while (desc.isEmpty && attempt < retries) {
            f.get(s"https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/$jobid") match {
              case Right(html) => desc = HtmlExtract.description(html)
              case Left(_) =>
            }
            // the reference sleeps after EVERY request (`main.py:27,36`) —
            // the per-partition politeness floor, injectable for tests
            sleeper(delay)
            attempt += 1
          }
          JobPosting(jobid, title, desc, jobTitle)
        }
      }
    postings.toDF()
  }
}
