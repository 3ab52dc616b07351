package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.scrape.{Fetcher, HtmlExtract, JobCard, LinkedInScraper}

/** Executor-visible fetcher resolution. A [[Fetcher]] is not expressible as
  * a DSv2 string option, so the scan carries either
  *   - `fetcher` — a name registered via [[Fetchers.register]] (tests,
  *     single-JVM local mode), or
  *   - `fetcher_class` — a zero-arg [[Fetcher]] class instantiated by
  *     reflection on each executor (the cluster deployment path; default
  *     [[UrlFetcher]]).
  */
object Fetchers {
  private val named = TrieMap.empty[String, Fetcher]

  def register(name: String, f: Fetcher): Unit = named.put(name, f)

  def resolve(name: Option[String], className: Option[String]): Fetcher =
    name.map(n => named.getOrElse(n,
        throw new IllegalArgumentException(s"no fetcher registered as '$n'")))
      .orElse(className.map(c =>
        Class.forName(c).getDeclaredConstructor().newInstance().asInstanceOf[Fetcher]))
      .getOrElse(new UrlFetcher)
}

/** Live-HTTP fetcher on `java.net.HttpURLConnection` — the production
  * transport (the reference's `requests.get`, `/root/reference/main.py:26`).
  */
final class UrlFetcher extends Fetcher {
  def get(url: String): Either[String, String] =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("User-Agent", "graft/0.1")
      val code = conn.getResponseCode
      if (code == 200) {
        val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
        conn.getInputStream.close()
        Right(body)
      } else Left(s"HTTP $code")
    } catch { case e: Exception => Left(e.toString) }
}

/** DataSource V2 for the LinkedIn scrape (SURVEY §2.1 S1+S2; §7 step 6):
  *
  * {{{
  *   spark.read.format("linkedin-jobs")
  *     .option("job_title", "Data Engineer")
  *     .load()
  *     .select("jobid", "title")   // column pruning → NO description GETs
  *     .limit(10)                  // limit pushdown → only 10 cards enriched
  * }}}
  *
  * The list-page fetch (S1) runs once, driver-side, at `planInputPartitions`
  * — honest about its ≤25-card cardinality — while the per-job description
  * enrichment (S2, the expensive network fan-out) is distributed: each
  * input partition carries a slice of the cards and its reader fetches
  * with the reference's retry + politeness-sleep semantics
  * (`/root/reference/main.py:22-37`).
  *
  * Scan pushdown does the work a custom optimizer rule otherwise would
  * (SURVEY §4): `SupportsPushDownLimit` caps the card list BEFORE any
  * description is fetched (mirroring the reference capping at
  * `main.py:97`), and `SupportsPushDownRequiredColumns` drops the
  * description fetch entirely when the column is pruned away.
  */
class JobsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "linkedin-jobs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JobsTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JobsTable(new CaseInsensitiveStringMap(properties))
}

object JobsTable {
  val Schema: StructType = StructType(Seq(
    StructField("jobid", StringType, nullable = false),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("job_type", StringType, nullable = false)))
}

final class JobsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String =
    s"linkedin-jobs(${options.getOrDefault("job_title", "")})"
  override def schema(): StructType = JobsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new JobsScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class JobsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var limit: Option[Int] = None
  private var required: StructType = JobsTable.Schema

  /** The cap is applied to the complete card list at planning time, so the
    * pushdown is total — Spark drops its own Limit node
    * (`isPartiallyPushed = false`).
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order; an empty projection (e.g. count(*))
    // still reads zero-field rows, one per card
    required = StructType(JobsTable.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new JobsScan(
    jobTitle = Option(options.get("job_title")).getOrElse(
      throw new IllegalArgumentException("option 'job_title' is required")),
    fetcherName = Option(options.get("fetcher")),
    fetcherClass = Option(options.get("fetcher_class")),
    maxCards = options.getInt("max_cards", 25),
    maxRetries = options.getInt("max_retries", 5),
    retryDelayMs = options.getLong("retry_delay_ms", 3000L),
    cardsPerPartition = options.getInt("cards_per_partition", 4),
    required = required,
    limit = limit)
}

final case class JobsInputPartition(cards: Seq[JobCard]) extends InputPartition

final class JobsScan(jobTitle: String, fetcherName: Option[String],
    fetcherClass: Option[String], maxCards: Int, maxRetries: Int,
    retryDelayMs: Long, cardsPerPartition: Int, required: StructType,
    limit: Option[Int]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"linkedin-jobs(job_title=$jobTitle, PushedLimit=${limit.getOrElse("none")}, " +
      s"ReadSchema=${required.simpleString})"

  /** S1 — one list-page fetch, driver-side; limit applied before any
    * partition (and so before any description GET) is planned.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val fetcher = Fetchers.resolve(fetcherName, fetcherClass)
    val scraper = new LinkedInScraper(fetcher, maxRetries, retryDelayMs, maxCards)
    val cards = scraper.fetchJobCards(jobTitle)
    val capped = limit.fold(cards)(cards.take)
    capped.grouped(math.max(1, cardsPerPartition))
      .map(g => JobsInputPartition(g)).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JobsReaderFactory(jobTitle, fetcherName, fetcherClass, maxRetries,
      retryDelayMs, required)
}

final class JobsReaderFactory(jobTitle: String, fetcherName: Option[String],
    fetcherClass: Option[String], maxRetries: Int, retryDelayMs: Long,
    required: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val cards = partition.asInstanceOf[JobsInputPartition].cards
    val needDescription = required.fieldNames.contains("description")
    val fetcher = Fetchers.resolve(fetcherName, fetcherClass)

    new PartitionReader[InternalRow] {
      private val it = cards.iterator
      private var current: InternalRow = _

      /** S2 — per-job enrichment with the reference's retry + sleep-after-
        * every-request semantics (`main.py:22-37`); skipped wholesale when
        * the description column was pruned.
        */
      private def describe(jobid: String): Option[String] = {
        var desc: Option[String] = None
        var attempt = 0
        while (desc.isEmpty && attempt < maxRetries) {
          fetcher.get(s"https://www.linkedin.com/jobs-guest/jobs/api/jobPosting/$jobid") match {
            case Right(html) => desc = HtmlExtract.description(html)
            case Left(_) =>
          }
          if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
          attempt += 1
        }
        desc
      }

      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val c = it.next()
          val values = required.fieldNames.map {
            case "jobid" => UTF8String.fromString(c.jobid)
            case "title" => c.title.map(UTF8String.fromString).orNull
            case "description" =>
              if (needDescription) describe(c.jobid).map(UTF8String.fromString).orNull
              else null
            case "job_type" => UTF8String.fromString(jobTitle)
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
          true
        }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
