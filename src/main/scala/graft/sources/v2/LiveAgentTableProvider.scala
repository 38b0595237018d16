package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.LiveAgentApi

/** DataSource V2 form of the paginated REST source (SURVEY.md §2.1 S1, the
  * stretch path named in §4.3): each page range is an input partition, so
  * page fetches parallelize across executors (bounded by a per-JVM rate
  * limiter), JSON parses straight to InternalRow, and two pushdowns happen
  * at the right layer:
  *
  *  - column pruning (SupportsPushDownRequiredColumns) prunes at parse
  *    time — unrequested fields are never materialized;
  *  - time-window predicate pushdown (SupportsPushDownFilters) translates
  *    `>=` / `<=` / `>` / `<` filters on the configured `filterField` into
  *    the API's `_filters` JSON — the reference's own source-side pushdown
  *    (`utils/tickets_util.py:5-15`), here done by the connector because
  *    Catalyst cannot see across the HTTP boundary.
  *
  * The API client is injected through [[LiveAgentApiRegistry]] (options key
  * `apiRef`), so tests plug fixtures and production plugs an HTTP client;
  * the client object is serialized into each partition.
  *
  * Usage:
  * {{{
  *   LiveAgentApiRegistry.register("fixture", api)
  *   spark.read.format("graft.sources.v2.LiveAgentTableProvider")
  *     .option("apiRef", "fixture").option("endpoint", "tickets")
  *     .option("filterField", "date_created")
  *     .load()
  * }}}
  */
class LiveAgentTableProvider extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LiveAgentTableProvider.inferSchema(
      LiveAgentApiRegistry.get(options.get("apiRef")),
      options.get("endpoint"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LiveAgentTable(schema, properties.asScala.toMap)
}

object LiveAgentTableProvider {
  /** Driver-side schema probe: first page → spark.read.json inference,
    * normalized per §1.2 (SchemaInference).
    */
  def inferSchema(api: LiveAgentApi, endpoint: String): StructType = {
    val spark = SparkSession.active
    import spark.implicits._
    val sample = api.fetchPage(endpoint, 1, 100, Map.empty)
      .getOrElse(throw new IllegalArgumentException(s"cannot sample $endpoint"))
    if (sample.isEmpty) throw new IllegalArgumentException(s"empty endpoint $endpoint")
    graft.operators.SchemaInference.normalizeStruct(
      spark.read.json(sample.toDS()).schema)
  }
}

/** Driver-side registry injecting (serializable) API clients by name. */
object LiveAgentApiRegistry {
  private val apis = new java.util.concurrent.ConcurrentHashMap[String, LiveAgentApi]()
  def register(name: String, api: LiveAgentApi): Unit = apis.put(name, api)
  def get(name: String): LiveAgentApi = {
    val a = apis.get(name)
    require(a != null, s"no LiveAgentApi registered under '$name'")
    a
  }
}

class LiveAgentTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"liveagent:${props.getOrElse("endpoint", "?")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LiveAgentScanBuilder(schema, props ++ options.asScala)
}

class LiveAgentScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[sources.Filter] = Array.empty
  private var apiFilters: Map[String, String] = Map.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown — load-bearing for a PAGINATED source: `LIMIT n`
    * must fetch ⌈n / pageSize⌉ pages, not walk the whole endpoint.
    * Pages are planned in order, so the first ⌈n/pageSize⌉ partitions
    * are guaranteed to contain the first n rows (the API's page order
    * IS the scan order). Advisory: Spark keeps its own Limit on top, so
    * over-fetch within the last page is trimmed plan-side.
    */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    true
  }

  /** Translate range predicates on `filterField` into the API `_filters`
    * JSON (the reference uses operators `D>` / `D<=` on the date field).
    * Everything else stays a Spark-side filter.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val field = props.getOrElse("filterField", "")
    val (acceptedParts, rest) = filters.partition {
      case sources.GreaterThan(a, _) if a == field            => true
      case sources.GreaterThanOrEqual(a, _) if a == field     => true
      case sources.LessThan(a, _) if a == field               => true
      case sources.LessThanOrEqual(a, _) if a == field        => true
      case _                                                  => false
    }
    if (acceptedParts.nonEmpty) {
      val terms = acceptedParts.map {
        case sources.GreaterThan(a, v)        => s"""["$a","D>","$v"]"""
        case sources.GreaterThanOrEqual(a, v) => s"""["$a","D>=","$v"]"""
        case sources.LessThan(a, v)           => s"""["$a","D<","$v"]"""
        case sources.LessThanOrEqual(a, v)    => s"""["$a","D<=","$v"]"""
        case f => throw new IllegalStateException(s"unexpected $f")
      }
      apiFilters = Map("_filters" -> terms.mkString("[", ",", "]"))
      pushed = acceptedParts
    }
    // pushed filters are advisory (API may not apply them exactly) — keep
    // them Spark-side too for correctness
    rest ++ acceptedParts
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = new LiveAgentScan(required, props, apiFilters, limit)
}

class LiveAgentScan(required: StructType, props: Map[String, String],
                    apiFilters: Map[String, String],
                    limit: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"LiveAgentScan(${props.getOrElse("endpoint", "?")}, pushed=$apiFilters" +
      limit.map(l => s", limit=$l").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    val api = LiveAgentApiRegistry.get(props("apiRef"))
    val maxPages = props.getOrElse("maxPages", "100").toInt
    val pageSize = props.getOrElse("pageSize", "100").toInt
    // LIMIT n needs only the first ⌈n/pageSize⌉ pages — page order is
    // scan order, so no later page can contribute to the first n rows
    val effPages = limit
      .map(l => math.min(maxPages, (l + pageSize - 1) / pageSize))
      .getOrElse(maxPages)
    // one partition per page; the reader stops early if its page is empty
    (1 to effPages).map(p =>
      LiveAgentInputPartition(api, props("endpoint"), p, pageSize, apiFilters)
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LiveAgentReaderFactory(required)
}

case class LiveAgentInputPartition(api: LiveAgentApi, endpoint: String,
                                   page: Int, pageSize: Int,
                                   filters: Map[String, String]) extends InputPartition

class LiveAgentReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LiveAgentInputPartition]
    new LiveAgentPartitionReader(p, schema)
  }
}

/** Executor-side page reader: one throttled fetch, then straight JSON →
  * InternalRow via JacksonParser over the REQUIRED schema only.
  */
class LiveAgentPartitionReader(p: LiveAgentInputPartition, schema: StructType)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    LiveAgentPartitionReader.limiter.acquire()
    val page = try p.api.fetchPage(p.endpoint, p.page, p.pageSize, p.filters)
      finally LiveAgentPartitionReader.limiter.release()
    val items = page.getOrElse(Seq.empty)
    val parser = new JacksonParser(schema,
      new JSONOptions(Map.empty[String, String], "UTC"), allowArrayAsStructs = true)
    items.iterator.flatMap(json =>
      parser.parse(json, CreateJacksonParser.string, UTF8String.fromString)
        .map(_.copy()))
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object LiveAgentPartitionReader {
  /** Per-JVM limiter mirroring the reference envelope: 15 concurrent,
    * 0.4 s between launches (~150 req/min). On a cluster each executor JVM
    * holds one — set maxConcurrent per executor accordingly.
    */
  lazy val limiter = new graft.sources.RateLimiter(15, 400)
}
