package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for ERDDAP-convention CSV responses
  * (SURVEY.md §4 "optional DSv2 connector"): the reference pushes
  * predicates/projections into tabledap request URLs
  * (/root/reference/gdutils/__init__.py:770-805); this connector exposes
  * the same pushdown surface to Catalyst via `SupportsPushDownFilters` +
  * `SupportsPushDownRequiredColumns`, so `SELECT a, b WHERE time >= t`
  * plans a scan that (a) only materializes a,b and (b) evaluates the
  * pushed comparisons inside the reader — the exact seam where a live
  * deployment would translate them into ERDDAP constraint URLs
  * (io.ErddapUrl) instead of reading local files.
  *
  * Usage:
  *   spark.read.format("graft.sources.v2.ErddapTableProvider")
  *     .schema(s).option("path", "fixtures/glob_*.csv").load()
  *
  * File format handled: header row, optional units row (auto-skipped when
  * the first typed column fails to parse), NA tokens none/None, simple
  * unquoted CSV (ERDDAP's own output shape). One input partition per
  * file — ERDDAP responses are per-dataset files; a glob of thousands of
  * datasets parallelizes across the cluster.
  */
class ErddapTableProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val cfg = ErddapV2.httpConfig(k => options.get(k))
    // first source whose header we can read wins — a 404 on the FIRST
    // url (its constraints match nothing) must not collapse a multi-url
    // read to zero columns while sibling partitions still carry data.
    // All sources 404ing = a genuinely empty result: empty schema is the
    // reference's empty-frame parity.
    ErddapV2.files(options.get("path")).iterator
      .flatMap(src => ErddapV2.headerLine(src, cfg))
      .nextOption() match {
      case None => StructType(Nil)
      case Some(h) =>
        StructType(h.split(",", -1).map(n =>
          StructField(graft.sources.ErddapCsv.normalizeName(n.trim), StringType)))
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ErddapTable(schema, properties.get("path"),
      Option(properties.get("unitsRow")).getOrElse("always"),
      ErddapV2.httpConfig(properties.get))
}

private[v2] object ErddapV2 {
  /** Compile a glob segment to a regex, quoting everything except the
    * `*` / `?` wildcards (file names may legally contain regex
    * metachars like `+` or `(`). */
  private def globToRegex(glob: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    java.util.regex.Pattern.compile(sb.toString)
  }

  private def isUrl(s: String): Boolean =
    s.regionMatches(true, 0, "http://", 0, 7) ||
      s.regionMatches(true, 0, "https://", 0, 8)

  /** Build the reader-side HTTP config from DSv2 options (URLs can
    * contain commas, so URL lists are whitespace-separated). */
  def httpConfig(get: String => String): graft.sources.ErddapHttp.HttpConfig = {
    def opt(k: String): Option[String] = Option(get(k))
    val d = graft.sources.ErddapHttp.HttpConfig()
    d.copy(
      connectTimeoutMs = opt("httpConnectTimeoutMs").map(_.toInt).getOrElse(d.connectTimeoutMs),
      requestTimeoutMs = opt("httpRequestTimeoutMs").map(_.toInt).getOrElse(d.requestTimeoutMs),
      retries = opt("httpRetries").map(_.toInt).getOrElse(d.retries),
      backoffMs = opt("httpBackoffMs").map(_.toLong).getOrElse(d.backoffMs),
      emptyOn404 = opt("emptyOn404").map(_.toBoolean).getOrElse(d.emptyOn404),
      maxResponseBytes = opt("httpMaxResponseBytes").map(_.toLong)
        .getOrElse(d.maxResponseBytes))
  }

  /** One line source per partition: a local file opens directly; a URL
    * goes through ErddapHttp's retrying fetch, where None = ERDDAP's
    * "404 means no matching rows" → an empty partition (reference
    * empty-frame parity), exactly how a live tabledap request behaves
    * when its pushed-down constraints match nothing. */
  def open(src: String, cfg: graft.sources.ErddapHttp.HttpConfig): Option[java.io.InputStream] =
    if (isUrl(src))
      graft.sources.ErddapHttp.fetchBytes(src, cfg)
        .map(new java.io.ByteArrayInputStream(_))
    else Some(new java.io.FileInputStream(src))

  /** First line of `src` WITHOUT buffering the body: a URL streams just
    * the header through fetchFirstLine; a local file reads one line.
    * None = 404-empty (URL) or an empty file. */
  def headerLine(src: String, cfg: graft.sources.ErddapHttp.HttpConfig): Option[String] =
    if (isUrl(src)) graft.sources.ErddapHttp.fetchFirstLine(src, cfg)
    else {
      val s = scala.io.Source.fromFile(src, "UTF-8")
      try s.getLines().nextOption().filter(_.nonEmpty) finally s.close()
    }

  def files(pathSpec: String): Seq[String] = {
    if (isUrl(pathSpec.trim))
      return pathSpec.trim.split("\\s+").toSeq
    val f = new java.io.File(pathSpec)
    if (f.isFile) Seq(f.getAbsolutePath)
    else if (f.isDirectory) f.listFiles().filter(_.isFile).map(_.getAbsolutePath).sorted.toSeq
    else { // glob on the final segment (bare globs resolve against cwd)
      val dir = Option(f.getParentFile).getOrElse(new java.io.File("."))
      val re = globToRegex(f.getName)
      val matched = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && re.matcher(x.getName).matches())
        .map(_.getAbsolutePath).sorted.toSeq
      if (matched.isEmpty)
        throw new IllegalArgumentException(s"no files match $pathSpec")
      matched
    }
  }
}

private[v2] class ErddapTable(schema: StructType, path: String, unitsRow: String,
    http: graft.sources.ErddapHttp.HttpConfig)
    extends Table with SupportsRead {
  override def name(): String = s"erddap:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ErddapScanBuilder(schema, path, unitsRow, http)
}

private[v2] class ErddapScanBuilder(fullSchema: StructType, path: String,
    unitsRow: String, http: graft.sources.ErddapHttp.HttpConfig)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Int = -1

  /** LIMIT pushdown (SURVEY §4: the reference's `items_per_page` —
    * /root/reference/gdutils/__init__.py:31-32,403 — caps each catalog
    * REQUEST; the same cap here stops each file reader early). Partial:
    * each partition (file ≙ request) returns at most `limit` rows, and
    * Spark's own Limit above the scan takes the global cut. */
  override def pushLimit(limit: Int): Boolean = { pushedLimit = limit; true }
  override def isPartiallyPushed(): Boolean = true

  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(supported)
    pushed = sup
    unsup // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ErddapScan(fullSchema, required, pushed, path, unitsRow, pushedLimit,
      http)
}

private[v2] class ErddapScan(fullSchema: StructType, required: StructType,
                             filters: Array[Filter], path: String,
                             unitsRow: String, limit: Int,
                             http: graft.sources.ErddapHttp.HttpConfig)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ErddapScan(path=$path, pushed=${filters.mkString(",")}, limit=$limit)"

  override def planInputPartitions(): Array[InputPartition] =
    ErddapV2.files(path).map(f => ErddapFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ErddapReaderFactory(fullSchema, required, filters, unitsRow, limit,
      http)
}

private[v2] case class ErddapFilePartition(file: String) extends InputPartition

private[v2] class ErddapReaderFactory(fullSchema: StructType,
    required: StructType, filters: Array[Filter], unitsRow: String,
    limit: Int, http: graft.sources.ErddapHttp.HttpConfig)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ErddapFileReader(p.asInstanceOf[ErddapFilePartition].file,
      fullSchema, required, filters, unitsRow, limit, http)
}

/** Per-file reader: header-driven column mapping, units-row skip, NA
  * tokens, typed parse, pushed-filter evaluation, early stop at the
  * pushed limit (post-filter row count, matching ERDDAP's per-request
  * `items_per_page` semantics; -1 = no limit). */
private[v2] class ErddapFileReader(file: String, fullSchema: StructType,
    required: StructType, filters: Array[Filter], unitsRow: String,
    limit: Int = -1,
    http: graft.sources.ErddapHttp.HttpConfig = graft.sources.ErddapHttp.HttpConfig())
    extends PartitionReader[InternalRow] {

  private var emitted = 0L

  // executor-side fetch: file or retrying HTTP GET; None = 404 = empty
  private val source: Option[scala.io.Source] =
    ErddapV2.open(file, http).map(scala.io.Source.fromInputStream(_, "UTF-8"))
  private val lines = source.map(_.getLines()).getOrElse(Iterator.empty)
  private val header: Array[String] =
    if (lines.hasNext)
      lines.next().split(",", -1).map(h =>
        graft.sources.ErddapCsv.normalizeName(h.trim))
    else Array.empty
  private val colIdx: Map[String, Int] = header.zipWithIndex.toMap
  private val fieldsByName = fullSchema.fields.map(f => f.name -> f).toMap

  private var current: InternalRow = _
  private var firstDataRow = true

  private def parseValue(raw: String, dt: DataType): Any = {
    val v = raw.trim
    if (v.isEmpty || v == "none" || v == "None" || v == "NaN") null
    else dt match {
      case StringType => UTF8String.fromString(v)
      case DoubleType => try java.lang.Double.valueOf(v) catch { case _: Exception => null }
      case LongType => try java.lang.Long.valueOf(v) catch { case _: Exception => null }
      case IntegerType => try Integer.valueOf(v) catch { case _: Exception => null }
      case BooleanType => try java.lang.Boolean.valueOf(v) catch { case _: Exception => null }
      case TimestampType =>
        DateTimeUtils.stringToTimestamp(UTF8String.fromString(v),
          DateTimeUtils.getZoneId("UTC")).map(Long.box).orNull
      case _ => UTF8String.fromString(v)
    }
  }

  private def fieldValue(cells: Array[String], name: String): Any =
    colIdx.get(name) match {
      case Some(i) if i < cells.length =>
        parseValue(cells(i), fieldsByName(name).dataType)
      case _ => null
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, _) => x.compareTo(toLong(b))
    case (x: java.lang.Double, _) => x.compareTo(toDouble(b))
    case (x: java.lang.Integer, _) => x.toLong.compareTo(toLong(b))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x: java.lang.Boolean, y) =>
      x.compareTo(java.lang.Boolean.valueOf(String.valueOf(y)))
    case (x: UTF8String, y) => x.toString.compareTo(String.valueOf(y))
    case _ => 0
  }
  private def toLong(b: Any): Long = b match {
    case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant => DateTimeUtils.instantToMicros(i)
    case d: java.sql.Date => DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate => d.toEpochDay
    case n: Number => n.longValue()
    case s => s.toString.toLong
  }
  private def toDouble(b: Any): Double = b match {
    case n: Number => n.doubleValue()
    case s => s.toString.toDouble
  }

  private def eval(f: Filter, get: String => Any): Boolean = f match {
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case EqualTo(a, v) => val x = get(a); x != null && cmp(x, v) == 0
    case GreaterThan(a, v) => val x = get(a); x != null && cmp(x, v) > 0
    case GreaterThanOrEqual(a, v) => val x = get(a); x != null && cmp(x, v) >= 0
    case LessThan(a, v) => val x = get(a); x != null && cmp(x, v) < 0
    case LessThanOrEqual(a, v) => val x = get(a); x != null && cmp(x, v) <= 0
    case _ => true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (lines.hasNext) {
      val cells = lines.next().split(",", -1)
      // units row handling per the `unitsRow` option:
      //  - "always" (default): ERDDAP's 2-header convention — skip the
      //    first data row unconditionally (reference skiprows=[1]; units
      //    cells can legally be parseable values like "1", so detection
      //    cannot be trusted)
      //  - "never": plain CSV
      //  - "auto":  best-effort — skip the first data row only when some
      //    typed (non-string) column fails to parse. Malformed values in
      //    later rows always coerce to null (pandas errors='coerce').
      val isUnitsRow = firstDataRow && (unitsRow match {
        case "never" => false
        case "auto" =>
          fullSchema.fields.exists { f =>
            f.dataType != StringType && colIdx.contains(f.name) && {
              val i = colIdx(f.name)
              i < cells.length && cells(i).trim.nonEmpty &&
                parseValue(cells(i), f.dataType) == null &&
                !Seq("none", "None", "NaN").contains(cells(i).trim)
            }
          }
        case _ => true
      })
      firstDataRow = false
      if (!isUnitsRow) {
        val get: String => Any = name => fieldValue(cells, name)
        if (filters.forall(eval(_, get))) {
          current = InternalRow.fromSeq(
            required.fields.toSeq.map(f => fieldValue(cells, f.name)))
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.foreach(_.close())
}
