package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One fixed-width field: 1-based byte offset, width, and decoded type
  * (LongType / DoubleType / StringType). Numerics are space-padded and
  * trimmed both sides; strings are right-trimmed (the rpad inverse) —
  * the same copybook conventions as the src15 roundtrip row.
  */
final case class FixedWidthField(name: String, start: Int, len: Int,
    dataType: DataType) {
  def decode(line: String): Any = {
    val lo = math.min(start - 1, line.length)
    val hi = math.min(lo + len, line.length)
    val raw = line.substring(lo, hi)
    dataType match {
      case LongType =>
        val t = raw.trim
        if (t.isEmpty) null else java.lang.Long.valueOf(t)
      case DoubleType =>
        val t = raw.trim
        if (t.isEmpty) null else java.lang.Double.valueOf(t)
      case _ =>
        var e = raw.length
        while (e > 0 && raw.charAt(e - 1) == ' ') e -= 1
        raw.substring(0, e)
    }
  }
}

/** DataSource V2 connector for FIXED-WIDTH text estates (the
  * mainframe/COBOL-copybook interchange format Spark has no reader
  * for). The src15 registry row decodes the format with substring/cast
  * projections; this promotes it to a real `TableProvider` so the
  * format gets the full scan contract a platform team would need:
  *
  *   - SCHEMA INFERENCE: field geometry comes from the `columns`
  *     option (`name:start:len[:type]`, 1-based offsets); omitted
  *     types are inferred by sampling the first rows of the first
  *     file (all-long -> long, else all-double -> double, else
  *     string) — the same infer-by-sample posture as Spark's CSV.
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only the
  *     requested byte ranges are decoded; unread fields cost nothing
  *     (fixed-width is the one text format where projection maps to
  *     byte offsets, exactly like a columnar stride).
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparison /
  *     null / prefix predicates evaluate DURING line decode, before
  *     any row object is built; the accepted set is reported via
  *     `pushedFilters()` and printed in the scan's plan description
  *     (`PushedFilters: [...]`), so `.explain` shows what reached the
  *     scan — PlanSpec pins it.
  *   - PARTITION PLANNING: every record is exactly `lineLen+1` bytes
  *     (probed once per file at planning time), so files split into
  *     `maxPartitionBytes`-sized slices at EXACT record boundaries —
  *     full scan parallelism with no line-boundary search, the
  *     property generic text sources don't have.
  *
  * Scale: planning touches one line per file; reading is scan-local
  * with zero shuffle; a 100 TB fixed-width estate reads at full
  * cluster width with pruning+pushdown applied per slice. Executors
  * open files with a fresh Hadoop `Configuration` (local/posix paths
  * need none); a cluster deployment would thread the session's Hadoop
  * conf through the reader factory the same way the built-in file
  * sources do.
  */
class FixedWidthDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-fixedwidth"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthSource.inferSchema(options.asScala.toMap)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FixedWidthTable(schema, properties.asScala.toMap)
}

object FixedWidthSource {
  /** Parse `columns` = "name:start:len[:type],..." (1-based starts). */
  def parseSpec(options: Map[String, String])
      : Seq[(String, Int, Int, Option[DataType])] = {
    val spec = options.getOrElse("columns",
      throw new IllegalArgumentException(
        "graft-fixedwidth requires a 'columns' option: name:start:len[:type],..."))
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
      c.split(":") match {
        case Array(n, st, ln) => (n, st.trim.toInt, ln.trim.toInt, None)
        case Array(n, st, ln, t) =>
          val dt = t.trim.toLowerCase match {
            case "long" | "bigint" => LongType
            case "double"          => DoubleType
            case "string"          => StringType
            case other => throw new IllegalArgumentException(
              s"graft-fixedwidth: unsupported type '$other' for field $n")
          }
          (n, st.trim.toInt, ln.trim.toInt, Some(dt))
        case _ => throw new IllegalArgumentException(
          s"graft-fixedwidth: bad column spec '$c'")
      }
    }
  }

  def paths(options: Map[String, String]): Seq[Path] = {
    val raw = options.get("path").orElse(options.get("paths")).getOrElse(
      throw new IllegalArgumentException("graft-fixedwidth: no path given"))
    val p = new Path(raw)
    val fs = p.getFileSystem(hadoopConf())
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getLen > 0 &&
            !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          .map(_.getPath)
      else if (st.getLen > 0) Seq(st.getPath)
      else Seq.empty
    }.sortBy(_.toString)
  }

  /** Driver-side planning conf: the active session's Hadoop conf when
    * one exists (tests/driver), else defaults.
    */
  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Sample-based type inference for fields whose spec omits the type:
    * read up to 100 lines of the first file; all-long -> long, else
    * all-double -> double, else string (blank-only samples -> string).
    */
  def inferSchema(options: Map[String, String]): StructType = {
    val spec = parseSpec(options)
    val needsInfer = spec.exists(_._4.isEmpty)
    val sampled: Seq[String] =
      if (!needsInfer) Seq.empty
      else {
        val ps = paths(options)
        if (ps.isEmpty) Seq.empty
        else {
          val fs = ps.head.getFileSystem(hadoopConf())
          val in = fs.open(ps.head)
          try {
            val br = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, "UTF-8"))
            Iterator.continually(br.readLine()).takeWhile(_ != null)
              .take(100).toSeq
          } finally in.close()
        }
      }
    StructType(spec.map { case (n, st, ln, dt) =>
      val resolved = dt.getOrElse {
        val vals = sampled
          .map(l => FixedWidthField(n, st, ln, StringType)
            .decode(l).asInstanceOf[String].trim)
          .filter(_.nonEmpty)
        if (vals.nonEmpty && vals.forall(v => v.toLongOption.isDefined))
          LongType
        else if (vals.nonEmpty && vals.forall(v => v.toDoubleOption.isDefined))
          DoubleType
        else StringType
      }
      StructField(n, resolved, nullable = true)
    })
  }

  def fields(schema: StructType, options: Map[String, String])
      : Seq[FixedWidthField] = {
    val spec = parseSpec(options)
    spec.map { case (n, st, ln, _) =>
      val dt = schema.find(_.name == n).map(_.dataType).getOrElse(StringType)
      FixedWidthField(n, st, ln, dt)
    }
  }
}

class FixedWidthTable(schema: StructType, options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-fixedwidth(${options.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(schema, options ++ opts.asScala)
}

class FixedWidthScanBuilder(fullSchema: StructType,
    options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  private def supported(f: Filter): Boolean = f match {
    case sources.EqualTo(a, _)            => fullSchema.fieldNames.contains(a)
    case sources.GreaterThan(a, _)        => fullSchema.fieldNames.contains(a)
    case sources.GreaterThanOrEqual(a, _) => fullSchema.fieldNames.contains(a)
    case sources.LessThan(a, _)           => fullSchema.fieldNames.contains(a)
    case sources.LessThanOrEqual(a, _)    => fullSchema.fieldNames.contains(a)
    case sources.IsNull(a)                => fullSchema.fieldNames.contains(a)
    case sources.IsNotNull(a)             => fullSchema.fieldNames.contains(a)
    case sources.StringStartsWith(a, _)   => fullSchema.fieldNames.contains(a)
    case sources.And(l, r)                => supported(l) && supported(r)
    case sources.Or(l, r)                 => supported(l) && supported(r)
    case sources.Not(c)                   => supported(c)
    case _                                => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(supported)
    pushed = ok
    rest // the source evaluates `ok` exactly; Spark re-checks only `rest`
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new FixedWidthScan(fullSchema, required, pushed, options)
}

final case class FixedWidthInputPartition(path: String, startByte: Long,
    nRecords: Long, lineLen: Int) extends InputPartition

class FixedWidthScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], options: Map[String, String])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = {
    val cols = required.fieldNames.mkString(",")
    val fs = pushed.map(_.toString).sorted.mkString(", ")
    s"GraftFixedWidth ReadSchema: [$cols], PushedFilters: [$fs]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val targetBytes = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val parts = ArrayBuffer.empty[InputPartition]
    FixedWidthSource.paths(options).foreach { p =>
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      // probe the record geometry: first line's byte length (+1 for \n)
      val in = fs.open(p)
      val lineLen =
        try {
          var n = 0
          var b = in.read()
          while (b >= 0 && b != '\n') { n += 1; b = in.read() }
          n
        } finally in.close()
      if (lineLen > 0) {
        val rec = lineLen + 1
        require(len % rec == 0 || len % rec == lineLen.toLong,
          s"graft-fixedwidth: $p length $len is not a multiple of the " +
            s"probed record size $rec — mixed line lengths?")
        val nRecords = (len + 1) / rec
        val perPart = math.max(1L, targetBytes / rec)
        var start = 0L
        while (start < nRecords) {
          val n = math.min(perPart, nRecords - start)
          parts += FixedWidthInputPartition(p.toString, start * rec, n, lineLen)
          start += n
        }
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(fullSchema, required, pushed, options)
}

class FixedWidthReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], options: Map[String, String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FixedWidthInputPartition]
    val allFields = FixedWidthSource.fields(fullSchema, options)
    // decode only what the projection + pushed filters actually touch
    val filterRefs = pushed.flatMap(_.references).toSet
    val needed = allFields.filter(f =>
      required.fieldNames.contains(f.name) || filterRefs.contains(f.name))
    val outIdx = required.fieldNames.map(n => needed.indexWhere(_.name == n))

    new PartitionReader[InternalRow] {
      private val fsPath = new Path(p.path)
      private val in = fsPath.getFileSystem(new Configuration()).open(fsPath)
      in.seek(p.startByte)
      private val buf = new Array[Byte](p.lineLen + 1)
      private var emitted = 0L
      private var row: InternalRow = _

      private def decodeNext(): Boolean = {
        while (emitted < p.nRecords) {
          val want = buf.length
          var got = 0
          var r = 0
          while (got < want && r >= 0) {
            r = in.read(buf, got, want - got)
            if (r > 0) got += r
          }
          emitted += 1
          if (got >= p.lineLen) {
            val line = new String(buf, 0, p.lineLen, "UTF-8")
            val vals = needed.map(_.decode(line)).toArray
            def get(name: String): Any = {
              val i = needed.indexWhere(_.name == name)
              if (i < 0) null else vals(i)
            }
            if (pushed.forall(f => FixedWidthFilters.eval(f, get))) {
              row = InternalRow.fromSeq(outIdx.map { i =>
                vals(i) match {
                  case s: String => UTF8String.fromString(s)
                  case other     => other
                }
              }.toIndexedSeq)
              return true
            }
          }
        }
        false
      }

      override def next(): Boolean = decodeNext()
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** Exact executor-side evaluation of the pushed v1 filters over decoded
  * field values, in SQL THREE-VALUED logic: a comparison over a null
  * field is UNKNOWN (None), not false — `Not(unknown)` must stay
  * unknown, not flip to true. Two-valued `!eval(...)` would KEEP rows
  * with blank numeric fields under e.g. `col =!= v` inside an Or
  * (Spark never re-checks pushed filters, so the wrong keep would be
  * silent). The DSv2 contract is "return rows iff all pushed filters
  * match", and SQL's match is `eval3 == Some(true)` — unknown rows
  * are dropped, exactly as a post-scan Filter would drop them.
  */
object FixedWidthFilters {
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Long, y: Number) =>
      Some(java.lang.Long.compare(x, y.longValue()))
    case (x: java.lang.Double, y: Number) =>
      Some(java.lang.Double.compare(x, y.doubleValue()))
    case (x: String, y) => Some(x.compareTo(y.toString))
    case _              => None
  }

  /** Kleene three-valued evaluation; None = SQL unknown. */
  def eval3(f: Filter, get: String => Any): Option[Boolean] = f match {
    case sources.EqualTo(a, v)            => cmp(get(a), v).map(_ == 0)
    case sources.GreaterThan(a, v)        => cmp(get(a), v).map(_ > 0)
    case sources.GreaterThanOrEqual(a, v) => cmp(get(a), v).map(_ >= 0)
    case sources.LessThan(a, v)           => cmp(get(a), v).map(_ < 0)
    case sources.LessThanOrEqual(a, v)    => cmp(get(a), v).map(_ <= 0)
    case sources.IsNull(a)                => Some(get(a) == null)
    case sources.IsNotNull(a)             => Some(get(a) != null)
    case sources.StringStartsWith(a, p) =>
      get(a) match {
        case s: String => Some(s.startsWith(p))
        case null      => None
        case _         => Some(false)
      }
    case sources.And(l, r) =>
      (eval3(l, get), eval3(r, get)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case sources.Or(l, r) =>
      (eval3(l, get), eval3(r, get)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
    case sources.Not(c) => eval3(c, get).map(!_)
    // Unreachable: pushFilters only accepts the shapes above (anything
    // else stays a Spark-side residual and never arrives here).
    case _ => None
  }

  def eval(f: Filter, get: String => Any): Boolean =
    eval3(f, get).contains(true)
}
