package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-lines` — a DataSource V2 for line-oriented text shards with
  * byte-offset provenance: the first hop of a training-data pipeline
  * (raw .txt/.jsonl shards → rows), exposed as a real Spark source so
  * the planner can do its job:
  *
  *  - schema `(path STRING, offset BIGINT, line STRING)` — offset is the
  *    byte position of the line start, the provenance key that lets a
  *    curation pipeline point back into the original shard;
  *  - PARALLEL INTRA-FILE SPLITS: each file is carved into `chunkBytes`
  *    ranges read concurrently. Line ownership follows the Hadoop
  *    LineRecordReader convention — a reader for (s, e] discards the
  *    first partial line when s != 0 and owns every line whose first
  *    byte is in (s, e] (plus byte 0 for the first chunk) — so a 100 GB
  *    shard becomes ~25k independent tasks with no coordination;
  *  - OFFSET FILTER PUSHDOWN (`SupportsPushDownFilters`): >,>=,<,<=,= on
  *    `offset` fold into one byte interval that both PRUNES whole chunks
  *    at planning time and bounds rows inside each reader — resuming a
  *    half-processed shard reads only the tail bytes;
  *  - AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): an ungrouped
  *    COUNT(*) collapses to one long per chunk inside the source
  *    (LinesCountReader), composing with the offset interval;
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): a count or an
  *    offset-only projection never materializes line/path strings.
  *
  * Registered as `graft-lines` via META-INF DataSourceRegister, so
  * `spark.read.format("graft-lines").load(dir)` works with zero session
  * setup. Lines are emitted as raw UTF-8 bytes (UTF8String.fromBytes) —
  * no transcode on the hot path.
  */
class LinesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-lines"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LinesSource.fullSchema
  // writes arrive with the DataFrame's own schema (usually just `line`)
  // — accept it instead of demanding the 3-column read schema, whose
  // path/offset columns are derived on read and never stored
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LinesTable(properties.get("path"), schema)
}

object LinesSource {
  val fullSchema: StructType = new StructType()
    .add("path", StringType, nullable = false)
    .add("offset", LongType, nullable = false)
    .add("line", StringType, nullable = false)
  /** Scan output when an ungrouped COUNT(*) is pushed down: one long
    * per partition (Spark sums the partials).
    */
  val countSchema: StructType = new StructType()
    .add("count(*)", LongType, nullable = false)
}

final class LinesTable(path: String, declared: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-lines requires a path: spark.read.format(\"graft-lines\").load(dir)")
  // no backticks: the V2 WRITE path parses this as a multipart
  // identifier and rejects stray backtick characters
  override def name(): String = s"graft_lines_$path"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // read options HERE: this map is case-insensitive, while getTable's
    // raw properties map is not (the chunkBytes lookup silently missed
    // there and fell back to one 4 MiB chunk)
    new LinesScanBuilder(path, options.getLong("chunkBytes", 4L * 1024 * 1024))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new LinesWriteBuilder(path, info.schema())
}

final class LinesScanBuilder(path: String, chunkBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var required: StructType = LinesSource.fullSchema
  private var lo = 0L              // accepted offset interval, inclusive
  private var hi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty
  private var countPushed = false

  /** AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): an ungrouped
    * COUNT(*) collapses each byte-range chunk to ONE long counted
    * without materializing path/offset/line values — no UTF8String per
    * row, no per-line allocation, and only per-partition counts cross
    * the scan boundary (Spark's planner rewrites the final COUNT into a
    * SUM of the pushed partials — `supportCompletePushDown` stays
    * false, so multi-partition merging is the engine's job, as it must
    * be). Composes with the pushed offset interval: the count honors
    * [lo, hi] exactly like the row path.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("offset", _: Long) | GreaterThanOrEqual("offset", _: Long) |
           LessThan("offset", _: Long) | LessThanOrEqual("offset", _: Long) |
           EqualTo("offset", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("offset", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("offset", v: Long) => lo = math.max(lo, v)
      case LessThan("offset", v: Long)           => hi = math.min(hi, v - 1)
      case LessThanOrEqual("offset", v: Long)    => hi = math.min(hi, v)
      case EqualTo("offset", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ =>
    }
    accepted = ours
    rest // everything else stays Spark's responsibility
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new LinesScan(path, chunkBytes,
      if (countPushed) LinesSource.countSchema else required,
      lo, hi, countPushed)
}

/** One byte range (start, end] of one file; owns lines whose first byte
  * falls inside it (plus byte 0 when start == 0).
  */
final case class LinesPartition(file: String, start: Long, end: Long) extends InputPartition

final class LinesScan(path: String, chunkBytes: Long, required: StructType,
                      lo: Long, hi: Long, countMode: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering {
  // RUNTIME FILTERING (`SupportsRuntimeFiltering`): when this scan is
  // the probe side of a broadcast join on `offset` (the secondary-index
  // lookup shape: a small filtered index table of offsets joining back
  // into the raw shards), Spark's dynamic-pruning rule delivers the
  // build side's actual offset values here BEFORE partitions are
  // planned. The scan tightens its owned interval to [min, max] of the
  // delivered set and chunk pruning does the rest — a best-effort
  // PARTITION-granularity optimization: readers keep the planning-time
  // [lo, hi] semantics and the join itself stays responsible for exact
  // row membership, so an ignored or partial runtime filter can never
  // change results, only costs.
  private var rLo: Long = lo
  private var rHi: Long = hi
  // Advertise `offset` only while the pruned read schema still carries
  // it: Spark's PartitionPruning rule resolves filterAttributes against
  // the scan relation's OUTPUT, so advertising a pruned-away column
  // makes resolveRefs throw at planning time for any join whose key
  // lineage reaches this scan (e.g. a query projecting only `line`
  // joined on a line-derived key).
  override def filterAttributes(): Array[NamedReference] =
    if (!countMode && required.fieldNames.contains("offset"))
      Array(Expressions.column("offset"))
    else Array.empty
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("offset", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
      val longs = vs.map(_.asInstanceOf[Long])
      rLo = math.max(rLo, longs.min)
      rHi = math.min(rHi, longs.max)
    case EqualTo("offset", v: Long) =>
      rLo = math.max(rLo, v); rHi = math.min(rHi, v)
    case _ => () // unsupported shapes are legitimately ignorable
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-lines path=$path chunkBytes=$chunkBytes offsetRange=[$lo, " +
      (if (hi == Long.MaxValue) "inf" else hi.toString) +
      s"] columns=${required.fieldNames.mkString(",")}" +
      (if (countMode) " pushedAggregate=COUNT(*)" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && {
          val n = s.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
        }).sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    val parts = ArrayBuffer.empty[InputPartition]
    files.foreach { st =>
      val size = st.getLen
      var s = 0L
      while (s < size) {
        val e = math.min(s + chunkBytes, size)
        // chunk (s, e] owns offsets in [max(s+1, s==0 ? 0 : s+1), e] —
        // prune it when the pushed OR runtime-filtered interval can't
        // intersect (rLo/rHi == lo/hi unless a runtime filter arrived)
        val minOwned = if (s == 0) 0L else s + 1
        if (e >= rLo && minOwned <= rHi) {
          parts += LinesPartition(st.getPath.toString, s, e)
        }
        s = e
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the DRIVER's Hadoop conf (S3 credentials, custom FS
    // options) at plan time and ship it to executors — a bare
    // `new Configuration()` in the reader would silently drop every
    // per-session fs.* setting and diverge from planInputPartitions
    new LinesReaderFactory(required.fieldNames, lo, hi,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration), countMode)
}

/** Java-serializable carrier for a Hadoop Configuration (which is
  * Writable but not Serializable) — same shape as Spark's internal
  * SerializableConfiguration, reimplemented here because that class is
  * `private[spark]` at the source level.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final class LinesReaderFactory(cols: Array[String], lo: Long, hi: Long,
                               conf: SerializableHadoopConf,
                               countMode: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LinesPartition]
    if (countMode) new LinesCountReader(p, lo, hi, conf.value)
    else new LinesPartitionReader(p, cols, lo, hi, conf.value)
  }
}

/** Pushed-COUNT(*) reader: one pass over the chunk counting qualifying
  * line starts — terminators are scanned byte-by-byte like the row
  * reader (ownership rules identical), but no path/offset/line value is
  * ever materialized. Emits exactly one row: the partial count Spark's
  * rewritten final aggregate sums.
  */
final class LinesCountReader(part: LinesPartition, lo: Long, hi: Long,
                             hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {
  private val hPath = new Path(part.file)
  private val in = {
    val stream = hPath.getFileSystem(hadoopConf).open(hPath)
    stream.seek(part.start)
    new java.io.BufferedInputStream(stream, 1 << 16)
  }
  private var pos = part.start
  private var emitted = false
  private var row: InternalRow = _

  // same ownership rule as the row reader: a partial first line belongs
  // to the previous chunk
  if (part.start != 0) skipLine()

  /** Advances past one line (terminator consumed); false at EOF. */
  private def skipLine(): Boolean = {
    var b = in.read()
    if (b < 0) return false
    while (b >= 0 && b != '\n') { pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    true
  }

  override def next(): Boolean = {
    if (emitted) return false
    var n = 0L
    var done = false
    while (!done) {
      val lineStart = pos
      if (lineStart > part.end || lineStart > hi) done = true
      else if (!skipLine()) done = true
      else if (lineStart >= lo) n += 1
    }
    row = new GenericInternalRow(Array[Any](java.lang.Long.valueOf(n)))
    emitted = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

final class LinesPartitionReader(part: LinesPartition, cols: Array[String],
                                 lo: Long, hi: Long, hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {
  private val hPath = new Path(part.file)
  private val in = {
    val stream = hPath.getFileSystem(hadoopConf).open(hPath)
    stream.seek(part.start)
    new java.io.BufferedInputStream(stream, 1 << 16)
  }
  private var pos = part.start
  private val pathUtf8 = UTF8String.fromString(part.file)
  private var row: InternalRow = _

  // discard the partial first line: it belongs to the previous chunk
  // (which reads through its end), except at the very start of the file
  if (part.start != 0) readLineBytes()

  /** Reads one line (terminator consumed, not returned); null at EOF. */
  private def readLineBytes(): Array[Byte] = {
    var b = in.read()
    if (b < 0) return null
    val buf = new java.io.ByteArrayOutputStream(256)
    while (b >= 0 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    buf.toByteArray
  }

  // column dispatch decided once, not string-matched per row
  private val colCodes: Array[Int] = cols.map {
    case "path" => 0
    case "offset" => 1
    case "line" => 2
  }

  override def next(): Boolean = {
    while (true) {
      val lineStart = pos
      if (lineStart > part.end) return false       // next chunk's territory
      if (lineStart > hi) return false             // past the pushed range: done
      val bytes = readLineBytes()
      if (bytes == null) return false              // EOF
      if (lineStart >= lo) {                       // pushed offset interval
        val vals = new Array[Any](colCodes.length)
        var i = 0
        while (i < colCodes.length) {
          vals(i) = colCodes(i) match {
            case 0 => pathUtf8
            case 1 => java.lang.Long.valueOf(lineStart)
            case 2 => UTF8String.fromBytes(bytes)
          }
          i += 1
        }
        row = new GenericInternalRow(vals)
        return true
      }
      // else: line below the pushed lower bound — keep scanning (cheap:
      // the chunk itself was already pruned unless it straddles lo)
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Write half of `graft-lines` — the standard DSv2 two-phase commit:
  * every task streams its rows to an `_tmp-`-prefixed file in the
  * target directory (the reader ignores `_`/`.` names, so an in-flight
  * or crashed write is invisible), task commit hands the temp path to
  * the driver, and JOB commit renames the winners to their final
  * `part-NNNNN-<jobToken>.txt` names — speculative duplicates and dead
  * tasks never surface because only driver-acknowledged messages
  * rename. The job token (one random 8-hex suffix per job) makes final
  * names JOB-UNIQUE: `mode("append")` into a non-empty directory can
  * never collide on rename, so commit stays all-or-nothing instead of
  * failing halfway with new+old files mixed. `mode("overwrite")`
  * arrives as SupportsTruncate; the old part files are deleted inside
  * job commit, immediately before the renames, so a failed job never
  * leaves the directory half-truncated.
  *
  * Input schema must carry a `line` STRING column (extra columns are
  * ignored); rows are written as raw UTF-8 bytes + '\n', the exact
  * inverse of the reader's framing.
  */
final class LinesWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new LinesWrite(path, schema, doTruncate)
}

final class LinesWrite(path: String, schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write {
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new LinesBatchWrite(path, schema.fieldIndex("line"), truncate,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))
}

final case class LinesCommitMessage(tempPath: String, finalName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class LinesBatchWrite(path: String, lineIdx: Int, truncate: Boolean,
                            conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  // one token per job → job-unique final names → append never collides
  private val jobToken =
    java.util.UUID.randomUUID.toString.replace("-", "").take(8)
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new LinesWriterFactory(path, lineIdx, jobToken, conf)
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(conf.value)
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    if (truncate) {
      val olds = fs.globStatus(new Path(dirPath, "part-*.txt"))
      if (olds != null) olds.foreach(s => fs.delete(s.getPath, false))
    }
    messages.foreach { case LinesCommitMessage(tmp, fin) =>
      val dest = new Path(dirPath, fin)
      if (!fs.rename(new Path(tmp), dest))
        throw new java.io.IOException(
          s"graft-lines job commit: rename $tmp -> $dest failed")
    }
  }
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case LinesCommitMessage(tmp, _) => fs.delete(new Path(tmp), false); ()
      case _ => ()
    }
  }
}

final class LinesWriterFactory(dir: String, lineIdx: Int, jobToken: String,
                               conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new LinesDataWriter(dir, lineIdx, partitionId, taskId, jobToken, conf)
}

final class LinesDataWriter(dir: String, lineIdx: Int, partitionId: Int,
                            taskId: Long, jobToken: String,
                            conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmpPath = new Path(dir, s"_tmp-part-$partitionId-$taskId.txt")
  private val fs = tmpPath.getFileSystem(conf.value)
  private val out = fs.create(tmpPath, true)
  override def write(row: InternalRow): Unit = {
    out.write(row.getUTF8String(lineIdx).getBytes)
    out.write('\n')
  }
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    LinesCommitMessage(tmpPath.toString, f"part-$partitionId%05d-$jobToken.txt")
  }
  override def abort(): Unit = { out.close(); fs.delete(tmpPath, false); () }
  override def close(): Unit = ()
}
