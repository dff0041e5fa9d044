package graft.streaming

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A durable message queue on shared storage, mirroring the reference's
  * Redis-Streams buffer semantics (redis_client.py:50 XADD producer,
  * :111 XRANGE consumer, :193 XDEL trim): the producer and the Spark
  * job live in SEPARATE crash domains — either side can die and restart
  * without losing or duplicating messages — which the raw socket source
  * cannot offer (its offsets die with the connection).
  *
  * Layout: one directory, immutable segment files `seg-NNNNNNNN` of
  * NDJSON lines. [[QueueLog.append]] (the XADD twin) writes a temp file
  * and ATOMICALLY renames it to the next segment id, so a consumer
  * listing the directory either sees a whole segment or nothing — no
  * torn reads, no locks, works on any rename-atomic store (POSIX, HDFS;
  * object stores use PUT-if-absent). Offsets are (segment, line) pairs:
  * totally ordered, valid across process restarts because segments are
  * immutable and listed in name order — so a restarted query resumes
  * from its CHECKPOINTED offset exactly (consume-commit), and an
  * exactly-once sink (parquet/Delta) yields end-to-end exactly-once.
  * [[QueueLog.trim]] (the XDEL twin) is retention, not correctness:
  * drop whole segments below the committed offset once every consumer
  * has passed them.
  *
  * Scale notes: the stream is driver-LIGHT — latestOffset is one
  * directory listing; segment CONTENT is read by executors (one input
  * partition per segment), so ingest bandwidth scales with the cluster,
  * not the driver (unlike socket feeds, where the driver buffers every
  * line). A single writer owns segment-id allocation (the reference has
  * exactly one producer process per stream); shard across directories
  * for multi-producer fan-in.
  */
object QueueLog {

  private val SegPattern = "seg-(\\d{8})".r

  private def segPath(dir: Path, id: Long): Path =
    dir.resolve(f"seg-$id%08d")

  /** Sorted (id, path) of the segments currently in `dir`. */
  def segments(dir: String): Seq[(Long, Path)] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d) // close: called per micro-batch — a
    try {                      //   leaked fd per trigger exhausts ulimit
      stream.iterator().asScala
        .flatMap { p =>
          p.getFileName.toString match {
            case SegPattern(n) => Some(n.toLong -> p)
            case _ => None
          }
        }
        .toSeq.sortBy(_._1)
    } finally stream.close()
  }

  /** Producer (XADD twin): durably append one segment of lines; returns
    * the segment id. Atomic rename = readers never observe a partial
    * segment; fsync-before-rename = the segment survives a producer
    * crash the instant append returns. */
  def append(dir: String, lines: Seq[String]): Long = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val id = segments(dir).lastOption.map(_._1 + 1).getOrElse(0L)
    val tmp = Files.createTempFile(d, ".tmp-seg", "")
    val ch = Files.newByteChannel(tmp, java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        lines.mkString("", "\n", "\n").getBytes(UTF_8)))
      ch.asInstanceOf[java.nio.channels.FileChannel].force(true)
    } finally ch.close()
    try {
      Files.move(tmp, segPath(d, id), StandardCopyOption.ATOMIC_MOVE)
      id
    } catch {
      case e: IOException =>
        Files.deleteIfExists(tmp)
        throw new IOException(
          s"queue append lost the segment-id race for seg $id " +
            "(one writer per queue directory owns id allocation)", e)
    }
  }

  /** Retention (XDEL twin): delete whole segments strictly below the
    * given committed offset — but ALWAYS retain the newest segment,
    * even when fully consumed. The highest surviving file is the
    * segment-id high-water mark (append allocates max+1): deleting it
    * after a full drain would restart ids at 0, invisible below any
    * checkpointed offset — silent, permanent delivery stall. Same
    * reason a Kafka log never deletes its active segment. */
  def trim(dir: String, upTo: QueueOffset): Unit =
    segments(dir).dropRight(1)
      .takeWhile(_._1 < upTo.seg).foreach(s => Files.delete(s._2))

  def readLines(p: Path): Array[String] =
    new String(Files.readAllBytes(p), UTF_8)
      .split("\n", -1).filter(_.nonEmpty)
}

/** (segment, lines-consumed-within-segment); `seg` may point one past
  * the last existing segment with line = 0 (fully drained). */
case class QueueOffset(seg: Long, line: Long) extends Offset {
  override def json(): String = s"""{"seg":$seg,"line":$line}"""
}

object QueueOffset {
  private val P = """\{"seg":(\d+),"line":(\d+)\}""".r
  def parse(json: String): QueueOffset = json match {
    case P(s, l) => QueueOffset(s.toLong, l.toLong)
    case other => throw new IllegalArgumentException(
      s"not a queue offset: $other")
  }
}

/** `format("graft-queue")` provider. Options: `path` (the queue
  * directory), `maxSegmentsPerTrigger` (optional batch bound). Single
  * `value` column, schema-identical to the file-replay and socket
  * paths, so [[StreamPipeline.decode]] serves all three. */
class QueueLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireSocket.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QueueLogTable(new CaseInsensitiveStringMap(properties))
}

private[streaming] class QueueLogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-queue(${options.get("path")})"
  override def schema(): StructType = WireSocket.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WireSocket.schema
        override def toMicroBatchStream(ckpt: String): MicroBatchStream =
          new QueueLogStream(options.get("path"),
            options.getLong("maxSegmentsPerTrigger", Long.MaxValue))
      }
    }
}

/** Driver side holds only OFFSETS (directory listing); executors read
  * segment content. Admission control (`maxSegmentsPerTrigger`) bounds
  * each batch at the OFFSET level — never by dropping planned
  * partitions, which would silently lose the unserved remainder. */
private[streaming] class QueueLogStream(dir: String, maxSegs: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Exclusive end segment captured when `Trigger.AvailableNow` starts.
    * Without this trait Spark freezes the run's end at the FIRST
    * `latestOffset` answer — which `maxSegmentsPerTrigger` caps, so an
    * AvailableNow backfill would drain exactly one capped batch and
    * stop (round-12 st15 bug). With it, the run drains cap-bounded
    * batches UP TO the log's true end at start, then terminates —
    * bounded batches and run-to-completion, both. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd =
      Some(QueueLog.segments(dir).lastOption.map(_._1 + 1).getOrElse(0L))

  /** A fresh consumer starts at the earliest RETAINED segment (Redis
    * XRANGE semantics on a trimmed stream), not at id 0. */
  override def initialOffset(): Offset =
    QueueOffset(QueueLog.segments(dir).headOption.map(_._1).getOrElse(0L), 0L)
  override def deserializeOffset(json: String): Offset =
    QueueOffset.parse(json)

  // clamp before toInt: a maxSegmentsPerTrigger in (Int.MaxValue, ∞)
  // must mean "unbounded", not a negative ReadLimit via truncation
  private val maxSegsInt: Int =
    math.min(maxSegs, Int.MaxValue.toLong).toInt

  override def getDefaultReadLimit: ReadLimit =
    if (maxSegsInt == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxSegsInt)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[QueueOffset]
    // honor whatever limit Spark passes (it may compose/override the
    // default, e.g. under Trigger.AvailableNow), tightened by our own
    // configured bound
    val cap = limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(maxSegsInt, mf.maxFiles())
      case _ => maxSegsInt
    }
    val pending = QueueLog.segments(dir).filter(_._1 >= s.seg)
      .filter(seg => availableNowEnd.forall(seg._1 < _))
    val capped = if (cap == Int.MaxValue) pending else pending.take(cap)
    capped.lastOption.map { case (last, _) => QueueOffset(last + 1, 0L) }
      .getOrElse(s)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-queue uses SupportsAdmissionControl.latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[QueueOffset]
    val e = end.asInstanceOf[QueueOffset]
    val segs = QueueLog.segments(dir)
      .filter { case (id, _) => id >= s.seg && id < e.seg }
    // the range [s.seg, e.seg) was observed to exist when `end` was
    // planned; every id must still be present — a hole means retention
    // ran PAST a checkpointed offset (operator error), and silently
    // serving what's left would be a lost-data restart
    val expected = s.seg until e.seg
    if (segs.map(_._1) != expected)
      throw new IllegalStateException(
        s"queue segments ${expected.mkString("[", ",", ")")} needed for " +
          s"offsets ${s.json()}..${e.json()} but only " +
          s"${segs.map(_._1).mkString("[", ",", "]")} exist — trimmed " +
          "past the checkpoint (lost-data restart)")
    segs.map { case (id, p) =>
      QueueSegmentPartition(p.toString,
        if (id == s.seg) s.line else 0L): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    QueueSegmentReaderFactory

  override def commit(end: Offset): Unit = () // retention is explicit trim()
  override def stop(): Unit = ()
}

private[streaming] case class QueueSegmentPartition(path: String,
    skipLines: Long) extends InputPartition

/** Streams a segment line by line — a segment is bounded by the
  * producer's append batch, but the reader must not ASSUME that: memory
  * stays O(1) per task whatever the writer did, and `skipLines` is
  * honored as a Long (no 2^31 truncation). Skip counts NON-EMPTY lines,
  * matching [[QueueLog.readLines]]'s view of segment content. */
private[streaming] object QueueSegmentReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QueueSegmentPartition]
    require(p.skipLines >= 0,
      s"negative skipLines ${p.skipLines} for segment ${p.path}")
    val reader = Files.newBufferedReader(Paths.get(p.path), UTF_8)
    new PartitionReader[InternalRow] {
      private var skipped = 0L
      private var line: String = _
      private def nextNonEmpty(): String = {
        var l = reader.readLine()
        while (l != null && l.isEmpty) l = reader.readLine()
        l
      }
      override def next(): Boolean = {
        while (skipped < p.skipLines && nextNonEmpty() != null) skipped += 1
        line = nextNonEmpty()
        line != null
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line))
      override def close(): Unit = reader.close()
    }
  }
}
