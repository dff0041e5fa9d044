package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most `k` entries, kept sorted best-first by
  * (score DESC, tiebreak ASC). `offer` is O(1) for rows that don't beat
  * the current k-th entry — the overwhelmingly common case when a
  * partition streams through — and O(k) shift for the rare accepted row.
  * Payload rows are only materialized (projected + copied) on accept,
  * so rejected candidates cost two primitive comparisons and nothing
  * else.
  */
private[functions] final class TopKHeap(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ties = new Array[Long](k)
  val rows = new Array[UnsafeRow](k)

  /** (s, t) ranks strictly better than entry i — descending score with
    * an ascending unique tiebreak, i.e. exactly ORDER BY score DESC,
    * tiebreak ASC. Double.compare gives a total order (NaN sorts last
    * here because compare(NaN, x) > 0 puts NaN FIRST under descending —
    * callers never produce NaN scores; nulls are skipped upstream). */
  @inline private def better(s: Double, t: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && t < ties(i))
  }

  def offer(s0: Double, t: Long, mkRow: () => UnsafeRow): Unit = {
    // +0.0 normalizes -0.0 (IEEE: -0.0 + 0.0 = +0.0) so Double.compare
    // can't order -0.0 < 0.0 where Spark's sort treats them equal and
    // falls to the tiebreak
    val s = s0 + 0.0
    if (n == k && !better(s, t, k - 1)) return // doesn't beat the worst kept
    if (n < k) n += 1
    var i = n - 1 // last slot: either empty or holds the entry that drops
    while (i > 0 && better(s, t, i - 1)) {
      scores(i) = scores(i - 1); ties(i) = ties(i - 1); rows(i) = rows(i - 1)
      i -= 1
    }
    scores(i) = s; ties(i) = t; rows(i) = mkRow()
  }
}

/** graft_topk(score DOUBLE, tiebreak BIGINT, payload STRUCT, k INT) →
  * ARRAY<STRUCT> of the k payloads with the highest (score, -tiebreak),
  * in rank order (element i is rank i+1).
  *
  * This is per-group top-k AS AN AGGREGATE, replacing the two-level
  * `row_number()` window split for per-query ranking: a
  * TypedImperativeAggregate gets map-side PARTIAL aggregation from
  * `ObjectHashAggregateExec`, so each input partition reduces to ≤ k
  * rows per group before the shuffle — zero extra exchange, zero sort,
  * one shuffle of ≤ k × partitions payloads keyed by the group. The
  * window spelling costs an exchange + full sort of the scored set
  * BEFORE discarding all but k rows per (group, partition); this
  * discards first. Exact, not approximate: ordering is total when the
  * tiebreak is unique, so the merged top-k equals the global top-k —
  * same rows, same ranks, same oracle SQL as the window spelling.
  *
  * Null handling: rows with a null score or null tiebreak are SKIPPED,
  * whereas the `row_number()` window spelling (NULLS LAST under DESC)
  * would still rank them when a group has fewer than k non-null rows —
  * the window-equivalence claim holds only for non-null scores and
  * tiebreaks (every current caller filters nulls upstream, e.g. the
  * `nrm > 0` guard).
  */
case class TopKStruct(
    score: Expression,
    tiebreak: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  // Analyzer-time validation: reject wrong argument types / a
  // non-literal k with a clear message instead of an opaque
  // ClassCastException (or a silent eval-on-null) inside update().
  // (ExpectsInputTypes would also coerce, but its AbstractDataType
  // vocabulary is private[sql] — explicit checks are the public API.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (tiebreak.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk tiebreak must be BIGINT, got ${tiebreak.dataType.sql}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk payload must be a struct, got ${payload.dataType.sql}")
    else if (!kExpr.foldable ||
      !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_topk k must be an integer literal")
    else if (kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk k must be a positive literal, got ${kExpr.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_topk k must be positive, got $v")
    v
  }
  private lazy val payloadType: StructType =
    payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(payloadType)

  override def children: Seq[Expression] =
    Seq(score, tiebreak, payload, kExpr)
  override def dataType: DataType =
    ArrayType(payloadType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    if (s != null && t != null) {
      b.offer(s.asInstanceOf[Double], t.asInstanceOf[Long],
        () => toUnsafe(payload.eval(input).asInstanceOf[InternalRow]).copy())
    }
    b
  }

  override def merge(b: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) {
      val r = other.rows(i) // already an owned copy — no re-copy needed
      b.offer(other.scores(i), other.ties(i), () => r)
      i += 1
    }
    b
  }

  override def eval(b: TopKHeap): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.rows(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.n)
    var i = 0
    while (i < b.n) {
      out.writeDouble(b.scores(i))
      out.writeLong(b.ties(i))
      val bytes = b.rows(i).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      b.scores(i) = in.readDouble()
      b.ties(i) = in.readLong()
      val arr = new Array[Byte](in.readInt())
      in.readFully(arr)
      val row = new UnsafeRow(payloadType.length)
      row.pointTo(arr, arr.length)
      b.rows(i) = row
      i += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStruct =
    copy(score = newChildren(0), tiebreak = newChildren(1),
      payload = newChildren(2), kExpr = newChildren(3))
  override def prettyName: String = "graft_topk"
}
