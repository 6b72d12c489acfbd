package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Mutable accumulation buffer shared by the two vector aggregates:
  * exactly one of `l`/`d` is non-null once the first row arrives
  * (long mode / double mode, fixed by the child's element type). */
final class VecSumBuf(var l: Array[Long], var d: Array[Double]) {
  def initialized: Boolean = l != null || d != null
}

/** Shared plumbing for elementwise array aggregation as a native
  * `TypedImperativeAggregate` (SURVEY §7.3 preference order: the
  * built-in formulation — `posexplode` to (i, v) rows + groupBy(i) —
  * pays a d× row expansion, a per-element hash-aggregate probe, and a
  * d-key shuffle PER INPUT ROW's worth of elements; this pays one
  * `update` call per row that loops over the array in place, and the
  * shuffle carries ONE buffer per partition). Runs under
  * ObjectHashAggregateExec — not whole-stage codegen'd, but the
  * per-row work is a tight primitive loop with zero allocation, which
  * is the part that matters at corpus scale.
  *
  * Semantics shared by both concrete aggregates:
  *  - long mode is EXACT (overflow wraps like BIGINT sums everywhere
  *    else in the engine); double mode adds in partition order like
  *    every Spark double `sum` (callers pin results before comparison
  *    — the `roundCoord6`/`oracleRound` discipline).
  *  - NULL input rows are skipped (SQL aggregate convention); array
  *    ELEMENTS must be non-null (embedding vectors — the graft_dot
  *    contract; undefined otherwise).
  *  - zero input rows evaluate to NULL (like built-in `sum`).
  *  - the first row fixes the length; a later row with a different
  *    length throws a clear error rather than silently truncating.
  */
abstract class VecAggBase extends TypedImperativeAggregate[VecSumBuf]
    with UnaryLike[Expression] {

  protected def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  /** Buffer length for an input array of n elements. */
  protected def bufLen(n: Int): Int
  /** Accumulate one input array into the buffer (same length checked). */
  protected def addLong(buf: Array[Long], a: ArrayData): Unit
  protected def addDouble(buf: Array[Double], a: ArrayData): Unit

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or array<double>, got $t")
  }
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null, null)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val want = bufLen(a.numElements())
    if (!buf.initialized) {
      if (isLong) buf.l = new Array[Long](want)
      else buf.d = new Array[Double](want)
    }
    val have = if (isLong) buf.l.length else buf.d.length
    if (have != want)
      throw new IllegalArgumentException(
        s"$prettyName: ragged input — a row's array implies buffer " +
          s"length $want but an earlier row fixed it at $have; " +
          "vector columns must be fixed-dimension")
    if (isLong) addLong(buf.l, a) else addDouble(buf.d, a)
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    if (!other.initialized) return buf
    if (!buf.initialized) {
      buf.l = other.l; buf.d = other.d; return buf
    }
    if (isLong) {
      if (buf.l.length != other.l.length)
        throw new IllegalArgumentException(s"$prettyName: ragged merge")
      var i = 0
      while (i < buf.l.length) { buf.l(i) += other.l(i); i += 1 }
    } else {
      if (buf.d.length != other.d.length)
        throw new IllegalArgumentException(s"$prettyName: ragged merge")
      var i = 0
      while (i < buf.d.length) { buf.d(i) += other.d(i); i += 1 }
    }
    buf
  }

  override def eval(buf: VecSumBuf): Any = {
    if (!buf.initialized) return null
    if (isLong) new GenericArrayData(buf.l.map(x => x: Any))
    else new GenericArrayData(buf.d.map(x => x: Any))
  }

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    if (!buf.initialized) return Array[Byte](0)
    val n = if (isLong) buf.l.length else buf.d.length
    val bb = ByteBuffer.allocate(1 + 4 + 8 * n)
    bb.put(if (isLong) 1.toByte else 2.toByte)
    bb.putInt(n)
    if (isLong) buf.l.foreach(bb.putLong) else buf.d.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    bb.get() match {
      case 0 => new VecSumBuf(null, null)
      case 1 =>
        val n = bb.getInt
        new VecSumBuf(Array.fill(n)(bb.getLong), null)
      case _ =>
        val n = bb.getInt
        new VecSumBuf(null, Array.fill(n)(bb.getDouble))
    }
  }
}

/** `graft_vec_sum(arr)` — elementwise sum of an `array<bigint>` /
  * `array<double>` column: out[i] = Σ rows arr[i]. The native form of
  * "posexplode + groupBy(dim) + sum + re-collect": one aggregation
  * buffer instead of a d-fold row expansion. */
case class VecSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends VecAggBase {

  override def prettyName: String = "graft_vec_sum"
  override protected def bufLen(n: Int): Int = n

  override protected def addLong(buf: Array[Long], a: ArrayData): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) += a.getLong(i); i += 1 }
  }
  override protected def addDouble(buf: Array[Double], a: ArrayData): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) += a.getDouble(i); i += 1 }
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

/** `graft_vec_outer_sum(arr)` — sum of each row's flattened outer
  * product: out[i·d + j] = Σ rows arr[i]·arr[j], the one-pass
  * covariance-numerator kernel (Spectral PCA, Gram matrices). The
  * built-in formulation materializes a d² nested-transform array per
  * row and explodes it into d² (i, j, p) rows; this multiplies in
  * place — no per-row allocation, no d²-fold row expansion, no d²-key
  * hash aggregate. d is capped so the d² buffer stays
  * collect-safe (the ANN-fit bounded-tensor contract). */
case class VecOuterSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends VecAggBase {

  override def prettyName: String = "graft_vec_outer_sum"
  override protected def bufLen(n: Int): Int = {
    if (n > VecOuterSumAgg.MaxDim)
      throw new IllegalArgumentException(
        s"graft_vec_outer_sum: dimension $n above the " +
          s"${VecOuterSumAgg.MaxDim} cap — the d² buffer must stay " +
          "driver-collectable; project to a lower dimension first")
    n * n
  }

  override protected def addLong(buf: Array[Long], a: ArrayData): Unit = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val base = i * n
      var j = 0
      while (j < n) { buf(base + j) += x * a.getLong(j); j += 1 }
      i += 1
    }
  }
  override protected def addDouble(buf: Array[Double], a: ArrayData): Unit = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val base = i * n
      var j = 0
      while (j < n) { buf(base + j) += x * a.getDouble(j); j += 1 }
      i += 1
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VecOuterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecOuterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VecOuterSumAgg =
    copy(child = newChild)
}

object VecOuterSumAgg {
  /** 1024² longs = 8 MiB per buffer — comfortably collect-safe, far
    * above any embedding dimension in the engine (64). */
  val MaxDim = 1024
}
