package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.array
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Data-layout kernels backing [[graft.operators.Layout]] — the
  * multi-dimensional clustering write (Z-order). The reference engine's
  * analog is its key-sorted SST layout (kv/lsm/builder.go — one-dimensional
  * clustering by key, pruned via per-table min/max metas); Z-order
  * generalizes the same footer-min/max skipping to predicates over SEVERAL
  * columns at once.
  *
  * Both kernels are codegen'd scalar expressions (no UDF): bucketing is a
  * binary search over a driver-fitted boundary array riding the expression
  * as a reference object, interleaving is a fixed bit loop — each stays
  * inside whole-stage codegen.
  */
object LayoutKernels {

  /** #boundaries <= v, by binary search — bucket index in [0, len]. */
  def boundaryBucket(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length // invariant: bounds[lo-1] <= v < bounds[hi]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** (x, y) -> d on the order-`bits` Hilbert curve over the
    * 2^bits x 2^bits grid — the classic iterative quadrant-rotation
    * form. Pure integer arithmetic (compare/add/xor/shift only), so the
    * key is exactly replayable in any engine — the q_hilbert_key oracle
    * unrolls these same `bits` rounds in plain SQL.
    */
  def hilbertD2(buckets: ArrayData, bits: Int): Long = {
    var x = buckets.getInt(0).toLong
    var y = buckets.getInt(1).toLong
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Interleave the low `bits` bits of each bucket: bit i of dimension c
    * lands at z-bit `i * n + c` — Morton order over n dimensions.
    */
  def interleave(buckets: ArrayData, bits: Int): Long = {
    val n = buckets.numElements()
    var z = 0L
    var i = 0
    while (i < bits) {
      var c = 0
      while (c < n) {
        z |= ((buckets.getInt(c) >> i) & 1L) << (i * n + c)
        c += 1
      }
      i += 1
    }
    z
  }
}

/** `BoundaryBucket(v, boundaries)`: which quantile bucket `v` falls in —
  * the count of fitted boundaries <= v (output range [0, len]). Boundaries
  * are at most 2^bits - 1 doubles fitted on the driver from
  * `approxQuantile`; per-row cost is a log2(len) binary search.
  */
case class BoundaryBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "boundary_bucket: boundaries must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"boundary_bucket expects double, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LayoutKernels.boundaryBucket(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = LayoutKernels.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("bounds", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $util.boundaryBucket($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BoundaryBucket =
    copy(child = newChild)
}

/** `InterleaveBits(array(b0, b1, ...), bits)`: the Morton (Z-order) key —
  * the low `bits` bits of each input bucket interleaved round-robin into
  * one long. Rows close in EVERY dimension get close z-values, so a range
  * sort on the key co-locates them into the same files and row groups.
  * Unary over an int array (built with the codegen'd native `array(...)`)
  * so the whole kernel is one `nullSafeCodeGen` call.
  */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0, "interleave_bits: bits must be positive")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects array<int>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LayoutKernels.interleave(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = LayoutKernels.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $util.interleave($arr, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
    copy(child = newChild)
}

/** `HilbertD2(array(xBucket, yBucket), bits)`: the 2-d Hilbert-curve key —
  * position of the cell on the order-`bits` space-filling curve. Unlike
  * the Morton key, CONSECUTIVE Hilbert positions are always
  * grid-adjacent (Manhattan distance 1 — the property LayoutSpec pins),
  * so a range sort on the key never splits a spatial neighborhood across
  * a curve discontinuity: per-file min/max spans on both dimensions stay
  * at least as tight as Z-order's at the same file count. Same codegen
  * shape as [[InterleaveBits]] — one fixed integer loop, no UDF.
  */
case class HilbertD2(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 31, "hilbert_key: bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hilbert_key expects array<int>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LayoutKernels.hilbertD2(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = LayoutKernels.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $util.hilbertD2($arr, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): HilbertD2 =
    copy(child = newChild)
}

object LayoutExpressions {

  def boundary_bucket(v: Column, boundaries: Array[Double]): Column =
    ColumnBridge.column(BoundaryBucket(ColumnBridge.expression(v), boundaries))

  def hilbert_key(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertD2(ColumnBridge.expression(array(x, y)), bits))

  def interleave_bits(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "interleave_bits: need at least one input")
    require(bits * buckets.size <= 63,
      s"interleave_bits: bits=$bits over ${buckets.size} dims exceeds a long")
    ColumnBridge.column(
      InterleaveBits(ColumnBridge.expression(array(buckets: _*)), bits))
  }
}
