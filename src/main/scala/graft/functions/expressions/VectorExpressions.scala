package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `hyperplane_bucket(vec, bits)`: random-hyperplane LSH bucket for a float
  * or double vector — `bits` sign bits of dot products with deterministic
  * pseudo-random +-1 hyperplanes (component (b, d) drawn from
  * XXH64(b * 10007 + d, seed 42), bit-compatible with Spark's `xxhash64`).
  *
  * Why a native expression: the Column-composition form built a dim x bits
  * tree of `element_at` + CASE terms — 512 nodes at dim 64 and ~12k at the
  * production embedding dims (768-1536), which blows past JVM method/codegen
  * limits and silently falls back to interpreted per-row eval. This
  * expression is one static call at any dimension; the hot loop is tight
  * JVM code and the vector is read once. Dimension is taken from the array
  * itself, so one expression serves every embedding width.
  */
case class HyperplaneBucket(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, "hyperplane_bucket: bits must be in [1, 63]")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_bucket expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = HyperplaneBucket.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.compute($arr, $bits, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Shared by interpreted eval and generated code (the static-call shape
    * keeps whole-stage codegen tiny regardless of dimension).
    */
  def compute(arr: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val dim = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        val h = XXH64.hashLong(b.toLong * 10007L + d, 42L)
        dot += (if ((h & 1L) == 1L) v else -v)
        d += 1
      }
      if (dot > 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: LSH bucket id (long) from `bits` hyperplane sign bits. */
  def hyperplane_bucket(vec: Column, bits: Int): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec), bits))
}
