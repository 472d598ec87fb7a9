package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch — a DETERMINISTIC KLL-style compactor stack
  * (Karnin, Lang & Liberty, FOCS 2016; the deterministic pairwise
  * variant goes back to Manku-Rajagopalan-Lindsay, SIGMOD 1998) that
  * CARRIES ITS OWN worst-case rank-error bound, the streaming twin the
  * profiler's percentile family lacked: heavy hitters (Misra-Gries) and
  * distinct counts (HLL) have mergeable state; exact quantiles
  * ([[graft.operators.Rank.quantilesDisc]]) are a 3-pass batch
  * computation no stream can incrementalize.
  *
  * Structure: level `h` holds items of weight `2^h`. Updates append to
  * level 0; a level reaching capacity `k` sorts, promotes every SECOND
  * item (doubling its weight) to level `h+1`, and keeps one leftover
  * when the count is odd — so TOTAL WEIGHT ALWAYS EQUALS `n` exactly
  * (surfaced and gated as `n`; a weight-leaking sketch would silently
  * shift every rank). Merge concatenates levels and re-compacts.
  *
  * The error accounting is the point. One compaction at level `h`
  * changes the estimated rank of ANY threshold by at most `2^h`
  * (sorted x1<=...<=xm, weight w, j of them <= t: the promoted evens
  * contribute `2w*floor(j/2)`, off from `w*j` by exactly `w*(j mod 2)`).
  * The sketch sums that per compaction into `errBound`, so the bound it
  * reports is not a probabilistic estimate but an exact worst-case
  * accumulator valid under ANY partitioning / merge order — which is
  * what lets the Catalog gate assert ZERO violations deterministically
  * (the bound's VALUE varies with merge order; its VALIDITY never does).
  * A quantile answer's true rank additionally sits anywhere inside the
  * answering item's weight span, so the reported `bound` is
  * `errBound + 2^maxLevel`.
  *
  * Sizing: errBound grows ~ (2n/k) * log2(2n/k) (each level contributes
  * ~n/(k/2) rank error before cascading); memory is k * log2(2n/k)
  * doubles per group. k=256 at n=150k gives bound/n under ~2%; pick k
  * for the rank-error target, not the data size — that is the 100 TB
  * contract (state is O(k log n), never O(n) like Spark's exact
  * `percentile` buffer).
  *
  * Scale shape: a TypedImperativeAggregate gets map-side partial
  * aggregation — each input partition reduces to one O(k log n) summary
  * BEFORE the shuffle, the [[MisraGries]] pattern.
  */
final class KLLBuffer(val k: Int) {
  require(k >= 8, "quantile_sketch: k must be >= 8")
  val levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Double])
  var n: Long = 0L
  var errBound: Long = 0L

  def update(v: Double): Unit = {
    n += 1
    levels(0) += v
    if (levels(0).size >= k) compact(0)
  }

  private def compact(h: Int): Unit = {
    val buf = levels(h)
    if (buf.size < 2) return
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    if (levels.size == h + 1)
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    val up = levels(h + 1)
    val m = sorted.length & ~1 // even prefix: promoted weight is exact
    var i = 1
    while (i < m) { up += sorted(i); i += 2 }
    buf.clear()
    if (m < sorted.length) buf += sorted(sorted.length - 1) // odd leftover
    errBound += (1L << h)
    if (up.size >= k) compact(h + 1)
  }

  def combine(other: KLLBuffer): Unit = {
    n += other.n
    errBound += other.errBound
    var h = 0
    while (h < other.levels.size) {
      if (levels.size == h)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      levels(h) ++= other.levels(h)
      h += 1
    }
    h = 0
    while (h < levels.size) { // cascade any over-full level
      if (levels(h).size >= k) compact(h)
      h += 1
    }
  }

  def totalWeight: Long = {
    var w = 0L
    var h = 0
    while (h < levels.size) { w += levels(h).size.toLong << h; h += 1 }
    w
  }

  /** bound = errBound + max item weight (the answer's true rank can sit
    * anywhere in the answering item's weight span). */
  def bound: Long = errBound + (1L << (levels.size - 1))

  /** For each prob: the retained value whose cumulative weight first
    * reaches `max(1, ceil(p*n))` — the quantile_disc selection rule on
    * the weighted summary. */
  def quantiles(probs: Seq[Double]): Seq[Double] = {
    val items = new scala.collection.mutable.ArrayBuffer[(Double, Long)]
    var h = 0
    while (h < levels.size) {
      levels(h).foreach(v => items += ((v, 1L << h)))
      h += 1
    }
    val sorted = items.sortBy(_._1).toArray
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var i = 0
      var ans = sorted.last._1
      var found = false
      while (!found && i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= target) { ans = sorted(i)._1; found = true }
        i += 1
      }
      ans
    }
  }
}

case class QuantileSketch(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KLLBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "quantile_sketch: probs must be in [0, 1]")
  require(k >= 8, "quantile_sketch: k must be >= 8")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("bound", LongType, nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true // empty input -> NULL (SQL quantiles)

  override def createAggregationBuffer(): KLLBuffer = new KLLBuffer(k)

  override def update(buffer: KLLBuffer, input: InternalRow): KLLBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KLLBuffer, other: KLLBuffer): KLLBuffer = {
    buffer.combine(other)
    buffer
  }

  override def eval(buffer: KLLBuffer): Any = {
    if (buffer.n == 0L) null
    else InternalRow(buffer.n, buffer.bound,
      new GenericArrayData(buffer.quantiles(probs).map(x => x: Any).toArray))
  }

  override def serialize(buffer: KLLBuffer): Array[Byte] = {
    val size = 4 + 8 + 8 + 4 +
      buffer.levels.map(l => 4 + 8 * l.size).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buffer.k).putLong(buffer.n).putLong(buffer.errBound)
    bb.putInt(buffer.levels.size)
    buffer.levels.foreach { l =>
      bb.putInt(l.size)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KLLBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KLLBuffer(bb.getInt())
    buf.n = bb.getLong()
    buf.errBound = bb.getLong()
    val nl = bb.getInt()
    var h = 0
    while (h < nl) {
      if (buf.levels.size == h)
        buf.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      val m = bb.getInt()
      var i = 0
      while (i < m) { buf.levels(h) += bb.getDouble(); i += 1 }
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}

object QuantileFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: the mergeable KLL-style quantile summary of
    * `value` — `struct(n, bound, qs array<double>)` where `qs(i)` is the
    * sketch's answer for `probs(i)` and the TRUE rank of each answer is
    * guaranteed within `bound` of `max(1, ceil(p*n))`, under any
    * partitioning or merge order.
    */
  def quantile_sketch(value: Column, probs: Seq[Double], k: Int): Column =
    ColumnBridge.column(
      QuantileSketch(ColumnBridge.expression(value), probs, k)
        .toAggregateExpression())
}
