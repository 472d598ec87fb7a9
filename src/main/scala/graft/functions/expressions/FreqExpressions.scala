package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate frequent items (heavy hitters) as a REAL mergeable
  * aggregate: the Misra–Gries summary (Misra & Gries 1982) with the
  * mergeable-summaries combine step (Agarwal et al., PODS 2012) — the
  * deterministic counter sketch next to the HLL cardinality sketch the
  * profiler already carries.
  *
  * `approx_heavy_hitters(item, k)` keeps at most `k` counters. Update:
  * resident items increment; a non-resident item takes a free counter
  * or, when none is free, decrements EVERY counter (dropping zeros) —
  * the classic amortized step. Merge: counters add, then the summary
  * re-truncates to `k` by subtracting the (k+1)-th largest count.
  *
  * Guarantees (exact, not probabilistic — this sketch never
  * false-negatives a heavy item):
  *   - `est(x) <= true(x)` — never overcounts;
  *   - `true(x) - est(x) <= (N - M) / (k+1)` where `N` = items
  *     processed, `M` = sum of retained counts (both carried in the
  *     state and surfaced as the output's `err` bound);
  *   - every item with `true(x) > N / (k+1)` is present in the output,
  *     REGARDLESS of partitioning or merge order.
  *
  * Output: `struct(n: bigint, err: bigint, items: array<struct<item:
  * string, count: bigint>>)`, items ordered (count desc, item asc).
  * The item SET and counts may vary with merge order within the bounds
  * above (why the Catalog row is gated, not value-oracled); the
  * guarantees above never do.
  *
  * Scale shape: same as [[TopKBy]] — a TypedImperativeAggregate gets
  * map-side partial aggregation, so each input partition reduces to a
  * <= k-counter summary BEFORE the shuffle; the exchange carries
  * O(k * partitions) rows per group however large the stream. The
  * window/groupBy-exact alternative shuffles every row of a 100 TB
  * stream to count what this summarizes in k counters.
  */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var n: Long = 0L // items processed (for the error bound)

  def add(item: String, c: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + c)
    else if (counts.size < k) counts.put(item, c)
    else {
      // decrement-all by min(c, smallest resident count) repeatedly is
      // the general form; for the c=1 update path one sweep suffices.
      // For c>1 (only reachable via merge, which uses combine() below)
      // this path is never taken.
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def update(item: String): Unit = { n += 1; add(item, 1L) }

  /** Mergeable-summaries combine: add counts, then subtract the
    * (k+1)-th largest count from every counter and drop the non-positive
    * — the summary shrinks back to <= k counters in one pass.
    */
  def combine(other: MGBuffer): Unit = {
    n += other.n
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  def retained: Long = {
    var m = 0L
    val vit = counts.values().iterator()
    while (vit.hasNext) m += vit.next()
    m
  }
}

case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "approx_heavy_hitters: k must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    // UTF8String may alias a reused page buffer — materialize the key
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.combine(other)
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val err = (buffer.n - buffer.retained) / (k + 1)
    val items = buffer.counts.entrySet().toArray(
        Array.empty[java.util.Map.Entry[String, Long]])
      .sortBy(e => (-e.getValue, e.getKey))
      .map(e => InternalRow(UTF8String.fromString(e.getKey), e.getValue): Any)
    InternalRow(buffer.n, err, new GenericArrayData(items))
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val entries = buffer.counts.entrySet().toArray(
      Array.empty[java.util.Map.Entry[String, Long]])
    val payload = entries.map(e => e.getKey.getBytes("UTF-8"))
    val size = 4 + 8 + 4 + payload.map(_.length + 12).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buffer.k).putLong(buffer.n).putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(payload(i).length).put(payload(i)).putLong(entries(i).getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MGBuffer(bb.getInt())
    buf.n = bb.getLong()
    val m = bb.getInt()
    var i = 0
    while (i < m) {
      val len = bb.getInt()
      val arr = new Array[Byte](len); bb.get(arr)
      buf.counts.put(new String(arr, "UTF-8"), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object FreqExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: the k-counter Misra–Gries summary of `item` —
    * `struct(n, err, items array<struct<item, count>>)`; every item with
    * true frequency > n/(k+1) is guaranteed present, and true counts lie
    * in `[count, count + err]`.
    */
  def approx_heavy_hitters(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), k).toAggregateExpression())
}
