package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a REAL aggregate.
  *
  * `topk_by(score, id, k)` keeps the k best `(score desc, id asc)` ids per
  * group and returns them best-first as `array<long>`.
  *
  * Why an aggregate and not `row_number() OVER (PARTITION BY group)`:
  * windows have NO partial aggregation — every scored row shuffles to the
  * single reducer owning its group, so a brute-force ANN scoring pass over
  * a 100 TB corpus would funnel the entire corpus's scores for each query
  * through one task. A TypedImperativeAggregate gets map-side combine: each
  * input partition reduces to at most k entries per group before the
  * shuffle, so the exchange carries <= k * numPartitions rows per group
  * regardless of corpus size.
  *
  * The buffer is a binary heap with the WORST element at the root
  * (min-score, ties by max-id), giving O(log k) updates and O(k log k)
  * final ordering.
  */
final class TopKByBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // "a is worse than b" under the ranking order (score desc, id asc).
  // java.lang.Double.compare gives NaN a total order (greater than every
  // other value — matching Spark's window `ORDER BY score DESC` which also
  // ranks NaN first), so a NaN score can never wedge at the heap root and
  // block inserts the way raw </== comparisons (all false vs NaN) would.
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val cmp = java.lang.Double.compare(s1, s2)
    cmp < 0 || (cmp == 0 && i1 > i2)
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) / 2
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    var continue = true
    while (continue) {
      val l = 2 * pos + 1; val r = l + 1
      var worst = pos
      if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == pos) continue = false
      else { swap(pos, worst); pos = worst }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKByBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Ids ordered best-first: (score desc, id asc), NaN ranked first to
    * match Spark's window `ORDER BY score DESC` NaN placement.
    */
  def sortedIds: Array[Long] = {
    val idx = (0 until size).sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))
    idx.map(ids).toArray
  }

  /** (score, id) pairs in the same best-first order as [[sortedIds]] — for
    * consumers that need the ranking score in the output (e.g. BM25 / RRF
    * retrieval), not just the ranked ids.
    */
  def sortedPairs: Array[(Double, Long)] = {
    val idx = (0 until size).sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))
    idx.map(i => (scores(i), ids(i))).toArray
  }
}

case class TopKBy(
    score: Expression,
    id: Expression,
    k: Int,
    withScores: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByBuffer]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0, "topk_by: k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  // Coerce (or reject) inputs at analysis time: update() reads the score as
  // a primitive Double and the id as a primitive Long, so an int score or a
  // string id must become an analysis error / implicit cast — never a
  // runtime ClassCastException. The id column is documented as bigint
  // (narrower integer ids up-cast losslessly). Declared as Seq[DataType]
  // (a covariant narrowing of Seq[AbstractDataType], which is private[sql]).
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  // `withScores` keeps the ranking score in the output: each element is a
  // (score, id) struct instead of a bare id — same buffer, same ordering.
  override def dataType: DataType =
    if (withScores)
      ArrayType(StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))), containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKByBuffer = new TopKByBuffer(k)

  override def update(buffer: TopKByBuffer, input: InternalRow): TopKByBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKByBuffer, other: TopKByBuffer): TopKByBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKByBuffer): Any =
    if (withScores)
      new GenericArrayData(buffer.sortedPairs.map { case (s, i) =>
        InternalRow(s, i): Any
      })
    else new GenericArrayData(buffer.sortedIds)

  override def serialize(buffer: TopKByBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKByBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      buf.insert(s, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKBy =
    copy(score = newLeft, id = newRight)
}

object TopKExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: k best ids by (score desc, id asc), best-first. */
  def topk_by(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Like [[topk_by]] but each element is a (score, id) struct — for
    * retrieval outputs that surface the ranking score.
    */
  def topk_by_scored(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k,
        withScores = true)
        .toAggregateExpression())
}
