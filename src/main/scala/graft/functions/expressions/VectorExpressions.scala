package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
case class HyperplaneBucket(child: Expression, bits: Int, knuth: Boolean = false)
    extends UnaryExpression {

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
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], bits, isFloat, knuth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = HyperplaneBucket.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.compute($arr, $bits, $isFloat, $knuth);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Shared by interpreted eval and generated code (the static-call shape
    * keeps whole-stage codegen tiny regardless of dimension).
    *
    * Two deterministic +-1 hyperplane families:
    *  - `knuth = false`: signs from Spark's XXH64 (seed 42) — the default
    *    for internal bucketing (lshTopK).
    *  - `knuth = true`: signs from the Knuth multiplicative hash's high bit,
    *    `((b*10007 + d + 1) * 2654435761) mod 2^32 >= 2^31` — pure int64
    *    arithmetic an external SQL engine can replicate exactly, so the
    *    bucket grid itself is oracle-checkable (used by the embedding-dedup
    *    catalog query).
    */
  def compute(arr: ArrayData, bits: Int, isFloat: Boolean, knuth: Boolean): Long = {
    val dim = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        val positive =
          if (knuth) (((b.toLong * 10007L + d + 1L) * 2654435761L) & 0xffffffffL) >= 0x80000000L
          else (XXH64.hashLong(b.toLong * 10007L + d, 42L) & 1L) == 1L
        dot += (if (positive) v else -v)
        d += 1
      }
      if (dot > 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

/** `cosine_sim(a, b)`: cosine similarity of two float/double vectors in ONE
  * pass — dot product and both norms accumulate in the same loop, compiled
  * into whole-stage codegen via a static call.
  *
  * Why a native expression: the higher-order-function form
  * (`aggregate(zip_with(...))`) is CodegenFallback — every element bounces
  * through interpreted lambda eval — and computing cosine as
  * dot/(norm*norm) walked the arrays three separate times. In the ANN hot
  * loops (every candidate pair scores one cosine) that interpreted 3-pass
  * kernel dominated the profile.
  *
  * Numerics match the previous HOF form bit-for-bit: all accumulation is
  * left-to-right in doubles, the denominator is `sqrt(na) * sqrt(nb)`, and
  * a zero denominator yields 0.0. Null array elements count as 0.0;
  * mismatched lengths yield NULL (the HOF form also degenerated to null).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression, side: String): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_sim: $side expects array<float> or array<double>, got $other")
  }
  private lazy val leftFloat = elemIsFloat(left, "left")
  private lazy val rightFloat = elemIsFloat(right, "right")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else CosineSimilarity.compute(aa, bb, leftFloat, rightFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = CosineSimilarity.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $util.compute($a, $b, $leftFloat, $rightFloat);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Single pass: dot, |a|^2, |b|^2 in one loop. Shared by interpreted eval
    * and generated code.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** `NearestCentroid(vec, centroids)`: index of the squared-euclidean
  * nearest centroid, with the centroid matrix baked into the expression
  * (it is small by definition — a coarse quantizer has tens-to-thousands
  * of cells). Assignment is a NARROW map: no crossJoin + window, no
  * shuffle — the right shape for appending billions of rows to an IVF
  * index. Euclidean metric and lowest-index tie-break mirror Spark ML
  * KMeans `findClosest`, so appended assignments agree with
  * `model.transform`.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: centroids must be non-empty")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_centroid expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = NearestCentroid.getClass.getName.stripSuffix("$")
    // ship the matrix into the generated class once as a reference object
    val matRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.compute($arr, $matRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `NearestCentroidDist(vec, centroids)`: squared euclidean distance to the
  * nearest centroid — the per-row drift signal behind the IVF re-fit
  * trigger (a batch whose mean distance is far above the fitted mean is
  * drawn from a distribution the quantizer never saw). Same narrow-map
  * shape, metric, and tie handling as [[NearestCentroid]].
  */
case class NearestCentroidDist(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid_dist: centroids must be non-empty")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_centroid_dist expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.computeDist(input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = NearestCentroid.getClass.getName.stripSuffix("$")
    val matRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.computeDist($arr, $matRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDist =
    copy(child = newChild)
}

object NearestCentroid {

  /** Squared euclidean distance to the nearest centroid (same loop as
    * [[compute]], returning the distance instead of the index).
    */
  def computeDist(arr: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Double = {
    val dim = arr.numElements()
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(dim, cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val v = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - cen(i)
        d += v * v
        i += 1
      }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }

  def compute(arr: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int = {
    val dim = arr.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(dim, cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val v = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - cen(i)
        d += v * v
        i += 1
      }
      if (d < bestD) { bestD = d; best = c } // strict < keeps lowest index on ties
      c += 1
    }
    best
  }
}

/** `PqEncode(vec, codebooks)`: product-quantization code of a vector —
  * for each of m subspaces, the index of the nearest codebook centroid of
  * that subspace (squared euclidean, lowest index on ties). Returns
  * `array<int>` of length m. `normalize = true` encodes the UNIT vector
  * (the cosine-ADC contract: with both sides normalized, inner product =
  * cosine). One static call per row — the narrow-map shape of
  * [[NearestCentroid]] at any dimension and any m.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = true)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: codebooks must be non-empty per subspace")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_encode expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqExpressions.encode(input.asInstanceOf[ArrayData], codebooks, isFloat, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqExpressions.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.encode($arr, $cbRef, $isFloat, $normalize);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `PqQueryLut(qvec, codebooks)`: the query-side ADC lookup table — for
  * every (subspace m, centroid j), the inner product of the query's m-th
  * subvector with that centroid, flattened to `array<double>` of length
  * m * ksub. `PqAdcDot(codes, lut)` then scores a PQ-coded corpus row in
  * O(m) lookups. `normalize = true` uses the unit query (cosine contract).
  */
case class PqQueryLut(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = true)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_query_lut: codebooks must be non-empty per subspace")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_query_lut expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqExpressions.queryLut(input.asInstanceOf[ArrayData], codebooks, isFloat, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqExpressions.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.queryLut($arr, $cbRef, $isFloat, $normalize);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqQueryLut =
    copy(child = newChild)
}

/** `PqAdcDot(codes, lut)`: asymmetric-distance score — sum over subspaces
  * of the lut entry the row's code selects (`lut[m * ksub + codes[m]]`,
  * ksub inferred from the lengths). With unit-normalized build and query,
  * this approximates the cosine. Codegen'd; the hot loop is m additions.
  */
case class PqAdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqExpressions.adcDot(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqExpressions.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (codes, lut) =>
      s"${ev.value} = $util.adcDot($codes, $lut);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {

  @inline private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  private def normOf(arr: ArrayData, isFloat: Boolean): Double = {
    val dim = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < dim) { val v = elem(arr, i, isFloat); s += v * v; i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) 1.0 else n // zero vector: encode as-is rather than NaN
  }

  /** PQ code per subspace (argmin squared distance, lowest index on ties). */
  def encode(arr: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean, normalize: Boolean): ArrayData = {
    val dim = arr.numElements()
    val inv = if (normalize) 1.0 / normOf(arr, isFloat) else 1.0
    val m = codebooks.length
    val out = new Array[Int](m)
    var sub = 0
    var off = 0
    while (sub < m) {
      val cents = codebooks(sub)
      val dsub = cents(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val cen = cents(j)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val v = (if (off + i < dim) elem(arr, off + i, isFloat) * inv else 0.0) - cen(i)
          d += v * v
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(sub) = best
      off += dsub
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Flattened (m x ksub) table of subvector-centroid inner products. */
  def queryLut(arr: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean, normalize: Boolean): ArrayData = {
    val dim = arr.numElements()
    val inv = if (normalize) 1.0 / normOf(arr, isFloat) else 1.0
    val m = codebooks.length
    val ksub = codebooks(0).length
    val out = new Array[Double](m * ksub)
    var sub = 0
    var off = 0
    while (sub < m) {
      val cents = codebooks(sub)
      val dsub = cents(0).length
      var j = 0
      while (j < cents.length) {
        val cen = cents(j)
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          if (off + i < dim) dot += elem(arr, off + i, isFloat) * inv * cen(i)
          i += 1
        }
        out(sub * ksub + j) = dot
        j += 1
      }
      off += dsub
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sum of the lut entries the codes select. */
  def adcDot(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val ksub = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * ksub + codes.getInt(i)); i += 1 }
    s
  }
}

/** `GridBucket(key, bounds)`: bucket id of a binary key against a FIXED
  * grid of split keys — the number of split keys strictly below the key
  * (split key i is the inclusive upper bound of bucket i), via binary
  * search over the decoded byte bounds.
  *
  * Why a native expression: the Column-composition form (a fold of
  * `when(hex(key) > bound, 1)` terms) builds an N-node tree — harmless at
  * 32 buckets, but a 100 TB table wants O(10^5) buckets, where the chain
  * blows past JVM method/codegen limits and falls back to interpreted
  * per-row eval (the HyperplaneBucket lesson). This is one static call and
  * O(log N) unsigned byte comparisons at any grid size.
  */
case class GridBucket(child: Expression, boundsHex: Array[String])
    extends UnaryExpression {

  require(boundsHex.nonEmpty, "grid_bucket: bounds must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val bounds: Array[Array[Byte]] =
    boundsHex.map(GridBucket.decodeHex)

  override protected def nullSafeEval(input: Any): Any =
    GridBucket.compute(input.asInstanceOf[Array[Byte]], bounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GridBucket.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("gridBounds", bounds, "byte[][]")
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = $util.compute($key, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): GridBucket =
    copy(child = newChild)
}

object GridBucket {

  /** One hex codec for the whole engine: delegates to [[graft.core.Hex]]
    * so driver-side bucketing (grid merge) and executor-side bucketing
    * (this expression) can never drift apart.
    */
  def decodeHex(s: String): Array[Byte] = graft.core.Hex.decode(s)

  /** Unsigned-lexicographic compare == Spark BinaryType ordering. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Lower-bound binary search: the count of bounds strictly below key. */
  def compute(key: Array[Byte], bounds: Array[Array[Byte]]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(bounds(mid), key) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

object MmrSelect {

  /** Greedy maximal-marginal-relevance selection over one query's packed
    * candidate array (structs of `(id, rel, vec)`): pick
    * argmax λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s) until `k` picks, the
    * diversity term 0 for the first pick (S empty). Engine-portability
    * discipline (the BM25 decimal rule applied to floats): every
    * pairwise cosine is 6dp-rounded BEFORE it enters the max, the mmr
    * score is 6dp-rounded, and ties break on (score, LOWER id) — an
    * external SQL replay (round(list_cosine, 6), literal `(1 - λ)`, same
    * tie order) selects the identical sequence, so the declared query is
    * fully oracled. Selection is input-order-independent (the tie-break
    * is total). O(k·n·dim) per query with n bounded by the upstream
    * top-k: constant work per query at any corpus size.
    */
  def compute(arr: ArrayData, lambda: Double, k: Int, vecFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      vecs(i) = row.getArray(2)
      i += 1
    }
    // HALF-AWAY-FROM-ZERO at 6dp (what SQL round() does — Math.rint is
    // half-even and flips on exact .5-ulp boundaries, which 6dp-discrete
    // inputs hit routinely); `+ 0.0` normalizes -0.0
    def r6(x: Double): Double =
      java.lang.Math.copySign(java.lang.Math.floor(java.lang.Math.abs(x) * 1e6 + 0.5), x) / 1e6 + 0.0
    val taken = new Array[Boolean](n)
    // max 6dp-rounded cosine to the selected set; init at cosine's lower
    // bound, NOT 0 — a candidate whose similarities to every pick are
    // negative keeps its true (negative) max, which the formula turns
    // into a diversity BONUS exactly as the oracle replay computes it
    val maxSim = Array.fill(n)(-1.0)
    val out = new Array[Any](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = r6(lambda * rels(i) -
            (if (step == 0) 0.0 else (1.0 - lambda) * maxSim(i)))
          if (best < 0 || s > bestScore || (s == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      out(step) = org.apache.spark.sql.catalyst.InternalRow(
        ids(best), bestScore, step + 1)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val c = r6(CosineSimilarity.compute(vecs(i), vecs(best), vecFloat, vecFloat))
          if (c > maxSim(i)) maxSim(i) = c
        }
        i += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}

/** `MmrSelect(candidates, lambda, k)`: maximal-marginal-relevance
  * diversification (Carbonell & Goldstein 1998) of one query's candidate
  * list — input `array<struct<id long, rel double, vec array<float|double>>>`
  * (packed per query by a bounded collect_list), output
  * `array<struct<doc_id long, mmr double, rank int>>` in selection order.
  */
case class MmrSelectExpr(child: Expression, lambda: Double, k: Int)
    extends UnaryExpression {

  require(lambda >= 0.0 && lambda <= 1.0, s"mmr_select: lambda $lambda not in [0,1]")
  require(k > 0, "mmr_select: k must be positive")

  private lazy val vecFloat: Boolean = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 3 =>
      fields(2).dataType match {
        case ArrayType(FloatType, _) => true
        case ArrayType(DoubleType, _) => false
        case other => throw new IllegalArgumentException(
          s"mmr_select: vec field must be array<float|double>, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"mmr_select expects array<struct<long, double, array<_>>>, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.compute(input.asInstanceOf[ArrayData], lambda, k, vecFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = MmrSelect.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $util.compute($arr, $lambda, $k, $vecFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelectExpr =
    copy(child = newChild)
}

/** `PcaProject(vec, components, mean)`: the centered projection
  * `y_c = sum_j components[c][j] * (x_j - mean[j])` — a k x d mat-vec per
  * row with the basis riding the generated class as a reference object
  * (the [[NearestCentroid]] discipline). Spark's own ml PCA transform
  * skips the centering (a long-standing quirk); this one centers, which
  * is what makes the projected covariance exactly diagonal and the
  * whitened variance exactly 1 — the properties emb_pca_gate certifies.
  */
case class PcaProject(child: Expression, components: Array[Array[Double]],
    mean: Array[Double])
    extends UnaryExpression {

  require(components.nonEmpty && components.forall(_.length == mean.length),
    "pca_project: components must be non-empty k x d with d == mean length")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pca_project expects array<float> or array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PcaProject.compute(input.asInstanceOf[ArrayData], components, mean, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PcaProject.getClass.getName.stripSuffix("$")
    val matRef = ctx.addReferenceObj("components", components, "double[][]")
    val meanRef = ctx.addReferenceObj("mean", mean, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $util.compute($arr, $matRef, $meanRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaProject {
  def compute(arr: ArrayData, components: Array[Array[Double]],
      mean: Array[Double], isFloat: Boolean): ArrayData = {
    val d = math.min(arr.numElements(), mean.length)
    val centered = new Array[Double](d)
    var j = 0
    while (j < d) {
      centered(j) =
        (if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)) - mean(j)
      j += 1
    }
    val out = new Array[Double](components.length)
    var c = 0
    while (c < components.length) {
      val row = components(c)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += row(i) * centered(i); i += 1 }
      out(c) = acc
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: LSH bucket id (long) from `bits` hyperplane sign bits.
    * `knuth = true` selects the SQL-replicable hyperplane family (see
    * [[HyperplaneBucket.compute]]).
    */
  def hyperplane_bucket(vec: Column, bits: Int, knuth: Boolean = false): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec), bits, knuth))

  /** Column API: single-pass codegen'd cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: greedy MMR diversification of a packed candidate array
    * (see [[MmrSelect.compute]] for the selection rule and tie-breaks).
    */
  def mmr_select(candidates: Column, lambda: Double, k: Int): Column =
    ColumnBridge.column(MmrSelectExpr(ColumnBridge.expression(candidates), lambda, k))

  /** Column API: squared-euclidean nearest-centroid index (narrow map). */
  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))

  /** Column API: centered PCA projection (k x d mat-vec, narrow map). */
  def pca_project(vec: Column, components: Array[Array[Double]],
      mean: Array[Double]): Column =
    ColumnBridge.column(
      PcaProject(ColumnBridge.expression(vec), components, mean))

  /** Column API: squared-euclidean distance to the nearest centroid (the
    * IVF drift signal; narrow map like [[nearest_centroid]]).
    */
  def nearest_centroid_dist(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidDist(ColumnBridge.expression(vec), centroids))

  /** Column API: fixed-grid bucket id of a binary key (O(log N) binary
    * search at any grid size). `boundsHex` are hex-encoded split keys,
    * ascending; split key i is the inclusive upper bound of bucket i.
    */
  def grid_bucket(key: Column, boundsHex: Seq[String]): Column =
    ColumnBridge.column(GridBucket(ColumnBridge.expression(key), boundsHex.toArray))

  /** Column API: product-quantization code (array<int>, one per subspace). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]],
      normalize: Boolean = true): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks, normalize))

  /** Column API: query-side ADC lookup table (array<double>, m x ksub). */
  def pq_query_lut(qvec: Column, codebooks: Array[Array[Array[Double]]],
      normalize: Boolean = true): Column =
    ColumnBridge.column(PqQueryLut(ColumnBridge.expression(qvec), codebooks, normalize))

  /** Column API: ADC score of a PQ code against a query lut. */
  def pq_adc_dot(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdcDot(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
