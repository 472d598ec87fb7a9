package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/hash primitives for similarity search and near-dedup. The hot
  * kernels (cosine, LSH buckets) are native Catalyst expressions in
  * [[graft.functions.expressions]] — Spark's higher-order functions
  * (`zip_with`/`aggregate`) are CodegenFallback and evaluate their lambdas
  * interpreted per element, which is the wrong kernel for an ANN hot loop.
  * At 100 TB the hot path is columnar parquet read + one tight codegen'd
  * loop per row.
  */
object Vectors {

  /** Dot product of two numeric arrays (computed in double).
    * HOF form — interpreted; fine for one-off projections, NOT for hot
    * loops (use [[cosine]], which is a native single-pass expression).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either norm is 0. Native single-pass
    * codegen'd expression (dot and both norms in one loop) — see
    * [[graft.functions.expressions.CosineSimilarity]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.cosine_sim(a, b)

  // SimHash/MinHash/LSH-band signatures live in
  // graft.functions.expressions (native Catalyst expressions): the
  // higher-order-function forms were re-evaluated per element by
  // CollapseProject inlining and are intentionally not provided here.

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val union = (size(ad) + size(bd)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Random-hyperplane LSH bucket for a float/double vector: `bits` signs
    * of dot products with deterministic pseudo-random +-1 hyperplanes
    * (drawn from xxhash64 of (bit, component)). Vectors in the same bucket
    * are ANN candidates. Native expression — the previous Column-composition
    * form built a dim x bits expression tree that broke codegen at real
    * embedding dims (768+); see
    * [[graft.functions.expressions.HyperplaneBucket]]. The dimension is
    * read from the vector itself (the old 3-arg `dim` overload is gone —
    * it was ignored, and silently ignoring an explicit dim is worse than
    * not accepting one). `knuth = true` selects the SQL-replicable
    * hyperplane family for oracle-checkable bucketing.
    */
  def hyperplaneBucket(vec: Column, bits: Int, knuth: Boolean = false): Column =
    graft.functions.expressions.VectorExpressions.hyperplane_bucket(vec, bits, knuth)
}
