package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/hash primitives for similarity search and near-dedup, built from
  * Spark's higher-order functions (`zip_with`/`aggregate`/`transform`) so
  * they evaluate inside codegen with no UDF serialization. At 100 TB the
  * hot loop (dot products over Array[Float]) is columnar parquet read +
  * codegen'd arithmetic.
  */
object Vectors {

  /** Dot product of two numeric arrays (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

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
    * [[graft.functions.expressions.HyperplaneBucket]]. The `dim` parameter
    * is retained for API stability but the dimension is read from the
    * vector itself.
    */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int): Column =
    graft.functions.expressions.VectorExpressions.hyperplane_bucket(vec, bits)
}
