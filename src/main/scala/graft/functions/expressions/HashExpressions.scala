package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketch primitives.
  *
  * Why not higher-order functions: `transform`/`aggregate` lambdas are
  * interpreted per element, and Catalyst's CollapseProject inlines a column
  * reference into every use site — a minhash signature expressed as
  * nested HOFs re-evaluates the shingle array once per hash seed per band
  * (measured 250x blowup at sf0.01). A native expression evaluates its
  * child ONCE and runs the seed/band loops as tight JVM code.
  *
  * Hashing uses Spark's own XXH64 (the `xxhash64` SQL function's core), so
  * signatures stay consistent with SQL-side xxhash64 seeds.
  */

/** `minhash_bands(shingles, numBands, rowsPerBand)`: array<string> ->
  * array<long> of `numBands` LSH band keys. Band j combines the minima of
  * seeds [j*rowsPerBand, (j+1)*rowsPerBand).
  */
case class MinHashBands(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val numHashes = numBands * rowsPerBand
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var seed = 0
      while (seed < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed.toLong)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(mins(b * rowsPerBand + r), acc)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val numHashes = numBands * rowsPerBand
      val mins = ctx.freshName("mins")
      val bands = ctx.freshName("bands")
      val i = ctx.freshName("i")
      val seed = ctx.freshName("seed")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          UTF8String $s = $arr.getUTF8String($i);
          for (int $seed = 0; $seed < $numHashes; $seed++) {
            long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $seed);
            if ($h < $mins[$seed]) $mins[$seed] = $h;
          }
        }
        long[] $bands = new long[$numBands];
        for (int $b = 0; $b < $numBands; $b++) {
          long $acc = (long) $b;
          for (int $r = 0; $r < $rowsPerBand; $r++) {
            $acc = $xxh.hashLong($mins[$b * $rowsPerBand + $r], $acc);
          }
          $bands[$b] = $acc;
        }
        ${ev.value} = new $gad($bands);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** `simhash64(tokens)`: array<string> -> 64-bit SimHash signature. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        int[] $votes = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          UTF8String $s = $arr.getUTF8String($i);
          long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
          for (int $bit = 0; $bit < 64; $bit++) {
            if ((($h >>> $bit) & 1L) == 1L) $votes[$bit]++; else $votes[$bit]--;
          }
        }
        long $sig = 0L;
        for (int $bit = 0; $bit < 64; $bit++) {
          if ($votes[$bit] > 0) $sig |= (1L << $bit);
        }
        ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `word_shingles(tokens, k)`: array<string> -> sorted, deduplicated array
  * of k-word shingles (space-joined). One pass; replaces an interpreted
  * transform/slice/concat_ws HOF chain that took ~2ms/doc at bench.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val set = new java.util.TreeSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    val last = n - k
    while (i <= last) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(space, parts: _*)
      if (s.numBytes() > 0) set.add(s)
      i += 1
    }
    // short docs (< k tokens) fall back to the whole-document shingle
    if (set.isEmpty && n > 0) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(j); j += 1 }
      val s = UTF8String.concatWs(space, parts: _*)
      if (s.numBytes() > 0) set.add(s)
    }
    new GenericArrayData(set.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `jaccard_sorted(a, b)`: exact Jaccard similarity of two pre-sorted,
  * pre-deduplicated string arrays via a single merge scan — no per-pair
  * hash-set allocation (array_intersect builds an OpenHashSet per call,
  * which dominated the pairwise-verification stage at bench).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    java.lang.Double.valueOf(if (union == 0) 0.0 else inter.toDouble / union)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val cmp = ctx.freshName("cmp")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val union = ctx.freshName("union")
      s"""
        int $na = $a.numElements(); int $nb = $b.numElements();
        int $i = 0; int $j = 0; int $inter = 0;
        while ($i < $na && $j < $nb) {
          int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
          if ($cmp == 0) { $inter++; $i++; $j++; }
          else if ($cmp < 0) $i++;
          else $j++;
        }
        int $union = $na + $nb - $inter;
        ${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** `md5_prefix8(s)`: the first 8 hex chars of md5(s) as an unsigned
  * 32-bit value in a long — BIT-IDENTICAL to
  * `conv(substring(md5(s), 1, 8), 16, 10)::long` (the engine's
  * replayable md5-bucket convention; the first 8 hex chars ARE the
  * first 4 digest bytes big-endian), without materializing the 32-char
  * hex string, slicing it, and parsing it back through a base
  * conversion per value. The digest instance is thread-local — no
  * per-call MessageDigest allocation.
  */
case class Md5Prefix8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix8 expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix8.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = Md5Prefix8.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix8 =
    copy(child = newChild)
}

object Md5Prefix8 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** First 8 md5 hex chars as a long (see [[Md5Prefix8]]). */
  def md5_prefix8(s: Column): Column =
    ColumnBridge.column(Md5Prefix8(ColumnBridge.expression(s)))

  /** Column API for the custom expressions. */
  def minhash_bands(shingles: Column, numBands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(
      MinHashBands(ColumnBridge.expression(shingles), numBands, rowsPerBand))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Sorted distinct k-word shingles of a token array. */
  def word_shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))

  /** Jaccard over arrays that are ALREADY sorted+distinct (see
    * [[JaccardSorted]]); pair with `sort_array(array_distinct(...))`.
    */
  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
