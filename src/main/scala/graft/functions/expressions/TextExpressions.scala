package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics.
  *
  * `text_stats(text)` -> struct<n_chars: long, punct_ratio: double,
  * stopword_ratio: double, quality: double>.
  *
  * Why one expression instead of composing `Text.punctRatio` /
  * `Text.stopwordRatio` / `Text.qualityScore`: CollapseProject inlines each
  * derived column into every use site, so the composed form re-ran
  * `split(trim(regexp_replace(lower(text))))` six times per row plus
  * interpreted `filter(...)` HOF lambdas per token (9.3 s at sf0.1 for a
  * query that should be sub-second — same pitfall already fixed for the
  * sketches in HashExpressions). This expression walks the UTF-8 bytes
  * exactly once and emits all four stats; repeated `GetStructField` uses of
  * the same call are unified by whole-stage-codegen subexpression
  * elimination, so the scan stays a single pass at any scale.
  *
  * Semantics are bit-compatible with the composed form (and the DuckDB
  * oracle): `n_chars` = code-point length; `punct_ratio` = share of
  * `[.,!?;:]` characters; `stopword_ratio` = stopword share of
  * whitespace-delimited lowercase tokens (0.0 when no tokens); `quality` =
  * (min(n_chars/500,1) + min(4*stopword_ratio,1) + max(1-5*punct_ratio,0))/3,
  * unrounded — callers apply `round(_, 6)` like the original columns did.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = TextStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  // Stopwords are <= 4 ASCII bytes; pack the case-folded bytes little-endian
  // plus the BYTE LENGTH into a long for an allocation-free membership test.
  // Baking the length into the key means a token whose first bytes match a
  // stopword but which is longer — including NUL-padded forms like "to<NUL>",
  // whose 0x00 bytes pack as zero bits — can never produce a false hit.
  // UTF-8 continuation bytes are >= 0x80, so multi-byte tokens cannot
  // collide with these either.
  private val stopwordsPacked: Array[Long] = {
    val words = Seq(
      "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
      "on", "with", "as", "at", "by", "from", "that", "this")
    words.map { w =>
      require(w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'))
      val packed = w.getBytes("UTF-8").zipWithIndex
        .map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
      packed | (w.length.toLong << 32)
    }.sorted.toArray
  }

  private final val MaxStopLen = 4

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def foldAscii(b: Byte): Int = {
    val v = b & 0xff
    if (v >= 'A' && v <= 'Z') v + 32 else v
  }

  /** One pass over the UTF-8 bytes; called from both interpreted eval and
    * generated code (a static call keeps the expression inside
    * whole-stage codegen without inlining a page of Java).
    */
  def compute(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var nChars = 0L
    var punct = 0L
    var nToks = 0L
    var stopHits = 0L
    // current-token state: byte count and packed case-folded bytes
    var tokLen = 0
    var tokPacked = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      val v = b & 0xff
      // count code points: every byte that is not a UTF-8 continuation byte
      if ((v & 0xc0) != 0x80) nChars += 1
      if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':') punct += 1
      if (isWs(b)) {
        if (tokLen > 0) {
          nToks += 1
          if (tokLen <= MaxStopLen && java.util.Arrays.binarySearch(
              stopwordsPacked, tokPacked | (tokLen.toLong << 32)) >= 0) stopHits += 1
        }
        tokLen = 0
        tokPacked = 0L
      } else {
        if (tokLen < MaxStopLen) tokPacked |= foldAscii(b).toLong << (8 * tokLen)
        tokLen += 1
      }
      i += 1
    }
    if (tokLen > 0) {
      nToks += 1
      if (tokLen <= MaxStopLen && java.util.Arrays.binarySearch(
          stopwordsPacked, tokPacked | (tokLen.toLong << 32)) >= 0) stopHits += 1
    }
    val pr = if (nChars == 0L) 0.0 else punct.toDouble / nChars
    val sr = if (nToks == 0L) 0.0 else stopHits.toDouble / nToks
    val lenScore = math.min(nChars.toDouble / 500.0, 1.0)
    val stopScore = math.min(sr * 4.0, 1.0)
    val punctPenalty = math.max(1.0 - pr * 5.0, 0.0)
    val quality = (lenScore + stopScore + punctPenalty) / 3.0
    new GenericInternalRow(Array[Any](nChars, pr, sr, quality))
  }
}

/** `rolling_hash64(text)`: base-31 Horner hash over the string's Unicode
  * CODE POINTS, wrapping in Long — the streaming-friendly fingerprint
  * (order-sensitive, incrementally maintainable). Replaces the HOF form
  * (`aggregate(transform(split(text, "")), ...)`) that evaluated an
  * interpreted lambda per character of every document; this is one static
  * call walking the string once. Code points (not UTF-16 units) keep it
  * bit-compatible with the HOF reference for ALL text including non-BMP:
  * Java's zero-width split never separates a surrogate pair and Spark's
  * `ascii` returns the code point of the first character.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = RollingHash64.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = h * 31L + cp.toLong
      i += Character.charCount(cp)
    }
    h
  }
}

/** `subword_split(word, vocab, maxPieceLen)`: greedy longest-match-first
  * subword segmentation against a FIXED vocabulary (WordPiece's inference
  * rule, marker-free) with single-character fallback — every word
  * segments losslessly (concatenating the pieces restores the word), so
  * there is no UNK sink and the roundtrip property is testable.
  *
  * Why a native expression: segmentation is an inherently sequential
  * per-word loop (position -> longest vocab prefix -> advance) that SQL
  * can only express as a recursive join per position; here it is one
  * static call with a hash-set probe per candidate length, O(|word| *
  * maxPieceLen) probes. The vocab rides the expression as a driver
  * parameter (the GridBucket / NearestCentroid convention) — bounded by
  * construction (it is a LEARNED top-K vocabulary, not corpus data).
  *
  * Greedy-match determinism: at each position the longest vocabulary
  * piece wins; lengths tie only with themselves, so the segmentation is
  * a pure function of (word, vocab set) — replayable in SQL by a
  * longest-prefix table + recursive path-follow, which is exactly how
  * the Catalog oracle certifies it.
  */
case class SubwordSplit(child: Expression, vocab: Array[String], maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1, "subword_split: maxPieceLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    SubwordSplit.compute(input.asInstanceOf[UTF8String], vocabSet, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SubwordSplit.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("subwordVocab", vocabSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $util.compute($s, $ref, $maxPieceLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordSplit =
    copy(child = newChild)
}

object SubwordSplit {
  def compute(word: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // code-point-safe segmentation over the java String form: pieces are
    // produced per DISTINCT word (the scale path joins them back to the
    // corpus), so per-word String materialization is off the hot path
    val s = word.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length)
    var pos = 0
    while (pos < s.length) {
      // remaining length in CODE POINTS (s.length is UTF-16 units; a
      // surrogate pair would otherwise overrun offsetByCodePoints)
      var len = math.min(maxPieceLen, s.codePointCount(pos, s.length))
      // candidate lengths are CODE POINTS; step down to the longest
      // vocabulary hit, falling back to the single code point at pos
      var matched: String = null
      while (matched == null && len > 1) {
        val end = s.offsetByCodePoints(pos, len)
        val cand = s.substring(pos, end)
        if (vocab.contains(cand)) matched = cand else len -= 1
      }
      if (matched == null) {
        val end = s.offsetByCodePoints(pos, 1)
        matched = s.substring(pos, end) // single-char fallback, in-vocab or not
      }
      out += UTF8String.fromString(matched)
      pos += matched.length
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `jaro_winkler(a, b)` / `jaro(a, b)`: the classic record-linkage string
  * similarity in [0, 1] as a codegen'd binary expression — Spark ships
  * `levenshtein` but no Jaro family, and record-linkage blocking stacks
  * (match part names, dedup entity aliases) lean on exactly this measure.
  *
  * Semantics match DuckDB's built-ins (the Catalog oracle certifies
  * 6dp-parity): Jaro over code points with the standard match window
  * `max(|a|,|b|)/2 - 1`, floored transposition halving, and 0 for any empty
  * side (including empty==empty — DuckDB's convention); Winkler boosts by
  * `prefix * 0.1 * (1 - jaro)` with the common prefix capped at 4, applied
  * only when jaro > 0.7. The exact formula lands on thirds, so the
  * boundary itself is unreachable in floating point and `>` vs `>=` is
  * immaterial. One static call per row, whole-stage-codegen friendly; the
  * O(|a|*|b|) flag scan is bounded by the match window, the same cost
  * class as `levenshtein`.
  */
case class JaroWinkler(left: Expression, right: Expression, winkler: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (winkler) "jaro_winkler" else "jaro"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = JaroWinkler.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $util.compute($a, $b, $winkler);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(ua: UTF8String, ub: UTF8String, winkler: Boolean): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aFlag = new Array[Boolean](la)
    val bFlag = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && b(j) == a(i)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched characters out of relative order, halved
    var trans = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aFlag(i)) {
        while (!bFlag(j)) j += 1
        if (a(i) != b(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transposition count is FLOORED (trans / 2 in integer math) — the
    // convention DuckDB and the classic C implementations share
    val jaro = (md / la + md / lb + (md - trans / 2) / md) / 3.0
    if (!winkler || jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) && a(prefix) == b(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `oov_count(tokens, vocab)`: how many of a row's tokens are OUTSIDE a
  * fixed vocabulary — the apply half of the persisted-vocabulary OOV
  * signal ([[graft.llmops.Tokenize.oovAgainstVocab]]).
  *
  * Why a native expression: the relational form (explode + anti-join +
  * re-aggregate per document) is the right BATCH plan but is not a
  * narrow map — a live stream would need a stateful aggregation just to
  * count per-row misses. This is one hash-set probe per token against a
  * vocabulary that rides the expression as a driver parameter (the
  * [[SubwordSplit]] convention — bounded by construction: it is a
  * LEARNED top-K vocabulary, not corpus data), so the apply is
  * stateless, codegen'd, and batch/stream identical. Probes compare
  * UTF8String directly — no per-token String materialization. A NULL
  * array element (never produced by the tokenizer) counts as OOV.
  */
case class OovCount(child: Expression, vocab: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.length * 2)
    vocab.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    OovCount.compute(input.asInstanceOf[ArrayData], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = OovCount.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("oovVocab", vocabSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): OovCount =
    copy(child = newChild)
}

object OovCount {
  def compute(arr: ArrayData,
      vocab: java.util.HashSet[UTF8String]): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (t == null || !vocab.contains(t)) c += 1
      i += 1
    }
    c
  }
}

/** `normalize_ws(text)`: lowercase + whitespace-collapse + trim in ONE
  * pass — bit-identical to `trim(regexp_replace(lower(text), "\\s+", " "))`,
  * the normalization every text operator here shares. Lowercasing calls
  * the SAME `UTF8String.toLowerCase` Spark's `lower()` uses; the
  * whitespace pass then works on bytes: Java's `\s` (no
  * UNICODE_CHARACTER_CLASS) is exactly the six ASCII bytes
  * `[ \t\n\x0B\f\r]`, which never occur inside UTF-8 multibyte
  * sequences, so collapsing runs of them to one 0x20 and dropping
  * leading/trailing runs reproduces the regex + trim byte-for-byte —
  * without compiling/running a regex engine over every document and
  * materializing the intermediate replaced string.
  */
case class NormalizeWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_ws expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeWs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = NormalizeWs.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}

object NormalizeWs {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase
    val n = lower.numBytes()
    // fast path: no whitespace work needed (no leading/trailing ws, no
    // ws runs, no non-space ws) — return the lowered string as-is
    var i = 0
    var needsWork = false
    var prevWs = true // treat position -1 as ws so leading ws trips it
    while (i < n && !needsWork) {
      val b = lower.getByte(i)
      val ws = isWs(b)
      if (ws && (b != ' ' || prevWs)) needsWork = true
      prevWs = ws
      i += 1
    }
    if (!needsWork && !prevWs) return lower
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val b = lower.getByte(i)
      if (isWs(b)) {
        if (o > 0) pendingSpace = true // leading ws drops; interior defers
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = b
        o += 1
      }
      i += 1
    }
    // trailing ws: pendingSpace never flushed — exactly trim()
    UTF8String.fromBytes(out, 0, o)
  }
}

/** `repetition_stats(norm)` -> struct<n_tokens: long, n_distinct: long,
  * top_word: long, top_bigram: long, dup_trigram: long> — the per-row
  * kernel of [[graft.llmops.Repetition.signals]] in ONE pass.
  *
  * Why a native expression: the HOF formulation materialized and SORTED
  * three gram arrays per row (tokens, joined bigram strings, joined
  * trigram strings — O(L log L) string comparisons each) and walked them
  * with interpreted lambdas (higher-order functions are CodegenFallback:
  * every filter/zip_with/aggregate call crosses the interpreted boundary
  * per element). This walks the normalized string's UTF-8 bytes once,
  * interning tokens / bigrams / trigrams into open hash maps — O(L)
  * amortized, fully inside whole-stage codegen via one static call.
  *
  * Semantics are value-identical to the sorted-run form (and the DuckDB
  * oracle): tokens are the non-empty single-space splits; counts are
  * exact per distinct gram; gram length counts CODE POINTS including the
  * joining spaces (a bigram's length is lenA + 1 + lenB — gram identity
  * via token identity, which equals joined-string identity because
  * tokens cannot contain the join character). `top_word`/`top_bigram`
  * are max(count·len) over distinct 1-/2-grams; `dup_trigram` sums
  * count·len over 3-grams with count >= 2. Products are computed in
  * LONG (the old int arithmetic could only differ by overflowing first,
  * which no real document reaches). Rows with fewer than 3 tokens
  * report 0 for gram stats that do not exist — callers drop them, as
  * before.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_word", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("dup_trigram", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = RepetitionStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  /** One pass over the UTF-8 bytes. Tokens are split on the single
    * space byte 0x20 (never a UTF-8 continuation byte, so this is
    * code-point-safe); lengths count code points (every byte that is
    * not a continuation byte), matching Spark's `length` and DuckDB's
    * `len`. Gram maps key on interned ids packed into longs: token ids
    * intern per distinct byte sequence; a bigram keys (idA << 32 | idB)
    * and also interns its own id, so a trigram keys
    * (bigramId(i, i+1) << 32 | id(i+2)) — exact identity, no string
    * building, no collision risk.
    */
  def compute(s: UTF8String): InternalRow = {
    val nb = s.numBytes()
    // token spans as byte offsets + code-point length per token
    var tokStart = new Array[Int](16)
    var tokEnd = new Array[Int](16)
    var tokCp = new Array[Int](16)
    var nTok = 0
    var i = 0
    var st = -1
    var cp = 0
    while (i <= nb) {
      val isSep = i == nb || s.getByte(i) == ' '
      if (isSep) {
        if (st >= 0) {
          if (nTok == tokStart.length) {
            tokStart = java.util.Arrays.copyOf(tokStart, nTok * 2)
            tokEnd = java.util.Arrays.copyOf(tokEnd, nTok * 2)
            tokCp = java.util.Arrays.copyOf(tokCp, nTok * 2)
          }
          tokStart(nTok) = st; tokEnd(nTok) = i; tokCp(nTok) = cp
          nTok += 1
          st = -1; cp = 0
        }
      } else {
        if (st < 0) st = i
        if ((s.getByte(i) & 0xc0) != 0x80) cp += 1
      }
      i += 1
    }
    // intern tokens -> ids; per-id count and code-point length
    val tokIdOf = new java.util.HashMap[UTF8String, Integer](nTok * 2)
    val ids = new Array[Int](nTok)
    val cnt = new Array[Long](math.max(16, nTok))
    val len = new Array[Int](math.max(16, nTok))
    var t = 0
    while (t < nTok) {
      val lenB = tokEnd(t) - tokStart(t)
      val arr = new Array[Byte](lenB)
      org.apache.spark.unsafe.Platform.copyMemory(
        s.getBaseObject, s.getBaseOffset + tokStart(t),
        arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, lenB)
      val tok = UTF8String.fromBytes(arr)
      val boxed = tokIdOf.get(tok)
      val id =
        if (boxed == null) {
          val nid = tokIdOf.size()
          tokIdOf.put(tok, nid)
          len(nid) = tokCp(t)
          nid
        } else boxed.intValue()
      ids(t) = id
      cnt(id) += 1
      t += 1
    }
    val nDistinct = tokIdOf.size()
    var w1 = 0L
    var d = 0
    while (d < nDistinct) { val v = cnt(d) * len(d); if (v > w1) w1 = v; d += 1 }
    // bigrams: key (idA << 32 | idB) -> (count, own id, cp length)
    var w2 = 0L
    var d3 = 0L
    if (nTok >= 2) {
      val bi = new java.util.HashMap[java.lang.Long, Array[Long]](nTok * 2)
      val biIds = new Array[Int](nTok - 1)
      var j = 0
      while (j < nTok - 1) {
        val key: java.lang.Long = (ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL)
        var rec = bi.get(key)
        if (rec == null) {
          rec = Array(0L, bi.size().toLong, len(ids(j)).toLong + 1 + len(ids(j + 1)))
          bi.put(key, rec)
        }
        rec(0) += 1
        biIds(j) = rec(1).toInt
        j += 1
      }
      val bit = bi.values().iterator()
      while (bit.hasNext) {
        val r = bit.next(); val v = r(0) * r(2); if (v > w2) w2 = v
      }
      // trigrams: key (bigramId(i, i+1) << 32 | id(i+2)) -> (count, cp length)
      if (nTok >= 3) {
        val tri = new java.util.HashMap[java.lang.Long, Array[Long]](nTok * 2)
        var k = 0
        while (k < nTok - 2) {
          val key: java.lang.Long = (biIds(k).toLong << 32) | (ids(k + 2).toLong & 0xffffffffL)
          var rec = tri.get(key)
          if (rec == null) {
            rec = Array(0L,
              len(ids(k)).toLong + 1 + len(ids(k + 1)) + 1 + len(ids(k + 2)))
            tri.put(key, rec)
          }
          rec(0) += 1
          k += 1
        }
        val tit = tri.values().iterator()
        while (tit.hasNext) {
          val r = tit.next(); if (r(0) >= 2) d3 += r(0) * r(1)
        }
      }
    }
    new GenericInternalRow(Array[Any](nTok.toLong, nDistinct.toLong, w1, w2, d3))
  }
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: struct of (n_chars, punct_ratio, stopword_ratio, quality). */
  def text_stats(text: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text)))

  /** Column API: one-pass repetition-signal kernel over normalized text. */
  def repetition_stats(norm: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(norm)))

  /** Column API: one-pass lowercase + whitespace-collapse + trim. */
  def normalize_ws(text: Column): Column =
    ColumnBridge.column(NormalizeWs(ColumnBridge.expression(text)))

  /** Column API: single-pass rolling (polynomial) fingerprint. */
  def rolling_hash64(text: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(text)))

  /** Column API: count of tokens outside a fixed vocabulary. */
  def oov_count(tokens: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      OovCount(ColumnBridge.expression(tokens), vocab.toArray))

  /** Column API: greedy subword segmentation against a learned vocab. */
  def subword_split(word: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    ColumnBridge.column(
      SubwordSplit(ColumnBridge.expression(word), vocab.toArray, maxPieceLen))

  /** Column API: Jaro-Winkler similarity in [0, 1] (DuckDB-compatible). */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b), winkler = true))

  /** Column API: plain Jaro similarity (no prefix boost). */
  def jaro(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b), winkler = false))
}
