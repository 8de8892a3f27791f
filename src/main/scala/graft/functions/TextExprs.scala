package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the native text-hash expressions. Top-level object
  * ⇒ scalac emits static forwarders, so generated Java can call
  * `graft.functions.MinHashUtil.compute(...)` directly inside whole-stage
  * codegen — no interpreted higher-order functions, no row explosion.
  *
  * Every kernel is byte-equal to a documented SQL construction (the DuckDB
  * oracle runs that SQL), so swapping the declarative form for the native
  * one changes nothing observable but time.
  */
object MinHashUtil {

  private val Hex = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = Hex(b >>> 4)
      out(2 * i + 1) = Hex(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MinHash signature: `numHashes` 8-hex-char min-slices over the doc's
    * `width`-token shingle set; null if the doc has fewer than `width`
    * tokens (no shingles). Seed `s` reads hex chars [(s%4)*8, (s%4)*8+8)
    * of md5(shingle || '#'*(s/4)) — byte-equal to the SQL form
    * `min(substr(md5(sh || repeat('#', s//4)), (s%4)*8+1, 8))` with
    * tokens = split(text, ' ') and shingle = tok_i||' '||...||tok_{i+w-1}. */
  def compute(text: UTF8String, width: Int, numHashes: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < width) return null
    val nDigests = (numHashes + 3) / 4
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + width <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val baseLen = sb.length()
      var d = 0
      while (d < nDigests) {
        if (d > 0) sb.append('#') // suffix grows: '#'*d
        val hex = toHex(md.digest(
          sb.toString.getBytes(StandardCharsets.UTF_8)))
        var s = d * 4
        val end = math.min(s + 4, numHashes)
        while (s < end) {
          val off = (s % 4) * 8
          val slice = hex.substring(off, off + 8)
          if (mins(s) == null || slice.compareTo(mins(s)) < 0) mins(s) = slice
          s += 1
        }
        d += 1
      }
      sb.setLength(baseLen)
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): AnyRef))
  }
}

object WinnowUtil {

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): the DISTINCT
    * minima of every full `w`-window over the doc's `k`-token-gram hex8
    * keys, sorted ascending. Gram key = first 8 hex chars of md5(gram) as
    * a long in [0, 2³²) — byte-equal to the SQL form
    * `hex8(array_to_string(toks[i:i+k-1], ' '))` with
    * toks = split(text, ' '). Empty array when the doc has fewer than
    * k+w−1 tokens (no full window).
    *
    * One pass per row: grams hash into a longs buffer (the StringBuilder
    * reuse of [[MinHashUtil.compute]]), the sliding minimum walks it with
    * a monotone deque in O(m), minima dedup in a hash set. The gate's
    * former declarative form exploded gram×w rows and — after
    * CollapseProject pushed the shingle transform past the generators —
    * re-evaluated the interpreted zip per exploded row (the q158 probe
    * class, measured 40–90 s at sf0.1 vs sub-second here). */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - k + 1 // gram count
    if (m < w) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // sliding min via a monotone index deque
    val sel = new java.util.HashSet[Long]()
    val dq = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** Codegen'd per-row winnowing fingerprint set (see [[WinnowUtil.compute]]):
  * collapses a gram explode + window-id explode + per-window min aggregate
  * + distinct (two corpus-sized shuffles) into one projection. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WinnowUtil.compute(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowUtil.compute($c, $k, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

object SimHashUtil {

  /** SimHash fingerprint over whitespace tokens with the md5-nibble bit
    * source: bit b of token t = bit (b%4) of hex digit (b/4) of md5(t).
    * Signature bit b is set iff Σ_tokens (±1) > 0. Byte-equal to
    * [[graft.ops.Dedup.simhash]] with `bitOf = md5NibbleBit` (and to the
    * generated oracle SQL), computed in one per-row pass. */
  def compute(text: UTF8String, bits: Int): Long = {
    val toks = text.toString.split(" ", -1)
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val digest = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      var b = 0
      while (b < bits) {
        val nibble =
          if (b % 8 < 4) (digest(b / 8) >>> 4) & 0xf
          else digest(b / 8) & 0xf
        if (((nibble >>> (b % 4)) & 1) == 1) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Codegen'd per-row MinHash signature (see [[MinHashUtil.compute]]).
  * Replaces a 3-stage shuffle chain (posexplode → window-lead shingles →
  * 8-way min aggregate) with a single projection: at 100 TB the signature
  * step becomes embarrassingly parallel map work and the first shuffle of
  * the dedup pipeline is the (seed, mh) candidate join itself. */
case class MinHashSlicesExpr(child: Expression, shingleWidth: Int,
    numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_hash_slices expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    MinHashUtil.compute(t.asInstanceOf[UTF8String], shingleWidth, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashUtil.compute(
         |  $c, $shingleWidth, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlicesExpr =
    copy(child = newChild)
}

/** Codegen'd per-row SimHash (see [[SimHashUtil.compute]]): collapses the
  * explode + 60-conditional-sum aggregate into map work. */
case class SimHashMd5Expr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    SimHashUtil.compute(t.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashUtil.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

/** Codegen'd composite quality score — byte-equal to the declarative
  * `TextOps.qualityScoreDeclarative` (four banded 0/1 heuristics averaged;
  * same IEEE divisions), computed in one token pass instead of four
  * interpreted higher-order filters. */
case class TokenQualityExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_quality expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  def compute(text: UTF8String): Double = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val n = toks.length
    var stop = 0
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (stopSet.contains(t)) stop += 1
      distinct.add(t)
      i += 1
    }
    // length() counts codepoints (UTF8String.numChars), not UTF-16 units
    val chars = s.codePointCount(0, s.length)
    val lenOk = if (n >= 10 && n <= 100000) 1.0 else 0.0
    val sr = stop.toDouble / n
    val stopOk = if (sr >= 0.01 && sr <= 0.8) 1.0 else 0.0
    val ttrOk = if (distinct.size.toDouble / n > 0.05) 1.0 else 0.0
    val cpt = chars.toDouble / n
    val cptOk = if (cpt >= 2.0 && cpt <= 12.0) 1.0 else 0.0
    (lenOk + stopOk + ttrOk + cptOk) / 4.0
  }

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityExpr", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenQualityExpr =
    copy(child = newChild)
}

/** Codegen'd stopword-profile language ID — same tokenization (lowercase +
  * `[^\p{L}\p{N}]+` split, both via the same Java regex Spark's `split`
  * delegates to) and the same first-profile-wins tie-break as the
  * declarative `TextOps.langIdDeclarative`. */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  @transient private lazy val sets: Array[(String, java.util.HashSet[String])] =
    profiles.map { case (lang, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (lang, s)
    }.toArray

  @transient private lazy val splitter =
    java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  def compute(text: UTF8String): UTF8String = {
    // UTF8String.toLowerCase = Spark's lower(): locale-free simple mapping
    val toks = splitter.split(text.toLowerCase.toString, -1)
    var bestLang = sets(0)._1
    var bestScore = -1
    var p = 0
    while (p < sets.length) {
      val (lang, set) = sets(p)
      var score = 0
      var i = 0
      while (i < toks.length) {
        if (set.contains(toks(i))) score += 1
        i += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
      p += 1
    }
    UTF8String.fromString(bestLang)
  }

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Codegen'd md5-portable rolling fingerprint over a token array — same
  * fold as `TextOps.fingerprintMd5Declarative`: token hash = first 8 hex
  * chars of md5 as uint32 mod p, combine = (acc·1000003 + h) mod p,
  * p = 2^31−1; all values stay < 2^51, so the long arithmetic never
  * overflows (ANSI-safe). */
case class FingerprintMd5Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint_md5 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  // a null ELEMENT yields a null result (the declarative fold propagates
  // null through md5/arithmetic), so the result is nullable even when the
  // child column itself is not
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FingerprintUtil.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.FingerprintUtil.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): FingerprintMd5Expr =
    copy(child = newChild)
}

object FingerprintUtil {
  private val P = 2147483647L

  /** Null on a null array element — matches the declarative HOF fold,
    * where md5(null) poisons the accumulator to null (the input type
    * admits containsNull, so SQL users can feed such arrays). */
  def compute(toks: ArrayData): java.lang.Long = {
    val md = MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null) return null
      val d = md.digest(t.getBytes)
      // first 8 hex chars = first 4 digest bytes as unsigned 32-bit
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % P
      acc = (acc * 1000003L + h) % P
      i += 1
    }
    acc
  }

  /** Distinct word-n-gram shingles of a space-tokenized text, first-
    * occurrence order; empty array (not null) when the doc is shorter than
    * the shingle width — same contract as
    * `array_distinct(TextOps.shingles(tokenize(text), n))`. */
  def distinctShingles(text: UTF8String, width: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < width)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + width <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** [[distinctShingles]] with each shingle collapsed to its 64-bit XXH64
    * hash. Set cardinalities (and so Jaccard over the sets) are preserved
    * up to hash collisions — ~n²/2⁶⁵ per corpus, vanishing against any
    * practical tolerance — while `array_intersect`/`array_union` downstream
    * hash and compare 8-byte longs instead of multi-word strings, and the
    * shuffled arrays shrink ~5×. The verification pass of near-dup dedup is
    * exactly this set arithmetic over candidate pairs, so at 100 TB the
    * saving is the dominant term of the verify stage. */
  def distinctShingleHashes(text: UTF8String, width: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < width)
      return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + width <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)): Unit
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd hashed-shingle-set builder ([[FingerprintUtil.distinctShingleHashes]]):
  * the compute kernel of the exact-Jaccard verify pass. */
case class ShingleHashesExpr(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    FingerprintUtil.distinctShingleHashes(t.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintUtil.distinctShingleHashes($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Codegen'd distinct-shingle-set builder (see
  * [[FingerprintUtil.distinctShingles]]); feeds the exact-Jaccard verify
  * join without an interpreted per-element transform. */
case class DistinctShinglesExpr(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingles expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    FingerprintUtil.distinctShingles(t.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintUtil.distinctShingles($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShinglesExpr =
    copy(child = newChild)
}

object CharNgramUtil {
  /** Distinct character n-grams of `t`, first-occurrence order (order is
    * irrelevant downstream — consumers explode into joins/counts — but a
    * deterministic order keeps the kernel replayable). Char-positional
    * (UTF8String.substring is code-point-based), so the oracle's
    * `substr(text, i, n)` replays it exactly. */
  def distinctCharNgrams(t: UTF8String, n: Int): ArrayData = {
    val len = t.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      seen.add(t.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }
}

/** Codegen'd distinct character-n-gram builder — the posting kernel of
  * the trigram inverted index ([[graft.ops.NgramIndex]]). A declarative
  * `array_distinct(transform(sequence(...), substring))` computes the
  * same set but the higher-order function is interpreted per element;
  * this kernel is one static call inside whole-stage codegen. */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    CharNgramUtil.distinctCharNgrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramUtil.distinctCharNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object RepetitionUtil {

  /** Gopher-style repetition statistics over whitespace tokens, one pass:
    *  - `top_bigram_frac`: occurrences of the most frequent token bigram /
    *    total bigrams (null when the doc has < 2 tokens);
    *  - `dup_trigram_frac`: fraction of trigram occurrences that are
    *    repeats of an earlier trigram, i.e. (total − distinct) / total
    *    (null when < 3 tokens);
    *  - `max_run`: longest run of identical consecutive tokens (≥ 1).
    * All three derive from integer counts with a single final division, so
    * any engine computing the same counts produces bit-identical doubles —
    * which is what the q59 oracle does. */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val sb = new java.lang.StringBuilder()

    var topFrac: Any = null
    val nb = n - 1
    if (nb > 0) {
      val counts = new java.util.HashMap[String, Integer]()
      var best = 0
      var i = 0
      while (i < nb) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        val k = sb.toString
        val c = counts.getOrDefault(k, 0) + 1
        counts.put(k, c)
        if (c > best) best = c
        i += 1
      }
      topFrac = best.toDouble / nb
    }

    var dupFrac: Any = null
    val nt = n - 2
    if (nt > 0) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i < nt) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
          .append(toks(i + 2))
        seen.add(sb.toString): Unit
        i += 1
      }
      dupFrac = (nt - seen.size).toDouble / nt
    }

    var maxRun = 1L
    var run = 1L
    var i = 1
    while (i < n) {
      if (toks(i) == toks(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
      else run = 1
      i += 1
    }

    new GenericInternalRow(Array[Any](topFrac, dupFrac, maxRun))
  }
}

/** Codegen'd per-row repetition statistics ([[RepetitionUtil.compute]]) —
  * the repetition leg of Gopher-style quality filtering, as a single
  * projection (no explode, no shuffle: at 100 TB the filter is pure map
  * work). The q59 oracle rebuilds all three statistics relationally
  * (unnest + group for the bigram mode, list_distinct for trigrams, a
  * gaps-and-islands window for runs) and must hash-match. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("top_bigram_frac",
      org.apache.spark.sql.types.DoubleType, nullable = true),
    org.apache.spark.sql.types.StructField("dup_trigram_frac",
      org.apache.spark.sql.types.DoubleType, nullable = true),
    org.apache.spark.sql.types.StructField("max_run", LongType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    RepetitionUtil.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Codegen'd O(n) span-key array for [[graft.ops.SpanDedup]]: element i
  * (0-based) is a 64-bit hash key for the `span`-token window starting
  * at token i, with the guarantee that IDENTICAL token windows map to
  * identical keys. Rolling polynomial hash over per-token FNV-1a with an
  * fmix64 finalizer: the whole array costs O(n) long multiplies — the
  * window TEXT is never materialized (vs O(n · span) bytes of
  * window-string construction + a string hash per window), which is the
  * dominant cost of the naive gram stream. Distinct windows collide with
  * probability ~n²/2⁶⁵ per corpus — the [[FingerprintUtil
  * .distinctShingleHashes]] argument: vanishing against any practical
  * tolerance, and the q79 gate hash-matches its oracle across this
  * substitution at both gated scale factors. Empty array when the doc
  * holds fewer than `span` tokens; null token elements hash as empty
  * strings (a null key would silently drop the window from the dup
  * stream). */
case class SpanKeysExpr(child: Expression, span: Int)
    extends UnaryExpression {
  require(span >= 1, "span must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_keys expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    SpanKeysUtil.compute(a.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SpanKeysUtil.compute($c, $span);
    """)

  override protected def withNewChildInternal(newChild: Expression): SpanKeysExpr =
    copy(child = newChild)
}

object SpanKeysUtil {
  // odd multiplier (golden-ratio) for the rolling polynomial; fmix64
  // finalizer decorrelates the low bits (the bucket reduction downstream
  // is a modulus, so low-bit quality matters)
  private val B = 0x9E3779B97F4A7C15L | 1L

  private def fnv1a(t: UTF8String): Long = {
    if (t == null) return 0xcbf29ce484222325L
    val bytes = t.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def compute(toks: ArrayData, span: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - span + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv1a(toks.getUTF8String(i)); i += 1 }
    // bs1 = B^(span-1) mod 2^64 for the rolling subtraction
    var bs1 = 1L
    i = 1
    while (i < span) { bs1 *= B; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < span) { h = h * B + th(i); i += 1 }
    out(0) = fmix64(h)
    i = 1
    while (i < m) {
      h = (h - th(i - 1) * bs1) * B + th(i + span - 1)
      out(i) = fmix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-row top token multiplicity — the repetition-cap signal
  * of the q142 Gopher rules as a single projection. Replaces the
  * `array_sort` + sequential-fold HOF form (interpreted lambda per
  * element, O(n log n) per row, intermediate array) with ONE static
  * O(n) hash pass that never leaves codegen. Token semantics match
  * `split(text, ' ')` exactly — single-space separators, leading/
  * trailing/internal empty tokens counted — so the substitution is a
  * semantic identity and the q142 oracle hash-matches across it. */
case class TopTokenFreqExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_token_freq expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    TopTokenFreqUtil.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopTokenFreqUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenFreqExpr =
    copy(child = newChild)
}

/** Codegen'd Jaro–Winkler similarity (Winkler 1990) — the record-linkage
  * scorer for SHORT keys (names, titles, codes) where Levenshtein's unit
  * edit costs over-penalize transpositions. Standard semantics, verified
  * byte-for-byte against DuckDB's `jaro_winkler_similarity` (the oracle):
  * match window ⌊max(|a|,|b|)/2⌋−1, half-transposition count, and the
  * prefix boost `j + ℓ·0.1·(1−j)` (ℓ ≤ 4) applied ONLY when jaro > 0.7.
  * Byte-level over the UTF-8 encoding — identical to character-level on
  * ASCII keys, the documented contract (the blocking keys this engine
  * scores are ASCII title prefixes). */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got $other")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerUtil {
  /** Jaro similarity over byte arrays; one boolean scratch pass, O(|a|·w)
    * worst case with w the match window — strings here are bounded keys,
    * never documents.
    *
    * Empty-string edge, verified against the oracle build (DuckDB 1.0.0):
    * `jaro_winkler_similarity('','')` returns 0.0 there — NOT the 1.0 some
    * rapidfuzz-derived implementations use — so this function returns 0.0
    * for empty-vs-empty to keep byte-for-byte parity on ALL inputs, not
    * just the non-empty keys the current gates score (JaroWinklerSpec pins
    * the edge). */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    if (java.util.Arrays.equals(a, b)) return if (a.length == 0) 0.0 else 1.0
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && b(j) == a(i)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object TopTokenFreqUtil {
  /** Max multiplicity over `split(s, ' ')` tokens (empties included),
    * computed directly on the UTF-8 bytes: 0x20 never occurs inside a
    * multi-byte sequence, so byte-level splitting is identical to
    * splitting the decoded string at ' ', and [[UTF8String]] equality is
    * byte equality — no String decode, no per-token char[] copy. Token
    * keys are zero-copy [[UTF8String]] views over the row's byte array
    * (`fromBytes(base, off, len)` wraps, never copies); the only
    * allocations are the view headers and one int[1] cell per DISTINCT
    * token. One pass, no sort. */
  def compute(t: UTF8String): Long = {
    val bytes = t.getBytes // the backing array itself when array-aligned
    val n = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var best = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        var cell = counts.get(tok)
        if (cell == null) { cell = new Array[Int](1); counts.put(tok, cell) }
        cell(0) += 1
        if (cell(0) > best) best = cell(0)
        start = i + 1
      }
      i += 1
    }
    best.toLong
  }
}

object TextFunctions {

  /** Per-row top token multiplicity (see [[TopTokenFreqExpr]]). */
  def top_token_freq(text: Column): Column =
    Bridge.column(TopTokenFreqExpr(Bridge.expression(text)))

  /** Pairwise Jaro–Winkler similarity (see [[JaroWinklerExpr]]). */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Per-row 64-bit span-key array (see [[SpanKeysExpr]]). */
  def span_keys(toks: Column, span: Int): Column =
    Bridge.column(SpanKeysExpr(Bridge.expression(toks), span))

  /** Per-row MinHash signature array (numHashes 8-hex-char slices). */
  def min_hash_slices(text: Column, shingleWidth: Int, numHashes: Int): Column =
    Bridge.column(MinHashSlicesExpr(Bridge.expression(text), shingleWidth, numHashes))

  /** Per-row md5-nibble SimHash fingerprint. */
  def simhash_md5(text: Column, bits: Int): Column =
    Bridge.column(SimHashMd5Expr(Bridge.expression(text), bits))

  /** Per-row winnowing fingerprint set (distinct w-window minima of
    * k-gram hex8 keys, sorted). */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprintsExpr(Bridge.expression(text), k, w))

  /** Per-row composite quality score in [0,1]. */
  def token_quality(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenQualityExpr(Bridge.expression(text), stopwords))

  /** Per-row stopword-profile language ID. */
  def lang_id(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangIdExpr(Bridge.expression(text), profiles))

  /** Per-row md5-portable rolling fingerprint of a token array. */
  def fingerprint_md5(toks: Column): Column =
    Bridge.column(FingerprintMd5Expr(Bridge.expression(toks)))

  /** Per-row distinct shingle set. */
  def distinct_shingles(text: Column, width: Int): Column =
    Bridge.column(DistinctShinglesExpr(Bridge.expression(text), width))

  /** Per-row distinct character n-gram set (trigram-index kernel). */
  def char_ngrams(text: Column, n: Int): Column =
    Bridge.column(CharNgramsExpr(Bridge.expression(text), n))

  /** Per-row repetition statistics struct (top-bigram fraction, duplicate-
    * trigram fraction, longest identical-token run). */
  def repetition_stats(text: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text)))

  /** Per-row distinct shingle XXH64 hash set (longs, not strings): the
    * compute kernel of the fast MinHash path and hash-based verify. */
  def shingle_hashes(text: Column, width: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(text), width))

  /** Misra-Gries heavy-hitters AGGREGATE: ≤ k (item, est) entries plus the
    * exact processed count, per group — `df.groupBy(g).agg(heavy_hitters
    * (col, k))`. See [[HeavyHittersSketch]] for the theorem bounds. */
  def heavy_hitters(c: Column, k: Int): Column =
    Bridge.column(
      HeavyHittersSketch(Bridge.expression(c), k).toAggregateExpression())

  /** The SQL-facing builder table — single source of truth shared by
    * [[register]] (temp functions on a live session) and
    * [[graft.GraftExtensions]] (session-build injection), so the two
    * registration paths can never drift. */
  private[graft] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    Seq(
      "min_hash_slices" -> (es => MinHashSlicesExpr(es(0), intArg(es(1)), intArg(es(2)))),
      "simhash_md5" -> (es => SimHashMd5Expr(es(0), intArg(es(1)))),
      "winnow_fingerprints" -> (es => WinnowFingerprintsExpr(es(0), intArg(es(1)), intArg(es(2)))),
      // SQL forms use the default English stopword profile / profile table
      "token_quality" -> (es => TokenQualityExpr(es(0), graft.ops.TextOps.langProfiles.head._2)),
      "lang_id" -> (es => LangIdExpr(es(0), graft.ops.TextOps.langProfiles)),
      "fingerprint_md5" -> (es => FingerprintMd5Expr(es(0))),
      "distinct_shingles" -> (es => DistinctShinglesExpr(es(0), intArg(es(1)))),
      "char_ngrams" -> (es => CharNgramsExpr(es(0), intArg(es(1)))),
      "shingle_hashes" -> (es => ShingleHashesExpr(es(0), intArg(es(1)))),
      "span_keys" -> (es => SpanKeysExpr(es(0), intArg(es(1)))),
      "repetition_stats" -> (es => RepetitionStatsExpr(es(0))),
      "top_token_freq" -> (es => TopTokenFreqExpr(es(0))),
      "jaro_winkler" -> (es => JaroWinklerExpr(es(0), es(1))),
      // aggregate, not scalar: the analyzer wraps the bare AggregateFunction
      // in an AggregateExpression at resolution, so GROUP BY ... in SQL works
      "graft_heavy_hitters" -> (es => HeavyHittersSketch(es(0), intArg(es(1)))))
  }

  /** Register SQL-facing names on a live session. */
  def register(spark: SparkSession): Unit =
    sqlBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
