package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the token-array kernels that every
  * text-analysis query shares.
  *
  * Why native: the higher-order-function forms (`filter(toks, t ->
  * array_contains(set, t))`, `aggregate(toks, 0L, ...)`) are
  * CodegenFallback — they force the surrounding stage into per-row
  * interpreted expression eval. On the shared tokenize kernel that
  * interpreted path profiled as a 33 s single task (vs ~1 s compiled) in
  * bench context, and whether HotSpot keeps the interpreter loops hot is
  * not under our control. These expressions generate a plain Java loop
  * (or one static-helper call), which stays inside whole-stage codegen
  * with no slow path.
  */

/** Count of elements of `child` (an array<string>, WITH multiplicity)
  * contained in the foldable literal string-array `words` — the kernel of
  * stopword ratios and marker-voting language-ID. Semantics identical to
  * `size(filter(child, t -> array_contains(words, t)))`.
  */
case class CountInSet(child: Expression, words: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = words
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, words.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) if words.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable array<string>), got " +
        s"(${child.dataType.simpleString}, ${words.dataType.simpleString})")
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = words.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, unused: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $c = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, words = newRight)
}

object TextExprHelpers {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val tokenSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Distinct word n-gram shingles of `text` (first-occurrence order):
    * lowercase → split on non-alphanumeric runs → drop empties → join each
    * n-token window with single spaces → dedup. Token semantics are
    * byte-identical to `array_remove(split(lower(text), "[^a-z0-9]+"),
    * "")` (= [[graft.functions.TextFunctions.tokens]]) and the shingle
    * list to `TextFunctions`-based wordShingles — one codegen'd call per
    * document instead of a window+lead+distinct pipeline (two shuffles)
    * or a CodegenFallback HOF chain.
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val raw = tokenSplit.split(text.toLowerCase.toString, -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) { raw(nTok) = raw(i); nTok += 1 }; i += 1 }
    if (nTok < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[String]((nTok - n + 1) * 2)
    i = 0
    while (i <= nTok - n) {
      val sb = new java.lang.StringBuilder(raw(i))
      var j = 1
      while (j < n) { sb.append(' ').append(raw(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Winnowing fingerprints (the MOSS local-fingerprint scheme): positional
    * word n-gram 31-bit hashes (first 4 md5 digest bytes unsigned, mod
    * 2³¹−1 — the same arithmetic as [[graft.ops.Dedup.baseHash]] and its
    * DuckDB mirror), then the minimum of every sliding window of `w`
    * consecutive hashes, deduped in first-occurrence order. Guarantees any
    * shared token run of ≥ n+w−1 tokens yields a shared fingerprint —
    * local fingerprints catch PARTIAL overlap (a copied paragraph inside
    * an otherwise-different document) that whole-document sketches miss.
    * Documents with fewer than `n` tokens fingerprint to an empty array;
    * fewer than `w` windows degrade to one window over all hashes.
    */
  def winnowFps(text: UTF8String, n: Int, w: Int): ArrayData = {
    val raw = tokenSplit.split(text.toLowerCase.toString, -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) { raw(nTok) = raw(i); nTok += 1 }; i += 1 }
    if (nTok < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val nGrams = nTok - n + 1
    val md = mdPool.get()
    val hashes = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder(raw(i))
      var j = 1
      while (j < n) { sb.append(' ').append(raw(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      hashes(i) = u % 2147483647L
      i += 1
    }
    val nWins = math.max(1, nGrams - w + 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nWins * 2)
    var j = 0
    while (j < nWins) {
      var m = hashes(j)
      var x = j + 1
      val end = math.min(j + w, nGrams)
      while (x < end) { if (hashes(x) < m) m = hashes(x); x += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** NFC-normalize (see [[NfcNormalize]]). Fast path: `Normalizer
    * .isNormalized` is O(n) with no allocation, and real-world corpora
    * are overwhelmingly already NFC.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** 16-bit SimHash over word tokens (with multiplicity): h(tok) = first
    * 4 hex chars of md5(tok) as an int (= first 2 digest bytes,
    * big-endian); bit j of the sketch is 1 iff 2·(#tokens with bit j
    * set) > #tokens. Byte-identical to the array-expression
    * [[graft.ops.Dedup.simhash16]] and the DuckDB oracle, but ONE
    * codegen'd call per document — no token explode, no 16-sum aggregate,
    * no shuffle: the sketch becomes a pure map, which is the only shape
    * that matters at corpus scale.
    */
  def simhash16(text: UTF8String): Int = {
    val raw = tokenSplit.split(text.toLowerCase.toString, -1)
    val ones = new Array[Int](16)
    var nTok = 0
    val md = mdPool.get()
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        nTok += 1
        md.reset()
        val d = md.digest(raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var j = 0
        while (j < 16) { if ((h & (1 << j)) != 0) ones(j) += 1; j += 1 }
      }
      i += 1
    }
    var sk = 0
    var j = 0
    while (j < 16) { if (2 * ones(j) > nTok) sk |= 1 << j; j += 1 }
    sk
  }

  /** Hashing-trick embedding (see [[HashedEmbed]]): bucket = first 8 md5
    * hex chars (bytes 0–3, unsigned) mod dim; sign = parity of the 9th
    * hex char (high nibble of byte 4), even → +1 — byte-for-byte the
    * values `conv(substring(md5(t), 1, 8), 16, 10) % dim` and
    * `conv(substring(md5(t), 9, 1), 16, 10) % 2` yield. Norm and divide
    * in double from exact LONG counts, truncate to float32 — the same
    * IEEE op order the DuckDB oracle replays.
    */
  def hashedEmbed(text: UTF8String, dim: Int): ArrayData = {
    val raw = tokenSplit.split(text.toLowerCase.toString, -1)
    val c = new Array[Long](dim)
    val md = mdPool.get()
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        md.reset()
        val d = md.digest(raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = (hi % dim).toInt
        c(b) += (if (((d(4) >>> 4) & 1) == 0) 1L else -1L)
      }
      i += 1
    }
    var ss = 0L
    var j = 0
    while (j < dim) { ss += c(j) * c(j); j += 1 }
    val out = new Array[Any](dim)
    if (ss == 0L) {
      j = 0; while (j < dim) { out(j) = 0f; j += 1 }
    } else {
      val nrm = math.sqrt(ss.toDouble)
      j = 0; while (j < dim) { out(j) = (c(j) / nrm).toFloat; j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** acc = (acc·31 + h) mod 2⁴⁰ over tokens, h = first 15 hex chars of
    * md5(tok) as an integer (= top 60 bits of the digest) mod 2⁴⁰ —
    * byte-for-byte the value `conv(substring(md5(t),1,15),16,10)` yields.
    * Returns -1 to signal a null element (caller emits SQL NULL, matching
    * the HOF fold's null propagation).
    */
  def rollingHash(arr: ArrayData, mod: Long): Long = {
    val md = mdPool.get()
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return -1L
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var be = 0L
      var j = 0
      while (j < 8) { be = (be << 8) | (d(j) & 0xffL); j += 1 }
      acc = (acc * 31 + ((be >>> 4) % mod)) % mod
      i += 1
    }
    acc
  }
}

/** 16-bit SimHash sketch (see [[TextExprHelpers.simhash16]]). */
case class Simhash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    TextExprHelpers.simhash16(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expr.TextExprHelpers.simhash16($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles (see [[TextExprHelpers.wordShingles]]).
  * `n` must be a foldable positive integer.
  */
case class WordShingles(child: Expression, n: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = n
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, n.dataType) match {
    case (StringType, IntegerType) if n.foldable => TypeCheckResult.TypeCheckSuccess
    case (c, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got (${c.simpleString}, ${r.simpleString})")
  }

  @transient private lazy val nVal: Int = n.eval(null).asInstanceOf[Number].intValue()

  override def nullSafeEval(t: Any, unused: Any): Any =
    TextExprHelpers.wordShingles(t.asInstanceOf[UTF8String], nVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expr.TextExprHelpers.wordShingles($t, $nVal);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, n = newRight)
}

/** Rolling polynomial token hash mod 2⁴⁰ (see [[TextExprHelpers.rollingHash]])
  * — the order-sensitive document fingerprint. Identical to the
  * `aggregate(tokens, 0L, (acc, t) -> (acc*31 + h(t)) % M)` HOF form.
  */
case class RollingTokenHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  private val mod: Long = 1L << 40

  override def nullSafeEval(a: Any): Any = {
    val r = TextExprHelpers.rollingHash(a.asInstanceOf[ArrayData], mod)
    if (r < 0) null else r
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.expr.TextExprHelpers.rollingHash($a, ${mod}L);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (see [[TextExprHelpers.winnowFps]]). `n` and
  * `w` must be foldable positive integers.
  */
case class WinnowFps(child: Expression, n: Expression, w: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = child
  override def second: Expression = n
  override def third: Expression = w
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, n.dataType, w.dataType) match {
      case (StringType, IntegerType, IntegerType) if n.foldable && w.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (c, a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int, foldable int), " +
          s"got (${c.simpleString}, ${a.simpleString}, ${b.simpleString})")
    }

  @transient private lazy val nVal: Int = n.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val wVal: Int = w.eval(null).asInstanceOf[Number].intValue()

  override def nullSafeEval(t: Any, unused1: Any, unused2: Any): Any =
    TextExprHelpers.winnowFps(t.asInstanceOf[UTF8String], nVal, wVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = graft.expr.TextExprHelpers.winnowFps($t, $nVal, $wVal);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(child = newFirst, n = newSecond, w = newThird)
}

/** Unicode NFC normalization (`java.text.Normalizer`) — the corpus
  * canonicalization step of a multilingual pipeline: decomposed
  * sequences (`e` + U+0301) fold to their composed forms (`é`), so
  * fingerprints, dedup and tokenization see one byte sequence per
  * grapheme. Codegen'd static call; DuckDB's independent
  * `nfc_normalize` implements the same Unicode tables, which makes the
  * operator oracle-checkable byte-for-byte.
  */
/** Hashing-trick text embedding kernel (the whole-document form of
  * [[graft.ops.Similarity.embedText]] — see its scaladoc for the
  * algorithm and the engine-parity contract): tokenize, md5-bucket each
  * token with a ±1 sign hash, accumulate exact LONG counts, L2-normalize
  * in double, emit `array<float>`. One codegen'd call per document — the
  * nested-HOF form (transform·aggregate over a (bucket, sign) struct
  * array) is CodegenFallback and measured ~17 ms/doc interpreted; this
  * loop is the same md5-per-token cost as [[Simhash16]]. `dim` must be a
  * foldable positive int.
  */
case class HashedEmbed(child: Expression, dim: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = dim
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, dim.dataType) match {
    case (StringType, IntegerType) if dim.foldable => TypeCheckResult.TypeCheckSuccess
    case (c, d) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got (${c.simpleString}, ${d.simpleString})")
  }

  @transient private lazy val dimVal: Int = dim.eval(null).asInstanceOf[Number].intValue()

  override def nullSafeEval(t: Any, unused: Any): Any =
    TextExprHelpers.hashedEmbed(t.asInstanceOf[UTF8String], dimVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expr.TextExprHelpers.hashedEmbed($t, $dimVal);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, dim = newRight)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextExprHelpers.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.TextExprHelpers.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
