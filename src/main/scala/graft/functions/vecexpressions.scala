package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers callable from generated code. All of these are
  * value-identical replacements for higher-order-function expression
  * trees (`aggregate(zip_with(...))`) that Spark evaluates interpreted,
  * element by element, outside whole-stage codegen: same element
  * order, same double-precision sequence, same null/length semantics —
  * so swapping them in cannot move a single oracle hash.
  */
object VecOps {

  /** Σ a_i · b_i in doubles, sequential from index 0 — exactly
    * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`.
    * zip_with pads the shorter array with nulls and `null * x` poisons
    * the fold, so a length mismatch or any null element yields null
    * (boxed); callers map the boxed null to the expression's null flag.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ a_i · w_i against a driver-side constant weight vector —
    * exactly `aggregate(zip_with(a, typedLit(w), ...), 0.0, +)`.
    */
  def dotLit(a: ArrayData, w: Array[Double], aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (w.length != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * w(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Driver-side mirror of [[dot]](a, a): Σ v_i² folded left-to-right —
    * used to constant-fold the norm of a literal vector into the plan.
    */
  def normOf(v: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    math.sqrt(acc)
  }

  /** Σ unsigned byte values of `bytes[off .. off+len-1]` (0-based):
    * 0 when `len <= 0`, NULL when the range leaves the payload —
    * exactly the `aggregate(sequence(1, len), 0, (acc, i) -> acc +
    * conv(hex(substring(bin, off+i, 1)), 16, 10))` fold the audio/video
    * decoders started with (substring past the end yields empty,
    * conv(hex('')) is null, and null poisons the fold — a truncated
    * payload reads as null, not a partial sum), but one codegen'd pass
    * instead of an interpreted per-byte expression tree. `off` must be
    * non-negative (1-based substring addressing never goes below the
    * payload start in the decoders).
    */
  def byteSumRange(bytes: Array[Byte], off: Long, len: Long): java.lang.Long = {
    if (len <= 0) return java.lang.Long.valueOf(0L)
    if (off < 0 || off + len > bytes.length) return null
    var acc = 0L
    var i = off
    val end = off + len
    while (i < end) { acc += (bytes(i.toInt) & 0xff); i += 1 }
    java.lang.Long.valueOf(acc)
  }

  /** The audio energy-hash kernel: slice `bytes[off .. off+len-1]`
    * into `windows` contiguous windows (boundaries len·w div windows —
    * the 1-D nearest-neighbor index mapping), then emit windows-1
    * '0'/'1' chars where bit w compares mean(window w+1) vs
    * mean(window w) as exact cross-multiplied integer sums. ONE pass
    * over the range; NULL when the range leaves the payload or is
    * empty (the byteSumRange contract). A 65-window hash as 130
    * separate byteSumRange expressions measured ~2 ms/row interpreted
    * (the composed tree is too large for codegen) — this kernel is
    * that hash as one codegen'd call.
    */
  def energyHashBits(bytes: Array[Byte], off: Long, len: Long,
      windows: Int): UTF8String = {
    if (len < 1 || off < 0 || off + len > bytes.length) return null
    val sums = new Array[Long](windows)
    val lens = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val lo = off + len * w / windows
      val hi = off + len * (w + 1) / windows
      var acc = 0L
      var i = lo
      while (i < hi) { acc += (bytes(i.toInt) & 0xff); i += 1 }
      sums(w) = acc
      lens(w) = hi - lo
      w += 1
    }
    val sb = new java.lang.StringBuilder(windows - 1)
    w = 0
    while (w < windows - 1) {
      sb.append(if (sums(w + 1) * lens(w) > sums(w) * lens(w + 1)) '1'
        else '0')
      w += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Rabin-Karp polynomial rolling hash over the first
    * `min(numChars, pows.length)` characters:
    * `(Σ codepoint(c_i) · pows(i-1)) % mod`, exact 64-bit arithmetic.
    * Character i is the i-th code point (what `substr(text, i, 1)`
    * addresses) and its value is what Spark's `ascii` returns for that
    * one-char string — the full code point, verified against the HOF
    * formulation in VecExprSpec.
    */
  def rollingHash(s: UTF8String, pows: Array[Long], mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0 // code-point index
    var off = 0 // char (UTF-16 unit) offset
    val end = str.length
    while (off < end && i < pows.length) {
      val cp = str.codePointAt(off)
      acc += cp.toLong * pows(i)
      off += Character.charCount(cp)
      i += 1
    }
    acc % mod
  }

  /** Distinct-code-point counts in ascending code-point order, plus
    * the total length — the shared single pass behind [[charEntropy]]
    * and [[distinctChars]]. Code points (not UTF-16 units), so
    * multibyte text counts whole characters, matching per-character
    * `substr` addressing in any engine.
    */
  private def codePointCounts(str: String): java.util.TreeMap[Integer, Long] = {
    val counts = new java.util.TreeMap[Integer, Long]()
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      val k: Integer = cp
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1L else prev + 1L)
      off += Character.charCount(cp)
    }
    counts
  }

  /** Shannon character entropy in nats: −Σ (k/n)·ln(k/n) over distinct
    * code points, folded in ASCENDING code-point order — the same
    * summation sequence as the `array_sort(array_distinct(chars))`
    * higher-order formulation and the oracle's list_sort'ed fold
    * (single-char UTF-8 byte order == code-point order), so swapping
    * this in moves no oracle hash. Empty string → positive 0.0; a
    * constant string's 0-sum also returns +0.0, never −0.0. One
    * O(len + d) pass instead of the HOF tree's O(len²) per-position
    * substr + O(len·d) interpreted filter.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = codePointCounts(str)
    var n = 0L
    val it0 = counts.values().iterator()
    while (it0.hasNext) n += it0.next()
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * math.log(p)
    }
    if (acc == 0.0) 0.0 else -acc
  }

  /** Distinct code points of `s` — the alphabet-size companion of
    * [[charEntropy]]. */
  def distinctChars(s: UTF8String): Long = codePointCounts(s.toString).size()

  /** Winnowing selections (Schleimer et al. SIGMOD'03) over word
    * k-grams of `s`, encoded `(pos+1)·2³² + hash32` with hash32 the
    * first 8 md5 hex digits of the gram (== the first 4 digest bytes
    * big-endian, matching `conv(substring(md5(gram), 1, 8), 16, 10)`
    * and the oracle's hex-digit sum). Tokenization is `split(" ", -1)`
    * — Spark's `split(text, " ")` semantics, empties kept — and grams
    * join with single spaces, the shingle convention. Rightmost
    * minimum per w-window via a left-to-right `<=` scan; selections
    * deduped in first-occurrence order. One O(tokens·w) pass per row —
    * the higher-order-function formulation this replaces was inlined
    * by projection collapse into O(windows · w · tokens) md5
    * evaluations per row (an uninterruptible ~30 min single task on
    * the sf0.1 base corpus).
    */
  def winnowArray(s: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - (k - 1)
    if (m < w) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    val nw = m - w + 1
    while (j < nw) {
      var minv = java.lang.Long.MAX_VALUE
      var pos = -1
      var p = j
      while (p < j + w) {
        if (h(p) <= minv) { minv = h(p); pos = p }
        p += 1
      }
      out.add((pos + 1).toLong * 4294967296L + minv)
      j += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd dot product of two array<float|double> columns. */
case class ArrayDotCols(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not a fixed local: two of these expressions in one
      // codegen scope would otherwise redeclare the same variable and
      // silently drop the WHOLE projection to interpreter mode
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.VecOps.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotCols =
    copy(l, r)
}

/** Codegen'd dot product of an array column against constant weights
  * (LSH hyperplanes, IVF centroids). Foldable when the child is, so
  * Catalyst constant-folds centroid-vs-centroid arithmetic away.
  */
case class ArrayDotLit(child: Expression, weights: Array[Double]) extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(a: Any): Any =
    VecOps.dotLit(a.asInstanceOf[ArrayData], weights, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("dotLitRes")
      s"""
         |java.lang.Double $r = graft.functions.VecOps.dotLit($a, $w, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }
  // weights participate in equality/semanticHash via the case-class
  // field, but Array equality is reference-based — compare contents so
  // two lexically-identical plans dedupe correctly
  override def equals(o: Any): Boolean = o match {
    case ArrayDotLit(c, w) => c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
  override protected def withNewChildInternal(c: Expression): ArrayDotLit =
    copy(child = c)
}

/** Codegen'd Rabin-Karp rolling hash (TextAnalysis constants). */
case class RollingHashExpr(child: Expression, pows: Array[Long], mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.rollingHash(v.asInstanceOf[UTF8String], pows, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pows", pows, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.rollingHash($c, $p, ${mod}L)")
  }
  override def equals(o: Any): Boolean = o match {
    case RollingHashExpr(c, p, m) =>
      c == child && m == mod && java.util.Arrays.equals(p, pows)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.lang.Long.hashCode(mod)) +
      java.util.Arrays.hashCode(pows)
  override protected def withNewChildInternal(c: Expression): RollingHashExpr =
    copy(child = c)
}

/** Codegen'd Shannon character entropy (nats, ascending-code-point
  * fold — see VecOps.charEntropy). */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    VecOps.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.charEntropy($c)")
  override protected def withNewChildInternal(c: Expression): CharEntropyExpr =
    copy(child = c)
}

/** Codegen'd distinct-code-point count. */
case class DistinctCharsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.distinctChars(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.distinctChars($c)")
  override protected def withNewChildInternal(c: Expression): DistinctCharsExpr =
    copy(child = c)
}

/** Codegen'd winnowing selections over a text column (see
  * VecOps.winnowArray). */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.winnowArray(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.winnowArray($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
}

/** Codegen'd unsigned-byte range sum over a binary column — the hot
  * inner loop of the WAV/AVI envelope and frame decoders.
  */
case class ByteSumRangeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, o: Any, l: Any): Any =
    VecOps.byteSumRange(b.asInstanceOf[Array[Byte]],
      o.asInstanceOf[Long], l.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, l) => {
      val r = ctx.freshName("byteSumRes")
      s"""
         |java.lang.Long $r = graft.functions.VecOps.byteSumRange($b, $o, $l);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ByteSumRangeExpr = copy(f, s, t)
}

/** Codegen'd audio energy-hash bits (see VecOps.energyHashBits). */
case class EnergyHashExpr(first: Expression, second: Expression,
    third: Expression, windows: Int) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, o: Any, l: Any): Any =
    VecOps.energyHashBits(b.asInstanceOf[Array[Byte]],
      o.asInstanceOf[Long], l.asInstanceOf[Long], windows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, l) => {
      val r = ctx.freshName("energyHashRes")
      s"""
         |UTF8String $r = graft.functions.VecOps.energyHashBits($b, $o, $l, $windows);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): EnergyHashExpr =
    copy(f, s, t)
}

/** Column API for the vector expressions. */
object vec {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotCols(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotLit(a: Column, w: Seq[Double]): Column =
    ColumnBridge.column(ArrayDotLit(ColumnBridge.expression(a), w.toArray))

  def rollingHash(text: Column, pows: Seq[Long], mod: Long): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(text), pows.toArray, mod))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  def distinctChars(text: Column): Column =
    ColumnBridge.column(DistinctCharsExpr(ColumnBridge.expression(text)))

  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))

  def energyHashBits(bin: Column, off: Column, len: Column,
      windows: Int): Column =
    ColumnBridge.column(EnergyHashExpr(ColumnBridge.expression(bin),
      ColumnBridge.expression(off.cast("long")),
      ColumnBridge.expression(len.cast("long")), windows))

  def byteSumRange(bin: Column, off: Column, len: Column): Column =
    ColumnBridge.column(ByteSumRangeExpr(ColumnBridge.expression(bin),
      ColumnBridge.expression(off.cast("long")),
      ColumnBridge.expression(len.cast("long"))))
}
