package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared primitive kernels for the text-hash expressions. Token hashing uses
  * Spark's builtin xxhash64 (seed 42) so results are interchangeable with the
  * `xxhash64(col)` SQL function. Called from both interpreted eval and
  * generated code.
  */
object TextHashKernels {
  private val P = 2147483647L // 2^31 - 1

  private def tokenHash(arr: ArrayData, i: Int): Long =
    XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Distinct space-joined word n-grams of a token array, first-occurrence
    * order (same output as transform(sequence…)+concat_ws+array_distinct,
    * which costs ~1ms/row through generic lambda eval — this is one pass). */
  def wordNGrams(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i + n <= m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Fraction of n-gram slots taken by the single most frequent n-gram of a
    * token array (max in-doc count / total n-grams; 0.0 when fewer than n
    * tokens) — the "most repeated n-gram" Gopher signal. One hash-map pass;
    * the agg-join formulation (explode → count → max → join back) shuffles
    * twice for what is purely per-row state. */
  def topNGramFrac(arr: ArrayData, n: Int): Double = {
    val m = arr.numElements()
    val total = m - n + 1
    if (total <= 0) return 0.0
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var max = 0
    var i = 0
    while (i + n <= m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      val prev = counts.getOrDefault(g, 0)
      counts.put(g, prev + 1)
      if (prev + 1 > max) max = prev + 1
      i += 1
    }
    max.toDouble / total
  }

  /** One-pass k-minhash over a shingle array: h_i(S) = min ((a_i·x + b_i) mod
    * p), x = pmod(xxhash64(s), p). Identical math to the higher-order-function
    * formulation (a_i = 2i+1, b_i = i·2654435761 mod p, init Long.MaxValue). */
  def minHashSignature(arr: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = tokenHash(arr, t)
      val x = ((h % P) + P) % P
      var i = 0
      while (i < k) {
        val v = ((2L * i + 1) * x + (i * 2654435761L) % P) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** One pass over a token array counting membership hits against k
    * stopword hash sets at once → k hit ratios (0.0 for an empty array).
    * Replaces k × `filter(toks, array_contains(...))` HOF chains that the
    * optimizer re-evaluates per reference (~12 generic-lambda walks per row
    * in the language-ID query). */
  def stopwordRatios(arr: ArrayData,
      sets: Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]])
      : ArrayData = {
    val n = arr.numElements()
    val k = sets.length
    val hits = new Array[Int](k)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        if (sets(j).contains(t)) hits(j) += 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (n > 0) hits(j).toDouble / n else 0.0
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 62-bit SimHash over a token array with an EXPLICIT, SQL-reproducible
    * per-token hash (the oracle device proven by `Sketches.mix31`): the
    * token folds char-by-char into 31 bits (`h·31 + codepoint mod 2³¹`),
    * then two decorrelated avalanche chains (multiply-mod-2³¹ + xor-shift,
    * every intermediate < 2⁶³ so BIGINT SQL reproduces it bit-for-bit)
    * yield two 31-bit halves packed into a 62-bit signature. Slightly less
    * uniform than xxhash64 ([[simHash]]) but cross-engine checkable — the
    * HLL lesson, applied to SimHash. */
  def simHashExplicit(arr: ArrayData): Long = {
    val votes = new Array[Int](62)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t).toString
      var h0 = 0L
      var ci = 0
      // fold Unicode CODEPOINTS, not UTF-16 code units — DuckDB's
      // ord(string_split(...)) sees codepoints, so surrogate pairs
      // (emoji, CJK extensions) must hash identically on both engines
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        h0 = (h0 * 31 + cp) % 2147483648L
        ci += Character.charCount(cp)
      }
      val ts = mixHalf(h0) | (mixHalf(h0 ^ 625148049L) << 31)
      var j = 0
      while (j < 62) {
        if (((ts >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 62) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** The 31-bit avalanche half-chain of [[simHashExplicit]]: identical math
    * to `Sketches.mix31` (multiply-mod + xor-shift, overflow-safe). */
  private def mixHalf(h0: Long): Long = {
    val h1 = (h0 * 2654435761L) % 2147483648L
    val h2 = h1 ^ (h1 >>> 15)
    val h3 = (h2 * 1103515245L) % 2147483648L
    h3 ^ (h3 >>> 13)
  }

  /** One-pass 64-bit SimHash over a token array: bit j = sign of the sum of
    * ±1 votes from bit j of each token's xxhash64. */
  def simHash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = tokenHash(arr, t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

private[expressions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
}

/** k-element MinHash signature of a shingle array (`array<string>` →
  * `array<long>`). Native single-pass kernel: the equivalent chain of k
  * `aggregate` folds re-walks the shingle array k times through generic
  * lambda evaluation with per-step boxing; this walks it once in primitive
  * code. Row-local, no shuffle, codegen-friendly.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minHashSignature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.minHashSignature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array (`array<string>` →
  * `array<string>`), native one-pass kernel. */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordNGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.wordNGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** Most-frequent-n-gram fraction of a token array (`array<string>` →
  * `double` in [0,1]), native one-pass kernel — see
  * [[TextHashKernels.topNGramFrac]]. */
case class TopNGramFrac(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_top_ngram_frac"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.topNGramFrac(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.topNGramFrac($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopNGramFrac =
    copy(child = newChild)
}

/** k stopword-profile hit ratios of a token array in one pass
  * (`array<string>` → `array<double>`, profile order). Hash-set membership
  * per token against all profiles at once; exact count/size division, so
  * results are bit-identical to the per-profile HOF formulation. */
case class StopwordRatios(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_stop_ratios"

  @transient private lazy val sets
      : Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] =
    profiles.map { ws =>
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      ws.foreach(w =>
        s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.stopwordRatios(input.asInstanceOf[ArrayData], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("stopSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.stopwordRatios($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordRatios =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (`array<string>` → `long`). Same vote
  * semantics as the higher-order formulation, one primitive pass. */
case class SimHash64(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.simHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 62-bit SimHash with the explicit SQL-reproducible token hash
  * (`array<string>` → `long`, see [[TextHashKernels.simHashExplicit]]). */
case class SimHashExplicit62(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash62"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simHashExplicit(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.simHashExplicit($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExplicit62 =
    copy(child = newChild)
}
