package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-random-projection) LSH kernel for cosine
  * similarity over embedding vectors.
  *
  * Each of `numPlanes` pseudo-random hyperplanes has ±1 components derived
  * deterministically from splitmix64(component, word) — no RNG state, no
  * broadcast plane matrix, reproducible across runs and engines. Bit j of the
  * signature is the sign of v·r_j; two vectors at angle θ disagree on each
  * bit with probability θ/π (Goemans–Williamson / Charikar SimHash bound), so
  * banding `numPlanes` bits into `bands` groups of r gives candidate recall
  * 1-(1-(1-θ/π)^r)^b per pair — ≈1-2e-8 at cos ≥ 0.95 with 256 bits / 32
  * bands. Signs are accumulated component-major: one 64-bit hash yields 64
  * plane signs per vector component, so hashing cost is O(d·numPlanes/64).
  */
object VectorLshKernels {

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Banded hyperplane signature: array<long> of `bands` band hashes, band b
    * packing sign bits [b·r, (b+1)·r), r = numPlanes/bands. */
  def hyperplaneBands(
      v: ArrayData, isFloat: Boolean, numPlanes: Int, bands: Int): ArrayData = {
    val d = v.numElements()
    val acc = new Array[Double](numPlanes)
    val words = (numPlanes + 63) / 64
    var i = 0
    while (i < d) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var w = 0
      while (w < words) {
        var bits = splitmix64(i.toLong * 1000003L + w)
        val base = w * 64
        val lim = math.min(64, numPlanes - base)
        var j = 0
        while (j < lim) {
          if ((bits & 1L) == 1L) acc(base + j) += x else acc(base + j) -= x
          bits >>>= 1
          j += 1
        }
        w += 1
      }
      i += 1
    }
    val r = numPlanes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0L
      var j = 0
      while (j < r) {
        h = (h << 1) | (if (acc(b * r + j) > 0) 1L else 0L)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Banded random-hyperplane LSH signature of an embedding
  * (`array<float|double>` → `array<long>` of `bands` band hashes). Row-local
  * one-pass kernel with whole-stage-codegen support — the candidate-blocking
  * step of cosine near-duplicate search at scale.
  */
case class HyperplaneBands(child: Expression, numPlanes: Int, bands: Int)
    extends UnaryExpression {
  require(numPlanes % bands == 0 && numPlanes / bands <= 64,
    "bands must divide numPlanes and band width must fit a long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == DoubleType || t == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float>, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorLshKernels.hyperplaneBands(
      input.asInstanceOf[ArrayData], isFloat, numPlanes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorLshKernels.hyperplaneBands($c, $isFloat, $numPlanes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
