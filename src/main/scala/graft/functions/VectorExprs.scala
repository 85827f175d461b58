package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the similarity operators. The
  * higher-order-function formulation (`aggregate(zip_with(...))`) stays
  * interpreted per element — ~5M lambda evals/s; this expression compiles
  * to a tight primitive loop inside whole-stage codegen, which is the
  * difference between brute-force cosine being usable as a baseline at
  * sf0.1 and not.
  */
object VectorExprs {

  /** Dot product of two array<double> columns (assumed equal length). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotJava(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Banded multi-table sign-random-projection LSH slots for an
    * array<double> vector: `tables` independent bands of `bits`
    * hyperplanes each; element t encodes (t << 32) | bucket_t. Two
    * vectors are candidates iff they share ANY slot (OR over tables, AND
    * within a band) — the same amplification shape as the MinHash
    * banding in SketchExprs. Hyperplane (p, k) signs come from a
    * splitmix64 mix, so the planes are deterministic across the cluster
    * with no broadcast matrix. Positive scaling never flips a sign, so
    * scaled duplicates collide in EVERY band (recall 1.0 by
    * construction).
    */
  def signLshBands(v: Column, tables: Int, bits: Int): Column =
    ColumnBridge.column(
      SignLshBandsExpr(ColumnBridge.expression(v), tables, bits))

  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def signLshBandsJava(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val plane = (t * bits + j).toLong
        var s = 0.0
        var k = 0
        while (k < dim) {
          val x = v.getDouble(k)
          s += (if ((mix64(plane * 0x100000L + k) & 1L) == 1L) x else -x)
          k += 1
        }
        bucket = (bucket << 1) | (if (s > 0) 1L else 0L)
        j += 1
      }
      out(t) = (t.toLong << 32) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class SignLshBandsExpr(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    VectorExprs.signLshBandsJava(v.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorExprs.signLshBandsJava($v, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprs.dotJava($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
