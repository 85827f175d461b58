package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled sketch kernels. The higher-order-function formulations of
  * MinHash/SimHash evaluate one interpreted lambda per (element × hash) —
  * measured ~10µs each, i.e. minutes for a few thousand documents. These
  * expressions do the same math in tight JVM loops (~ns per op). They are
  * CodegenFallback (one interpreted call per ROW, compiled loop inside),
  * which is the right trade: per-row work here is thousands of ops.
  *
  * Hashing: 64-bit base hash = two murmur3-x86-32 passes (seeds 0/1) over
  * the UTF-8 bytes; per-function remix = murmur 128 finalizer (fmix64) of
  * base ^ (i · golden). Only internal consistency matters — sketches never
  * need cross-engine hash parity (the DuckDB oracles verify *pairs*, not
  * signatures).
  */
object SketchExprs {

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private final val Golden = -7046029254386353131L // 0x9E3779B97F4A7C15

  /** Per-function remix of a 64-bit base hash — the i-th independent
    * hash used by the MinHash family and the bloom filter's double
    * hashing.
    */
  @inline def remix(base: Long, i: Int): Long = fmix64(base ^ (i * Golden))

  def hash64(s: UTF8String): Long = {
    val b = s.getBytes
    (Murmur3X86.hashBytes(b, 0).toLong << 32) |
      (Murmur3X86.hashBytes(b, 1).toLong & 0xffffffffL)
  }

  /** MinHash signature: for each of `numHashes` functions, the min over
    * elements of fmix64(base_i) where base comes from the element (either
    * a pre-hashed long or a string hashed here).
    */
  def minhashSig(elems: ArrayData, numHashes: Int, preHashed: Boolean): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val base =
        if (preHashed) elems.getLong(j) else hash64(elems.getUTF8String(j))
      var i = 0
      while (i < numHashes) {
        val m = fmix64(base ^ (i * Golden))
        if (m < out(i)) out(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a token array: majority vote per bit over token
    * hashes, packed into one long.
    */
  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var j = 0
    while (j < n) {
      val h = hash64(toks.getUTF8String(j))
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Distinct hashed k-shingles of a token array in one compiled pass:
    * each token hashed once, each window combined with fmix64 chaining —
    * replaces the interpreted transform(sequence…concat_ws…) pipeline.
    */
  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = hash64(toks.getUTF8String(i)); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (n - k + 1) * 2))
    val out = new Array[Long](n - k + 1)
    var m = 0
    i = 0
    while (i <= n - k) {
      // polynomial combine (NOT xor-chaining: xor annihilates repeated
      // tokens — (a,y,y) and (a,z,z) would collide via h^h=0)
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = h * 0x100000001b3L + th(i + j); j += 1 }
      h = fmix64(h)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def minhash_sig(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), numHashes))

  def shingle_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(c), k))

  def simhash_64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))
}

/** array<string> | array<long> → array<long> MinHash signature. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  private lazy val preHashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchExprs.minhashSig(v.asInstanceOf[ArrayData], numHashes, preHashed)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> tokens → array<long> distinct hashed k-shingles. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchExprs.shingleHashes(v.asInstanceOf[ArrayData], k)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> → packed 64-bit SimHash. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchExprs.simhash64(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
