package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Murmur3 x86 32-bit (Austin Appleby's public-domain MurmurHash3,
  * the variant the reference routes partitions with — seed 0,
  * little-endian blocks; Murmur32Hash.java:33–98 documents the same
  * constants). Spark's built-in `hash()` is Murmur3 with seed 42 and a
  * different byte-mixing order (`hashUnsafeBytes`), so bit parity with
  * the reference's `murmur3_32(pv) & Int.MaxValue % N` routing requires
  * this standalone implementation (SURVEY.md §7.4).
  */
object Murmur3X86 {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** Hash UTF-8 bytes with the given seed (reference uses seed 0). */
  def hashBytes(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    var h = seed
    val nBlocks = len / 4
    var i = 0
    while (i < nBlocks * 4) {
      var k = (data(i) & 0xff) |
        ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) |
        ((data(i + 3) & 0xff) << 24)
      k *= C1
      k = Integer.rotateLeft(k, 15)
      k *= C2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = nBlocks * 4
    (len & 3) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 1 =>
        k ^= data(tail) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) {
      k *= C1
      k = Integer.rotateLeft(k, 15)
      k *= C2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  def hashString(s: String, seed: Int = 0): Int =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** The reference's routing function: clear the sign bit, then modulo
    * (DeltaReader.java:60–63: `hash & Integer.MAX_VALUE % numPartitions`).
    */
  def partitionIndex(partitionValue: String, numPartitions: Int): Int =
    (hashString(partitionValue) & Integer.MAX_VALUE) % numPartitions

  /** Column form: murmur3_x86_32 of a string column, seed 0. */
  def murmur3_32(c: Column): Column =
    ColumnBridge.column(Murmur3X86Expr(ColumnBridge.expression(c)))

  /** Column form of the reference's partition routing. */
  def routeIndex(c: Column, numPartitions: Int): Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    pmod(murmur3_32(c).bitwiseAND(Integer.MAX_VALUE), lit(numPartitions))
  }
}

/** Catalyst expression wrapper — codegen'd so routing stays inside
  * whole-stage codegen on the hot path.
  */
case class Murmur3X86Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Murmur3X86.hashBytes(input.asInstanceOf[UTF8String].getBytes, 0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Murmur3X86.hashBytes($c.getBytes(), 0)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
