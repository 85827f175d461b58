package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter join pruning: build a compact membership sketch of the
  * SMALL side's join keys, broadcast it, and drop non-matching rows of
  * the BIG side BEFORE the shuffle — the standard runtime-filter trick
  * for cutting a 100 TB probe side down to its matching fraction when
  * the dimension side is too big to broadcast-hash-join outright but its
  * KEY SET still fits in a few MB of bits.
  *
  * The sketch is one-sided (false positives only), so
  * [[BloomFilterExprs.semiJoinPruned]] always follows the probe with the
  * exact join — results are exact; the bloom only shrinks the shuffle.
  *
  * Build is a treeAggregate of fixed-size bit arrays (same distribution
  * shape as Spark's own `DataFrameStatFunctions.bloomFilter`); the probe
  * is a codegen'd expression reading the broadcast ONCE per partition.
  * Hashing reuses the engine's 64-bit base hash (murmur3-x86-32 ×2 —
  * SketchExprs.hash64) + double hashing for the k probes, so string and
  * long keys both work without boxing.
  */
object BloomFilterExprs {

  /** Immutable-after-build long bloom. m is forced to a power of two so
    * the probe is mask, not mod.
    */
  final class LongBloom(val bits: Array[Long], val k: Int) extends Serializable {
    // bits.length is a power of two; Long math — 2^26 words is already a
    // 2^32 bit index, past Int range
    private val mask: Long = bits.length.toLong * 64 - 1

    def put(x: Long): Unit = {
      val h1 = SketchExprs.remix(x, 0)
      val h2 = SketchExprs.remix(x, 1) | 1L
      var i = 0
      while (i < k) {
        val pos = (h1 + i * h2) & mask
        bits((pos >>> 6).toInt) |= 1L << (pos & 63).toInt
        i += 1
      }
    }

    def mightContain(x: Long): Boolean = {
      val h1 = SketchExprs.remix(x, 0)
      val h2 = SketchExprs.remix(x, 1) | 1L
      var i = 0
      while (i < k) {
        val pos = (h1 + i * h2) & mask
        if ((bits((pos >>> 6).toInt) & (1L << (pos & 63).toInt)) == 0L)
          return false
        i += 1
      }
      true
    }

    def mightContainUtf8(s: UTF8String): Boolean =
      mightContain(SketchExprs.hash64(s))

    def merge(o: LongBloom): LongBloom = {
      var i = 0
      while (i < bits.length) { bits(i) |= o.bits(i); i += 1 }
      this
    }

    def sizeBytes: Int = bits.length * 8
  }

  /** Empty bloom sized for `expectedKeys` at ~`bitsPerKey` bits each
    * (10 bits/key ≈ 0.8% FPP with k=7). Word count rounds UP to a power
    * of two, so the realized FPP is at or below the nominal one.
    */
  def empty(expectedKeys: Long, bitsPerKey: Int = 10): LongBloom = {
    require(expectedKeys > 0 && bitsPerKey > 0)
    val words = math.max(1L, (expectedKeys * bitsPerKey + 63) / 64)
    val pow2 = java.lang.Long.highestOneBit(words * 2 - 1)
    require(pow2 <= (1L << 27), // 1 GiB of bits — past this, rethink
      s"bloom of ${pow2 * 8} bytes; key set too large for a runtime filter")
    val k = math.max(1, math.round(0.693 * bitsPerKey).toInt)
    new LongBloom(new Array[Long](pow2.toInt), k)
  }

  /** Distributed build over a one-column frame of long or string keys.
    * Nulls never enter the sketch (SQL join semantics: null matches
    * nothing).
    */
  def build(keys: DataFrame, column: String,
      expectedKeys: Long, bitsPerKey: Int = 10): LongBloom = {
    val hashed: org.apache.spark.rdd.RDD[Long] =
      keys.schema(column).dataType match {
        case LongType =>
          keys.select(col(column)).na.drop()
            .rdd.map(_.getLong(0))
        case StringType =>
          keys.select(col(column)).na.drop()
            .rdd.map(r => SketchExprs.hash64(
              UTF8String.fromString(r.getString(0))))
        case other => throw new IllegalArgumentException(
          s"bloom build on $other; hash to LONG or cast to STRING first")
      }
    hashed.treeAggregate(empty(expectedKeys, bitsPerKey))(
      seqOp = { (b, x) => b.put(x); b },
      combOp = { (a, b) => a.merge(b) })
  }

  /** Probe column: true iff `key` might be in the broadcast sketch. */
  def mightContain(key: Column, bloom: Broadcast[LongBloom]): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(key), bloom))

  /** Exact semi-join with a bloom pre-filter on the big side: the filter
    * runs at the scan (map-side, before the exchange), the join then
    * removes the sketch's false positives. Equivalent to
    * `big.join(small, keys, "left_semi")` — only the shuffled volume
    * changes.
    */
  def semiJoinPruned(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      bitsPerKey: Int = 10): DataFrame = {
    val spark = big.sparkSession
    val keyFrame = small.select(col(smallKey)).distinct()
    val n = math.max(1L, keyFrame.count())
    val bloom = spark.sparkContext.broadcast(
      build(keyFrame, smallKey, n, bitsPerKey))
    big.filter(mightContain(col(bigKey), bloom))
      .join(keyFrame.withColumnRenamed(smallKey, bigKey),
        Seq(bigKey), "left_semi")
  }
}

/** `bloom.value.mightContain(child)` as a codegen'd boolean expression.
  * The broadcast handle rides the serialized plan; generated code caches
  * the deserialized sketch in a partition-local field, so the per-row
  * cost is k masked loads — no broadcast lookup, no boxing.
  */
case class BloomMightContainExpr(
    child: Expression,
    bloom: Broadcast[BloomFilterExprs.LongBloom])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom probe needs LONG or STRING, got $other")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => bloom.value.mightContain(l)
    case s: UTF8String => bloom.value.mightContainUtf8(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilterExprs.LongBloom]].getName)
    val cls = classOf[BloomFilterExprs.LongBloom].getName
    val local = ctx.addMutableState(cls, "bloomLocal",
      v => s"$v = ($cls) $bloomRef.value();")
    val probe = child.dataType match {
      case LongType => (c: String) => s"$local.mightContain($c)"
      case StringType => (c: String) => s"$local.mightContainUtf8($c)"
      case _ => throw new IllegalStateException("unreachable: checked types")
    }
    defineCodeGen(ctx, ev, c => probe(c))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
