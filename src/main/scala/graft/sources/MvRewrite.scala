package graft.sources

import graft.operators.MaterializedAgg
import graft.txn.TxnLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Materialized-view AUTO-REWRITE (the warehouse "query rewrite with
  * materialized views" feature, re-expressed as a Catalyst optimizer
  * rule): an aggregate over a graft base table is transparently served
  * from a registered [[MaterializedAgg]] MV when — and only when — the
  * answer is provably identical:
  *
  *  - the scan binds the base table's LATEST version (a time-travel scan
  *    keeps its plan), with no pushed filters and no limit;
  *  - the MV's refreshed-through watermark equals that same version
  *    (a stale MV is never served — freshness is re-checked on every
  *    planning pass from the two transaction logs, which is a metadata
  *    read, not a data read);
  *  - the GROUP BY columns are a subset of the MV keys (distributive
  *    COUNT/SUM roll up), and every aggregate is COUNT(*) or
  *    SUM(CAST(c AS DECIMAL(15,2))) over a maintained sum column — the
  *    engine's exact-decimal money convention, which is what makes the
  *    MV's incremental state bit-identical to a recompute.
  *
  * At 100 TB this turns a full fact-table aggregate into a read of the
  * (key-cardinality-sized) MV — the optimizer decides per query, the
  * user keeps writing `GROUP BY` over the base table.
  *
  * Output attribute ids are preserved (aliases re-carry the original
  * exprIds) so parent operators resolve unchanged. The rewritten subtree
  * is the MV relation's own optimized plan: pushdown has already run at
  * this point in the optimizer, so the inserted scan is planner-ready.
  */
object MvRewrite {

  final case class Registration(
      basePath: String, mvPath: String, keys: Seq[String], sums: Seq[String])

  private val regs =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Register an MV for rewrite and install the rule on the session
    * (idempotent). The MV must have been built by [[MaterializedAgg]]
    * with the same keys/sums.
    */
  def register(spark: SparkSession, basePath: String, mvPath: String,
      keys: Seq[String], sums: Seq[String]): Unit = {
    regs.put(norm(basePath), Registration(basePath, mvPath, keys, sums))
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
  }

  def unregister(basePath: String): Unit = regs.remove(norm(basePath))

  private[sources] def lookup(basePath: String): Option[Registration] =
    Option(regs.get(norm(basePath)))
}

final case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  // guards the re-entrant optimization of the MV relation itself
  private val inRewrite = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (inRewrite.get()) return plan
    plan.transformDown {
      case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
        tryRewrite(groupingExprs, aggExprs, child).getOrElse(agg)
    }
  }

  /** The graft scan under the aggregate, looking through column-pruning
    * projections (attribute-only — any computation blocks the rewrite).
    */
  private def scanOf(plan: LogicalPlan): Option[GraftBatchScan] = plan match {
    case r: DataSourceV2ScanRelation => r.scan match {
      case s: GraftBatchScan => Some(s)
      case _ => None
    }
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanOf(child)
    case _ => None
  }

  private def tryRewrite(
      groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val scan = scanOf(child).getOrElse(return None)
    if (scan.limit >= 0 || scan.pushedV1Filters.nonEmpty) return None
    val resolved = scan.boundResolved
    val reg = MvRewrite.lookup(resolved.tablePath).getOrElse(return None)

    val groupAttrs = groupingExprs.map {
      case a: AttributeReference if reg.keys.contains(a.name) => a
      case _ => return None
    }
    def sumSrc(s: Sum): Option[String] = s.child match {
      case Cast(a: AttributeReference, dt: DecimalType, _, _)
          if dt == DecimalType(15, 2) && reg.sums.contains(a.name) =>
        Some(a.name)
      case _ => None
    }
    val shapesOk = aggExprs.forall {
      case a: AttributeReference => groupAttrs.exists(_.exprId == a.exprId)
      case Alias(a: AttributeReference, _) =>
        groupAttrs.exists(_.exprId == a.exprId)
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count => c.children.forall(e => e.foldable && !e.nullable)
          case s: Sum => sumSrc(s).isDefined
          case _ => false
        }
      case _ => false
    }
    if (!shapesOk) return None

    // freshness: base latest == scan-bound version == MV watermark
    val conf = spark.sessionState.newHadoopConf()
    val baseLatest = new TxnLog(reg.basePath, conf).latestVersion()
      .getOrElse(return None)
    if (resolved.version != baseLatest) return None
    val through =
      try MaterializedAgg.refreshedThrough(spark, reg.mvPath)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (through != baseLatest) return None

    inRewrite.set(true)
    val mvPlan =
      try spark.read.format("graft").option("tablePath", reg.mvPath).load()
        .queryExecution.optimizedPlan
      finally inRewrite.set(false)
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap
    // a registration whose keys/sums don't match the MV's actual
    // columns must DECLINE, never crash the optimizer mid-plan
    if (!reg.keys.forall(mvOut.contains) || !mvOut.contains("mv_cnt") ||
        !reg.sums.forall(c => mvOut.contains(s"sum_$c")))
      return None

    val newGrouping: Seq[Expression] = groupAttrs.map(a => mvOut(a.name))
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference =>
        Alias(mvOut(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) =>
        Alias(mvOut(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        ae.aggregateFunction match {
          case _: Count =>
            // COUNT over the base = exact sum of maintained group counts;
            // coalesce covers the empty-table global aggregate (COUNT is
            // 0 there, SUM over no rows is NULL)
            Alias(Cast(Coalesce(Seq(
              Sum(mvOut("mv_cnt")).toAggregateExpression(),
              Literal(0L))), LongType), name)(exprId = al.exprId)
          case s: Sum =>
            val src = sumSrc(s).get
            Alias(Cast(
              Sum(mvOut(s"sum_$src")).toAggregateExpression(),
              al.dataType), name)(exprId = al.exprId)
          case other => throw new IllegalStateException(
            s"unreachable: shape check admitted $other")
        }
      case other => throw new IllegalStateException(
        s"unreachable: shape check admitted $other")
    }
    Some(Aggregate(newGrouping, newAggExprs, mvPlan))
  }
}
