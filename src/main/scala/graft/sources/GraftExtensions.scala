package graft.sources

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Divide, Expression, Floor, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, RepartitionByExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DoubleType

/** Session extensions making `df.write.format("graft")` self-distributing:
  * a resolution rule injects the tile-key shuffle
  * (floor(row/ts), floor(col/ts)) under any write to a graft table, so
  * un-clustered input commits with no manual repartition — Spark plans
  * exactly one clustering exchange and the commit protocol's
  * whole-tile-per-task invariant holds by construction.
  *
  * Why a rule and not `RequiresDistributionAndOrdering`: the connector
  * interface was tried first, but Spark 4.1's
  * `V2ExpressionUtils.toCatalystOpt` (V2ExpressionUtils.scala:97) rejects
  * `GeneralScalarExpression` in write distributions ("FLOOR(row / 50) is
  * not currently supported") — only named references and catalog-resolved
  * transforms convert, and path-based `TableProvider` tables have no
  * function catalog to resolve a bucket transform against. The rule
  * expresses the identical clustering one layer up, in Catalyst, where
  * floor/divide are first-class. Sessions without the extension still
  * cannot corrupt a store: GraftWrite's commit verifies per-tile distinct
  * coverage and aborts un-clustered input.
  *
  * Register via `.config("spark.sql.extensions", "graft.sources.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(_ => GraftWriteDistributionRule)
}

object GraftWriteDistributionRule extends Rule[LogicalPlan] {

  private def tileKeys(output: Seq[Attribute], ts: Int): Option[Seq[Expression]] = {
    def key(name: String): Option[Expression] =
      output.find(_.name == name).map(a =>
        Floor(Divide(Cast(a, DoubleType), Literal(ts.toDouble))))
    // dataset stores cluster additionally on var_name so each (var, tile)
    // lands wholly in one task
    val varKey = output.find(_.name == "var_name").toSeq
    for (r <- key("row"); c <- key("col")) yield varKey ++ Seq(r, c)
  }

  private def clustered(query: LogicalPlan, ts: Int): LogicalPlan = query match {
    // idempotence under the fixpoint resolution batch
    case RepartitionByExpression(exprs, _, _, _)
        if exprs.exists(_.isInstanceOf[Floor]) => query
    case _ =>
      tileKeys(query.output, ts) match {
        case Some(keys) => RepartitionByExpression(keys, query, None)
        case None => query
      }
  }

  private def tsOf(r: DataSourceV2Relation): Option[Int] = r.table match {
    case t: GraftTable => Some(t.tileSize)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case o: OverwriteByExpression if o.table.resolved && o.query.resolved =>
      o.table match {
        case r: DataSourceV2Relation =>
          tsOf(r).map(ts => o.copy(query = clustered(o.query, ts))).getOrElse(o)
        case _ => o
      }
    case a: AppendData if a.table.resolved && a.query.resolved =>
      a.table match {
        case r: DataSourceV2Relation =>
          tsOf(r).map(ts => a.copy(query = clustered(a.query, ts))).getOrElse(a)
        case _ => a
      }
  }
}
