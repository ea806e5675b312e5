package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration of the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the Column
  * API (the reference exposes no UDF surface — SURVEY §2.7 — but a SQL
  * registry is the idiomatic Spark completion of it). */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash",
      (exprs: Seq[Expression]) => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("hilbert_index",
      (exprs: Seq[Expression]) => exprs(2) match {
        case Literal(order: Int, _) => HilbertIndex(exprs(0), exprs(1), order)
        case other => throw new IllegalArgumentException(
          s"hilbert_index order must be an integer literal, got $other")
      }, "built-in")
  }
}
