package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Pmod, Subtract}

import graft.functions.expressions.ArrayDotProduct

/**
 * SQL registration surface: exposes the engine's primitives to `spark.sql`,
 * so the library is usable from pure-SQL contexts (the reference has no SQL
 * surface at all — everything rides a Java client API).
 *
 * {{{
 *   GraftFunctions.register(spark)
 *   spark.sql("SELECT ts_bucket(ts_ms, 1704067200000, 900000) b, max(v) FROM t GROUP BY b")
 *   spark.sql("SELECT array_dot_product(a.embedding, b.embedding) FROM ...")
 * }}}
 */
object GraftFunctions {

  /** `ts_bucket(tsMs, t0Ms, intervalMs)` → bucket start, exact long arithmetic
    * (same formula as TsAgg.bucketStartExpr). */
  private def tsBucket(args: Seq[Expression]): Expression = {
    require(args.length == 3, s"ts_bucket(tsMs, t0Ms, intervalMs) takes 3 args, got ${args.length}")
    val Seq(ts, t0, iv) = args
    val d = Subtract(ts, t0)
    Add(t0, Subtract(d, Pmod(d, iv)))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ts_bucket", tsBucket, "built-in")
    reg.createOrReplaceTempFunction(
      "array_dot_product",
      exprs => {
        require(exprs.length == 2, s"array_dot_product takes 2 args, got ${exprs.length}")
        expressions.ArrayDotProduct(exprs(0), exprs(1))
      },
      "built-in")
    Aggregators.registerAll(spark) // graft_avg / graft_wavg UDAFs
  }
}
