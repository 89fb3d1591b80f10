package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/**
 * Config-driven injection of the engine's SQL surface:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   // or
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * }}}
 *
 * Every custom expression becomes a permanent SQL function in each session of
 * the application — no driver-side `register` call needed, which is what a
 * pure-SQL deployment (Thrift server, SQL gateway, notebook service) requires.
 * The session-scoped [[graft.functions.GraftFunctions.register]] remains for
 * programmatic use and additionally registers the typed UDAFs (the extension
 * injection point covers Catalyst expressions only).
 *
 * The reference has no SQL surface at all — its whole API is a Java client
 * (`TimeseriesAggregationClient.java`); this is the Spark-native equivalent
 * of shipping the coprocessor jar to the cluster: deploy once via config,
 * every session can query.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.expressionFunctions.foreach { case (name, usage, builder) =>
      // 5-arg ctor is (className, db, name, usage, extended) — the 3-arg form
      // is (className, db, name) and would register the usage text as the name
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
  }
}
