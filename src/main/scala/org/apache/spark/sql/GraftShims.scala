package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. Spark 4 wraps Column around ColumnNode; the converters
  * live behind `private[sql]`, so this one-file shim (the standard
  * extension-library pattern) exposes them to the graft packages.
  */
object GraftShims {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Release the storage behind a localCheckpoint'ed Dataset.
    *
    * `Dataset.unpersist()` only talks to the CacheManager, so the
    * MEMORY_AND_DISK blocks a localCheckpoint pins (its LogicalRDD)
    * would otherwise live until the ContextCleaner happens to GC them —
    * a leak across a long multi-query session. Iterative operators
    * (Dedup.d07) call this on each superseded round.
    */
  def unpersistLocalCheckpoint(ds: Dataset[_]): Unit = ds match {
    case c: org.apache.spark.sql.classic.Dataset[_] =>
      c.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
    case _ => ()
  }
}
