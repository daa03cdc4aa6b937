package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 hides the Expression-backed
  * Column constructors behind `private[sql]`; extension libraries reach
  * them from inside the package namespace (the same pattern Spark
  * connector/extension projects use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (classic.Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A file-backed relation marked `isStreaming = true` — what a v1
    * streaming `Source.getBatch` must return (the engine asserts the
    * returned plan is streaming; `DataSource`/`LogicalRelation` are
    * private[sql], hence this bridge). Mirrors FileStreamSource's own
    * getBatch construction.
    */
  def streamingFileRelation(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String]): org.apache.spark.sql.DataFrame = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark,
      className = "parquet",
      paths = Seq(path),
      userSpecifiedSchema = Some(schema),
      options = options)
    ofRows(spark, org.apache.spark.sql.execution.datasources.LogicalRelation(
      ds.resolveRelation(checkFilesExist = false), isStreaming = true))
  }
}
