package graft.functions

import graft.core.Ids
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers callable from generated code. */
object UuidBits {
  /** Parse the low 64 bits of a canonical (36-char, dashed) UUID string
    * without allocating a java.util.UUID. Returns Long.MinValue marker
    * never — caller guarantees shape via validation or tolerates
    * NumberFormatException on malformed input.
    */
  def lowBits(s: UTF8String): Long = {
    val str = s.toString
    val u = java.util.UUID.fromString(str)
    u.getLeastSignificantBits
  }

  def partitionHash(s: UTF8String): Int =
    ((lowBits(s) >>> 46) & 0xffff).toInt

  def timestampMs(s: UTF8String): Long =
    java.util.UUID.fromString(s.toString).getMostSignificantBits >>> 16
}

/** Native Catalyst expression: extract the 16-bit partition hash
  * embedded at bits 46-61 of an event/partition-key UUID
  * (`id.rs:50-53` semantics). Whole-stage-codegen friendly: compiles to
  * a static call, no Row boxing, stays inside the generated loop —
  * unlike a Scala UDF this never breaks a WholeStageCodegen span.
  */
case class UuidPartitionHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    UuidBits.partitionHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UuidBits.partitionHash($c)")
  override protected def withNewChildInternal(c: Expression): UuidPartitionHash = copy(c)
}

/** Native expression: ms timestamp from a v7-style event UUID
  * (top 48 bits; `id.rs:21-47`).
  */
case class UuidTimestampMs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    UuidBits.timestampMs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UuidBits.timestampMs($c)")
  override protected def withNewChildInternal(c: Expression): UuidTimestampMs = copy(c)
}

/** Function descriptors for SparkSessionExtensions.injectFunction. */
object UuidPartitionHashDescriptor {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("uuid_partition_hash"),
      new ExpressionInfo(classOf[UuidPartitionHash].getName, "uuid_partition_hash"),
      (exprs: Seq[Expression]) => UuidPartitionHash(exprs.head))
}

object UuidTimestampMsDescriptor {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("uuid_timestamp_ms"),
      new ExpressionInfo(classOf[UuidTimestampMs].getName, "uuid_timestamp_ms"),
      (exprs: Seq[Expression]) => UuidTimestampMs(exprs.head))
}

/** Column-API and SQL-registration surface for the native expressions. */
object functions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def uuid_partition_hash(c: Column): Column =
    ColumnBridge.column(UuidPartitionHash(ColumnBridge.expression(c)))

  def uuid_timestamp_ms(c: Column): Column =
    ColumnBridge.column(UuidTimestampMs(ColumnBridge.expression(c)))

  /** partition_id = hash % numPartitions (`eappend.rs:197`). */
  def uuid_partition_id(c: Column, numPartitions: Int): Column =
    uuid_partition_hash(c) % numPartitions

  /** How many entries a per-key lookup may compile to a CASE chain
    * before switching to a single map literal. A chain is preferable
    * while small — Catalyst constant-folds it to one literal whenever
    * the key is pinned (e.g. an EGET scan pruned to one partition) —
    * but it grows the plan by two nodes per entry, which at the
    * reference's partition-count scale (50k+ partitions,
    * `docs/partitions.md`) turns every watermark clamp into a
    * 100k-node expression the optimizer re-walks per rule.
    */
  val KeyedLookupWhenMax = 64

  /** `key -> value` lookup against a driver-side table, with a default
    * for absent keys. Past [[KeyedLookupWhenMax]] entries the table
    * ships as ONE map literal and the lookup is a single `element_at`
    * — O(1) plan nodes regardless of the table size.
    */
  def keyedLookup[K: scala.reflect.runtime.universe.TypeTag](
      table: Map[K, Long], key: Column, default: Long): Column = {
    import org.apache.spark.sql.functions.{coalesce, element_at, lit, typedLit, when}
    if (table.isEmpty) lit(default)
    else if (table.size <= KeyedLookupWhenMax)
      table.foldLeft(when(lit(false), lit(default))) {
        case (acc, (k, v)) => acc.when(key === lit(k), lit(v))
      }.otherwise(lit(default))
    else coalesce(element_at(typedLit(table), key), lit(default))
  }

  /** Register `uuid_partition_hash` / `uuid_timestamp_ms` for
    * `spark.sql(...)` use.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid_partition_hash", exprs => UuidPartitionHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid_timestamp_ms", exprs => UuidTimestampMs(exprs.head), "built-in")
  }
}
