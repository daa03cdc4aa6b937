package graft.plans

import graft.core.Ids
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: EGET routing for anyone querying the event-log
  * table directly (raw SQL / DataFrame, not via `EventStore.get`).
  *
  * A filter pinning `event_id` to a literal UUID implies the event
  * lives in exactly one partition — the 16-bit hash embedded at bits
  * 46-61 of the UUID (`id.rs:50-53`). The rule conjoins
  * `partition_id = hash % numPartitions`, which Catalyst then turns
  * into directory-partition pruning on the partitioned parquet table
  * (the same "route by the hash inside the id, no global index" trick
  * as `read.rs:756-767`).
  *
  * numPartitions comes from `spark.graft.numPartitions` (default 32).
  */
case class InjectEventIdPartitionPruning() extends Rule[LogicalPlan] {

  private def numPartitions: Int =
    conf.getConfString("spark.graft.numPartitions", "32").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child)
        if child.output.exists(_.name == "partition_id") &&
          child.output.exists(_.name == "event_id") &&
          !mentionsPartitionId(cond) =>
      // ONLY top-level conjuncts imply the equality for every surviving
      // row — an event_id equality under OR/NOT must not pin the scan
      val pids = conjuncts(cond).flatMap(eventIdLiteral).flatMap(partitionIdOf).distinct
      pids match {
        case Seq(pid) =>
          val pidAttr = child.output.find(_.name == "partition_id").get
          Filter(And(cond, EqualTo(pidAttr, Literal(pid, IntegerType))), child)
        case _ => f
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def mentionsPartitionId(cond: Expression): Boolean =
    cond.references.exists(_.name == "partition_id")

  private def eventIdLiteral(e: Expression): Option[UTF8String] = e match {
    case EqualTo(a, Literal(v: UTF8String, StringType))
        if a.references.size == 1 && a.references.head.name == "event_id" => Some(v)
    case EqualTo(Literal(v: UTF8String, StringType), a)
        if a.references.size == 1 && a.references.head.name == "event_id" => Some(v)
    case _ => None
  }

  private def partitionIdOf(v: UTF8String): Option[Int] =
    try {
      val u = java.util.UUID.fromString(v.toString)
      Some(Ids.partitionIdFor(Ids.partitionHash(u), numPartitions))
    } catch { case _: IllegalArgumentException => None }
}

/** One-stop registration for everything graft adds to a session:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or per-session via `spark.experimental.*`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => InjectEventIdPartitionPruning())
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction(graft.functions.UuidPartitionHashDescriptor.descriptor)
    e.injectFunction(graft.functions.UuidTimestampMsDescriptor.descriptor)
  }
}
