package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Grouped top-k as a first-class operator (logical node + strategy +
  * physical plan), for when `row_number().over(...) <= k` is too
  * expensive: the window operator SORTS every group in full, while this
  * keeps a bounded k-heap per key — O(n log k) with O(keys·k) memory,
  * no sort buffer, no spill pressure from cold groups. At 100 TB the
  * only data movement is the one hash shuffle on the grouping keys that
  * any grouped operator needs.
  *
  * Semantics: retain, per distinct key, the first k rows under
  * `ordering` (ties resolved by the ordering itself — give it a unique
  * tie-break column for determinism). Output order within/across keys
  * is unspecified, like any aggregation.
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child) =>
      // two-phase, like any aggregate: a partial pass prunes each input
      // partition to ≤ k rows per key BEFORE the exchange (exact —
      // a row outside its partition's top-k cannot be in the global
      // top-k), so the shuffle carries ≤ partitions·keys·k rows, never
      // the full input
      TopKPerKeyExec(keys, ordering, k,
        TopKPerKeyExec(keys, ordering, k, planLater(child),
          partial = true)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  require(k >= 1, s"top-k requires k >= 1, got $k")
  require(keys.nonEmpty, "top-k requires at least one grouping key")

  override def output: Seq[Attribute] = child.output

  /** final pass: one hash shuffle on the keys — all surviving rows of a
    * key meet in one task; partial pass: runs wherever the data already
    * is
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  /** rows never move between partitions here, so downstream operators
    * clustered on the same keys (a per-key window rank, a grouped agg)
    * must not re-shuffle the survivors
    */
  override def outputPartitioning: Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrders = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateOrdering.generate(sortOrders, childOutput)
      // per key: bounded heap holding the current top-k, worst on top
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            limit + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrd.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopK {

  /** Install the strategy once per session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Keep the first `k` rows per key under `orderBy` (add a unique
    * tie-break column for deterministic results).
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    require(keyCols.nonEmpty, "top-k requires at least one grouping key")
    val spark = df.sparkSession
    ensureRegistered(spark)
    // Column is a lazy node in Spark 4 — get fully-resolved catalyst
    // expressions by letting the analyzer process a Sort over df, then
    // lift its SortOrder list (the Sort's child IS df.analyzed, so
    // attribute ids line up with our node's child)
    val sorted = df.sort(orderBy: _*).queryExecution.analyzed
    val (sortOrders, child) = sorted match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
        (s.order, s.child)
      case other =>
        throw new IllegalStateException(s"expected Sort, got $other")
    }
    val keyExprs: Seq[Expression] = keyCols.map { c =>
      child.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
    }
    ColumnBridge.ofRows(spark, TopKPerKeyPlan(keyExprs, sortOrders, k, child))
  }
}
