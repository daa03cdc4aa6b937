package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

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
  * is unspecified, like any aggregation — unless `rankCol` is set, in
  * which case the final pass also emits each survivor's 1-based rank
  * under `ordering` as an extra Long column (the heap already ordered
  * the rows; numbering them here is free and saves consumers a
  * redundant window sort over the survivors).
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child, rankAttr) =>
      // two-phase, like any aggregate: a partial pass prunes each input
      // partition to ≤ k rows per key BEFORE the exchange (exact —
      // a row outside its partition's top-k cannot be in the global
      // top-k), so the shuffle carries ≤ partitions·keys·k rows, never
      // the full input
      TopKPerKeyExec(keys, ordering, k,
        TopKPerKeyExec(keys, ordering, k, planLater(child),
          partial = true),
        rankAttr = rankAttr) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  require(k >= 1, s"top-k requires k >= 1, got $k")
  require(keys.nonEmpty, "top-k requires at least one grouping key")
  require(rankAttr.isEmpty || !partial, "rank is a final-pass output")

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

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
    val isPartial = partial
    val emitRank = rankAttr.isDefined
    val outputAttrs = output
    // driver-side conf read, captured into the task closure
    val rowBudget =
      conf.getConfString("graft.topk.partialRowBudget",
        TopK.PartialHeapRowBudget.toString).toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateOrdering.generate(sortOrders, childOutput)
      // per key: bounded heap holding the current top-k, worst on top
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      // memory fallback (partial pass only): heaps hold up to keys·k
      // row copies per INPUT partition — with high-cardinality keys
      // randomly distributed that is a new OOM surface the single-phase
      // plan never had. Past the row budget, stop admitting NEW keys
      // and pass their rows straight through (the final pass prunes
      // exactly; the partial pass is only ever an optimization) —
      // mirroring partial-aggregation fallback. The budget RESERVES k
      // rows per admitted key up front: accounting admissions lazily
      // (one row at a time) would cap the key count but let
      // already-admitted heaps keep growing to k each, overshooting
      // the budget by up to k× in exactly the random-key-order
      // scenario the guard exists for.
      var reservedRows = 0L
      val pruned = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (isPartial && reservedRows + limit > rowBudget) {
            // fallback: untracked key past the budget — emit as-is
            Iterator.single(row)
          } else {
            heap = new java.util.PriorityQueue[InternalRow](
              limit + 1, rowOrd.reverse)
            heaps.put(key.copy(), heap)
            heap.add(row.copy())
            reservedRows += limit
            Iterator.empty
          }
        } else {
          if (heap.size < limit) heap.add(row.copy())
          else if (rowOrd.lt(row, heap.peek())) {
            heap.poll()
            heap.add(row.copy())
          }
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // `++` keeps the drain lazy: heaps are complete only once the
      // child iterator is exhausted
      val drained =
        if (!emitRank)
          pruned ++ heaps.values().iterator().asScala
            .flatMap(_.iterator().asScala)
        else {
          // final pass with rank: drain each heap sorted and append the
          // 1-based position — the heap did the ordering work already
          val toUnsafe = UnsafeProjection.create(
            outputAttrs.map(_.dataType).toArray)
          val rankRow = new GenericInternalRow(1)
          val joined = new JoinedRow
          pruned ++ heaps.values().iterator().asScala.flatMap { heap =>
            val arr = heap.toArray(new Array[InternalRow](heap.size))
            java.util.Arrays.sort(arr, rowOrd)
            arr.iterator.zipWithIndex.map { case (r, i) =>
              rankRow.setLong(0, i + 1L)
              toUnsafe(joined(r, rankRow))
            }
          }
        }
      drained
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopK {

  /** Partial-pass heap budget in retained row copies per input
    * partition (override with SQL conf `graft.topk.partialRowBudget`).
    * Past this, new keys bypass the heap and flow to the exchange
    * unpruned (correctness unaffected — the final pass prunes
    * exactly). 2²¹ rows ≈ tens of MB for typical narrow top-k inputs,
    * far below an executor-thread share of the heap.
    */
  val PartialHeapRowBudget: Long = 1L << 21

  /** Install the strategy once per session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Keep the first `k` rows per key under `orderBy` (add a unique
    * tie-break column for deterministic results). With `rankCol` set,
    * the result carries each row's 1-based rank within its key under
    * `orderBy` as an extra Long column — emitted by the final heap
    * pass, so no window operator appears anywhere in the plan.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[Column], k: Int,
      rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    require(keyCols.nonEmpty, "top-k requires at least one grouping key")
    // a rank column shadowing an input column would emit TWO
    // same-named attributes (child.output ++ rankAttr) — ambiguous
    // references or silently wrong resolution downstream. Match with
    // the session's resolver: under the default case-INsensitive
    // analysis, "RK" vs "rk" is exactly such a collision
    val caseSensitive =
      df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    rankCol.foreach(n => require(
      !df.columns.exists(c => if (caseSensitive) c == n
        else c.equalsIgnoreCase(n)),
      s"rankCol '$n' already exists in the input columns " +
        s"(${df.columns.mkString(", ")}); pick an unused name"))
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
    val rankAttr = rankCol.map(n =>
      AttributeReference(n, LongType, nullable = false)())
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keyExprs, sortOrders, k, child, rankAttr))
  }
}
