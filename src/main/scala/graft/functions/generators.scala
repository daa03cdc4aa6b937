package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Lazy C(n,2) pair generator over an array column: one output row
  * `(a, b)` per unordered element pair `(i < j)` of the input array —
  * the posting-list pair-emission primitive behind the capped
  * shingle-overlap tiers (`Dedup.shingleOverlap`).
  *
  * Why a custom `Generator` and not a double `explode`: the
  * compositional form
  * `select(explode(ids) as a, ids).select(a, explode(ids) as b)`
  * duplicates the FULL posting array into every one of its df exploded
  * rows — O(df²) bytes per posting bucket held across the generate
  * boundary, then another df² (a,b) rows of which half are discarded
  * by the `a < b` filter. At a 12.6M-pair candidate volume that
  * intermediate was the suite's single largest GC source (BENCH_r16:
  * `dedup_containment` gc 7.3 s at 10×). This generator walks the pair
  * index space lazily — no pair array, no per-row array copy, and only
  * the `i < j` half is ever emitted, so the per-bucket working set is
  * O(df) (the element snapshot) instead of O(df²).
  *
  * SORTED-INPUT CONTRACT: callers pass `sort_array(collect_list(id))`
  * over DISTINCT ids, so positional order (i < j) IS value order
  * (a < b) under the same ordering `col("a") < col("b")` used by the
  * self-join form — the emitted pair set is identical by construction
  * (DedupSpec pins it).
  *
  * `CodegenFallback` is deliberate: `GenerateExec`'s eval path streams
  * the iterator row-by-row (each emitted row is unsafe-projected
  * before the next is drawn), which is exactly the zero-materialization
  * behavior wanted; a codegen'd generator would have to materialize
  * the pair collection per input row.
  *
  * CONSUMER CONTRACT (read before reusing this class): the iterator
  * below emits ONE reused `GenericInternalRow`, which is safe only
  * because `GenerateExec`'s eval path copies each row (unsafe
  * projection) before the next `next()` call. That copy-before-next
  * behavior is a Spark internal, not a documented API guarantee —
  * Spark's own generators (Explode, Stack) allocate fresh rows. This
  * expression must therefore NEVER be evaluated outside a Generate
  * plan node (no direct `eval()` + buffering of the returned rows);
  * the behavior is pinned against Spark 4.1.x
  * (`GenerateExec.doExecute`'s per-row `pruneChildForResult` +
  * UnsafeProjection), and GeneratorsSpec's groupBy-over-pairs test is
  * the upgrade canary — a Spark version that starts buffering
  * generator output uncopied makes every pair collapse to the last
  * one and that test fails loudly.
  */
case class PairCombosExpr(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pairCombos requires an array column, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(
    StructField("a", elemType, nullable = true) ::
    StructField("b", elemType, nullable = true) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else {
        // snapshot the elements once: the source ArrayData may live in
        // a buffer the upstream operator reuses, and element accessors
        // (UTF8String) point into it — O(n) per bucket, the only
        // allocation proportional to the posting
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          vals(i) = if (arr.isNullAt(i)) null else arr.get(i, elemType)
          i += 1
        }
        new Iterator[InternalRow] {
          private var a = 0
          private var b = 1
          // ONE reused 2-field row: GenerateExec's eval path projects
          // each emitted row to an UnsafeRow before drawing the next,
          // so the buffer is copied out before mutation — the same
          // reuse contract every streaming SparkPlan leans on
          private val row = new GenericInternalRow(2)
          override def hasNext: Boolean = a < n - 1
          override def next(): InternalRow = {
            row.update(0, vals(a))
            row.update(1, vals(b))
            b += 1
            if (b == n) { a += 1; b = a + 1 }
            row
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): PairCombosExpr =
    copy(child = c)
}

/** Column API for the generator expressions. */
object gen {
  /** All unordered element pairs of `arr` as generator output columns
    * — alias with `.as(Seq("a", "b"))`. See [[PairCombosExpr]] for the
    * sorted-distinct input contract.
    */
  def pairCombos(arr: Column): Column =
    ColumnBridge.column(PairCombosExpr(ColumnBridge.expression(arr)))
}
