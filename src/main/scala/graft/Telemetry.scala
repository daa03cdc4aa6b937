package graft

/** Harness-level run telemetry: scale witnesses the bench reads after
  * invoking a gated query opaquely through `SparkEntry.queries`. The
  * ops library stays free of mutable state — the QUERY layer (which
  * knows it is the one being measured) records here, and only `Bench`
  * reads. Single-driver, sequential-leg scope by design; a value is
  * valid only immediately after the leg that wrote it.
  */
object Telemetry {
  /** Large/small-star rounds of the most recent connected-components
    * fixpoint run by the `dedup_clusters` gated query (-1 before any
    * run). Steady rounds between 1× and 10× prove the replica's pair
    * graph contracts identically at both scales.
    */
  val ccRounds = new java.util.concurrent.atomic.AtomicInteger(-1)
}
