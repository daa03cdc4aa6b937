package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check helper (the scalatest↔scalacheck bridge
  * artifact isn't in the offline cache): deterministically samples a
  * generator N times and runs the assertion block on each value.
  */
trait PropHelpers {
  val propRuns = 200

  def forAllSampled[A](gen: Gen[A], runs: Int = propRuns)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var attempts = 0
    while (done < runs && attempts < runs * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for sample: $a", e)
          }
          done += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    require(done > 0, "generator produced no samples")
  }

  def forAllSampled[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAllSampled(Gen.zip(ga, gb))(t => f(t._1, t._2))
}
