package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Ports the version-gap truth table (`database.rs:988-1049`) and the
  * proptest invariants (`writer_thread_pool.rs:1607-1830`).
  */
class VersionsSpec extends AnyFunSuite with graft.PropHelpers {
  import ExpectedVersion._
  import CurrentVersion.{Current, Empty => NoStream}

  test("truth table: Any matches everything") {
    assert(Any.gapFrom(NoStream) == VersionGap.None)
    assert(Any.gapFrom(Current(0)) == VersionGap.None)
    assert(Any.gapFrom(Current(42)) == VersionGap.None)
  }

  test("truth table: Exists") {
    assert(Exists.gapFrom(NoStream) == VersionGap.Incompatible)
    assert(Exists.gapFrom(Current(0)) == VersionGap.None)
    assert(Exists.gapFrom(Current(9)) == VersionGap.None)
  }

  test("truth table: Empty") {
    assert(Empty.gapFrom(NoStream) == VersionGap.None)
    assert(Empty.gapFrom(Current(0)) == VersionGap.Ahead(1))
    assert(Empty.gapFrom(Current(4)) == VersionGap.Ahead(5))
  }

  test("truth table: Exact") {
    assert(Exact(3).gapFrom(Current(3)) == VersionGap.None)
    assert(Exact(3).gapFrom(Current(1)) == VersionGap.Behind(2))
    assert(Exact(1).gapFrom(Current(3)) == VersionGap.Ahead(2))
    assert(Exact(3).gapFrom(NoStream) == VersionGap.Behind(4))
  }

  val genCurrent: Gen[CurrentVersion] = Gen.oneOf(
    Gen.const(NoStream), Gen.chooseNum(0L, 1000000L).map(Current(_)))

  test("property: Any never fails") {
    forAllSampled(genCurrent) { c => assert(Any.isSatisfiedBy(c)) }
  }

  test("property: Empty fails iff stream has events") {
    forAllSampled(genCurrent) { c =>
      assert(Empty.isSatisfiedBy(c) == (c == NoStream))
    }
  }

  test("property: Exact satisfied iff equal") {
    forAllSampled(Gen.chooseNum(0L, 100L), genCurrent) { (e, c) =>
      assert(Exact(e).isSatisfiedBy(c) == (c == Current(e)))
    }
  }

  test("next version advances by one") {
    forAllSampled(Gen.chooseNum(0L, 1000L)) { v =>
      assert(Current(v).next == v + 1)
    }
    assert(NoStream.next == 0L)
  }

  test("strict mode rejects Any/Exists") {
    assert(!Any.isStrictAllowed && !Exists.isStrictAllowed)
    assert(Empty.isStrictAllowed && Exact(0).isStrictAllowed)
  }

  test("parse round-trips the wire grammar") {
    assert(ExpectedVersion.parse("any") == Right(Any))
    assert(ExpectedVersion.parse("exists") == Right(Exists))
    assert(ExpectedVersion.parse("empty") == Right(Empty))
    assert(ExpectedVersion.parse("17") == Right(Exact(17)))
    assert(ExpectedVersion.parse("-1").isLeft)
    assert(ExpectedVersion.parse("bogus").isLeft)
  }

  test("stream id validation: 1-64 bytes, no NUL") {
    assert(StreamId.isValid("a"))
    assert(StreamId.isValid("a" * 64))
    assert(!StreamId.isValid(""))
    assert(!StreamId.isValid("a" * 65))
    assert(!StreamId.isValid("bad\u0000id"))
    // multi-byte UTF-8 counts bytes, not chars
    assert(!StreamId.isValid("é" * 33)) // 66 bytes
    assert(StreamId.isValid("é" * 32)) // 64 bytes
  }
}
