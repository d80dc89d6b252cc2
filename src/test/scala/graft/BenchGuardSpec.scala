package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r14 "what's wrong #1": the dirty-overwrite guard recognized a
  * clean canonical by the literal substring `"load_warning":false`, so a
  * committed record re-serialized by Python tooling (`": "` separators)
  * silently disarmed it and the driver's load-warned end-of-round run
  * clobbered the clean BENCH_LOCAL.json. The guard is now
  * whitespace-insensitive; this spec locks BOTH serializations plus the
  * cases that must stay dirty. */
class BenchGuardSpec extends AnyFunSuite {

  test("clean record recognized in Scala-compact serialization") {
    assert(Bench.isCleanRecord(
      """{"metric":"total","value":90.807,"load_warning":false,"repeat":2}"""))
  }

  test("clean record recognized in Python-reserialized form (': ' separators)") {
    // json.dump(..., indent=1) style — the exact shape that disarmed the
    // r14 guard
    assert(Bench.isCleanRecord(
      """|{
         | "metric": "total",
         | "value": 90.807,
         | "load_warning": false,
         | "repeat": 2
         |}""".stripMargin))
  }

  test("load-warned record is NOT clean in either serialization") {
    assert(!Bench.isCleanRecord("""{"value":112.3,"load_warning":true}"""))
    assert(!Bench.isCleanRecord("{\n \"value\": 112.3,\n \"load_warning\": true\n}"))
  }

  test("missing flag / unreadable content is NOT clean") {
    assert(!Bench.isCleanRecord("""{"value":90.8}"""))
    assert(!Bench.isCleanRecord(""))
  }
}
