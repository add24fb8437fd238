package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the solo-retime adjudication's input: the r11 regex parser
  * tolerated no whitespace after colons, so the moment BENCH_IDLE.json
  * was committed pretty-printed the parser silently returned an empty
  * map and the retimer never fired again. These tests feed the parser
  * the ACTUAL committed file (whatever shape it is written in today)
  * plus both canonical shapes, so a format drift fails the build
  * instead of silently disarming the bench's self-adjudication. */
class BenchIdleParseSpec extends AnyFunSuite {

  private val canonicalSf = "/root/testdata/sf0.1"

  test("the committed BENCH_IDLE.json parses to a full-sized map") {
    val p = java.nio.file.Paths.get("BENCH_IDLE.json")
    assert(java.nio.file.Files.exists(p), "BENCH_IDLE.json must be committed")
    val txt = new String(java.nio.file.Files.readAllBytes(p))
    val idle = Bench.parseIdleBaseline(txt, canonicalSf)
    assert(idle.size >= 200,
      s"committed idle baseline parsed to only ${idle.size} entries — " +
        "the solo-retime adjudication is disarmed")
    assert(idle.values.forall(v => v >= 0.0 && v < 3600.0),
      "idle seconds out of range — wrong fields captured")
    // known stable queries must be present with their own times
    assert(idle.contains("a1_ingest") && idle.contains("c9_quality"))
  }

  test("pretty-printed and compact shapes parse identically") {
    val compact =
      s"""{"queries":{"a1":0.5,"b2":1.25},"metric":"total","value":1.75,"sf":"$canonicalSf"}"""
    val pretty =
      s"""{
         |  "queries": {
         |    "a1": 0.5,
         |    "b2": 1.25
         |  },
         |  "metric": "total",
         |  "value": 1.75,
         |  "sf": "$canonicalSf"
         |}""".stripMargin
    val want = Map("a1" -> 0.5, "b2" -> 1.25)
    assert(Bench.parseIdleBaseline(compact, canonicalSf) == want)
    assert(Bench.parseIdleBaseline(pretty, canonicalSf) == want)
  }

  test("a baseline at a different sf is rejected; garbage is empty") {
    val txt = s"""{"queries":{"a1":0.5},"sf":"/root/testdata/sf0.01"}"""
    assert(Bench.parseIdleBaseline(txt, canonicalSf).isEmpty)
    assert(Bench.parseIdleBaseline("not json at all", canonicalSf).isEmpty)
    assert(Bench.parseIdleBaseline("""{"sf":"x"}""", canonicalSf).isEmpty)
  }
}
