package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `Bench merge`'s board-folding math and its canary gate: medians are
  * unbiased at even run counts, and runs whose canaries say "different
  * box" are excluded mechanically — with the exclusions recorded in the
  * output instead of adjudicated by hand (BENCH_NOTES' old protocol). */
class BenchMergeSpec extends AnyFunSuite {

  private def writeRun(
      dir: java.nio.file.Path, name: String, canary: Double,
      shuffle: Double, qs: Map[String, Any]): String = {
    val qjson = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":0,"unit":"sec","queries":$qjson,"sf":"/tmp/sf","failed":0,"passes":3,"stat":"median","canary":$canary,"shuffle_canary":$shuffle}"""
    val p = dir.resolve(name)
    Files.writeString(p, line)
    p.toString
  }

  test("median averages the two middle elements at even sizes (no systematic upward bias)") {
    assert(Bench.medianOf(Seq(1.0, 2.0, 3.0)) === 2.0)
    assert(Bench.medianOf(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
    assert(Bench.medianOf(Seq(4.0)) === 4.0)
    assert(Bench.medianOf(Seq(2.0, 4.0)) === 3.0)
  }

  test("canary gate: a drifted run is excluded with a recorded reason; medians fold only quiet runs") {
    val dir = Files.createTempDirectory("benchmerge")
    // four runs: three quiet (canary ~0.06), one on a loud box (0.12 =
    // +100% CPU canary) whose query times are uniformly inflated
    val paths = Seq(
      writeRun(dir, "a.json", 0.060, 0.30, Map("q1" -> 1.0, "q2" -> 2.0)),
      writeRun(dir, "b.json", 0.062, 0.31, Map("q1" -> 1.2, "q2" -> 2.2)),
      writeRun(dir, "c.json", 0.061, 0.29, Map("q1" -> 1.1, "q2" -> 2.1)),
      writeRun(dir, "d.json", 0.120, 0.62, Map("q1" -> 3.0, "q2" -> 6.0)))
    val (json, failed) = Bench.mergeBoardsJson(paths)
    assert(failed === 0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("runs").asInt === 3, "the loud run must not merge")
    assert(node.get("queries").get("q1").asDouble === 1.1)
    assert(node.get("queries").get("q2").asDouble === 2.1)
    val excl = node.get("excluded_runs")
    assert(excl.size === 1 && excl.get(0).get("path").asText.endsWith("d.json"))
    assert(excl.get(0).get("reason").asText.contains("canary"))
    assert(!json.contains("3.0"), "excluded samples must not leak into medians")
    // cross-round normalization (round 14): total adjusted to the
    // recorded reference canary window, so BENCH_NOTES can compare
    // rounds without re-litigating box drift by hand
    assert(node.get("ref_canary").asDouble === Bench.RefCanary)
    val total = node.get("value").asDouble
    val canary = node.get("canary").asDouble
    assert(math.abs(node.get("normalized_total").asDouble -
      total * Bench.RefCanary / canary) < 1e-9)
  }

  test("gating needs a quorum: with fewer than 3 runs everything merges, even-count medians average") {
    val dir = Files.createTempDirectory("benchmerge2")
    val paths = Seq(
      writeRun(dir, "a.json", 0.060, 0.30, Map("q1" -> 1.0)),
      writeRun(dir, "b.json", 0.200, 0.90, Map("q1" -> 3.0)))
    val (json, _) = Bench.mergeBoardsJson(paths)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("runs").asInt === 2)
    assert(node.get("excluded_runs").size === 0)
    assert(node.get("queries").get("q1").asDouble === 2.0,
      "even-count median must be the average of the middle pair")
  }

  test("a query erring in any KEPT run stays err; an err only in an EXCLUDED run does not poison the board") {
    val dir = Files.createTempDirectory("benchmerge3")
    val paths = Seq(
      writeRun(dir, "a.json", 0.060, 0.30, Map("q1" -> 1.0, "q2" -> "\"err\"")),
      writeRun(dir, "b.json", 0.061, 0.31, Map("q1" -> 1.1, "q2" -> 2.0)),
      writeRun(dir, "c.json", 0.062, 0.30, Map("q1" -> 1.2, "q2" -> 2.1)),
      writeRun(dir, "d.json", 0.150, 0.70, Map("q1" -> "\"err\"", "q2" -> 5.0)))
    val (json, failed) = Bench.mergeBoardsJson(paths)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(failed === 1, "q2 erred in a kept run")
    assert(node.get("queries").get("q2").asText === "err")
    assert(node.get("queries").get("q1").isNumber,
      "q1's err lived only in the excluded run")
  }
}
