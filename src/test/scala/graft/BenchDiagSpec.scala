package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-diagnosis hooks (round-9 response to three rounds of
  * load-corrupted official artifacts needing out-of-band rehabilitation).
  */
class BenchDiagSpec extends AnyFunSuite {

  test("MaxIterWatch counts optimizer fixpoint warnings from any logger") {
    // the bare test JVM has no Spark log config (root=ERROR, which would
    // drop the WARN before any appender); Bench itself runs after
    // setLogLevel("WARN"), so mirror that here
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.WARN)
    Bench.MaxIterWatch.install()
    val before = Bench.MaxIterWatch.hits.get()
    // the exact message shape RuleExecutor logs when a rule ping-pongs
    // (the r8 PartialAggRule↔FederationRule bug's only symptom)
    val log = org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.rules.RuleExecutor")
    log.warn("Max iterations (100) reached for batch Operator " +
      "Optimization before Inferring Filters, please set " +
      "'spark.sql.optimizer.maxIterations' to a larger value.")
    log.warn("some unrelated warning")
    assert(Bench.MaxIterWatch.hits.get() == before + 1)
  }

  test("loaded-box requeue: mins parse from the committed record format " +
      "and only >1.5x-vs-committed gates with real minima re-run") {
    val record =
      """{"metric":"total","value":9.9,"unit":"sec",
        |"queries":{"a":0.5,"b":1.0},
        |"mins":{"a":0.4,"b":0.9,"c":0.03,"d":2.0}}""".stripMargin
    val mins = Bench.parseMins(record)
    assert(mins == Map("a" -> 0.4, "b" -> 0.9, "c" -> 0.03, "d" -> 2.0))
    val medians = Seq(
      "a" -> 0.9, // 2.25x its 0.4 min -> requeue
      "b" -> 1.2, // 1.33x -> fine
      "c" -> 0.5, // 16x, but the min is sub-50ms noise -> skip
      "d" -> -1.0, // errored in the sweep -> skip
      "e" -> 9.0) // no committed min (new gate) -> skip
    assert(Bench.requeueSuspects(medians, mins) == Seq("a"))
    // a record without mins (pre-r11 format) parses to empty, so the
    // requeue degrades to a no-op instead of throwing mid-record
    assert(Bench.parseMins("""{"metric":"total","value":1}""").isEmpty)
  }

  test("quiet-box calibration pins exist for the driver's cpu counts") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/bench_calibration.json")), "UTF-8")
    for (c <- Seq("8", "32"))
      assert(s""""$c"\\s*:\\s*([0-9.]+)""".r.findFirstIn(txt).isDefined,
        s"no pin for cpus=$c")
  }
}
