package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

import LogConf._

/** Unit tables from the reference parsers (logsqlite
  * `src/config.rs:74-133,186-231`), including the documented quirks.
  */
class LogConfSpec extends AnyFunSuite {

  test("duration suffix table (w/d/h/m/s, case-insensitive)") {
    assert(parseDuration("1w") === Right(7.days))
    assert(parseDuration("2D") === Right(2.days))
    assert(parseDuration("3h") === Right(3.hours))
    assert(parseDuration("10s") === Right(10.seconds))
    assert(parseDuration("0s") === Right(0.seconds))
  }

  test("m AND M both mean minutes — code wins over the README's 'months' claim (src/config.rs:95)") {
    assert(parseDuration("5m") === Right(5.minutes))
    assert(parseDuration("5M") === Right(5.minutes))
  }

  test("duration: suffix is required, number is required") {
    assert(parseDuration("10").isLeft)   // bare number → error in the reference too
    assert(parseDuration("s").isLeft)
    assert(parseDuration("").isLeft)
    assert(parseDuration("10x").isLeft)
  }

  test("SI size table (g/m/k/b, powers of 1024, case-insensitive)") {
    assert(parseSiSize("1g") === Right(1024L * 1024 * 1024))
    assert(parseSiSize("2G") === Right(2048L * 1024 * 1024))
    assert(parseSiSize("10M") === Right(10L * 1024 * 1024))
    assert(parseSiSize("64k") === Right(64L * 1024))
    assert(parseSiSize("128B") === Right(128L))
    assert(parseSiSize("128").isLeft)
    assert(parseSiSize("1T").isLeft)
  }

  test("bool parse accepts only true/false, any case") {
    assert(parseBool("true") === Right(true))
    assert(parseBool("FALSE") === Right(false))
    assert(parseBool("yes").isLeft)
  }

  test("defaults match the reference (src/config.rs:172-184)") {
    val c = LogConfig()
    assert(c.maxLinesPerTx === 10000L)
    assert(c.maxSizePerTx === 10L * 1024 * 1024)
    assert(c.messageReadTimeout === 100.millis)
    assert(c.cleanupAge === None)
    assert(c.cleanupMaxLines === Some(10000000L))
    assert(c.cleanupInterval === 10.minutes)
    assert(c.deleteWhenStopped === true)
  }

  test("per-container options override defaults; unknown keys ignored") {
    val c = fromOptions(Map(
      "max_lines_per_tx" -> "500",
      "max_size_per_tx" -> "1m",
      "cleanup_age" -> "2h",
      "delete_when_stopped" -> "false",
      "definitely_not_a_key" -> "whatever"))
    assert(c === Right(LogConfig(
      maxLinesPerTx = 500L,
      maxSizePerTx = 1024L * 1024,
      cleanupAge = Some(2.hours),
      deleteWhenStopped = false)))
    assert(fromOptions(Map("cleanup_age" -> "oops")).isLeft)
  }
}
