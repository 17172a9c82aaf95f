package graft.functions

import scala.concurrent.duration._

/** Config/option parsing ops (SURVEY.md §2.1 O18) — behavioral twin of the
  * reference's parsers (logsqlite `src/config.rs:74-133,172-231`), as plain
  * Scala utilities (driver-side; no Catalyst involvement).
  *
  * Reference quirks preserved:
  *  - duration suffix is REQUIRED ("10" is an error; "10s" is not) and
  *    `m`/`M` both mean minutes (the README claims M=months; code wins —
  *    `src/config.rs:95`);
  *  - size suffix is REQUIRED, powers of 1024 (g/m/k/b, case-insensitive);
  *  - booleans accept only "true"/"false" (any case);
  *  - unknown option keys are silently ignored (`src/config.rs:225`).
  */
object LogConf {

  final case class LogConfig(
      maxLinesPerTx: Long = 10000L,
      maxSizePerTx: Long = 10L * 1024 * 1024,
      messageReadTimeout: FiniteDuration = 100.millis,
      cleanupAge: Option[FiniteDuration] = None,
      cleanupMaxLines: Option[Long] = Some(10000000L),
      cleanupInterval: FiniteDuration = 10.minutes,
      deleteWhenStopped: Boolean = true)

  private def splitNum(v: String, what: String): Either[String, (Long, String)] = {
    val pos = v.takeWhile(_.isDigit).length
    if (pos == 0) Left(s"Cannot parse $what: no number")
    else Right((v.substring(0, pos).toLong, v.substring(pos)))
  }

  /** "10s" | "5m" | "2h" | "7d" | "1w" → duration (suffix required). */
  def parseDuration(v: String): Either[String, FiniteDuration] =
    splitNum(v, "time").flatMap { case (num, suffix) =>
      suffix match {
        case "w" | "W" => Right((num * 7 * 24 * 60 * 60).seconds)
        case "d" | "D" => Right((num * 24 * 60 * 60).seconds)
        case "h" | "H" => Right((num * 60 * 60).seconds)
        case "m" | "M" => Right((num * 60).seconds)
        case "s" | "S" => Right(num.seconds)
        case s => Left(s"""Unknown time specifier "$s"""")
      }
    }

  /** "10G" | "512m" | "64k" | "128b" → bytes (powers of 1024, suffix required). */
  def parseSiSize(v: String): Either[String, Long] =
    splitNum(v, "size").flatMap { case (num, suffix) =>
      suffix match {
        case "g" | "G" => Right(num * 1024L * 1024 * 1024)
        case "m" | "M" => Right(num * 1024L * 1024)
        case "k" | "K" => Right(num * 1024L)
        case "b" | "B" => Right(num)
        case s => Left(s"""Unknown time specifier "$s"""")
      }
    }

  def parseBool(v: String): Either[String, Boolean] = v.toLowerCase match {
    case "true"  => Right(true)
    case "false" => Right(false)
    case _ => Left("""delete_when_stopped is neither "true" or "false"""")
  }

  /** Per-container option map over defaults (`src/config.rs:186-231`):
    * known keys override, unknown keys are ignored, first parse error wins.
    */
  def fromOptions(opts: Map[String, String]): Either[String, LogConfig] =
    opts.foldLeft[Either[String, LogConfig]](Right(LogConfig())) {
      case (acc, (key, value)) => acc.flatMap { c =>
        key match {
          case "message_read_timeout" =>
            value.toLongOption.map(ms => c.copy(messageReadTimeout = ms.millis))
              .toRight(s"invalid integer: $value")
          case "max_lines_per_tx" =>
            value.toLongOption.map(n => c.copy(maxLinesPerTx = n))
              .toRight(s"invalid integer: $value")
          case "max_size_per_tx" =>
            parseSiSize(value).map(n => c.copy(maxSizePerTx = n))
          case "cleanup_age" =>
            parseDuration(value).map(a => c.copy(cleanupAge = Some(a)))
          case "cleanup_max_lines" =>
            value.toLongOption.map(n => c.copy(cleanupMaxLines = Some(n)))
              .toRight(s"invalid integer: $value")
          case "delete_when_stopped" =>
            parseBool(value).map(b => c.copy(deleteWhenStopped = b))
          case _ => Right(c)
        }
      }
    }
}
