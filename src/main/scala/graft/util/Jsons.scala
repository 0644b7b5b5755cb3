package graft.util

import java.util.Locale

/** Machine-read JSON output helpers shared by the Bench and Verify mains.
  * Every record line those mains print is parsed by an external driver, so
  * two classes of host-dependent corruption must be impossible by
  * construction: un-escaped string values (a quote/backslash/control char
  * in an env-provided path or an error message breaks the whole line) and
  * locale-dependent number formatting (the default-locale `f"%.3f"` prints
  * a COMMA decimal separator under e.g. LANG=de_DE — invalid JSON). */
object Jsons {

  /** JSON string literal: escapes backslash, quote and ALL control chars,
    * wraps in quotes. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Fixed-decimal number, always '.'-separated regardless of locale.
    * Non-finite values print as JSON null — a bare NaN/Infinity token is
    * invalid JSON and would break the driver's parse of the whole record
    * line, the exact corruption class this module exists to preclude. */
  def num(d: Double, digits: Int): String =
    if (java.lang.Double.isFinite(d))
      String.format(Locale.ROOT, s"%.${digits}f", Double.box(d))
    else "null"
}
