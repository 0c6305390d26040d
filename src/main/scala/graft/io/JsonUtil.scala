package graft.io

/** Shared JSON string escaping (used by Verify's oracle dump and
  * EvalJob's prediction-data mirror): backslash, quote, and ALL control
  * chars (< 0x20) — a stray tab or CR would otherwise break a consumer's
  * strict json parse. */
object JsonUtil {
  def quote(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
