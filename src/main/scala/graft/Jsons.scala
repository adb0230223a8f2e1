package graft

/** Shared minimal JSON string quoting for the driver-contract mains
  * (Verify's oracle_sql.json, Bench's one-line artifact). Escapes
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL or an exception message would otherwise make the
  * driver's json.load fail and silently zero the round's artifact.
  */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
