package graft

/** Shared JSON string escaping for the machine-parsed driver protocol lines
  * (Verify's oracle_sql.json, Bench's one-line report) — one escaper so the
  * two emitters can't drift.
  */
private[graft] object JsonOut {
  /** Quote + escape backslash, quote, and ALL control chars (<0x20). */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
