package graft

/** Minimal JSON emitters shared by the mains and the heap analysis
  * (no external deps allowed in this build). The escape covers quote,
  * backslash, and ALL control chars — one copy, so a future escaping
  * fix can't miss a duplicate.
  */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")
}
