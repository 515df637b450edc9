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

  /** Full recursive JSON parser — objects become insertion-ordered
    * Map[String, Any], arrays Vector[Any], numbers Long (integral) or
    * Double, plus String/Boolean/null. Zero-dependency by the build's
    * design; the JSON-RPC framing of the MCP transport needs nested
    * values, which HeapServer's flat parser deliberately rejects.
    */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    if (p.i < s.length)
      throw new IllegalArgumentException(s"trailing JSON content at offset ${p.i}")
    v
  }

  private final class Parser(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed JSON: $what at offset $i")
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def value(): Any = {
      ws()
      if (i >= s.length) fail("missing value")
      s(i) match {
        case '{' => objBody()
        case '[' => arrBody()
        case '"' => stringBody()
        case 't' if s.startsWith("true", i) => i += 4; true
        case 'f' if s.startsWith("false", i) => i += 5; false
        case 'n' if s.startsWith("null", i) => i += 4; null
        case c if c == '-' || c.isDigit => number()
        case c => fail(s"unexpected '$c'")
      }
    }
    private def objBody(): Map[String, Any] = {
      expect('{')
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      ws()
      if (i < s.length && s(i) == '}') { i += 1; return out.toMap }
      var done = false
      while (!done) {
        ws()
        val k = stringBody()
        expect(':')
        out(k) = value()
        ws()
        if (i < s.length && s(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      out.toMap
    }
    private def arrBody(): Vector[Any] = {
      expect('[')
      val out = Vector.newBuilder[Any]
      ws()
      if (i < s.length && s(i) == ']') { i += 1; return out.result() }
      var done = false
      while (!done) {
        out += value()
        ws()
        if (i < s.length && s(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      out.result()
    }
    private def stringBody(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (i + 4 >= s.length) fail("bad \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => fail(s"bad escape \\$c")
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }
    private def number(): Any = {
      val st = i
      if (s(i) == '-') i += 1
      while (i < s.length && (s(i).isDigit || "+-.eE".indexOf(s(i).toInt) >= 0)) i += 1
      val tok = s.substring(st, i)
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble else tok.toLong
    }
  }
}
