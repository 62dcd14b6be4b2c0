package graft.evm

import scala.collection.mutable

/** Minimal dependency-free JSON parse/render for the RPC layer (params
  * arrays, fake-chain documents). Values map to: String, BigDecimal,
  * Boolean, null, List[Any], Map[String, Any] (insertion-ordered).
  */
object Json {

  def render(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + Abi.jsonEscape(s) + "\""
    case b: Boolean => b.toString
    case n: BigDecimal => n.bigDecimal.toPlainString
    case n: BigInt => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => "\"" + Abi.jsonEscape(k.toString) + "\":" + render(x) }
        .mkString("{", ",", "}")
    case xs: collection.Seq[_] => xs.map(render).mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(s"cannot render: $other")
  }

  /** Throws on malformed input. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  /** True if the string is a self-contained JSON document. */
  def isValid(s: String): Boolean =
    try { parse(s); true } catch { case _: Exception => false }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => literal("true", true)
        case 'f' => literal("false", false)
        case 'n' => literal("null", null)
        case _ => parseNumber()
      }
    }

    private def literal(lit: String, v: Any): Any = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
      v
    }

    private def parseObject(): Map[String, Any] = {
      expect('{'); skipWs()
      val out = mutable.LinkedHashMap.empty[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return out.toMap }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        out(k) = parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      out.toMap
    }

    private def parseArray(): List[Any] = {
      expect('['); skipWs()
      val out = mutable.ListBuffer.empty[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return out.toList }
      var done = false
      while (!done) {
        out += parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      out.toList
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (true) {
        require(!eof, "unterminated string")
        val c = s.charAt(pos)
        pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            require(!eof, "unterminated escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case other => throw new IllegalArgumentException(s"bad escape \\$other")
            }
          case other => sb.append(other)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseNumber(): BigDecimal = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (Character.isDigit(s.charAt(pos)) || "eE+-.".indexOf(s.charAt(pos)) >= 0))
        pos += 1
      require(pos > start, s"expected number at $start")
      BigDecimal(s.substring(start, pos))
    }
  }
}
