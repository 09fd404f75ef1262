package graft.cypher

/**
 * Hand-written lexer for the openCypher subset (the ANTLR codegen tool
 * is unavailable offline; the token set is small). Token categories
 * follow the reference grammar's lexical rules (reference:
 * src/openCypherParser/Grammar/CypherLexer.cs — generated; we only need
 * identifiers, keywords, numbers, strings, and punctuation).
 */
object Lexer {
  sealed trait Tok { def pos: Int }
  final case class Ident(s: String, pos: Int) extends Tok
  /** Keyword, stored upper-case; `raw` keeps the original spelling so
   *  keyword-shaped names remain usable as labels/properties (e.g. a
   *  node label `Order`). */
  final case class Kw(s: String, raw: String, pos: Int) extends Tok
  final case class NumLit(s: String, isFloat: Boolean, pos: Int) extends Tok
  final case class StrLit(s: String, pos: Int) extends Tok
  /** Punctuation / operator, e.g. "(", "<=", "<>", "->". */
  final case class Punct(s: String, pos: Int) extends Tok
  /** `$name` query parameter — lexed always, resolved (extensions on)
   *  or rejected (parity mode) by the parser. */
  final case class Param(name: String, pos: Int) extends Tok
  final case class EOF(pos: Int) extends Tok

  val keywords: Set[String] = Set(
    "MATCH", "OPTIONAL", "WHERE", "WITH", "RETURN", "DISTINCT", "ORDER",
    "BY", "ASC", "ASCENDING", "DESC", "DESCENDING", "LIMIT", "SKIP",
    "UNION", "ALL", "AND", "OR", "XOR", "NOT", "IN", "STARTS", "ENDS",
    "CONTAINS", "IS", "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN",
    "ELSE", "END", "AS",
    // recognized only to reject with a clear message (SURVEY.md §2.6)
    "UNWIND", "CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE",
    "CALL", "FILTER", "EXTRACT", "ANY", "NONE", "SINGLE", "EXISTS",
    "FOREACH")

  def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    def err(msg: String) = throw new CypherSyntaxException(s"$msg at offset $i")
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '/' && i + 1 < n && q(i + 1) == '/') {
        while (i < n && q(i) != '\n') i += 1
      }
      else if (c == '/' && i + 1 < n && q(i + 1) == '*') {
        val end = q.indexOf("*/", i + 2)
        if (end < 0) err("Unterminated comment")
        i = end + 2
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        val s = q.substring(start, i)
        val up = s.toUpperCase(java.util.Locale.ROOT)
        if (keywords(up)) out += Kw(up, s, start) else out += Ident(s, start)
      }
      else if (c == '`') {                       // escaped identifier
        val end = q.indexOf('`', i + 1)
        if (end < 0) err("Unterminated escaped identifier")
        out += Ident(q.substring(i + 1, end), i)
        i = end + 1
      }
      else if (c.isDigit || (c == '.' && i + 1 < n && q(i + 1).isDigit)) {
        val start = i
        var isFloat = false
        while (i < n && q(i).isDigit) i += 1
        if (i < n && q(i) == '.' && i + 1 < n && q(i + 1).isDigit) {
          isFloat = true; i += 1
          while (i < n && q(i).isDigit) i += 1
        }
        if (i < n && (q(i) == 'e' || q(i) == 'E')) {
          isFloat = true; i += 1
          if (i < n && (q(i) == '+' || q(i) == '-')) i += 1
          if (i >= n || !q(i).isDigit)
            err("Exponent requires at least one digit")
          while (i < n && q(i).isDigit) i += 1
        }
        out += NumLit(q.substring(start, i), isFloat, start)
      }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = q(i)
          if (ch == '\\' && i + 1 < n) {
            q(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'; case '\\' => sb += '\\'
              case '\'' => sb += '\''; case '"' => sb += '"'
              case other => sb += other
            }
            i += 2
          } else if (ch == quote) {
            // doubled quote = escaped quote (Cypher allows '' inside '...')
            if (i + 1 < n && q(i + 1) == quote) { sb += quote; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        if (!closed) { i = start; err("Unterminated string literal") }
        out += StrLit(sb.toString, start)
      }
      else if (c == '$') {
        val start = i
        i += 1
        if (i >= n || !(q(i).isLetter || q(i) == '_'))
          err("Expected a parameter name after '$'")
        val ns = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += Param(q.substring(ns, i), start)
      }
      else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        two match {
          case "<=" | ">=" | "<>" | "->" | "<-" | "=~" | ".." =>
            out += Punct(two, i); i += 2
          case "!=" =>
            // Neo4j's alternative inequality spelling — kept distinct
            // so the parser can accept it only with extensions (the
            // reference grammar has '<>' alone; Cypher.tokens)
            out += Punct("!=", i); i += 2
          case _ =>
            c match {
              case '(' | ')' | '[' | ']' | '{' | '}' | ',' | '.' | ':' |
                   '+' | '-' | '*' | '/' | '%' | '^' | '=' | '<' | '>' |
                   '|' | ';' | '&' | '!' =>
                out += Punct(c.toString, i); i += 1
              case _ => err(s"Unexpected character '$c'")
            }
        }
      }
    }
    out += EOF(n)
    out.result()
  }
}
