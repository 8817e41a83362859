package graft.dql

/** DQL tokenizer (reference: `src/dql_lexer.xrl`): case-insensitive
  * keywords, `'single-quoted'` parts with `\'` escapes, bare identifiers,
  * integers/floats, time-unit suffix words, `$` variables, and the symbol
  * set of the grammar.
  */
object Lexer {
  sealed trait Tok
  final case class TKw(kw: String) extends Tok       // upper-cased keyword
  final case class TPart(s: String) extends Tok      // quoted or bare name
  final case class TInt(v: Long) extends Tok
  final case class TFloat(v: Double) extends Tok
  final case class TSym(s: String) extends Tok       // punctuation / operator
  case object TEnd extends Tok

  val keywords: Set[String] = Set(
    "SELECT", "LAST", "AS", "FROM", "BUCKET", "ALIAS", "ALL", "WHERE",
    "BETWEEN", "AND", "OR", "NOT", "AGO", "NOW", "AFTER", "BEFORE", "FOR",
    "TOP", "BOTTOM", "BY", "GROUP", "USING", "EVENTS", "SHIFT", "METADATA")

  /** multi-char symbols first so `>=` doesn't lex as `>`,`=` */
  private val symbols = Seq("==", "!=", ">=", "=<", "<=", "~=", ".", ",",
    "(", ")", "{", "}", "[", "]", "*", "+", "-", "/", "=", ">", "<", ":",
    "$")

  final case class LexError(msg: String) extends RuntimeException(msg)

  def lex(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input(i) == '\\' && i + 1 < n) { sb.append(input(i + 1)); i += 2 }
          else if (input(i) == '\'') { closed = true; i += 1 }
          else { sb.append(input(i)); i += 1 }
        }
        if (!closed) throw LexError(s"unterminated quote at offset $i")
        out += TPart(sb.toString)
      } else if (c.isDigit) {
        val start = i
        while (i < n && input(i).isDigit) i += 1
        if (i < n && input(i) == '.' && i + 1 < n && input(i + 1).isDigit) {
          i += 1
          while (i < n && input(i).isDigit) i += 1
          out += TFloat(input.substring(start, i).toDouble)
        } else out += TInt(input.substring(start, i).toLong)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        val word = input.substring(start, i)
        val up = word.toUpperCase
        if (keywords.contains(up)) out += TKw(up)
        else out += TPart(word)
      } else {
        symbols.find(s => input.startsWith(s, i)) match {
          case Some(s) => out += TSym(s); i += s.length
          case None => throw LexError(s"unexpected character '$c' at offset $i")
        }
      }
    }
    out += TEnd
    out.result()
  }
}
