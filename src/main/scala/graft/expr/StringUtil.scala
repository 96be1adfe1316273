package graft.expr

/** Identity/literal quoting helpers mirroring the reference's
  * expr/stringutil.go (IdentityMaybeQuote, IdentityMaybeQuoteStrict,
  * LiteralQuoteEscape, StringUnEscape, LeftRight). Used by dialect
  * writers and by `Node.text` to print always-reparseable forms.
  */
object StringUtil {

  private def plain(s: String): Boolean =
    s.nonEmpty && (s.head.isLetter || s.head == '_') &&
      s.forall(c => c.isLetterOrDigit && c < 128 || c == '_')

  /** Quote an identity with `q` unless it is already quoted or is a
    * plain identifier; embedded quote chars are doubled. */
  def identityMaybeQuote(q: Char, s: String): String =
    if (s.nonEmpty && s.head == q) s // already escaped
    else if (plain(s) && !s.head.isDigit) s
    else q + s.replace(q.toString, s"$q$q") + q

  /** Like [[identityMaybeQuote]] but quotes leading-underscore names
    * too (the strict MySQL-compatible form). */
  def identityMaybeQuoteStrict(q: Char, s: String): String =
    if (s.nonEmpty && s.head == '_') q + s.replace(q.toString, s"$q$q") + q
    else identityMaybeQuote(q, s)

  /** Quote a literal with `q` unless already fully quoted; embedded
    * quote chars are doubled. The "already quoted" passthrough is a
    * first/last-char heuristic ported as-is from the reference (its
    * tests pin `"name"` → unchanged); a value like `"a" OR "b"` passes
    * through untouched — callers quoting UNTRUSTED values should quote
    * unconditionally instead. */
  def literalQuoteEscape(q: Char, s: String): String =
    if (s.length >= 2 && s.head == q && s.last == q) s // already escaped
    else q + s.replace(q.toString, s"$q$q") + q

  /** Un-escape both supported forms (backslash-escape `\"` and doubled
    * `""`); returns (value, wasUnescaped). */
  def stringUnEscape(q: Char, s: String): (String, Boolean) = {
    val sb = new StringBuilder
    var changed = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == q) {
        sb.append(q); changed = true; i += 2
      } else if (c == q && i + 1 < s.length && s.charAt(i + 1) == q) {
        sb.append(q); changed = true; i += 2
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, changed)
  }

  /** Split a (possibly backtick-quoted) identity into (left, right,
    * hasLeft): `table.column` → ("table","column",true);
    * a fully-quoted single part has no left. Unquoted names split at
    * the FIRST period (legacy reference behavior). */
  def leftRight(s: String): (String, String, Boolean) =
    if (s.startsWith("`")) {
      val close = s.indexOf('`', 1)
      if (close < 0) ("", s, false)
      else if (close == s.length - 1) ("", s.substring(1, close), false)
      else {
        // `left`.`right` or `left`.right
        val left = s.substring(1, close)
        var rest = s.substring(close + 1)
        if (rest.startsWith(".")) rest = rest.substring(1)
        val right =
          if (rest.startsWith("`") && rest.endsWith("`") && rest.length >= 2)
            rest.substring(1, rest.length - 1)
          else rest
        (left, right, true)
      }
    } else {
      val dot = s.indexOf('.')
      if (dot < 0) ("", s, false)
      else (s.substring(0, dot), s.substring(dot + 1), true)
    }
}
