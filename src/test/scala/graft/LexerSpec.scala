package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Lexer
import graft.expr.Lexer._

/** Tokenizer edge cases (lex/lexer_test.go parity shapes). */
class LexerSpec extends AnyFunSuite {

  private def kinds(s: String) = Lexer.lex(s).map(_.kind)
  private def texts(s: String) = Lexer.lex(s).map(_.text)

  test("comments are skipped") {
    assert(texts("a -- trailing comment\n+ b") == Vector("a", "+", "b", ""))
    assert(texts("a /* block */ + b") == Vector("a", "+", "b", ""))
    // all four reference comment forms (lex/lexer_test.go TestLexCommentTypes)
    assert(texts("a # hash comment\n+ b") == Vector("a", "+", "b", ""))
    assert(texts("a // slashes comment\n+ b") == Vector("a", "+", "b", ""))
    assert(texts("/*\nmulti\nline\n*/ SELECT x") == Vector("SELECT", "x", ""))
    // '#' inside a string is NOT a comment
    assert(texts("\"Supplier#01%\"") == Vector("Supplier#01%", ""))
  }

  test("hex integer literals (lex/lexer_test.go TestLexNumber)") {
    assert(texts("0x1A2B") == Vector("0x1A2B", ""))
    assert(kinds("0x1A2B").head == TNumber)
    // parses to the right value through the expression parser
    val n = graft.expr.ExprParser.parse("0x1A2B")
    assert(n == graft.expr.NumberNode(0x1A2B.toDouble, isInt = true))
  }

  test("scientific notation and exponent edges (lex/lexer_test.go TestLexNumber)") {
    // valid reference floats lex as single numbers
    for (v <- Seq("0.5", "6.02e23", "5.1e-9", "3e-3"))
      assert(kinds(v) == Vector(TNumber, TEof), v)
    // a bare exponent marker does NOT join the number (the reference
    // rejects `6.02e` outright; here the trailing e is an identifier)
    assert(texts("6.02e") == Vector("6.02", "e", ""))
    assert(texts("3e") == Vector("3", "e", ""))
    // exponent sign requires digits too
    assert(texts("3e-") == Vector("3", "e", "-", ""))
    // these parse to usable numbers end-to-end
    assert(graft.expr.ExprParser.parse("6.02e23") ==
      graft.expr.NumberNode(6.02e23, isInt = false))
  }

  test("quoted strings with escapes and doubling") {
    assert(texts("""'it''s'""") == Vector("it's", ""))
    assert(texts("\"a\\\"b\"") == Vector("a\"b", ""))
    assert(kinds("'x'").head == TString)
  }

  test("backtick identifiers keep special characters") {
    assert(texts("`weird col`") == Vector("weird col", ""))
    assert(kinds("`weird col`").head == TIdent)
  }

  test("numbers: ints, decimals, exponents") {
    assert(texts("1 2.5 1e3 1.5E-2") == Vector("1", "2.5", "1e3", "1.5E-2", ""))
    assert(kinds("3.14").head == TNumber)
  }

  test("multi-char operators win over single") {
    assert(texts("a <= b != c == d <> e") == Vector("a", "<=", "b", "!=", "c", "==", "d", "<>", "e", ""))
    assert(texts("@@session.x") == Vector("@@", "session", ".", "x", ""))
  }

  test("unterminated string raises") {
    assertThrows[LexException](Lexer.lex("'unterminated"))
    assertThrows[LexException](Lexer.lex("`unterminated"))
  }
}
