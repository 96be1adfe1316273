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
