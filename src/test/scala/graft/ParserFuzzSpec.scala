package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{ExprParser, Lexer, ParseException}
import graft.rel.SqlParser

/** Deterministic fuzz over the lexer/parser surface: malformed input
  * must fail with ParseException/LexException (or parse), never with
  * index crashes, NPEs or stack overflows — the failure-mode contract
  * an embedding API owes its callers.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val fragments = Array(
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "IN", "LIKE", "BETWEEN",
    "GROUP", "BY", "ORDER", "LIMIT", "OFFSET", "AS", "IF", "EXISTS", "INCLUDE",
    "FILTER", "CREATE", "TABLE", "WITH", "INTO", "JOIN", "ON", "SET", "VALUES",
    "INSERT", "UPDATE", "DELETE", "UNION", "x", "tbl", "`weird id`", "a.b",
    "\"str\"", "'s2'", "42", "0x1F", "6.02e23", ".", ",", ";", "(", ")", "[",
    "]", "{", "}", "=", "==", "!=", "<", ">", "<=", ">=", "+", "-", "*", "/",
    "%", "@@var", "@v", "!", "\\", "\"unterminated", "`unterminated",
    "now-3d", "count(*)", "--c\n", "/*b*/", "#h\n", "0x", "1e", "e1",
    // r11 surface: quantified subqueries, FILTER clause, named windows,
    // null-safe comparison, ANSI extract
    "ANY", "ALL", "SOME", "OVER", "WINDOW", "QUALIFY", "PARTITION",
    "DISTINCT", "IS", "EXTRACT", "w")

  private def accept(thunk: => Any, input: String): Unit =
    try { thunk; () } catch {
      case _: ParseException => // expected failure mode
      case _: Lexer.LexException => // expected failure mode
      case e: Throwable =>
        fail(s"unacceptable failure ${e.getClass.getName}: ${e.getMessage}\n  input: $input")
    }

  test("random fragment soups never crash the SQL parser") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(12)
      val s = Seq.fill(n)(fragments(rnd.nextInt(fragments.length))).mkString(" ")
      accept(SqlParser.parse(s), s)
      accept(SqlParser.parseStatements(s), s)
    }
  }

  test("random fragment soups never crash the expression parser") {
    val rnd = new scala.util.Random(99L)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(10)
      val s = Seq.fill(n)(fragments(rnd.nextInt(fragments.length))).mkString(" ")
      accept(ExprParser.parse(s), s)
    }
  }

  test("random character noise never crashes the lexer") {
    val rnd = new scala.util.Random(7L)
    val alphabet = "ab1 .,;()[]{}\"'`=<>!+-*/%@#\\\n\t"
    for (_ <- 1 to 2000) {
      val s = Seq.fill(1 + rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))).mkString
      accept(Lexer.lex(s), s)
    }
  }
}
