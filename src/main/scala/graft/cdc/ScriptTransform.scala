package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-process SCRIPTED plugin form (reference README.md:39-43 — the
  * RFC's embedded-script plugin class, completing the plugin-form
  * matrix beside the out-of-process pipe ([[PipedTransform]]) and HTTP
  * ([[HttpTransform]]) runners).
  *
  * The script language is deliberately TOTAL and tiny — line/`;`
  * statements over the row struct:
  *
  * {{{
  *   keep event_type != 'view' and value > 10;
  *   set tier = if(value > 500, 'high', 'low');
  *   set tag  = concat(upper(event_type), '_', tier);
  *   drop props
  * }}}
  *
  * Spark-first: a script COMPILES to Catalyst `Column` expressions
  * (`set` → withColumn, `keep` → filter, `drop` → drop), so a scripted
  * plugin fuses into the chain's single codegen'd plan — at 100 TB it
  * costs exactly what the equivalent hand-written projection costs,
  * with no per-row interpreter, no foreign runtime, no extra exchange.
  *
  * Sandboxing is BY CONSTRUCTION, which is stronger than the runtime
  * limits the out-of-process runners need ([[PipedTransform.Limits]]):
  * the grammar has no loops, no recursion, no IO, no UDF escape hatch
  * — only whitelisted total functions — so evaluation time is bounded
  * per row and output is exactly ≤ 1 row per row (no amplification);
  * the eval-timeout/output-cap knobs are therefore THEOREMS here, not
  * monitors. What remains enforceable is resource use at COMPILE time,
  * and [[Limits]] bounds it: script bytes, statement count, expression
  * depth, and literal size, checked before any plan is built (the
  * RFC's Prepare-time validation) — a hostile script is rejected
  * loudly at registration, never scheduled.
  *
  * Unknown COLUMNS surface at bind time (AnalysisException when the
  * chain runs), which the streaming DLQ path
  * ([[graft.streaming.CdcStream.deliverWithDlq]]) turns into a
  * quarantined micro-batch — the same poison-batch contract as every
  * other plugin form (ScriptTransformSpec pins it).
  */
object ScriptTransform {

  /** Compile-time resource bounds (Prepare-time validation). */
  final case class Limits(maxBytes: Int = 4096, maxStatements: Int = 32,
                          maxDepth: Int = 32, maxLiteralChars: Int = 256)

  /** Function whitelist: name → (arity check, builder). All total. */
  private val functions: Map[String, (Int => Boolean, Seq[Column] => Column)] =
    Map(
      "upper" -> ((n: Int) => n == 1, (a: Seq[Column]) => upper(a(0))),
      "lower" -> ((n: Int) => n == 1, (a: Seq[Column]) => lower(a(0))),
      "length" -> ((n: Int) => n == 1, (a: Seq[Column]) => length(a(0)).cast("long")),
      "abs" -> ((n: Int) => n == 1, (a: Seq[Column]) => abs(a(0))),
      "floor" -> ((n: Int) => n == 1, (a: Seq[Column]) => floor(a(0))),
      "ceil" -> ((n: Int) => n == 1, (a: Seq[Column]) => ceil(a(0))),
      "concat" -> ((n: Int) => n >= 2, (a: Seq[Column]) => concat(a: _*)),
      "substr" -> ((n: Int) => n == 3,
        (a: Seq[Column]) => a(0).substr(a(1), a(2))),
      "coalesce" -> ((n: Int) => n >= 2, (a: Seq[Column]) => coalesce(a: _*)),
      "if" -> ((n: Int) => n == 3,
        (a: Seq[Column]) => when(a(0), a(1)).otherwise(a(2))))

  /** Parse + compile `script` into a chain transform; throws
    * IllegalArgumentException with the offending token on any
    * grammar / whitelist / limit violation. */
  def compile(script: String, limits: Limits = Limits())
      : DataFrame => DataFrame = {
    require(script.length <= limits.maxBytes,
      s"script exceeds ${limits.maxBytes} bytes (${script.length}): " +
        "raise ScriptTransform.Limits.maxBytes only for trusted scripts")
    val stmts = new Parser(script, limits).parseScript()
    require(stmts.size <= limits.maxStatements,
      s"script exceeds ${limits.maxStatements} statements (${stmts.size})")
    df => stmts.foldLeft(df) { (d, s) =>
      s match {
        case Set(name, e) => d.withColumn(name, e)
        case Keep(e) => d.where(e)
        case Drop(cols) => d.drop(cols: _*)
      }
    }
  }

  /** Register under `name` for `transform:<name>` chain stages; the
    * `script:` DSL stage compiles inline instead. */
  def register(name: String, script: String,
               limits: Limits = Limits()): Unit =
    ChainConfig.registerTransform(name, compile(script, limits))

  private sealed trait Stmt
  private final case class Set(name: String, expr: Column) extends Stmt
  private final case class Keep(expr: Column) extends Stmt
  private final case class Drop(cols: Seq[String]) extends Stmt

  /** Recursive-descent parser over a hand-rolled token stream. Depth
    * is checked on every expression recursion (a 10k-paren bomb is an
    * error, not a driver StackOverflow). */
  private final class Parser(src: String, limits: Limits) {

    private val tokens: Vector[String] = tokenize()
    private var pos = 0
    private var depth = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"script error at token ${if (pos < tokens.size) s"'${tokens(pos)}'"
          else "<end>"}: $msg")

    private def tokenize(): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < src.length) {
        val c = src.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '\'') {
          val b = new StringBuilder("'")
          i += 1
          var closed = false
          while (i < src.length && !closed) {
            if (src.charAt(i) == '\'' &&
                i + 1 < src.length && src.charAt(i + 1) == '\'') {
              b.append('\''); i += 2 // '' escapes a quote
            } else if (src.charAt(i) == '\'') { closed = true; i += 1 }
            else { b.append(src.charAt(i)); i += 1 }
          }
          if (!closed) throw new IllegalArgumentException(
            "script error: unterminated string literal")
          if (b.length - 1 > limits.maxLiteralChars)
            throw new IllegalArgumentException(
              s"script error: string literal exceeds ${limits.maxLiteralChars} chars")
          out += b.result()
        } else if (c.isLetter || c == '_') {
          val j = i
          while (i < src.length &&
            (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
          out += src.substring(j, i)
        } else if (c.isDigit) {
          val j = i
          // at most one '.' per number token: '1.2.3' must fail loudly
          // at tokenize time (a second dot would otherwise reach
          // toDouble and throw a context-free NumberFormatException)
          var seenDot = false
          var inNumber = true
          while (inNumber && i < src.length) {
            val d = src.charAt(i)
            if (d.isDigit) i += 1
            else if (d == '.' && !seenDot) { seenDot = true; i += 1 }
            else inNumber = false
          }
          out += src.substring(j, i)
        } else if ((c == '!' || c == '<' || c == '>') &&
            i + 1 < src.length && src.charAt(i + 1) == '=') {
          out += src.substring(i, i + 2); i += 2
        } else if ("=<>+-*/%(),;".indexOf(c) >= 0) {
          out += c.toString; i += 1
        } else throw new IllegalArgumentException(
          s"script error: illegal character '$c'")
      }
      out.result()
    }

    private def peek: String = if (pos < tokens.size) tokens(pos) else ""
    private def next(): String = { val t = peek; pos += 1; t }
    private def expect(t: String): Unit =
      if (next() != t) { pos -= 1; fail(s"expected '$t'") }

    def parseScript(): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      var first = true
      while (pos < tokens.size) {
        if (!first) expect(";")
        first = false
        if (pos < tokens.size) out += parseStmt() // trailing ';' ok
      }
      val r = out.result()
      if (r.isEmpty) fail("empty script")
      r
    }

    private def ident(): String = {
      val t = next()
      if (t.isEmpty || !(t.charAt(0).isLetter || t.charAt(0) == '_'))
        { pos -= 1; fail("expected a column name") }
      t
    }

    private def parseStmt(): Stmt = next() match {
      case "set" =>
        val name = ident()
        expect("=")
        Set(name, expr())
      case "keep" => Keep(expr())
      case "drop" =>
        val cols = Seq.newBuilder[String]
        cols += ident()
        while (peek == ",") { next(); cols += ident() }
        Drop(cols.result())
      case _ =>
        pos -= 1
        fail("expected 'set', 'keep' or 'drop'")
    }

    private def nested[T](body: => T): T = {
      depth += 1
      if (depth > limits.maxDepth)
        throw new IllegalArgumentException(
          s"script error: expression nesting exceeds ${limits.maxDepth}")
      try body finally depth -= 1
    }

    private def expr(): Column = nested {
      var l = andExpr()
      while (peek == "or") { next(); l = l || andExpr() }
      l
    }

    private def andExpr(): Column = nested {
      var l = notExpr()
      while (peek == "and") { next(); l = l && notExpr() }
      l
    }

    private def notExpr(): Column = nested {
      if (peek == "not") { next(); !notExpr() } else cmp()
    }

    private def cmp(): Column = nested {
      val l = addSub()
      peek match {
        case "=" => next(); l === addSub()
        case "!=" => next(); l =!= addSub()
        case "<" => next(); l < addSub()
        case "<=" => next(); l <= addSub()
        case ">" => next(); l > addSub()
        case ">=" => next(); l >= addSub()
        case _ => l
      }
    }

    private def addSub(): Column = nested {
      var l = mulDiv()
      var go = true
      while (go) peek match {
        case "+" => next(); l = l + mulDiv()
        case "-" => next(); l = l - mulDiv()
        case _ => go = false
      }
      l
    }

    private def mulDiv(): Column = nested {
      var l = unary()
      var go = true
      while (go) peek match {
        case "*" => next(); l = l * unary()
        case "/" => next(); l = l / unary()
        case "%" => next(); l = l % unary()
        case _ => go = false
      }
      l
    }

    private def unary(): Column = nested {
      if (peek == "-") { next(); -unary() } else atom()
    }

    private def atom(): Column = nested {
      val t = next()
      if (t == "(") { val e = expr(); expect(")"); e }
      else if (t.startsWith("'")) lit(t.substring(1))
      else if (t.nonEmpty && t.charAt(0).isDigit) {
        if (t.contains('.')) lit(t.toDouble) else lit(t.toLong)
      }
      else if (t == "true") lit(true)
      else if (t == "false") lit(false)
      else if (t == "null") lit(null)
      else if (peek == "(") { // function call
        functions.get(t) match {
          case None =>
            pos -= 1
            fail(s"unknown function '$t' — whitelist: " +
              functions.keys.toSeq.sorted.mkString(", "))
          case Some((arityOk, build)) =>
            expect("(")
            val args = Seq.newBuilder[Column]
            args += expr()
            while (peek == ",") { next(); args += expr() }
            expect(")")
            val a = args.result()
            if (!arityOk(a.size))
              fail(s"wrong argument count for '$t' (${a.size})")
            build(a)
        }
      }
      else if (t.nonEmpty && (t.charAt(0).isLetter || t.charAt(0) == '_'))
        col(t)
      else { pos -= 1; fail("expected a value") }
    }
  }
}
