package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types._

import graft.streaming.PatternMatch._
import graft.streaming.StatefulOps.Event

/** SQL-syntax entry for MATCH_RECOGNIZE — a clause parser/rewriter onto
  * the existing NFA ([[PatternMatch.matchPattern]]), closing the last
  * SQL-surface delta vs the reference: the reference accepts the clause
  * as SQL text (reference: flink-table-planner-blink
  * StreamExecMatch.scala:68 compiles the parsed clause,
  * MatchCodeGenerator.scala:82 codegens DEFINE/MEASURES, and
  * MatchRecognizeITCase exercises the grammar), while Spark's parser has
  * no such production — `spark.sql` would throw a parse error. The
  * grammar subset here is the reference IT-case surface:
  *
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY user_id
  *   ORDER BY ts [, event_id]
  *   [MEASURES <measure> AS <alias> [, ...]]
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
  *     | SKIP TO FIRST <var> | SKIP TO LAST <var>]
  *   PATTERN ( <var><quant> ... )   -- quant: (none) ? + * ?? +? *?
  *   [WITHIN INTERVAL '<n>' <SECOND|MINUTE|HOUR|DAY>]
  *   [DEFINE <var> AS <predicate> [, ...]]
  * )
  * }}}
  *
  * where <measure> is `VAR.field`, `FIRST(VAR.field)`, `LAST(VAR.field)`
  * or `COUNT(VAR.*)`/`COUNT(VAR.field)`, and <predicate> is an AND of
  * comparisons over the current row's fields, literals, and
  * `PREV(field[, 1])` / `NEXT(field[, 1])` cross-row references —
  * exactly the constructs [[PatternMatch.Step]] executes. A variable
  * with no DEFINE matches any row (SQL default). Unsupported constructs
  * (cross-variable DEFINE references, PREV offsets > 1, OR, arithmetic)
  * fail loudly at parse time rather than mis-executing.
  *
  * ONE ROW PER MATCH output is the SQL-standard projection: the
  * PARTITION BY column followed by the MEASURES aliases. ALL ROWS PER
  * MATCH routes to [[PatternMatch.matchPatternAllRows]] and exposes its
  * canonical projection (user_id, match_no, pos, classifier, event_id,
  * running_n, final_n) — CLASSIFIER()/MATCH_NUMBER()/RUNNING-vs-FINAL
  * counts as columns; a MEASURES clause in this mode is rejected.
  *
  * The partition/order columns are pinned to the engine's event model
  * (PARTITION BY user_id, ORDER BY ts[, event_id]) — the NFA is keyed
  * and event-time-ordered on exactly those; any other spec is an error
  * naming the expectation. Batch and streaming both work (the NFA is
  * one code path); `delay` is the streaming watermark.
  */
object MatchRecognizeSql {

  // ---- event-field registry (the NFA's row model) ----
  private val fieldType: Map[String, DataType] = Map(
    "user_id" -> LongType, "event_id" -> LongType, "ts" -> TimestampType,
    "event_type" -> StringType, "value" -> DoubleType)
  private val fieldGet: Map[String, Event => Any] = Map(
    "user_id" -> (_.user_id), "event_id" -> (_.event_id), "ts" -> (_.ts),
    "event_type" -> (_.event_type), "value" -> (_.value))

  // ---- AST ----
  private sealed trait Term
  private final case class Cur(field: String) extends Term
  private final case class PrevT(field: String) extends Term
  private final case class NextT(field: String) extends Term
  private final case class NumLit(v: Double) extends Term
  private final case class StrLit(v: String) extends Term

  private final case class Comparison(l: Term, op: String, r: Term) {
    def usesPrev: Boolean = Seq(l, r).exists(_.isInstanceOf[PrevT])
    def usesNext: Boolean = Seq(l, r).exists(_.isInstanceOf[NextT])
  }

  private sealed trait MExpr
  /** mode: 0 = bare VAR.field (SQL default: the variable's LAST row),
    * 1 = FIRST(...), 2 = LAST(...). */
  private final case class MVarField(v: String, f: String, mode: Int) extends MExpr
  private final case class MCount(v: String) extends MExpr

  private final case class Parsed(steps: Seq[Step], skip: SkipStrategy,
      within: Option[java.time.Duration],
      measures: Seq[(String, MExpr, DataType)], allRows: Boolean)

  /** Parse + execute `text` over `events`. Returns the match table. */
  def sql(events: Dataset[Event], text: String,
      delay: String = "0 seconds"): DataFrame = {
    val p = parse(text)
    if (p.allRows)
      matchPatternAllRows(events, p.steps, delay, p.within, p.skip).toDF()
    else {
      val schema = StructType(
        StructField("user_id", LongType, nullable = false) +:
          p.measures.map { case (alias, _, dt) => StructField(alias, dt) })
      implicit val enc = Encoders.row(schema)
      matchPattern(events, p.steps, delay, (key: Long, bound: Seq[Bound]) => {
        val bm = bound.map(b => b.name -> b.rows).toMap
        Row.fromSeq(key +: p.measures.map { case (_, m, _) => evalM(m, bm) })
      }, p.within, p.skip).toDF()
    }
  }

  private def evalM(m: MExpr, bm: Map[String, Seq[Event]]): Any = m match {
    case MCount(v) => bm.getOrElse(v, Nil).size.toLong
    case MVarField(v, f, mode) =>
      val rows = bm.getOrElse(v, Nil)
      val row = if (mode == 1) rows.headOption else rows.lastOption
      row.map(fieldGet(f)).orNull
  }

  // ---- tokenizer ----
  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { // string literal, '' escapes
        val sb = new StringBuilder("'")
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          val d = s.charAt(i)
          if (d == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            sb.append('\''); i += 2
          } else if (d == '\'') { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        require(closed, s"unterminated string literal in: $s")
        out += sb.append('\'').result()
      } else if (c.isLetter || c == '_') {
        val j = s.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) s.length else j
        out += s.substring(i, end); i = end
      } else if (c.isDigit) {
        var j = i
        while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        out += s.substring(i, j); i = j
      } else if ((c == '<' || c == '>' || c == '!') && i + 1 < s.length &&
          (s.charAt(i + 1) == '=' || (c == '<' && s.charAt(i + 1) == '>'))) {
        out += s.substring(i, i + 2); i += 2
      } else { out += c.toString; i += 1 }
    }
    out.result()
  }

  // ---- parser ----
  private final class P(toks: Vector[String]) {
    var i = 0
    def peek: String = if (i < toks.length) toks(i) else ""
    def peekIs(kw: String): Boolean = peek.equalsIgnoreCase(kw)
    def next(): String = { val t = peek; i += 1; t }
    def expect(kw: String): String = {
      require(peekIs(kw), s"expected '$kw' but found '$peek' (token $i)")
      next()
    }
    def accept(kw: String): Boolean =
      if (peekIs(kw)) { i += 1; true } else false
    def acceptWords(kws: String*): Boolean = {
      if (kws.indices.forall(k => i + k < toks.length &&
          toks(i + k).equalsIgnoreCase(kws(k)))) { i += kws.length; true }
      else false
    }
    def ident(): String = {
      val t = next()
      require(t.nonEmpty && (t.charAt(0).isLetter || t.charAt(0) == '_'),
        s"expected identifier, found '$t'")
      t
    }
  }

  private def parse(text: String): Parsed = {
    val p = new P(tokenize(text))
    // optional SELECT * FROM <table> wrapper
    if (p.accept("SELECT")) {
      p.expect("*"); p.expect("FROM"); p.ident()
    }
    p.expect("MATCH_RECOGNIZE"); p.expect("(")

    p.expect("PARTITION"); p.expect("BY")
    val part = p.ident()
    require(part == "user_id",
      s"PARTITION BY must be user_id (the NFA's key column), got '$part'")

    p.expect("ORDER"); p.expect("BY")
    val ord1 = p.ident()
    require(ord1 == "ts",
      s"ORDER BY must lead with ts (the NFA's event-time order), got '$ord1'")
    if (p.accept(",")) {
      val ord2 = p.ident()
      require(ord2 == "event_id",
        s"the only supported ORDER BY tie-break is event_id, got '$ord2'")
    }

    var measures = Seq.empty[(String, MExpr, DataType)]
    if (p.accept("MEASURES")) {
      val ms = Seq.newBuilder[(String, MExpr, DataType)]
      var more = true
      while (more) {
        val m = parseMeasure(p)
        p.expect("AS")
        val alias = p.ident()
        val dt = m match {
          case MCount(_) => LongType
          case MVarField(_, f, _) =>
            fieldType.getOrElse(f, sys.error(s"unknown field '$f'"))
        }
        ms += ((alias, m, dt))
        more = p.accept(",")
      }
      measures = ms.result()
    }

    var allRows = false
    if (p.acceptWords("ONE", "ROW", "PER", "MATCH")) ()
    else if (p.acceptWords("ALL", "ROWS", "PER", "MATCH")) allRows = true
    require(!allRows || measures.isEmpty,
      "ALL ROWS PER MATCH exposes the canonical projection (user_id, " +
        "match_no, pos, classifier, event_id, running_n, final_n); a " +
        "MEASURES clause is not supported in this mode")

    var skip: SkipStrategy = SkipPastLastRow
    if (p.acceptWords("AFTER", "MATCH", "SKIP")) {
      if (p.acceptWords("PAST", "LAST", "ROW")) skip = SkipPastLastRow
      else if (p.acceptWords("TO", "NEXT", "ROW")) skip = SkipToNextRow
      else if (p.acceptWords("TO", "FIRST")) skip = SkipToFirst(p.ident())
      else if (p.acceptWords("TO", "LAST")) skip = SkipToLast(p.ident())
      else sys.error(s"unsupported AFTER MATCH SKIP form at '${p.peek}'")
    }

    p.expect("PATTERN"); p.expect("(")
    val pat = Seq.newBuilder[(String, Quant)]
    while (!p.peekIs(")")) {
      val v = p.ident()
      val q: Quant =
        if (p.accept("+")) { if (p.accept("?")) PlusReluctant else Plus }
        else if (p.accept("*")) { if (p.accept("?")) StarReluctant else Star }
        else if (p.accept("?")) { if (p.accept("?")) OptReluctant else Opt }
        else One
      pat += ((v, q))
    }
    p.expect(")")
    val patternVars = pat.result()
    require(patternVars.nonEmpty, "PATTERN must name at least one variable")

    var within: Option[java.time.Duration] = None
    if (p.accept("WITHIN")) {
      p.expect("INTERVAL")
      val lit = p.next()
      require(lit.startsWith("'") && lit.endsWith("'"),
        s"WITHIN INTERVAL needs a quoted count, got $lit")
      val n = lit.substring(1, lit.length - 1).trim.toLong
      val unit = p.ident().toUpperCase.stripSuffix("S")
      within = Some(unit match {
        case "SECOND" => java.time.Duration.ofSeconds(n)
        case "MINUTE" => java.time.Duration.ofMinutes(n)
        case "HOUR" => java.time.Duration.ofHours(n)
        case "DAY" => java.time.Duration.ofDays(n)
        case u => sys.error(s"unsupported WITHIN unit '$u'")
      })
    }

    var defines = Map.empty[String, Seq[Comparison]]
    if (p.accept("DEFINE")) {
      var more = true
      while (more) {
        val v = p.ident()
        p.expect("AS")
        val comps = Seq.newBuilder[Comparison]
        comps += parseComparison(p, v)
        while (p.accept("AND")) comps += parseComparison(p, v)
        defines += (v -> comps.result())
        more = p.accept(",")
      }
    }
    p.expect(")")
    p.accept("AS") // optional trailing alias
    if (p.peek.nonEmpty && p.peek.matches("[A-Za-z_][A-Za-z0-9_]*")) p.next()
    require(p.peek.isEmpty, s"trailing tokens after MATCH_RECOGNIZE: '${p.peek}'")

    val knownVars = patternVars.map(_._1).toSet
    defines.keys.foreach(v => require(knownVars(v),
      s"DEFINE names '$v' which is not a PATTERN variable ($knownVars)"))
    measures.foreach {
      case (_, MVarField(v, _, _), _) => require(knownVars(v),
        s"MEASURES references undefined PATTERN variable '$v'")
      case (_, MCount(v), _) => require(knownVars(v),
        s"MEASURES references undefined PATTERN variable '$v'")
    }

    val steps = patternVars.map { case (v, q) =>
      toStep(v, q, defines.getOrElse(v, Nil))
    }
    Parsed(steps, skip, within, measures, allRows)
  }

  private def parseMeasure(p: P): MExpr = {
    val t = p.ident()
    if (t.equalsIgnoreCase("FIRST") || t.equalsIgnoreCase("LAST")) {
      p.expect("(")
      val v = p.ident(); p.expect("."); val f = p.ident()
      p.expect(")")
      MVarField(v, f, if (t.equalsIgnoreCase("FIRST")) 1 else 2)
    } else if (t.equalsIgnoreCase("COUNT")) {
      p.expect("(")
      val v = p.ident(); p.expect(".")
      if (!p.accept("*")) p.ident() // COUNT(V.field) counts the same rows
      p.expect(")")
      MCount(v)
    } else {
      p.expect("."); val f = p.ident()
      MVarField(t, f, 0)
    }
  }

  /** One DEFINE comparison for variable `v`: term op term. */
  private def parseComparison(p: P, v: String): Comparison = {
    val l = parseTerm(p, v)
    val op = p.next()
    require(Set("=", "<>", "!=", "<", "<=", ">", ">=")(op),
      s"unsupported comparison operator '$op' in DEFINE $v")
    val r = parseTerm(p, v)
    val c = Comparison(l, op, r)
    require(!(c.usesPrev && c.usesNext),
      s"a single comparison mixing PREV and NEXT is unsupported (DEFINE $v)")
    c
  }

  private def parseTerm(p: P, v: String): Term = {
    val t = p.next()
    if (t.equalsIgnoreCase("PREV") || t.equalsIgnoreCase("NEXT")) {
      p.expect("(")
      val f = fieldRef(p, v)
      if (p.accept(",")) {
        val off = p.next()
        require(off == "1",
          s"only PREV/NEXT offset 1 is supported, got $off (DEFINE $v)")
      }
      p.expect(")")
      if (t.equalsIgnoreCase("PREV")) PrevT(f) else NextT(f)
    } else if (t.startsWith("'")) StrLit(t.substring(1, t.length - 1))
    else if (t.nonEmpty && (t.charAt(0).isDigit || t == "-")) {
      if (t == "-") NumLit(-p.next().toDouble) else NumLit(t.toDouble)
    } else {
      // identifier: bare field, or VAR.field where VAR must be `v`
      if (p.accept(".")) {
        require(t == v, s"DEFINE $v references variable '$t' — " +
          "cross-variable DEFINE references are unsupported")
        Cur(checkedField(p.ident(), v))
      } else Cur(checkedField(t, v))
    }
  }

  private def fieldRef(p: P, v: String): String = {
    val t = p.ident()
    if (p.accept(".")) {
      require(t == v, s"PREV/NEXT in DEFINE $v may only reference $v's " +
        s"fields, got '$t'")
      checkedField(p.ident(), v)
    } else checkedField(t, v)
  }

  private def checkedField(f: String, v: String): String = {
    require(fieldGet.contains(f),
      s"unknown field '$f' in DEFINE $v (have: ${fieldGet.keys.toSeq.sorted})")
    f
  }

  // ---- compile to a Step ----
  private def toStep(name: String, q: Quant, comps: Seq[Comparison]): Step = {
    val (cur, cross) = comps.partition(c => !c.usesPrev && !c.usesNext)
    val (prevC, nextC) = cross.partition(_.usesPrev)
    val curFns = cur.map(compile2(_, otherIsPrev = false)) // other unused
    val pred: Event => Boolean =
      e => curFns.forall(f => f(e, null))
    val prevPred =
      if (prevC.isEmpty) None
      else {
        val fns = prevC.map(compile2(_, otherIsPrev = true))
        Some((c: Event, prv: Event) => fns.forall(f => f(c, prv)))
      }
    val nextPred =
      if (nextC.isEmpty) None
      else {
        val fns = nextC.map(compile2(_, otherIsPrev = false))
        Some((c: Event, nxt: Event) => fns.forall(f => f(c, nxt)))
      }
    Step(name, pred, q, prevPred, nextPred)
  }

  /** Compile a comparison to (current, other) => Boolean, where `other`
    * is the PREV or NEXT row (null when the comparison doesn't use it). */
  private def compile2(c: Comparison,
      otherIsPrev: Boolean): (Event, Event) => Boolean = {
    def term(t: Term): (Event, Event) => Any = t match {
      case Cur(f) => (cur, _) => fieldGet(f)(cur)
      case PrevT(f) => (_, other) => if (other == null) null else fieldGet(f)(other)
      case NextT(f) => (_, other) => if (other == null) null else fieldGet(f)(other)
      case NumLit(v) => (_, _) => v
      case StrLit(v) => (_, _) => v
    }
    val lf = term(c.l); val rf = term(c.r)
    (cur, other) => cmp(lf(cur, other), c.op, rf(cur, other))
  }

  /** SQL three-valued comparison collapsed to Boolean: NULL → not true. */
  private def cmp(a: Any, op: String, b: Any): Boolean = {
    if (a == null || b == null) return false
    val c: Int = (a, b) match {
      case (x: String, y: String) => x.compareTo(y)
      case (x: Timestamp, y: Timestamp) => x.compareTo(y)
      case _ => java.lang.Double.compare(toD(a), toD(b))
    }
    op match {
      case "=" => c == 0
      case "<>" | "!=" => c != 0
      case "<" => c < 0
      case "<=" => c <= 0
      case ">" => c > 0
      case ">=" => c >= 0
    }
  }

  private def toD(a: Any): Double = a match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => sys.error(
      s"cannot compare ${other.getClass.getSimpleName} numerically")
  }
}
