package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The single SQL front door — parity with the reference's one
  * `sqlQuery(String)` entry (reference: flink-table
  * .../api/internal/TableEnvironmentImpl.java:300, which accepts every
  * statement including embedded MATCH_RECOGNIZE), where graft previously
  * exposed per-family entries (`spark.sql`, [[
  * graft.streaming.MatchRecognizeSql.sqlDf]], [[
  * graft.streaming.StreamingOverSql.sqlDf]], [[
  * graft.streaming.RankSql.sqlDf]]).
  *
  * Division of labor: Spark SQL already evaluates OVER windows,
  * ROW_NUMBER filters, joins, subqueries and unions natively in batch —
  * the ONE clause it cannot parse at all is MATCH_RECOGNIZE. So the
  * router extracts each `<table> MATCH_RECOGNIZE ( ... )` or
  * `(subquery) MATCH_RECOGNIZE ( ... )` source from the statement,
  * executes it through the existing general-schema executor (the
  * subquery form runs through `spark.sql` first — a windowed aggregate
  * feeding pattern matching is the reference's own IT composition),
  * registers the result as a temp view, and hands the spliced
  * statement to `spark.sql` — the surrounding query (joins,
  * aggregations, set ops over the clause result) composes untouched. Tables named in the statement must be resolvable through
  * the session catalog (temp views or tables), exactly as in the
  * reference's registered-table model.
  *
  * Streaming tables take the same door: a statement whose FROM names a
  * streaming temp view routes rank/dedup (`ROW_NUMBER()` filter) and
  * OVER-frame shapes to the stateful executors ([[routeStreaming]]) —
  * Spark SQL cannot plan either on a stream — and leaves natively
  * streamable statements (projections, filters, group/window
  * aggregates, stream-static joins) with Spark. The df-parameterized
  * per-family entries remain for sources not registered in the catalog.
  *
  * DML parity: the reference's `sqlUpdate` accepts exactly INSERT /
  * CREATE TABLE / DROP TABLE (TableEnvironmentImpl.java:339-384); all
  * three are Spark SQL statements and flow through this same entry —
  * including an INSERT whose SELECT embeds a MATCH_RECOGNIZE clause
  * (the splicer is position-based, so it works inside any statement
  * form). Pinned by `SqlSpec`.
  */
object Sql {

  def sql(spark: SparkSession, text: String): DataFrame = {
    val spliced = spliceMatchRecognize(spark, text)
    routeStreaming(spark, spliced).getOrElse(spark.sql(spliced))
  }

  /** Statements over a STREAMING registered table that Spark SQL cannot
    * plan on a stream — the reference's rank/dedup `ROW_NUMBER()` filter
    * (StreamExecDeduplicateRule / StreamExecRank) and OVER frame
    * aggregates (StreamExecOverAggregate) — route to the stateful
    * executors, so one `sql(text)` call serves them by table NAME just
    * like everything else. Detection is conservative: only when a
    * referenced table is a streaming temp view AND the statement carries
    * the defining keyword does the router step in; Spark itself could
    * never run those statements (UnsupportedOperationChecker rejects
    * rank/OVER on streams at query start), so there is nothing the
    * rerouting can shadow — a statement that deviates from the executor
    * grammar fails loudly in its parser instead of obscurely at
    * writeStream start. Everything else (streaming or batch) stays with
    * Spark SQL. */
  private def routeStreaming(spark: SparkSession,
      text: String): Option[DataFrame] = {
    val rank = indexOfWord(text, "ROW_NUMBER", 0) >= 0
    val over = indexOfWord(text, "OVER", 0) >= 0
    if (!rank && !over) return None
    val rels = referencedTables(spark, text)
    val streamingRels = rels.filter { n =>
      scala.util.Try(spark.table(n).isStreaming).getOrElse(false)
    }
    if (streamingRels.isEmpty) return None
    // reference parity: StreamExecRank supports only ROW_NUMBER on a
    // stream and throws on the other rank types (StreamExecRank.scala:
    // 139-143) — reject them with the same message instead of a
    // confusing OVER-parser error
    Seq("RANK", "DENSE_RANK").foreach { fn =>
      require(indexOfWord(text, fn, 0) < 0 || rank,
        s"$fn() on streaming table is not supported currently " +
          "(reference parity: only ROW_NUMBER ranks a stream)")
    }
    require(rels.size == 1,
      "a streaming rank/OVER statement must read exactly one table " +
        s"(the stateful executor's input); found ${rels.mkString(", ")} — " +
        "compose joins in a view over the executor result instead")
    val df = spark.table(streamingRels.head)
    if (rank) Some(graft.streaming.RankSql.sqlDf(df, text))
    else Some(graft.streaming.StreamingOverSql.sqlDf(df, text))
  }

  /** Table/view names referenced by the statement (parse only — no
    * analysis, so rank-on-stream shapes Spark cannot plan still parse). */
  private def referencedTables(spark: SparkSession,
      text: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    scala.util.Try(spark.sessionState.sqlParser.parsePlan(text))
      .map(_.collect {
        case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
      }.distinct)
      .getOrElse(Seq.empty)
  }

  /** Replace every `<table> MATCH_RECOGNIZE (...)` reference with a temp
    * view holding the executed clause result; returns the spliced
    * statement. Exposed for tests. */
  private[graft] def spliceMatchRecognize(spark: SparkSession,
      text: String): String = {
    val out = new StringBuilder
    var i = 0
    var n = 0
    while (i < text.length) {
      val kw = indexOfWord(text, "MATCH_RECOGNIZE", i)
      if (kw < 0) { out.append(text.substring(i)); i = text.length }
      else {
        // backtrack over whitespace to the source: a table identifier or
        // a parenthesized subquery (reference accepts both —
        // MatchRecognizeITCase.testMatchRecognizeAppliedToWindowedGrouping)
        var e = kw - 1
        while (e >= i && text.charAt(e).isWhitespace) e -= 1
        val (srcDf, srcStart) =
          if (e >= i && text.charAt(e) == ')') {
            val open = balancedOpen(text, e)
            require(open >= i, "unbalanced subquery before MATCH_RECOGNIZE")
            val sub = text.substring(open + 1, e).trim
            require(sub.nonEmpty, "empty subquery before MATCH_RECOGNIZE")
            (spark.sql(sub), open)
          } else {
            val idEnd = e + 1
            while (e >= i && (text.charAt(e).isLetterOrDigit ||
              text.charAt(e) == '_' || text.charAt(e) == '.')) e -= 1
            val table = text.substring(e + 1, idEnd)
            require(table.nonEmpty && !table.head.isDigit,
              s"MATCH_RECOGNIZE must follow a table reference or " +
                s"(subquery), found " +
                s"'${text.substring(math.max(i, kw - 20), kw)}'")
            (spark.table(table), e + 1)
          }
        // forward: the balanced clause body
        var j = kw + "MATCH_RECOGNIZE".length
        while (j < text.length && text.charAt(j).isWhitespace) j += 1
        require(j < text.length && text.charAt(j) == '(',
          "expected '(' after MATCH_RECOGNIZE")
        val close = balancedClose(text, j)
        val clause = text.substring(kw, close + 1)
        val view = s"graft_mr_$n"
        n += 1
        graft.streaming.MatchRecognizeSql
          .sqlDf(srcDf, s"SELECT * FROM graft_mr_src $clause")
          .createOrReplaceTempView(view)
        out.append(text.substring(i, srcStart)).append(view)
        i = close + 1
      }
    }
    out.result()
  }

  /** First occurrence of `word` at or after `from`, case-insensitive, on
    * identifier boundaries, outside single-quoted string literals. */
  private def indexOfWord(s: String, word: String, from: Int): Int = {
    val u = s.toUpperCase
    var i = from
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inStr = !inStr; i += 1 }
      else if (!inStr && u.startsWith(word, i) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
          (i + word.length >= s.length || !isIdentChar(s.charAt(i + word.length))))
        return i
      else i += 1
    }
    -1
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Index of the '(' balancing the ')' at `close`, scanning backward
    * and skipping string literals (quote state derived by a forward
    * pass — backward quote scanning is ambiguous). */
  private def balancedOpen(s: String, close: Int): Int = {
    // forward pass: record paren depth transitions outside strings
    var inStr = false
    var depth = 0
    val opens = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i <= close) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') { opens.push(i); depth += 1 }
      else if (!inStr && c == ')') {
        if (i == close) return if (opens.isEmpty) -1 else opens.pop()
        if (!opens.isEmpty) opens.pop()
        depth -= 1
      }
      i += 1
    }
    -1
  }

  /** Index of the ')' balancing the '(' at `open`, skipping string
    * literals. */
  private def balancedClose(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    sys.error("unbalanced parentheses in MATCH_RECOGNIZE clause")
  }
}
