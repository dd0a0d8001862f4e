package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SQL text entry for streaming TOP-N and DEDUPLICATION — the
  * reference's `ROW_NUMBER()` filter patterns accepted as SQL and routed
  * onto [[RankOps.rankRows]] (reference: flink-table-planner-blink
  * .../physical/stream/StreamExecDeduplicateRule.scala matches
  * `ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) = 1` and routes it to
  * the dedup operator; any other rank range routes to StreamExecRank /
  * AbstractTopNFunction. IT surface: RankITCase.scala testTopN /
  * testTopNth, DeduplicateITCase.scala).
  *
  * Accepted grammar (anything else fails loudly):
  *
  * {{{
  * SELECT out [, out]* FROM (
  *   SELECT (* | col [, col]*) ,
  *     ROW_NUMBER() OVER (PARTITION BY col [, col]*
  *                        ORDER BY col [ASC|DESC] [, ...]) AS <rn>
  *   FROM <ident> ) [<ident>]
  * WHERE <rn> (= | <=) <k>  [ORDER BY col [, col]*]
  * out := * | col | <rn>
  * }}}
  *
  * `ORDER BY proctime [DESC]` inside the OVER orders on ARRIVAL (the
  * reference's proc-time attribute); any other column orders on value.
  * `<rn> = 1` is the dedup shape (keep-first when the order is
  * ascending, keep-last when descending — exactly the rule's routing);
  * `<= k` is top-n; `= k` (k > 1) is the k-th-row shape
  * (RankITCase.testTopNth), evaluated as top-k filtered to rank k. The
  * trailing ORDER BY is a batch presentation order (it sorts emitted
  * rows; meaningless under continuous emission, so it is rejected on a
  * streaming input).
  */
object RankSql {

  private final case class Parsed(
      innerCols: Option[Seq[String]], // None = *
      partCols: Seq[String],
      orderKeys: Seq[(String, Boolean)],
      rnAlias: String,
      exact: Boolean, // true: rn = k; false: rn <= k
      k: Int,
      outCols: Option[Seq[String]], // None = *
      outOrder: Seq[String])

  /** Run a ROW_NUMBER-filter SQL statement against an arbitrary
    * DataFrame (batch or streaming — the operator collapses to the plain
    * window query on batch, the oracle shape).
    *
    * `batchNative` (default ON): a BATCH input with a value-based order
    * plans as Spark's own WindowExec with the rank filter pushed into
    * WindowGroupLimit ([[RankOps.rankRowsBatchNative]]) — the
    * 100 TB-right plan. Pass false to force the stateful executor's
    * batch collapse instead (the correctness gate does, so the declared
    * queries keep exercising the streaming executor; `RankOpsSpec` pins
    * the two paths row-identical). Streaming inputs and proctime orders
    * always take the stateful executor. */
  def sqlDf(df: DataFrame, text: String,
      batchNative: Boolean = true): DataFrame = {
    val q = parse(text)
    // parsed identifiers are lowercased; resolve them against the actual
    // schema case-insensitively (Spark's own resolution default)
    def resolve(c: String): String =
      df.columns.find(_.equalsIgnoreCase(c)).getOrElse(sys.error(
        s"column '$c' not in input schema ${df.columns.mkString(", ")}"))
    val innerCols = q.innerCols.map(_.map(resolve))
    val partCols = q.partCols.map(resolve)
    val orderKeys = q.orderKeys.map { case (c, asc) =>
      if (c == "proctime" && !df.columns.exists(_.equalsIgnoreCase(c)))
        (c, asc) // arrival pseudo-column
      else (resolve(c), asc)
    }
    require(q.outOrder.isEmpty || !df.isStreaming,
      "the trailing ORDER BY is a batch presentation order; a continuous " +
        "stream has no final order — drop it on streaming inputs")
    // the executor ranks whole input rows; inner projection composes after
    val useNative = batchNative && !df.isStreaming &&
      !orderKeys.exists(k => k._1 == "proctime" &&
        !df.columns.contains("proctime"))
    val ranked =
      if (useNative) RankOps.rankRowsBatchNative(df, partCols, orderKeys,
        q.k, rankAlias = Some(q.rnAlias))
      else RankOps.rankRows(df, partCols, orderKeys, q.k,
        rankAlias = Some(q.rnAlias))
    val filtered =
      if (q.exact && q.k > 1) ranked.filter(col(q.rnAlias) === q.k)
      else ranked
    val visible = q.innerCols match {
      case None => filtered.columns.toSeq
      case Some(_) => innerCols.get :+ q.rnAlias
    }
    val outNames = q.outCols.getOrElse(visible.map(_.toLowerCase)).map { c =>
      visible.find(_.equalsIgnoreCase(c)).getOrElse(sys.error(
        s"output column '$c' not visible from the subquery " +
          s"(${visible.mkString(", ")})"))
    }
    val sel = filtered.select(outNames.map(col): _*)
    if (q.outOrder.isEmpty) sel
    else sel.orderBy(q.outOrder.map { c =>
      val r = outNames.find(_.equalsIgnoreCase(c)).getOrElse(sys.error(
        s"ORDER BY column '$c' not in the output (${outNames.mkString(", ")})"))
      col(r)
    }: _*)
  }

  private def parse(text: String): Parsed = {
    val p = new MatchRecognizeSql.P(MatchRecognizeSql.tokenize(text))
    p.expect("SELECT")
    val outCols: Option[Seq[String]] =
      if (p.accept("*")) None
      else {
        val cs = scala.collection.mutable.ArrayBuffer(p.ident().toLowerCase)
        while (p.accept(",")) cs += p.ident().toLowerCase
        Some(cs.toSeq)
      }
    p.expect("FROM"); p.expect("(")
    p.expect("SELECT")
    val innerCols: Option[Seq[String]] =
      if (p.accept("*")) { p.expect(","); None }
      else {
        val cs = scala.collection.mutable.ArrayBuffer.empty[String]
        while (!p.peekIs("ROW_NUMBER")) { cs += p.ident().toLowerCase; p.expect(",") }
        Some(cs.toSeq)
      }
    p.expect("ROW_NUMBER"); p.expect("("); p.expect(")")
    p.expect("OVER"); p.expect("(")
    p.expect("PARTITION"); p.expect("BY")
    val parts = scala.collection.mutable.ArrayBuffer(p.ident().toLowerCase)
    while (p.accept(",")) parts += p.ident().toLowerCase
    p.expect("ORDER"); p.expect("BY")
    val orderKeys = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    do {
      val c = p.ident().toLowerCase
      if (c == "proctime" && p.accept("(")) p.expect(")") // proctime() form
      val asc =
        if (p.accept("DESC")) false
        else { p.accept("ASC"); true }
      orderKeys += ((c, asc))
    } while (p.accept(","))
    p.expect(")")
    p.expect("AS")
    val rnAlias = p.ident().toLowerCase
    p.expect("FROM")
    p.ident() // the DataFrame IS the table
    p.expect(")")
    if (!p.peekIs("WHERE")) p.ident() // optional subquery alias
    p.expect("WHERE")
    val lhs = p.ident().toLowerCase
    require(lhs == rnAlias,
      s"WHERE must filter the ROW_NUMBER alias '$rnAlias', found '$lhs'")
    val exact = p.peek match {
      case "=" => p.next(); true
      case "<=" => p.next(); false
      case other => sys.error(
        s"rank filter must be '= k' or '<= k', found '$other'")
    }
    val k = p.intLit()
    require(k >= 1, s"rank bound must be >= 1, got $k")
    val outOrder = scala.collection.mutable.ArrayBuffer.empty[String]
    if (p.accept("ORDER")) {
      p.expect("BY")
      do outOrder += p.ident().toLowerCase while (p.accept(","))
    }
    require(p.peek.isEmpty, s"unexpected trailing tokens from '${p.peek}'")
    Parsed(innerCols, parts.toSeq, orderKeys.toSeq, rnAlias, exact, k,
      outCols, outOrder.toSeq)
  }
}
