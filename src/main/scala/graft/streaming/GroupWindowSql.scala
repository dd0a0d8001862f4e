package graft.streaming

/** The reference's group-window SQL surface, rewritten to Spark's
  * grouping expressions (reference: flink-table planner-blink — the
  * `TUMBLE`/`HOP`/`SESSION` GROUP BY functions with their `_START` /
  * `_END` / `_ROWTIME` / `_PROCTIME` auxiliaries, exercised across
  * `runtime/batch/sql/agg/WindowAggregateITCase.scala:59-744` and
  * `runtime/stream/sql/WindowAggregateITCase.scala:71-100`; window
  * assignment semantics `TumblingWindowAssigner.java:34`,
  * `SlidingWindowAssigner.java:40`, `SessionWindowAssigner.java:37`).
  *
  * Spark spells the identical [start, end) epoch-aligned windows
  * `window(ts, size[, slide])` and `session_window(ts, gap)`, so the
  * translation is a pure text rewrite in front of `spark.sql` — the
  * plan underneath is Spark's native (and streaming-capable) windowed
  * aggregate, never a custom operator:
  *
  *   - `TUMBLE(ts, size)`        → `window(ts, size)`
  *   - `HOP(ts, slide, size)`    → `window(ts, size, slide)`  (note the
  *     reference's slide-first argument order; Spark takes size first)
  *   - `SESSION(ts, gap)`        → `session_window(ts, gap)`
  *   - `X_START(args)` / `X_END(args)` → the grouping struct's
  *     `start` / `end` fields
  *   - `X_ROWTIME(args)` → `end - INTERVAL '0.001' SECOND` — the
  *     reference's rowtime attribute is the window end minus 1 ms
  *     (its timestamps are millisecond-precision; emitting the last
  *     contained instant keeps downstream event-time logic from
  *     leaking the row into the next window)
  *   - `X_PROCTIME(args)` → rejected: a proc-time attribute is a
  *     wall-clock processing artifact with no batch/SQL value; the
  *     proc-time executors take DataFrames directly.
  *
  * Interval literals (`INTERVAL '5.111' SECOND(1,3)`) become Spark
  * duration strings (`'5.111 second'`); only single-unit DAY / HOUR /
  * MINUTE / SECOND intervals are valid window sizes — the reference
  * likewise rejects months/years for group windows, and compound
  * (`TO`) forms fail loudly here.
  *
  * Rows with a NULL group-window timestamp are dropped by both engines
  * (reference `WindowAggregateITCase.testNullValueInputTimestamp` —
  * "null columns are dropped"; Spark's time-window rewrite filters
  * `isnotnull(ts)`), so the rewrite preserves that semantic for free.
  *
  * Contract, enforced fail-loud: an auxiliary must repeat the family
  * and arguments of a grouping call present in the statement (the
  * reference's planner requires an auxiliary to repeat its block's
  * GROUP BY window). Distinct group windows may coexist across query
  * blocks — each block carries its own `window` struct and the
  * analyzer resolves auxiliaries within their block.
  */
object GroupWindowSql {

  private val Families = Seq("TUMBLE", "HOP", "SESSION")
  private val Suffixes = Seq("_START", "_END", "_ROWTIME", "_PROCTIME", "")

  /** All 15 keywords, one scan table: (family, suffix). */
  private val Keywords: Seq[(String, String)] =
    for (f <- Families; s <- Suffixes) yield (f, s)

  /** Rewrite every group-window call in `text`; returns `text` unchanged
    * when no TUMBLE/HOP/SESSION form appears. Pure text → text, no
    * session needed. */
  def rewrite(text: String): String = {
    // cheap bail-out before any real scanning
    val upper = text.toUpperCase
    if (!Families.exists(upper.contains)) return text

    val out = new StringBuilder
    var i = 0
    // every group-window (non-aux) call, normalized, for the one-window
    // contract; aux calls recorded as (family, normalized args)
    var groupCalls = List.empty[(String, String)]
    var auxCalls = List.empty[(String, String)]

    while (i < text.length) {
      // earliest keyword occurrence at or after i (word-boundary,
      // string-literal-aware); boundaries make TUMBLE vs TUMBLE_START
      // unambiguous — '_' is an identifier char
      val hit = Keywords
        .map { case (f, s) => (f, s, indexOfWord(text, f + s, i)) }
        .filter(_._3 >= 0)
        .sortBy(_._3)
        .headOption
      hit match {
        case None =>
          out.append(text.substring(i)); i = text.length
        case Some((family, suffix, k)) =>
          var j = k + family.length + suffix.length
          while (j < text.length && text.charAt(j).isWhitespace) j += 1
          if (j >= text.length || text.charAt(j) != '(') {
            // bare identifier (e.g. a column named `hop`) — not a call;
            // copy through and keep scanning
            out.append(text.substring(i, k + family.length + suffix.length))
            i = k + family.length + suffix.length
          } else {
            val close = balancedClose(text, j)
            val args = splitTopLevel(text.substring(j + 1, close))
            val norm = args.map(normalize).mkString(", ")
            out.append(text.substring(i, k))
            suffix match {
              case "" =>
                groupCalls ::= (family, norm)
                out.append(groupExpr(family, args))
              case "_PROCTIME" =>
                sys.error(s"$family$suffix is not supported: proc-time " +
                  "attributes are wall-clock artifacts with no SQL/batch " +
                  "meaning — use the proc-time DataFrame executors " +
                  "(graft.streaming) for proc-time composition")
              case _ =>
                auxCalls ::= (family, norm)
                val struct =
                  if (family == "SESSION") "session_window" else "window"
                out.append(suffix match {
                  case "_START" => s"$struct.start"
                  case "_END" => s"$struct.end"
                  case "_ROWTIME" =>
                    s"($struct.end - INTERVAL '0.001' SECOND)"
                })
            }
            i = close + 1
          }
      }
    }

    // Auxiliary/grouping agreement is validated statement-wide: every
    // auxiliary must repeat the family and arguments of SOME group-window
    // call in the statement. Distinct group windows may coexist — each
    // lives in its own query block (the reference admits one group window
    // per GROUP BY, and the analyzer resolves each block's `window`
    // struct within that block), so the per-block discipline the
    // reference enforces is: write each auxiliary in the block whose
    // GROUP BY it repeats.
    val distinctGroups = groupCalls.distinct
    auxCalls.distinct.foreach { case (f, a) =>
      require(distinctGroups.contains((f, a)),
        s"group-window auxiliary ${f}_START/_END/_ROWTIME($a) must repeat " +
          s"a GROUP BY window's family and arguments; the statement " +
          (if (distinctGroups.isEmpty) "has no group window in GROUP BY"
           else "groups by " + distinctGroups
             .map { case (gf, ga) => s"$gf($ga)" }.mkString("; ")))
    }
    out.result()
  }

  /** The Spark grouping expression for one reference group-window call. */
  private def groupExpr(family: String, args: Seq[String]): String =
    family match {
      case "TUMBLE" =>
        require(args.length == 2,
          s"TUMBLE takes (time_attr, size); got ${args.length} arguments")
        s"window(${args(0).trim}, ${duration(args(1))})"
      case "HOP" =>
        require(args.length == 3,
          s"HOP takes (time_attr, slide, size); got ${args.length} arguments")
        // reference order is slide-then-size; Spark is size-then-slide
        s"window(${args(0).trim}, ${duration(args(2))}, ${duration(args(1))})"
      case "SESSION" =>
        require(args.length == 2,
          s"SESSION takes (time_attr, gap); got ${args.length} arguments")
        s"session_window(${args(0).trim}, ${duration(args(1))})"
    }

  private val IntervalRe =
    """(?is)\s*INTERVAL\s*'([0-9.]+)'\s*(DAY|HOUR|MINUTE|SECOND)\s*(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*""".r

  /** A reference interval literal rendered as a Spark duration string:
    * `INTERVAL '5.111' SECOND(1,3)` → `'5.111 second'`. The optional
    * precision suffix only constrains the literal's printed digits —
    * the value already carries them. */
  private def duration(arg: String): String = arg match {
    case IntervalRe(v, unit) => s"'$v ${unit.toLowerCase}'"
    case other => sys.error(
      s"group-window size must be a single-unit interval literal " +
        s"(INTERVAL '<n>' DAY|HOUR|MINUTE|SECOND), got: ${other.trim} — " +
        "month/year intervals are not fixed durations and compound " +
        "(TO) forms are not window sizes")
  }

  private def normalize(s: String): String =
    s.trim.replaceAll("\\s+", " ").toUpperCase

  /** Split `s` on commas at paren depth 0, outside string literals. */
  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      else if (!inStr && c == ',' && depth == 0) {
        parts += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    parts += s.substring(start)
    parts.result()
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
    sys.error("unbalanced parentheses in group-window call")
  }
}
