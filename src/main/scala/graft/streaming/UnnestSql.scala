package graft.streaming

/** The reference's `UNNEST` SQL spelling, rewritten to Spark's lateral
  * generators (reference: flink-table planner — Calcite's
  * `FROM T, UNNEST(T.arr) AS A (s)` relation, exercised across
  * `runtime/stream/sql/SqlITCase.scala:551-705` for primitive arrays,
  * object arrays with multi-column aliases, COLLECT results, and the
  * `LEFT JOIN UNNEST(...) ON TRUE` form).
  *
  * Spark spells the identical cross/outer correlation `LATERAL
  * explode(arr)` (one output column) and `LATERAL inline(arr)` (an
  * array of rows expanded to the alias's columns), in the same FROM
  * positions — comma-join, CROSS JOIN, and LEFT [OUTER] JOIN ... ON
  * TRUE all parse with a LATERAL operand — so the translation is a
  * pure text swap of the `UNNEST` token:
  *
  *   - alias with one column (or no alias) → `LATERAL explode`
  *   - alias with two or more columns      → `LATERAL inline`
  *
  * The column-count rule is decidable from the text alone because the
  * reference requires the alias to name every field of the element
  * type. A two-column alias over a MAP-typed operand (the reference's
  * map unnest) would mis-route to `inline` and fail loudly in the
  * analyzer — spell map expansion as `LATERAL explode(m)` directly;
  * Flink's MULTISET (from COLLECT) has no Spark twin and its graft
  * equivalent is `collect_list`, whose array output unnests through
  * this same path. */
object UnnestSql {

  /** Rewrite every `UNNEST(...)` call in `text`; returns `text`
    * unchanged when the token does not appear. Pure text → text. */
  def rewrite(text: String): String = {
    if (!text.toUpperCase.contains("UNNEST")) return text
    val out = new StringBuilder
    var i = 0
    while (i < text.length) {
      val k = indexOfWord(text, "UNNEST", i)
      if (k < 0) { out.append(text.substring(i)); i = text.length }
      else {
        var j = k + "UNNEST".length
        while (j < text.length && text.charAt(j).isWhitespace) j += 1
        if (j >= text.length || text.charAt(j) != '(') {
          // a bare identifier named unnest — copy through
          out.append(text.substring(i, k + "UNNEST".length))
          i = k + "UNNEST".length
        } else {
          val fn = if (aliasColumns(text, balancedClose(text, j) + 1) >= 2)
            "inline" else "explode"
          out.append(text.substring(i, k)).append("LATERAL ").append(fn)
          i = k + "UNNEST".length // args and alias pass through verbatim
        }
      }
    }
    out.result()
  }

  /** Number of columns in the optional `[AS] alias (c1, c2, ...)`
    * following the call at `from`; 1 when there is no column list. */
  private def aliasColumns(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (s.regionMatches(true, i, "AS", 0, 2) &&
        (i + 2 >= s.length || !isIdentChar(s.charAt(i + 2)))) i += 2
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    val idStart = i
    while (i < s.length && isIdentChar(s.charAt(i))) i += 1
    if (i == idStart) return 1 // no alias identifier
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '(') return 1
    val close = balancedClose(s, i)
    1 + s.substring(i + 1, close).count(_ == ',')
  }

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
    sys.error("unbalanced parentheses in UNNEST call")
  }
}
