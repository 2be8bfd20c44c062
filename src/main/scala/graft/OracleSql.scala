package graft

/** DuckDB-oracle SQL hygiene (the round-12 gate-killer lesson).
  *
  * DuckDB 1.x inlines every *reference* to a plain (non-MATERIALIZED)
  * CTE. A cascade where each step is read twice therefore re-evaluates
  * its whole upstream tree per reference — the 6-half-step HITS oracle
  * (q162) went from 0.7 s materialized to >45 min plain at sf0.001 and
  * starved the driver's entire correctness budget (CORRECTNESS_r12 was
  * wiped to `{}`). Hand-applying `AS MATERIALIZED` per oracle proved
  * unreliable (the BPE oracle had it, HITS did not), so the convention
  * is now enforced centrally: [[materializeCtes]] runs over EVERY
  * oracle — static and generated — at [[SparkEntry.oracleSql]] assembly.
  *
  * Rewrite rule: a CTE definition `name AS (SELECT …)` becomes
  * `name AS MATERIALIZED (SELECT …)` iff
  *   - its body starts with SELECT (named-WINDOW specs — `WINDOW w AS
  *     (PARTITION …)` — start with PARTITION/ORDER/ROWS/RANGE and are
  *     left alone),
  *   - it is not already MATERIALIZED,
  *   - it is not recursive. A CTE can only be recursive when the
  *     statement begins `WITH RECURSIVE` (SQL standard; DuckDB agrees),
  *     so only then does a body mention of the CTE's own name mark it
  *     recursive. A plain statement's CTE whose body merely aliases a
  *     COLUMN to the CTE's name (`sq AS (SELECT … AS sq FROM ps)`) is
  *     NOT recursive and must still be rewritten — the earlier
  *     any-word-occurrence check silently skipped exactly that common
  *     shape (ADVICE r13),
  *   - the full statement references it at least twice outside its own
  *     header (single-reference CTEs stay plain so DuckDB can still
  *     inline + push filters through them).
  */
object OracleSql {

  private val DefPattern =
    """(?i)\b([a-zA-Z_][a-zA-Z0-9_]*)\s+AS\s+(MATERIALIZED\s+)?\(""".r

  /** Index of the `(`'s matching `)`, or -1 if unbalanced. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case '\'' => // skip string literal ('' is an escaped quote and
          // re-enters literal mode on the next loop step, which is fine)
          i += 1
          while (i < sql.length && sql.charAt(i) != '\'') i += 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def wordCount(hay: String, word: String): Int =
    ("""(?i)\b""" + java.util.regex.Pattern.quote(word) + """\b""").r
      .findAllMatchIn(hay).size

  /** Strip leading whitespace and SQL comments (`-- …\n` line comments
    * and `/* … */` block comments, any number, any order) so prefix
    * classification sees the first real token. Unterminated block
    * comments strip to end-of-string (the statement is broken anyway —
    * classification must still terminate). */
  private def dropLeadingComments(sql: String): String = {
    var s = sql
    var changed = true
    while (changed) {
      val t = s.dropWhile(_.isWhitespace)
      val u =
        if (t.startsWith("--")) {
          val nl = t.indexOf('\n')
          if (nl < 0) "" else t.substring(nl + 1)
        } else if (t.startsWith("/*")) {
          val end = t.indexOf("*/", 2)
          if (end < 0) "" else t.substring(end + 2)
        } else t
      changed = u != s
      s = u
    }
    s
  }

  /** True iff the statement can contain a recursive CTE at all. Word
    * boundaries matter both ways: `WITH recursive_docs AS …` is NOT a
    * recursive statement (a 14-char prefix check would misread it and
    * skip materialization), and `WITH\nRECURSIVE` IS one (code-review
    * r14). Leading comments are stripped first: `-- note\nWITH RECURSIVE`
    * IS recursive, and anchoring on the raw string would misclassify it
    * and inject MATERIALIZED into a genuinely recursive CTE (ADVICE
    * r14). */
  def isRecursiveStatement(sql: String): Boolean =
    """(?is)^\s*with\s+recursive\b""".r
      .findFirstIn(dropLeadingComments(sql)).isDefined

  def materializeCtes(sql: String): String = {
    val recursiveStmt = isRecursiveStatement(sql)
    // Collect (defStart, insertAt, name, bodyStart, bodyEnd) for every
    // qualifying plain CTE definition.
    val edits = DefPattern.findAllMatchIn(sql).flatMap { m =>
      val name = m.group(1)
      val already = m.group(2) != null
      val open = m.end - 1
      val close = matchParen(sql, open)
      if (already || close < 0) None
      else {
        val body = sql.substring(open + 1, close)
        val bodyIsSelect = body.dropWhile(_.isWhitespace)
          .take(6).equalsIgnoreCase("select")
        val selfRef = recursiveStmt && wordCount(body, name) > 0
        // references = total mentions − this definition's own header
        val refs = wordCount(sql, name) - 1
        if (bodyIsSelect && !selfRef && refs >= 2)
          Some((m.start(0) + m.group(1).length, name)) // insert after name
        else None
      }
    }.toList
    // Apply right-to-left so earlier offsets stay valid. The insertion
    // point is immediately after the CTE name; keep the original
    // "<name> AS " spelling and inject the keyword after "AS".
    edits.sortBy(-_._1).foldLeft(sql) { case (acc, (afterName, _)) =>
      // afterName points just past the name; the next token is AS.
      // Find the end of that AS token and insert " MATERIALIZED" there.
      val asEnd = {
        var i = afterName
        while (i < acc.length && acc.charAt(i).isWhitespace) i += 1
        i + 2 // past "AS"
      }
      acc.substring(0, asEnd) + " MATERIALIZED" + acc.substring(asEnd)
    }
  }
}
