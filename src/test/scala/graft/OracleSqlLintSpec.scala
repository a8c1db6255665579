package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every DuckDB oracle in [[SparkEntry.oracleSql]]: the
  * driver's result hash is TYPE-sensitive, and DuckDB types `sum(BIGINT)`
  * (plain or windowed) as HUGEINT — a 128-bit type Spark never writes, so
  * an un-cast sum in an oracle's output fails the driver compare even when
  * every value matches (the round-5 regression class: domain_mix,
  * corpus_stats, sequence_pack, sequence_manifest, pretrain_pipeline).
  *
  * Rule enforced here: every `sum(` in an oracle string that can reach the
  * result (i.e. not inside ORDER BY) must have `CAST` or `round` somewhere
  * in its chain of enclosing calls — CAST fixes the type explicitly;
  * round() returns DOUBLE. The companion runtime gate is tools/check.py,
  * which compares actual DuckDB column types of oracle vs Spark parquet.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** `sql` with every single-quoted literal's CONTENT blanked to spaces
    * (same length, so offsets stay valid): parens inside literals — e.g.
    * regexp_replace(x, '[(]', '') or a label 'a) b' — must not corrupt the
    * depth scans below. Handles the '' escape (stays inside the literal). */
  private def blankLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var inLit = false
    while (i < out.length) {
      if (out(i) == '\'') {
        if (inLit && i + 1 < out.length && out(i + 1) == '\'') { out(i + 1) = ' '; i += 1 }
        else inLit = !inLit
      } else if (inLit) out(i) = ' '
      i += 1
    }
    new String(out)
  }

  /** Identifiers of the calls enclosing position `pos` in `sql`, innermost
    * first, found by a backward paren walk. */
  private def enclosingCalls(sql: String, pos: Int): Seq[String] = {
    val calls = Seq.newBuilder[String]
    var depth = 0
    var i = pos - 1
    while (i >= 0) {
      sql.charAt(i) match {
        case ')' => depth += 1
        case '(' if depth > 0 => depth -= 1
        case '(' =>
          // crossed an enclosing open paren — read the identifier before it
          var j = i - 1
          while (j >= 0 && sql.charAt(j).isWhitespace) j -= 1
          val end = j + 1
          while (j >= 0 && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j -= 1
          if (end > j + 1) calls += sql.substring(j + 1, end).toLowerCase
        case _ =>
      }
      i -= 1
    }
    calls.result()
  }

  /** The nearest clause keyword before `pos` — a sum under ORDER BY never
    * reaches the output row, so it is exempt. Clause keywords only count
    * at the SAME paren depth as the sum site: an aggregate-internal
    * `ORDER BY` (string_agg(x ORDER BY y) — one level deeper) must not
    * exempt a later output-reachable sum in the same SELECT list, and a
    * subquery's clauses must not leak into the outer query's scan. */
  private def inOrderBy(sql: String, pos: Int): Boolean = {
    val depth = new Array[Int](sql.length + 1)
    var d = 0
    var k = 0
    while (k < sql.length) {
      depth(k) = d
      val ch = sql.charAt(k)
      if (ch == '(') d += 1 else if (ch == ')') d -= 1
      k += 1
    }
    val target = depth(pos)
    def lastAt(re: scala.util.matching.Regex): Int =
      re.findAllMatchIn(sql).map(_.start).filter(i => i < pos && depth(i) == target)
        .foldLeft(-1)(math.max)
    val lastSelect = lastAt("(?i)(?<![a-z0-9_])SELECT(?![a-z0-9_])".r)
    val lastOrder = lastAt("(?i)(?<![a-z0-9_])ORDER\\s+BY(?![a-z0-9_])".r)
    lastOrder > lastSelect
  }

  // plain/window sum AND list_sum/list_aggregate — all return HUGEINT on
  // integer inputs in DuckDB
  private val sumRe = "(?i)(?<![a-z0-9_])(?:list_)?sum\\s*\\(".r

  /** Sums PROVEN not to reach the result row (so their HUGEINT width is
    * harmless): each entry is (query name, a context prefix at the sum
    * site). Adding here requires the same proof — the driver compare
    * passing with the sum in place. */
  private val intermediateSums: Set[(String, String)] = Set(
    // simhash sign accumulator `s`: consumed only by `s > 0` comparisons
    // inside the fp CTE — boolean, never emitted (driver-green since r3)
    "dedup_simhash" -> "sum(CASE WHEN (CASE WHEN b.b < 48",
    "dedup_recall" -> "sum(CASE WHEN (CASE WHEN b.b < 48",
    // №182 shares the same chain; `s` additionally orders the probe
    // ranking via abs(s) inside a row_number — ordinal only, never
    // emitted (driver-green at sf0.01 AND sf0.1, r13)
    "dedup_simhash_multiprobe" -> "sum(CASE WHEN (CASE WHEN b.b < 48",
    // №188's pipeline mode shares the №182 chain verbatim; `s` feeds the
    // margin ordering and fp signs only (driver-green at sf0.01 AND
    // sf0.1, r14)
    "dedup_pipeline_smp" -> "sum(CASE WHEN (CASE WHEN b.b < 48")

  test("every output-reachable sum( in every oracle is CAST- or round-wrapped") {
    val offenders = for {
      (name, raw) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      sql = blankLiterals(raw) // paren/keyword scans must not see literal content
      m <- sumRe.findAllMatchIn(sql)
      if !inOrderBy(sql, m.start)
      ctx = raw.slice(m.start, math.min(raw.length, m.start + 60))
      if !intermediateSums.exists { case (n, p) => n == name && ctx.startsWith(p) }
      chain = enclosingCalls(sql, m.start)
      if !chain.exists(c => c == "cast" || c == "round")
    } yield s"$name: un-cast sum at offset ${m.start}: ...$ctx..."
    assert(offenders.isEmpty, "\n" + offenders.mkString("\n"))
  }

  test("driver contract: queries and oracles are 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).mkString(", ")}")
    // every query has an oracle (none of the current operators is
    // SQL-inexpressible; if one ever is, list it here explicitly)
    assert((q -- o).isEmpty, s"queries without an oracle (driver downgrades to rows-only): ${(q -- o).mkString(", ")}")
  }

  test("no oracle emits a raw window sum outside a CAST (HUGEINT via OVER)") {
    // belt-and-braces for the window form: any "OVER" whose governing sum
    // escaped the first test would be caught there; this asserts the lint
    // actually sees every sum the oracles contain (sanity on the regex).
    val total = SparkEntry.oracleSql.valuesIterator.map(sumRe.findAllMatchIn(_).size).sum
    assert(total > 30, s"lint regex found only $total sum( occurrences — regex broken?")
  }
}
