package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tiny boolean keyword-query parser (SURVEY.md §2.2 F2), with the
  * reference's flat grammar (`sql_search.py:299-352`):
  *
  *  - `NOT` binds to the following term; all NOT-terms become conjunctive
  *    exclusions (`NOT LIKE`);
  *  - if the remaining query contains `OR`, the positive terms are a
  *    disjunction, otherwise a conjunction (no parentheses/precedence —
  *    faithfully flat);
  *  - matching is case-insensitive substring containment, like SQLite
  *    `LIKE '%kw%'`.
  *
  * The parsed query compiles to a single `Column` predicate, so Catalyst
  * sees plain `Contains` conjunctions it can push into the scan.
  */
object BooleanQuery {

  /** A parsed flat boolean query. */
  case class Parsed(include: Seq[String], exclude: Seq[String], isOr: Boolean)

  def parse(query: String): Parsed = {
    val toks = query.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val exclude = scala.collection.mutable.ArrayBuffer.empty[String]
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (toks(i).equalsIgnoreCase("NOT") && i + 1 < toks.length) {
        exclude += toks(i + 1).toLowerCase
        i += 2
      } else {
        rest += toks(i)
        i += 1
      }
    }
    val isOr = rest.exists(_.equalsIgnoreCase("OR"))
    val include = rest.toSeq
      // a dangling trailing NOT has no operand — drop it with the operators
      .filterNot(t => t.equalsIgnoreCase("AND") || t.equalsIgnoreCase("OR") ||
        t.equalsIgnoreCase("NOT"))
      .map(_.toLowerCase)
    Parsed(include, exclude.toSeq, isOr)
  }

  /** Compile a query string to a predicate over `text`. */
  def predicate(text: Column, query: String): Column = {
    val p = parse(query)
    val t = lower(text)
    val inc = p.include.map(k => t.contains(k))
      .reduceOption((a, b) => if (p.isOr) a || b else a && b)
      .getOrElse(lit(true))
    val exc = p.exclude.map(k => !t.contains(k))
      .reduceOption(_ && _).getOrElse(lit(true))
    inc && exc
  }

  /** The same predicate as DuckDB SQL (for oracle parity). */
  def toSql(textExpr: String, query: String): String = {
    val p = parse(query)
    val op = if (p.isOr) " OR " else " AND "
    val inc =
      if (p.include.isEmpty) "TRUE"
      else p.include.map(k => s"lower($textExpr) LIKE '%$k%'").mkString("(", op, ")")
    val exc = p.exclude.map(k => s"lower($textExpr) NOT LIKE '%$k%'")
    (inc +: exc).mkString(" AND ")
  }
}
