package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanizes the round invariants that have so far been manual greps:
  * queries = oracleSql = SURVEY §2 key parity, and the DuckDB
  * reserved-keyword CTE-name trap that has now bitten twice (r13
  * text_bm25 `glob`, r14 audit_tcloseness first draft `glob` again). */
class ContractParitySpec extends AnyFunSuite {

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("SURVEY §2 inventory lists exactly the query keys") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val rowKey = """\| `([a-z0-9_]+)` \|""".r
    val survey = rowKey.findAllMatchIn(text).map(_.group(1)).toSet
    val q = SparkEntry.queries.keySet
    assert((q -- survey).isEmpty,
      s"queries missing a SURVEY §2 row: ${(q -- survey).toSeq.sorted}")
    assert((survey -- q).isEmpty,
      s"SURVEY rows with no query: ${(survey -- q).toSeq.sorted}")
  }

  test("no oracle names a CTE after a DuckDB reserved keyword") {
    // keywords DuckDB's parser rejects (or reinterprets) as a bare CTE
    // name — the class of failure where the oracle never RUNS and the
    // lane silently degrades to untested
    val banned = Set(
      "glob", "cross", "order", "group", "select", "table", "values",
      "window", "union", "natural", "limit", "offset", "fetch", "pivot",
      "unpivot", "qualify", "using", "where", "from", "join", "having",
      "distinct", "case", "when", "then", "else", "end", "cast",
      "between", "exists", "collate", "lateral", "primary", "foreign",
      "constraint", "default", "create", "insert", "update", "delete")
    // the optional (col, ...) group covers recursive CTEs with column
    // lists — `WITH RECURSIVE w(s, node, d) AS (` — which the first
    // regex draft skipped (the name-then-AS form only)
    val cte = """(?m)(?:WITH(?:\s+RECURSIVE)?\s+|,\s*\n?\s*\|?)([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([^)]*\)\s*)?AS(?:\s+MATERIALIZED)?\s*\(""".r
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      cte.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filter(banned.contains).map(k => s"$name: CTE `$k`")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
