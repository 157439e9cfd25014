package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round4Sql rewriter is load-bearing: every oracle SQL string passes
  * through it, so a mangled rewrite would silently break the whole
  * correctness gate. Pin its behavior on the shapes that appear in the
  * oracle map. */
class OrcSpec extends AnyFunSuite {

  test("simple round(x, 4) rewrites to floor arithmetic") {
    assert(Orc.round4Sql("round(sum(l_quantity), 4) AS sum_qty") ==
      "floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty")
  }

  test("nested call with inner comma keeps balance") {
    assert(Orc.round4Sql("round(quantile_cont(l_quantity, 0.9), 4) AS p90") ==
      "floor((quantile_cont(l_quantity, 0.9)) * 1e4 + 0.5) / 1e4 AS p90")
  }

  test("window function arg: only the top-level scale is matched") {
    assert(Orc.round4Sql("round(lag(o_totalprice, 1) OVER w, 4) AS p") ==
      "floor((lag(o_totalprice, 1) OVER w) * 1e4 + 0.5) / 1e4 AS p")
  }

  test("non-4 literal scales rewrite with their own power") {
    assert(Orc.round4Sql("round(x, 2) AS m") ==
      "floor((x) * 1e2 + 0.5) / 1e2 AS m")
  }

  test("non-literal scale and bare round() are untouched") {
    assert(Orc.round4Sql("round(x, n)") == "round(x, n)")
    assert(Orc.round4Sql("round(x)") == "round(x)")
  }

  test("identifier suffix like my_round( is untouched") {
    assert(Orc.round4Sql("my_round(x, 4)") == "my_round(x, 4)")
  }

  test("multiple occurrences across lines all rewrite") {
    val in = "SELECT round(a, 4) AS a4,\n round(b, 4) AS b4 FROM t"
    val out = Orc.round4Sql(in)
    assert(out == "SELECT floor((a) * 1e4 + 0.5) / 1e4 AS a4,\n " +
      "floor((b) * 1e4 + 0.5) / 1e4 AS b4 FROM t")
  }

  test("every oracle SQL string is free of engine-native round(x, n)") {
    // The mechanical guarantee the VERDICT asked for: no oracle text can
    // reach DuckDB with its native double-rounding convention.
    val leftover = SparkEntry.oracleSql.collect {
      case (k, sql) if "(?i)\\bround\\s*\\([^)]*,\\s*\\d+\\s*\\)".r
        .findFirstIn(sql).isDefined => k
    }
    assert(leftover.isEmpty, s"unrewritten round(x, n) in: $leftover")
  }
}
