package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the aggregated query registry. */
class RegistrySpec extends AnyFunSuite {

  test("registry builds without duplicate query names") {
    assert(SparkEntry.queries.nonEmpty)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("queries without an oracle are the known non-SQL-expressible set") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val allowed = noOracle.forall { n =>
      n.contains("approx") || n.contains("minhash") || n.contains("simhash") ||
        n.contains("stream") || n.contains("lsh") || n.contains("multimodal") ||
        n.contains("ann_")
    }
    assert(allowed, s"unexpected oracle-less queries: $noOracle")
  }

  test("oracle SQL strings are non-empty and reference a table or file") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle empty")
      assert(sql.toUpperCase.contains("FROM"), s"$name oracle has no FROM")
    }
  }
}
