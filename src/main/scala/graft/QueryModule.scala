package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A bundle of named queries plus their DuckDB oracle SQL.
  * `SparkEntry` aggregates all modules into the driver contract.
  */
trait QueryModule {
  /** name -> (spark, sfDir) => result. Results must carry a total ordering
    * (deterministic ORDER BY) and oracle-matching column names.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-dialect oracle SQL per query name. Keys may be omitted for
    * non-SQL-expressible ops (driver falls back to a rows-only check).
    */
  def oracles: Map[String, String]
}

/** Exact-arithmetic helpers so Spark and the DuckDB oracle agree
  * bit-for-bit despite distributed execution.
  *
  * Money columns in the testdata are doubles holding 2-decimal values. Both
  * engines cast them to DECIMAL losslessly, aggregate exactly — decimal sums
  * are associative, so partial aggregation across any number of partitions
  * (or 1000 executors) cannot change the result — and only then cast to
  * DOUBLE. Final double arithmetic (division etc.) is IEEE-deterministic
  * given equal inputs. See SURVEY.md §7.3 (floating-point hash-compare).
  *
  * Rule for the final DECIMAL→DOUBLE cast (verified empirically against
  * DuckDB 1.0): the cast is only bit-exact across engines when the decimal's
  * *scaled integer* fits in 2^53 — DuckDB converts int128→double before
  * dividing by 10^scale, so a wider value picks up an ulp of error. Keep
  * final sums at scale ≤ 6 and magnitude ≤ ~9e8 (cast the sum to
  * DECIMAL(30,6) first if an intermediate product raised the scale).
  */
object Exact {
  val Money: DecimalType = DecimalType(18, 2)
  val Rate: DecimalType = DecimalType(9, 4)

  /** Lossless lift of a 2-decimal double into exact decimal. */
  def money(c: Column): Column = c.cast(Money)

  /** Lossless lift of a small ratio (discount/tax) into exact decimal. */
  def rate(c: Column): Column = c.cast(Rate)

  /** Exact distributed sum of a money column, surfaced as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Exact mean: exact decimal sum, then one double division. */
  def avgMoney(c: Column): Column = sum(money(c)).cast(DoubleType) / count(c)

  /** DuckDB-side spelling of [[sumMoney]] for oracle strings. */
  def sqlSumMoney(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  def sqlAvgMoney(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)"

  /** DuckDB spelling of Spark's `conv(substring(<hexExpr>, off, n), 16, 10)`:
    * positional parse of `n` hex chars (1-based `off`) into a BIGINT sum.
    * DuckDB 1.0 has no `conv()`; every md5-bucket oracle shares this one
    * implementation so the shift arithmetic can never drift between them.
    */
  def sqlHexToLong(hexExpr: String, off: Int, n: Int): String =
    (0 until n).map { i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, ${off + i}, 1)) - 1) * ${1L << ((n - 1 - i) * 4)}"
    }.mkString(" + ")
}
