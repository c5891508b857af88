package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar-function semantics the DuckDB oracle cannot replay (F2
  * url-encode has no DuckDB counterpart) plus reference-behavior pins.
  */
class ScalarsSpec extends SparkSpec {

  test("url_encode matches the reference's quote() behavior for query strings") {
    import spark.implicits._
    // main.py:46 / mainn.py:42: quote("machine learning") interpolated into
    // the search URL. Spark's url_encode is application/x-www-form-urlencoded
    // (space -> '+'); Python's quote uses %20 — pin both the encode and the
    // round trip so the difference is explicit and decoded forms agree.
    val rows = Seq("machine learning", "AI", "a&b=c", "café").toDF("q")
      .select(col("q"), expr("url_encode(q)").as("enc"))
      .select(col("q"), col("enc"), expr("url_decode(enc)").as("back"))
      .collect()
    val enc = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("machine learning") == "machine+learning")
    assert(enc("a&b=c") == "a%26b%3Dc")
    assert(enc("café") == "caf%C3%A9")
    rows.foreach(r => assert(r.getString(2) == r.getString(0), s"round trip: $r"))
  }

  test("trim/substring match the reference's strip()/slice semantics") {
    import spark.implicits._
    val df = Seq(("  padded  ", "0123456789abcdef")).toDF("a", "b")
      .select(
        trim(col("a")).as("t"),
        substring(col("b"), 1, 50).as("s50"), // [:50] on short input: identity
        substring(col("b"), 1, 5).as("s5"))
    val r = df.collect()(0)
    assert(r.getString(0) == "padded")
    assert(r.getString(1) == "0123456789abcdef")
    assert(r.getString(2) == "01234")
  }
}
