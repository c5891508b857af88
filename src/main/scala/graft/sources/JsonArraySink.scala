package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's JSON artifact writer (SURVEY.md §2.1 S8,
  * `main.py:197-198`): ONE pretty-printed array —
  * `json.dump(results, f, ensure_ascii=False, indent=2)` — reproduced
  * byte-for-byte (SinksSpec pins it against the reference's own landed
  * files).
  *
  * A single-file JSON array is inherently a sequential artifact (there is
  * no parallel spelling of "one array in one file"), so rows stream
  * through `toLocalIterator` — one partition in memory at a time, never a
  * full collect. The SCALABLE S8 path everywhere else in the engine is
  * `df.write.json` (JSONL, one file per partition); this writer exists for
  * exact parity with the reference's small landed corpora.
  */
object JsonArraySink {

  /** Python-json string escaping under `ensure_ascii=False`: only `"`,
    * `\` and control chars are escaped (`\b \t \n \f \r`, other C0 as
    * `\u00xx`); every other code point passes through as raw UTF-8.
    */
  private[sources] def pyEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\b' => b.append("\\b")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\f' => b.append("\\f")
      case '\r' => b.append("\\r")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Write `df`'s string columns, in `cols` order (the reference emits
    * insertion-ordered dict keys, not Spark's alphabetical inference
    * order), as the single-array artifact at `path`. NULLs are restored to
    * the reference's `''` missing-value sentinel (the inverse of
    * [[ArticleSource.normalize]]).
    */
  def write(df: DataFrame, cols: Seq[String], path: String): Unit = {
    val ordered = df.select(cols.map(col): _*)
    val out = new java.io.OutputStreamWriter(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)), "UTF-8")
    try {
      val it = ordered.toLocalIterator()
      if (!it.hasNext) out.write("[]") // json.dump([], indent=2)
      else {
        out.write("[")
        var first = true
        while (it.hasNext) {
          val r = it.next()
          out.write(if (first) "\n  {\n" else ",\n  {\n")
          first = false
          var i = 0
          while (i < cols.length) {
            val v = if (r.isNullAt(i)) "" else r.getString(i)
            out.write("    \"" + pyEscape(cols(i)) + "\": \"" + pyEscape(v) + "\"")
            out.write(if (i == cols.length - 1) "\n" else ",\n")
            i += 1
          }
          out.write("  }")
        }
        out.write("\n]")
      }
    } finally out.close()
  }
}
