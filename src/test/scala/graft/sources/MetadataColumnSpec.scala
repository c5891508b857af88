package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The `_metadata` hidden column on file sources — per-row provenance
  * (file name/path/size) surfaced without any join: the lineage surface a
  * landing-zone audit or incremental loader reads. Not DuckDB-oracled
  * because the oracle harness sees registered views, not file paths; the
  * facts are checked against the filesystem instead.
  */
class MetadataColumnSpec extends SparkSpec {

  test("_metadata exposes file name and size matching the filesystem") {
    val f = new java.io.File(s"$sf0001/lineitem.parquet")
    val meta = Tables.lineitem(spark, sf0001)
      .select(col("_metadata.file_name").as("fn"),
        col("_metadata.file_size").as("sz"))
      .distinct().collect()
    assert(meta.length == 1, s"expected one file, got ${meta.length}")
    assert(meta(0).getString(0) == "lineitem.parquet")
    assert(meta(0).getLong(1) == f.length(),
      s"file_size ${meta(0).getLong(1)} != fs ${f.length()}")
  }

  test("_metadata.row_index enumerates rows within the file") {
    val idx = Tables.region(spark, sf0001)
      .select(col("_metadata.row_index").as("ri")).collect()
      .map(_.getLong(0)).sorted
    assert(idx.toSeq == (0L until idx.length).toSeq,
      s"row_index not dense from 0: ${idx.toSeq}")
  }
}
