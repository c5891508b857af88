package graft

import org.apache.spark.sql.SparkSession

/** The one place the harness session is configured. Every main and the
  * shared test fixture build through here, so the verify, bench, and test
  * paths can never silently diverge on an environment setting (the round-3
  * review found the same 6-line block copy-pasted five times).
  */
object GraftSession {

  /** Default parallelism when `SPARK_GRAFT_CPUS` is unset. */
  def cpus(default: String): String = sys.env.getOrElse("SPARK_GRAFT_CPUS", default)

  /** A configured builder: local[cpus], shuffle partitions = cpus, UTC,
    * UI off, the graft extensions (native functions + optimizer rule +
    * as-of strategy), and no per-file checkpoint checksums — harness
    * streams checkpoint into throwaway temp dirs, where that durability
    * is pure overhead (a real deployment configures its own session).
    */
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

  /** Build (or reuse) the session and quiet the logs. */
  def get(cpus: String): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
