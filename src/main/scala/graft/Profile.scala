package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query and print its formatted physical plan.
  * Usage: runMain graft.Profile <sfDir> <query> [query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = GraftSession.cpus("32")
    val spark = GraftSession.get(cpus)
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"===== $name =====")
      // construction is not free for every query: iterative operators
      // (q85) and streaming backfills (q90+) execute jobs while building
      // the result — time it separately from plan re-execution
      val tc = System.nanoTime()
      val df = fn(spark, sfDir)
      println(f"[profile] $name construct: ${(System.nanoTime() - tc) / 1e9}%.2f s")
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // NOTE: releasing here would break iterative queries whose result
        // depends on localCheckpoint blocks built at construction (q85
        // et al. re-execute from the checkpointed RDD); release only
        // between queries, after this df's last run.
      }
      CacheHygiene.release(spark)
      println(s"[profile] active streams after $name: " +
        spark.streams.active.length)
    }
    spark.stop()
  }
}
