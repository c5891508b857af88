package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Registry of per-application staging directories under `java.io.tmpdir`
  * (the landed-PNG fixtures, q216's published fingerprint artifact, q203's
  * ORC round-trip dir, the streaming source symlink stages). They are keyed
  * by applicationId so runs never race each other AND so a query that
  * executes many times per session (bench attempts) reuses its landed
  * artifact instead of re-writing it — which is exactly why they cannot be
  * plain `createTempDirectory` throwaways. The cost was a leak: every
  * session left its directories behind (round-7 ADVICE). Registering them
  * here deletes the lot in a JVM shutdown hook — after `SparkSession.stop`,
  * since the harness mains stop Spark before exiting and specs share one
  * session for the JVM lifetime.
  */
object StagingDirs {

  private val dirs = scala.collection.mutable.LinkedHashSet.empty[String]
  private var hooked = false

  /** Register a staging dir for deletion at JVM exit; returns the path. */
  def register(path: String): String = synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))
      hooked = true
    }
    dirs += path
    path
  }

  private def deleteAll(): Unit = synchronized {
    dirs.foreach { d =>
      try {
        val p = Paths.get(d)
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
      } catch { case _: Exception => () }
    }
    dirs.clear()
  }
}
