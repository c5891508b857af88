package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{VersionedManifest => VM}

/** CROSS-PROCESS OCC race harness (r13 verdict "What's missing" #3): the
  * commit protocol is built on O_CREAT|O_EXCL + hard-link publish —
  * primitives whose real adversary is a SECOND PROCESS — but every race
  * spec so far ran racers as threads inside one JVM. This main is run
  * TWICE CONCURRENTLY by `tools/occ_race.sh` (two plain `java -cp
  * dist/graft.jar` processes against one estate dir) and once more in
  * `verify` mode to pin the invariants the protocol promises:
  *
  *   - `tryCommit`: per slot, EXACTLY one process wins and the committed
  *     body is the winner's complete body (never torn, never mixed);
  *   - `tryAppendAt`: a fixed-slot deterministic batch lands EXACTLY
  *     once — one winner, the loser treats the race as already-applied;
  *   - `appendBatch`: two different per-process batches BOTH land — the
  *     loser REBASES to the next slot instead of dropping or doubling.
  *
  * Modes:
  *   seed <estate>         — create the append table at v1 (1 seed row)
  *   race <estate> <id>    — barrier on <estate>/.go, then race all
  *                           three protocols; prints one `[occ]` line per
  *                           outcome for the script to cross-count
  *   ivf <estate> <id> <dataset> — barrier on <estate>/.go2, then both
  *                           processes run the FULL buildIvfIndex against
  *                           one root (the operation-level race the
  *                           primitives exist for); prints the serving
  *                           result's hash so the script can pin
  *                           winner-loser result identity
  *   verify <estate>       — recheck every invariant from the committed
  *                           manifests + data; prints OCCRACE PASS/FAIL
  *                           and exits non-zero on FAIL
  */
object OccRace {

  private val Slots = 8

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OccRace seed|race|verify <estate> [id]")
    val mode = args(0)
    val estate = args(1)
    val spark = GraftSession.get(GraftSession.cpus("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tbl1 = s"$estate/slots"  // tryCommit slot races (manifest-only)
    val tbl2 = s"$estate/append" // tryAppendAt + appendBatch races

    def arrivals = spark.range(10)
      .select((col("id") + 100L).as("id"), lit("arrivals").as("src"))

    mode match {
      case "seed" =>
        new java.io.File(estate).mkdirs()
        Seq((0L, "seed")).toDF("id", "src")
          .write.mode("overwrite").parquet(s"$tbl2/v=1")
        VM.commit(spark, tbl2, 1, "seed")
        println(s"[occ] seeded $tbl2 at v1")

      case "race" =>
        val id = args(2)
        // readiness handshake + start barrier: the script releases .go
        // only once BOTH processes are warmed up and polling, so the
        // racing calls overlap for real instead of serializing on JVM
        // startup skew
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(estate, s".ready.$id"))
        val go = java.nio.file.Paths.get(estate, ".go")
        while (!java.nio.file.Files.exists(go)) Thread.sleep(5)
        // 1) slot-commit races: same slot, different bodies, both fire
        (1 to Slots).foreach { k =>
          val won = VM.tryCommit(spark, tbl1, k.toLong,
            s"winner=$id k=$k\n" + (s"pad=$id-$k\n" * 50) + "END")
          println(s"[occ] $id slot$k=$won")
        }
        // 2) fixed-slot append: the deterministic batch must land ONCE
        val wonApp = VM.tryAppendAt(spark, tbl2, 2, arrivals, "arrivals")
        println(s"[occ] $id appendAt2=$wonApp")
        // 3) rebase appends: each process's OWN batch must land (loser
        // rebases past the winner's slot)
        val mine = spark.range(5)
          .select((col("id") + 1000L).as("id"), lit(s"proc=$id").as("src"))
        val v = VM.appendBatch(spark, tbl2, mine, s"proc=$id")
        println(s"[occ] $id appendBatch_v=$v")

      case "ivf" =>
        val id = args(2)
        val dataset = args(3)
        val root = s"$estate/ivf"
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(estate, s".ready2.$id"))
        val go = java.nio.file.Paths.get(estate, ".go2")
        while (!java.nio.file.Files.exists(go)) Thread.sleep(5)
        operators.Similarity.buildIvfIndex(spark, dataset, root,
          baseOnly = false)
        val served = operators.Similarity
          .serveFromIvfIndex(spark, dataset, root)
          .collect().map(_.toString).mkString("|")
        println(s"[occ] $id ivf_serve_hash=${served.hashCode}")

      case "verify" =>
        // operation-level build race (when the script ran mode `ivf`):
        // exactly one committed version per index table, each addressing
        // ONE writer-unique stage — two processes can never interleave
        // files in a shared dir
        if (new java.io.File(s"$estate/ivf/lists/_commits").isDirectory) {
          val root = s"$estate/ivf"
          Seq("cents", "lists").foreach { tbl =>
            val vs = VM.committedVersions(spark, s"$root/$tbl")
            if (vs != Seq(1L)) {
              println(s"OCCRACE FAIL: ivf $tbl versions $vs != [1]")
              spark.stop(); sys.exit(1)
            }
            val dirs = VM.resolveDataDirs(spark, s"$root/$tbl", 1)
            if (dirs.size != 1) {
              println(s"OCCRACE FAIL: ivf $tbl v1 addresses ${dirs.size} " +
                "stages (must be exactly the winner's)")
              spark.stop(); sys.exit(1)
            }
          }
          println("[occ] ivf build race: one version per table, " +
            "one winner stage each")
        }
        verifyPrimitives(spark, tbl1, tbl2)
    }
    spark.stop()
  }

  private def verifyPrimitives(spark: SparkSession, tbl1: String,
      tbl2: String): Unit = {
    var fails = List.empty[String]
    def check(ok: Boolean, msg: String): Unit =
      if (!ok) fails ::= msg
        // tryCommit invariants: every slot committed, body COMPLETE and
        // internally consistent (one winner id throughout — a torn or
        // mixed publish would break the pad lines or the terminator)
        check(VM.committedVersions(spark, tbl1) ==
          (1L to Slots.toLong).toSeq, s"slots table versions != 1..$Slots")
        (1 to Slots).foreach { k =>
          val body = VM.describe(spark, tbl1, k.toLong)
          check(body.endsWith("END"), s"slot $k body truncated")
          val ids = body.linesIterator
            .filter(_.startsWith("winner=")).map(_.drop(7).takeWhile(_ != ' '))
            .toSet ++
            body.linesIterator.filter(_.startsWith("pad="))
              .map(_.drop(4).takeWhile(_ != '-')).toSet
          check(ids.size == 1, s"slot $k body mixes writers: $ids")
        }
        // tryAppendAt + appendBatch invariants: v1 seed + v2 arrivals +
        // two rebased proc batches = versions 1..4, exact row masses
        check(VM.committedVersions(spark, tbl2) == Seq(1L, 2L, 3L, 4L),
          s"append table versions ${VM.committedVersions(spark, tbl2)} != 1..4")
        val rows = VM.readLatest(spark, tbl2)
        check(rows.count() == 21L,
          s"append table rows ${rows.count()} != 21 (1+10+5+5)")
        check(rows.filter(col("src") === "arrivals").count() == 10L,
          "fixed-slot batch lost or doubled")
        Seq("A", "B").foreach { id =>
          check(rows.filter(col("src") === s"proc=$id").count() == 5L,
            s"proc=$id batch lost or doubled")
        }
        // no torn residue
        val residue = Option(new java.io.File(s"$tbl1/_commits").listFiles())
          .getOrElse(Array.empty).filter(_.getName.endsWith(".tmp"))
        check(residue.isEmpty, s"tmp residue in _commits: ${residue.length}")
        if (fails.isEmpty) println("OCCRACE PASS")
        else {
          fails.reverse.foreach(m => println(s"OCCRACE FAIL: $m"))
          spark.stop(); sys.exit(1)
        }
  }
}
