package graft

/** Dedicated 100×-scale child (forked by [[Bench]] at `-Xmx96g` — VERDICT
  * r9 #1/#2). The 100× corpus (~0.5 M docs / 0.2 M vectors) wants the big
  * heap, but the bench sweep must stay at the moderate 16 GB that keeps the
  * ContextCleaner honest — so the 100× section runs here, in its own JVM,
  * and persists its rows to `bench_scale100x.json`: a standalone committed
  * artifact that later bench runs EMBED (with provenance) rather than
  * regenerate, so one dedicated measurement survives per-round
  * bench_full.json rewrites.
  *
  * Usage: `graft.Scale100x <sfDir> [cpus]` (also runnable directly via
  * `SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.Scale100x /root/testdata/sf0.1'`
  * — but then sbt's -Xmx applies; prefer SPARK_DRIVER_MEM=96g).
  */
object Scale100x {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val (spark, listener) = Bench.freshSession(cpus)
    // scale100xRows gives each row its own fresh session (quiet-gated,
    // corpus-scaled shuffle partitions) — this session only synthesizes
    val (json, secs) = Bench.scale100xRows(spark, listener, sfDir, cpus)
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    val unix = System.currentTimeMillis() / 1000
    if (secs.nonEmpty) {
      // Only a successful measurement may overwrite the artifact: an error
      // run must not erase previously-committed 100× evidence.
      val out =
        f"""{"heap_gb":$heapGb%.1f,"unix":$unix,"sf":"$sfDir","rows":$json}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_scale100x.json").toAbsolutePath,
        (out + "\n").getBytes("UTF-8"))
      println("scale100x rows written: " +
        secs.map { case (k, v) => f"$k=$v%.1fs" }.mkString(", "))
    } else {
      println(s"scale100x FAILED, artifact untouched: $json")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
