package graft

/** Measure the machine-calibration kernel standalone — the tool that pins
  * (and re-pins, on new hardware) [[Bench.CalBaselineRowsPerS]]. Prints N
  * gated samples plus their best/median so the pin can cite a quiet
  * measurement. No Spark session: the kernel is a single-thread JVM loop
  * by design (the calibration must not depend on scheduler/shuffle state).
  */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(8)
    val vals = (0 until samples).map { i =>
      Thread.sleep(200)
      val v = Bench.calSample()
      println(f"sample ${i + 1}: ${v / 1e6}%.2f M rows/s")
      v
    }.sorted
    println(f"best ${vals.last / 1e6}%.2f M rows/s, median " +
      f"${vals(samples / 2) / 1e6}%.2f, worst ${vals.head / 1e6}%.2f " +
      f"(pinned baseline ${Bench.CalBaselineRowsPerS / 1e6}%.2f)")
  }
}
