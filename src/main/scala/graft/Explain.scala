package graft

import graft.queries.GraftSession

/** Plan inspection tool: prints the formatted physical plan and wall time
  * for one or more queries. Usage:
  *   sbt "runMain graft.Explain <sfDir> <query> [query ...]"
  *   sbt "runMain graft.Explain <sfDir> <query> --plan"   (also dump plan)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val wantPlan = args.contains("--plan")
    val names = args.tail.filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (wantPlan) {
        println(s"===== $name plan =====")
        df.explain("formatted")
      }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    spark.stop()
  }
}
