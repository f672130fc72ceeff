package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.queries.GraftSession

/** Plan inspection tool: prints the formatted physical plan and wall time
  * for one or more queries. Usage:
  *   sbt "runMain graft.Explain <sfDir> <query> [query ...]"
  *   sbt "runMain graft.Explain <sfDir> <query> --plan"   (also dump plan)
  *   sbt "runMain graft.Explain <sfDir> <query> --conf k=v"  (conf override)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val wantPlan = args.contains("--plan")
    val confs = args.sliding(2).collect {
      case Array("--conf", kv) if kv.contains('=') =>
        val Array(k, v) = kv.split("=", 2); (k, v)
    }.toSeq
    val names = args.tail.filterNot(_.startsWith("--"))
      .filterNot(a => confs.exists(c => s"${c._1}=${c._2}" == a))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = confs.foldLeft(
      GraftSession.builder(s"local[$cpus]", cpus.toInt)) {
      case (b, (k, v)) => b.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --stages: per-stage (tasks, max task ms, max task shuffle-read/input)
    // for the LAST run of each query — pinpoints a hot stage/task without
    // the UI (disabled in GraftSession)
    val wantStages = args.contains("--stages")
    val stageMax = new TrieMap[Int, (Int, Long, Long, Long)]()
    if (wantStages) spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val (n, ms, sr, in) = stageMax.getOrElse(t.stageId, (0, 0L, 0L, 0L))
          stageMax.update(t.stageId, (n + 1,
            math.max(ms, m.executorRunTime),
            math.max(sr, m.shuffleReadMetrics.totalBytesRead),
            math.max(in, m.inputMetrics.bytesRead)))
        }
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (wantPlan) {
        println(s"===== $name plan =====")
        df.explain("formatted")
      }
      (1 to 3).foreach { i =>
        if (i == 3) stageMax.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
      if (wantStages) {
        println(s"===== $name per-stage maxima (run3) =====")
        stageMax.toSeq.sortBy(_._1).foreach { case (sid, (n, ms, sr, in)) =>
          println(f"stage $sid%4d  tasks=$n%4d  maxTask=$ms%6d ms  " +
            f"maxShufRead=${sr / 1048576.0}%7.1f MiB  maxInput=${in / 1048576.0}%7.1f MiB")
        }
      }
    }
    spark.stop()
  }
}
