package graft

import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** One-off diagnostic: run s07's production form on the 100x corpus under
  * several session configs, each behind its own quiet gate, and print
  * per-config wall + the heaviest stages (task count, max task, task-sum,
  * shuffle telemetry) so straggler hunts aim at the right stage instead of
  * re-rolling the whole evidence row. Not part of any evidence path.
  *
  * Usage: graft.StageProbe <workDir> "k=v,k=v" "k=v" ...   (one arg per config)
  */
object StageProbe {
  private def gate(threshold: Double, maxWaitSec: Int): Double = {
    def la(): Double = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+").head.toDouble
    val deadline = System.currentTimeMillis() + maxWaitSec * 1000L
    var l = la()
    while (l > threshold && System.currentTimeMillis() < deadline) {
      Thread.sleep(5000); l = la()
    }
    l
  }

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_scale100x")
    val configs = if (args.length > 1) args.drop(1).toSeq else Seq("")
    configs.foreach { confStr =>
      SparkSessionCleanup()
      val l = gate(2.5, 240)
      val (spark, _) = Bench.freshSession("32")
      confStr.split(",").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) }
      case class St(var tasks: Int = 0, var maxMs: Long = 0,
        var sumMs: Long = 0, var maxShuf: Long = 0, var maxIn: Long = 0)
      val stages = TrieMap.empty[Int, St]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val st = stages.getOrElseUpdate(e.stageId, St())
          val m = e.taskMetrics
          if (m != null) {
            st.tasks += 1
            st.maxMs = math.max(st.maxMs, m.executorRunTime)
            st.sumMs += m.executorRunTime
            st.maxShuf = math.max(st.maxShuf,
              m.shuffleReadMetrics.totalBytesRead)
            st.maxIn = math.max(st.maxIn, m.inputMetrics.bytesRead)
          }
        }
      })
      val emb = spark.read.parquet(s"$workDir/embeddings.parquet")
      def run() = graft.ops.Similarity
        .cosineNearDupAuto(emb, "vec_id", "embedding", 0.9).count()
      run() // warm
      spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      val n = run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CONFIG [$confStr] gateLoad=$l%.2f wall=$sec%.1fs rows=$n")
      stages.toSeq.sortBy(-_._2.maxMs).take(5).foreach { case (id, s) =>
        println(f"  stage $id%4d tasks=${s.tasks}%4d max=${s.maxMs}%6d ms " +
          f"sum=${s.sumMs / 1000}%5d s maxShuf=${s.maxShuf / 1048576.0}%7.1f MB " +
          f"maxIn=${s.maxIn / 1048576.0}%6.1f MB")
      }
      spark.stop()
    }
  }

  private object SparkSessionCleanup {
    def apply(): Unit = System.gc()
  }
}
