package graft

import org.apache.spark.sql.SparkSession

import graft.queries.GraftSession

/** Dev-only bisection probe for bench contamination: replicates the sweep's
  * exact per-query protocol (clearCache → 1 warmup + 3 timed iterations) for
  * an arbitrary query list in ONE fresh session, so an in-section
  * interaction (e.g. d06's checkpoint/caching residue slowing d07) can be
  * separated from cumulative whole-JVM effects.
  *
  * Usage: `sbt 'runMain graft.BenchProbe <sfDir> <query> [query ...]'`
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark: SparkSession = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val forceGc = sys.env.get("PROBE_GC").contains("1")
    names.foreach { name =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (name == "s07t09") // the bench's 10x near-dup operating point
          (s, dir) => graft.ops.Similarity.cosineNearDupBucketed(
            s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
            threshold = 0.9, tables = 16, planes = 10)
        else SparkEntry.queries(name)
      spark.catalog.clearCache()
      if (forceGc) { System.gc(); Thread.sleep(200) }
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory - rt.freeMemory) / 1048576
      print(f"heap_used_mb=$usedMb%-6d ")
      val gc0 = gcMs()
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s warm=${times.head}%.2f iters=${times.tail.map(t => f"$t%.2f").mkString(",")} gc_s=${(gcMs() - gc0) / 1e3}%.2f")
    }
    spark.stop()
  }
}
