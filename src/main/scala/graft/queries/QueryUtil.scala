package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared oracle-determinism helpers. Money aggregates run in exact integer
  * cents: `SUM(round(x*100)::BIGINT)` is order-independent and bit-identical
  * across engines, unlike floating-point summation. The Spark and SQL forms
  * here MUST stay in lockstep — they are two spellings of one definition.
  */
object QueryUtil {
  /** money → exact integer cents */
  def cents(c: Column): Column = round(c * 100).cast("long")
  /** fraction → exact integer basis points (0.07 → 7) */
  def pctInt(c: Column): Column = round(c * 100).cast("long")
  /** DuckDB spelling of [[cents]]/[[pctInt]] */
  val centsSql: String => String = x => s"CAST(round($x*100) AS BIGINT)"

  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val scratchHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      import scala.jdk.CollectionConverters._
      scratchDirs.asScala.foreach { p =>
        try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_): Unit)
        catch { case _: Exception => }
      }
    }))

  /** Temp directory that is reclaimed at JVM exit (ADVICE r13: the
    * streaming rows and the z-order writer rows materialize table-sized
    * parquet copies plus checkpoints per invocation; without cleanup a
    * registry sweep leaks /tmp disk proportional to SF × iterations). The
    * dir must OUTLIVE the returned DataFrame — registry results are
    * consumed lazily by Verify/Bench after the query fn returns — so
    * deletion is a shutdown hook, not an eager unlink.
    */
  def scratchDir(prefix: String): String = {
    scratchHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }
}
