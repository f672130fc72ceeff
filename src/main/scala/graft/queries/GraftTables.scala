package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata access. The `events` table stores TIMESTAMP(NANOS) which Spark's
  * parquet reader rejects by default (PARQUET_TYPE_ILLEGAL); sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[GraftSession]]) and this
  * reader normalizes the nano longs back to TimestampType micros — matching
  * DuckDB's nano→micro truncation, so oracles agree.
  */
object GraftTables {
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}

/** One place for session defaults so Verify / Bench / tests / user code get
  * identical semantics (UTC, nanos handling, AQE, local-sized shuffles).
  */
object GraftSession {
  def builder(master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // reap reliable checkpoint files (ConnectedComponents per-round
      // checkpoints) once their RDDs are GC'd — otherwise every superseded
      // round's files live until the application exits
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
}
