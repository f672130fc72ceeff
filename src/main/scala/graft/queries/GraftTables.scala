package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata access. Current testdata stores naive `timestamp[us]` columns;
  * [[GraftSession]] disables TIMESTAMP_NTZ inference so they read as
  * TimestampType in the UTC session, matching DuckDB's naive reading of the
  * same files. Older generations stored TIMESTAMP(NANOS) (rejected by
  * Spark's reader unless `spark.sql.legacy.parquet.nanosAsLong=true`);
  * that config plus this reader's long-ts normalization keep those files
  * readable too — a no-op on current data.
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
      shufflePartitions: Int = 32): SparkSession.Builder = {
    // Streaming state-store backend knob (VERDICT r13 #4): the default
    // HDFS-backed provider keeps every state row on-heap, which is what
    // degrades the stateful-streaming rows on small heaps; RocksDB keeps
    // state off-heap/on-disk. Opt-in (SPARK_GRAFT_STATESTORE=rocksdb) —
    // measured on st04/st01 at 8 GB before deciding the default.
    val stateStore = sys.env.get("SPARK_GRAFT_STATESTORE") match {
      case Some("rocksdb") => Some("org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
      case _ => None
    }
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata `ts` is naive timestamp[us]; read it as TimestampType in
      // the UTC session (not TIMESTAMP_NTZ) so unix_micros()/watermarks
      // work and values match DuckDB's naive reading of the same file
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // reap reliable checkpoint files (ConnectedComponents per-round
      // checkpoints) once their RDDs are GC'd — otherwise every superseded
      // round's files live until the application exits
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
    stateStore.fold(b)(p =>
      b.config("spark.sql.streaming.stateStore.providerClass", p))
  }
}
