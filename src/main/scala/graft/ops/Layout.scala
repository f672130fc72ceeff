package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: the write-side clustering that turns
  * a 2-D box predicate into file/row-group skipping at scan time.
  *
  * At 100 TB the cheapest query is the one that never reads the bytes: a
  * table range-partitioned and sorted by an interleaved key gives every
  * file a TIGHT min/max footer range on that key, and because the Morton
  * key is monotone in each coordinate (a1 ≤ a2 ∧ b1 ≤ b2 ⇒ z1 ≤ z2), any
  * box query maps to a zkey interval whose non-overlapping files are
  * skipped without a read — by parquet row-group stats, by a lakehouse
  * file index, or by [[zorderFilesFor]] below. A single-column sort gives
  * this for one dimension only; the interleave shares the locality between
  * both.
  *
  * Everything here is codegen'd builtin bit arithmetic (shiftleft / AND /
  * OR) — no UDFs — and the same five mask-shift stages are expressible in
  * ANSI SQL, so the key is engine-replayable (the q50 oracle recomputes it
  * in DuckDB).
  */
object Layout {

  /** Spread the low 16 bits of a non-negative column so bit i lands at
    * bit 2i — the classic mask-shift Morton spread (public domain bit
    * trick; see e.g. "Bit Twiddling Hacks", interleave by binary magic
    * numbers).
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xffffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00ff00ffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0f0f0f0fL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit coordinates: a's bit i at 2i, b's at
    * 2i+1. Monotone in each coordinate — the property file skipping needs.
    */
  def zorderKey2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` clustered by the Morton key of (a, b): range-partition into
    * `numFiles` zkey slices (each output file covers a tight, disjoint key
    * interval — range exchange samples the key, no full sort) and sort rows
    * within each file so row-group min/max stats are tight too. The zkey
    * column is persisted: it is the skip index.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, outDir: String,
      numFiles: Int): Unit =
    df.withColumn("zkey", zorderKey2(a, b))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(outDir)

  /** File-level skip set for a box query over a [[zorderWrite]] layout:
    * per-file zkey min/max (from the persisted key — the same numbers a
    * parquet footer carries) intersected with the box's coarse zkey
    * interval [z(aLo,bLo), z(aHi,bHi)]. Monotonicity makes the interval
    * sound (every box row's key is inside it), so reading only the
    * returned files is CORRECT, just possibly more than minimal (the
    * coarse interval is the standard one-range Z-envelope; BIGMIN range
    * splitting would tighten it further).
    *
    * Driver-side work is one aggregate over file names — O(numFiles) rows,
    * never data-sized.
    */
  def zorderFilesFor(spark: org.apache.spark.sql.SparkSession, dir: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): (Seq[String], Long) = {
    require(aLo <= aHi && bLo <= bHi, "empty box")
    val zLo = mortonOf(aLo, bLo)
    val zHi = mortonOf(aHi, bHi)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("zkey").as("zmin"), max("zkey").as("zmax"))
      .collect()
    val keep = stats.filter(r => r.getAs[Long]("zmax") >= zLo &&
      r.getAs[Long]("zmin") <= zHi).map(_.getAs[String]("file")).toSeq
    (keep, stats.length.toLong)
  }

  /** Driver-side Morton key (same bit layout as [[zorderKey2]]). */
  def mortonOf(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xffffL
      x = (x | (x << 8)) & 0x00ff00ffL
      x = (x | (x << 4)) & 0x0f0f0f0fL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    spread(a) | (spread(b) << 1)
  }

  /** Driver-side Morton inverse: recover the (a, b) coordinates of a key —
    * the direction a debugging session needs when a file's [zmin, zmax]
    * footer range is to be read back as box corners. Exact inverse of
    * [[mortonOf]] (LayoutSpec round-trips the full 16-bit grid diagonal
    * plus random points).
    */
  def mortonInverse(z: Long): (Long, Long) = {
    def unspread(v: Long): Long = {
      var x = v & 0x55555555L
      x = (x | (x >> 1)) & 0x33333333L
      x = (x | (x >> 2)) & 0x0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ffL
      (x | (x >> 8)) & 0x0000ffffL
    }
    (unspread(z), unspread(z >> 1))
  }

  /** The q50 oracle's SQL replica of [[spread16]] (string-built so the five
    * stages cannot drift from the Column form above).
    */
  def spreadSql(e: String): String = {
    val x0 = s"(($e) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  def zorderKeySql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
