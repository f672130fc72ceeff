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

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Inclusive upper bound of each Morton coordinate: the key interleaves
    * 16 bits per dimension, so every caller must deliver coordinates in
    * [0, 65535] (pmod / bucketize first). Out-of-domain values would WRAP
    * under the masking below and silently land in the wrong key interval —
    * [[zorderFilesFor]] and [[zorderRanges]] reject them loudly instead
    * (ADVICE r13).
    */
  val CoordMax: Long = 65535L

  /** Spread the low 16 bits of a non-negative column so bit i lands at
    * bit 2i — the classic mask-shift Morton spread (public domain bit
    * trick; see e.g. "Bit Twiddling Hacks", interleave by binary magic
    * numbers). Domain: [0, [[CoordMax]]]; higher bits are masked off, so
    * the CALLER must reduce (pmod) first or distinct coordinates collide.
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

  /** Spread the low 16 bits of a non-negative column so bit i lands at
    * bit 3i — the 3-D Morton spread (same public-domain mask-shift family
    * as [[spread16]]; the masks are the standard part-by-two chain used
    * for ≤21-bit 3-D keys, e.g. libmorton). Domain: [0, [[CoordMax]]];
    * higher bits are masked off, so the caller must reduce (pmod) first.
    */
  def spread16By3(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xffffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1f00000000ffffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1f0000ff0000ffL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100f00f00f00f00fL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10c30c30c30c30c3L))
    x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 48-bit Morton key of THREE 16-bit coordinates — the multi-dimension
    * clustering key for the common (date, customer, part)-style layout
    * where box queries constrain any subset of three dimensions. Monotone
    * in each coordinate like [[zorderKey2]], so per-file zkey min/max
    * footer pruning stays sound; codegen'd bit arithmetic, no UDF.
    */
  def zorderKey3(a: Column, b: Column, c: Column): Column =
    spread16By3(a).bitwiseOR(shiftleft(spread16By3(b), 1))
      .bitwiseOR(shiftleft(spread16By3(c), 2))

  /** Write `df` clustered by the Morton key of (a, b): range-partition into
    * `numFiles` zkey slices (each output file covers a tight, disjoint key
    * interval — range exchange samples the key, no full sort) and sort rows
    * within each file so row-group min/max stats are tight too. The zkey
    * column is persisted: it is the skip index.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, outDir: String,
      numFiles: Int): Unit = {
    // a pre-existing zkey column would be silently overwritten in the
    // persisted layout (ADVICE r13) — refuse loudly instead
    require(!df.columns.contains("zkey"),
      "input already has a 'zkey' column; rename it before zorderWrite")
    df.withColumn("zkey", zorderKey2(a, b))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(outDir)
  }

  /** File-level skip set for a box query over a [[zorderWrite]] layout:
    * per-file zkey min/max (from the persisted key — the same numbers a
    * parquet footer carries) intersected with the box's coarse zkey
    * interval [z(aLo,bLo), z(aHi,bHi)]. Monotonicity makes the interval
    * sound (every box row's key is inside it), so reading only the
    * returned files is CORRECT, just possibly more than minimal (the
    * coarse interval is the standard one-range Z-envelope;
    * [[zorderFilesForSplit]] is the tightened multi-range form).
    *
    * Driver-side work is one aggregate over file names — O(numFiles) rows,
    * never data-sized.
    */
  def zorderFilesFor(spark: org.apache.spark.sql.SparkSession, dir: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): (Seq[String], Long) = {
    requireBox(aLo, aHi, bLo, bHi)
    val zLo = mortonOf(aLo, bLo)
    val zHi = mortonOf(aHi, bHi)
    val stats = fileStats(spark, dir)
    val keep = stats.filter { case (_, zmin, zmax) =>
      zmax >= zLo && zmin <= zHi }.map(_._1)
    (keep, stats.length.toLong)
  }

  /** File-level skip set via SPLIT Z-ranges (the BIGMIN/LITMAX refinement
    * the coarse envelope concedes in [[zorderFilesFor]]'s doc): the box is
    * decomposed into ≤ `maxRanges` disjoint zkey intervals by quadrant
    * recursion — an aligned 2^k square either lies outside the box (its
    * whole contiguous z-interval is SKIPPED, including the seam gaps the
    * one-range envelope keeps), inside it (emitted verbatim), or straddles
    * it (recursed). Emitted in increasing z; adjacent intervals are merged
    * and, when more than `maxRanges` survive, the smallest inter-range gaps
    * are re-covered first — merging only ever OVER-covers, so soundness is
    * unconditional while the range count stays index-friendly. A file is
    * read iff its [zmin, zmax] overlaps some range, so a box hugging the
    * curve's seam skips the files the coarse interval was forced to keep
    * (LayoutSpec pins both soundness and the strict improvement).
    *
    * Same driver cost shape as the coarse form: O(numFiles · log ranges)
    * after one O(numFiles) stats aggregate — never data-sized.
    */
  def zorderFilesForSplit(spark: org.apache.spark.sql.SparkSession,
      dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      maxRanges: Int = 64): (Seq[String], Long) = {
    val ranges = zorderRanges(aLo, aHi, bLo, bHi, maxRanges)
    val stats = fileStats(spark, dir)
    (filesOverlapping(stats, ranges), stats.length.toLong)
  }

  /** Coarse envelope AND split cover from ONE stats pass — for callers that
    * want both (e.g. to assert the split cover is no worse): the two
    * single-cover entry points each read the directory's footers, so asking
    * them separately doubles the metadata pass. Returns
    * (coarseFiles, splitFiles, totalFiles).
    */
  def zorderFilesForBoth(spark: org.apache.spark.sql.SparkSession,
      dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      maxRanges: Int = 64): (Seq[String], Seq[String], Long) = {
    requireBox(aLo, aHi, bLo, bHi)
    val zLo = mortonOf(aLo, bLo)
    val zHi = mortonOf(aHi, bHi)
    val ranges = zorderRanges(aLo, aHi, bLo, bHi, maxRanges)
    val stats = fileStats(spark, dir)
    val coarse = stats.filter { case (_, zmin, zmax) =>
      zmax >= zLo && zmin <= zHi }.map(_._1).toSeq
    (coarse, filesOverlapping(stats, ranges), stats.length.toLong)
  }

  /** Files whose [zmin, zmax] overlaps some cover range (ranges disjoint
    * and increasing — binary search per file).
    */
  private def filesOverlapping(stats: Array[(String, Long, Long)],
      ranges: Seq[(Long, Long)]): Seq[String] = {
    val los = ranges.map(_._1).toArray
    stats.filter { case (_, zmin, zmax) =>
      // candidate range = last one starting at or before zmax
      val i = {
        val p = java.util.Arrays.binarySearch(los, zmax)
        if (p >= 0) p else -(p + 1) - 1
      }
      i >= 0 && ranges(i)._2 >= zmin
    }.map(_._1).toSeq
  }

  /** The box's zkey cover as ≤ `maxRanges` disjoint, increasing intervals
    * (driver-side, pure). The exact cover can hold O(perimeter) intervals;
    * the merge step trades range count for over-read bytes explicitly —
    * maxRanges = 1 degenerates to the coarse envelope, so the split cover
    * is never worse.
    */
  def zorderRanges(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    requireBox(aLo, aHi, bLo, bHi)
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    val exact = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // quadrant order (b-half, then a-half) IS increasing-z order because a's
    // bits sit at even positions and b's just above — so `exact` needs no
    // sort and adjacent-merge is a single pass
    def rec(ca: Long, cb: Long, size: Long): Unit = {
      val caHi = ca + size - 1
      val cbHi = cb + size - 1
      if (caHi < aLo || ca > aHi || cbHi < bLo || cb > bHi) ()
      else if (ca >= aLo && caHi <= aHi && cb >= bLo && cbHi <= bHi) {
        val z0 = mortonOf(ca, cb) // aligned square ⇒ contiguous z-interval
        val r = (z0, z0 + size * size - 1)
        if (exact.nonEmpty && exact.last._2 + 1 == r._1)
          exact(exact.length - 1) = (exact.last._1, r._2)
        else exact += r
      } else {
        val h = size / 2
        rec(ca, cb, h); rec(ca + h, cb, h)
        rec(ca, cb + h, h); rec(ca + h, cb + h, h)
      }
    }
    rec(0L, 0L, CoordMax + 1)
    mergeToBudget(exact, maxRanges)
  }

  /** Reduce a disjoint increasing cover to ≤ `maxRanges` intervals by
    * closing the smallest inter-range gaps first: each merge adds gap-many
    * over-read keys, so greedy-by-gap minimizes total over-cover for the
    * budget. Merging only ever OVER-covers — soundness is unconditional.
    */
  private def mergeToBudget(
      exact: scala.collection.mutable.ArrayBuffer[(Long, Long)],
      maxRanges: Int): Seq[(Long, Long)] = {
    if (exact.length <= maxRanges) exact.toSeq
    else {
      val mergeAt = (1 until exact.length)
        .map(i => (exact(i)._1 - exact(i - 1)._2 - 1, i))
        .sortBy(_._1).take(exact.length - maxRanges).map(_._2).toSet
      val out = scala.collection.mutable.ArrayBuffer(exact.head)
      (1 until exact.length).foreach { i =>
        if (mergeAt(i)) out(out.length - 1) = (out.last._1, exact(i)._2)
        else out += exact(i)
      }
      out.toSeq
    }
  }

  /** Write `df` Hive-partitioned by `partitionCol` AND z-ordered by (a, b)
    * WITHIN each partition — the two pruning levers composed, which is the
    * 100 TB layout story: a scan with a partition predicate plans only the
    * matching directories (q53's lever), and a box predicate inside a
    * partition skips files by the persisted zkey via [[zorderFilesFor]] /
    * [[zorderFilesForSplit]] on that partition's directory (q52's lever).
    *
    * Mechanics: one range exchange on (partitionCol, zkey) — the sampler
    * gives each task a contiguous (partition, key) slice, so almost every
    * task writes ONE file into ONE partition directory covering a tight,
    * near-disjoint zkey interval; the within-task sort tightens row-group
    * stats too. Same single-shuffle cost as [[zorderWrite]].
    */
  def zorderWritePartitioned(df: DataFrame, partitionCol: String,
      a: Column, b: Column, outDir: String, numFiles: Int): Unit = {
    require(!df.columns.contains("zkey"),
      "input already has a 'zkey' column; rename it before zorderWritePartitioned")
    require(df.columns.contains(partitionCol),
      s"partition column '$partitionCol' not in input")
    df.withColumn("zkey", zorderKey2(a, b))
      .repartitionByRange(numFiles, col(partitionCol), col("zkey"))
      .sortWithinPartitions(partitionCol, "zkey")
      .write.partitionBy(partitionCol).mode("overwrite").parquet(outDir)
  }

  /** Write `df` clustered by the 3-D Morton key of (a, b, c) — the
    * three-dimension twin of [[zorderWrite]] for the (date, customer,
    * part)-style layout q55 pins the key for. Same mechanics: range
    * exchange on the persisted `zkey3` (samples the key, no full sort),
    * within-file sort so row-group min/max stats are tight.
    */
  def zorderWrite3(df: DataFrame, a: Column, b: Column, c: Column,
      outDir: String, numFiles: Int): Unit = {
    require(!df.columns.contains("zkey3"),
      "input already has a 'zkey3' column; rename it before zorderWrite3")
    df.withColumn("zkey3", zorderKey3(a, b, c))
      .repartitionByRange(numFiles, col("zkey3"))
      .sortWithinPartitions("zkey3")
      .write.mode("overwrite").parquet(outDir)
  }

  /** 3-D box's zkey3 cover as ≤ `maxRanges` disjoint, increasing intervals
    * (driver-side, pure) — the octant-recursion BIGMIN form of
    * [[zorderRanges]]. The 2-D argument generalizes directly: an aligned
    * 2^k cube's keys are contiguous (its low 3k z-bits range over all
    * values), and octant order (c-half, then b-half, then a-half) IS
    * increasing z because a's bits sit at positions 3i, b's at 3i+1, c's
    * at 3i+2 — so emission needs no sort and adjacent-merge is one pass.
    *
    * One 3-D-specific guard the 2-D form doesn't need: the EXACT cover
    * grows with the box's SURFACE AREA (O((side/s)^2) straddling cells per
    * level), not its perimeter, so an unbudgeted recursion over a large box
    * could emit millions of driver-side intervals. A split budget
    * (64·maxRanges splits, min 4096) caps that — and it is spent
    * BREADTH-FIRST, one octree level at a time (ADVICE r15: the old
    * depth-first recursion concentrated refinement on the lowest-z octants,
    * so once the budget ran out every remaining high-z straddling cube was
    * emitted whole and residual over-cover piled onto one side of the box).
    * A level either splits every straddler it holds or none: once the
    * remaining budget can't split the whole level, ALL its straddlers are
    * emitted whole — residual over-cover is spread evenly across the box at
    * a uniform refinement depth. Whole-cube emissions are pure over-cover,
    * so soundness is unconditional and tightness degrades gracefully toward
    * the coarse envelope. maxRanges = 1 still degenerates exactly to
    * [z(aLo,bLo,cLo), z(aHi,bHi,cHi)] (LayoutSpec pins it).
    */
  def zorderRanges3(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      cLo: Long, cHi: Long, maxRanges: Int = 64): Seq[(Long, Long)] = {
    requireBox3(aLo, aHi, bLo, bHi, cLo, cHi)
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    val exact = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var budget = math.max(4096L, 64L * maxRanges)
    // every box key lies in the coarse envelope (per-coordinate
    // monotonicity: min/max over the box land at its corners) — used to
    // clamp budget-exhausted whole-cube emissions so over-cover never
    // escapes the envelope and maxRanges=1 degenerates exactly to it
    val envLo = mortonOf3(aLo, bLo, cLo)
    val envHi = mortonOf3(aHi, bHi, cHi)
    // BFS emits levels interleaved in z, so intervals collect unsorted and
    // sort+merge once at the end (bounded: exact and level sizes are both
    // O(budget), ≤ ~32k intervals at the default budget)
    def emitWhole(ca: Long, cb: Long, cc: Long, size: Long): Unit = {
      // over-cover the straddling cube whole, clamped to the envelope
      // (sound — its box rows' keys lie in the cube's interval AND in the
      // envelope; a straddling cube holds at least one box key, so the
      // clamp never empties the interval)
      val z0 = mortonOf3(ca, cb, cc)
      exact += ((math.max(z0, envLo),
        math.min(z0 + size * size * size - 1, envHi)))
    }
    var level =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](
        (0L, 0L, 0L, CoordMax + 1))
    while (level.nonEmpty) {
      if (budget < level.length) {
        // can't split this whole level: emit EVERY remaining straddler
        // whole — uniform refinement depth, evenly-spread residual cover
        level.foreach { case (ca, cb, cc, size) => emitWhole(ca, cb, cc, size) }
        level.clear()
      } else {
        budget -= level.length
        val next = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        level.foreach { case (ca, cb, cc, size) =>
          val h = size / 2
          // octant order (c-half, then b-half, then a-half) IS increasing z
          Seq((ca, cb, cc), (ca + h, cb, cc), (ca, cb + h, cc),
            (ca + h, cb + h, cc), (ca, cb, cc + h), (ca + h, cb, cc + h),
            (ca, cb + h, cc + h), (ca + h, cb + h, cc + h))
            .foreach { case (oa, ob, oc) =>
              val oaHi = oa + h - 1
              val obHi = ob + h - 1
              val ocHi = oc + h - 1
              if (oaHi < aLo || oa > aHi || obHi < bLo || ob > bHi ||
                  ocHi < cLo || oc > cHi) ()
              else if (oa >= aLo && oaHi <= aHi && ob >= bLo && obHi <= bHi &&
                  oc >= cLo && ocHi <= cHi) {
                val z0 = mortonOf3(oa, ob, oc) // aligned ⇒ contiguous z
                exact += ((z0, z0 + h * h * h - 1))
              } else next += ((oa, ob, oc, h))
            }
        }
        level = next
      }
    }
    // cube intervals are pairwise disjoint (distinct octree cells; clamps
    // only shrink) — sort by lo, then one-pass adjacent merge
    val sorted = exact.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 == lo)
        merged(merged.length - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    mergeToBudget(merged, maxRanges)
  }

  /** Coarse one-range file skip set for a 3-D box over a [[zorderWrite3]]
    * layout — the 3-D twin of [[zorderFilesFor]] (sound by per-coordinate
    * monotonicity of the key; [[zorderFilesForSplit3]] is the tightened
    * multi-range form).
    */
  def zorderFilesFor3(spark: org.apache.spark.sql.SparkSession, dir: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      cLo: Long, cHi: Long): (Seq[String], Long) = {
    requireBox3(aLo, aHi, bLo, bHi, cLo, cHi)
    val zLo = mortonOf3(aLo, bLo, cLo)
    val zHi = mortonOf3(aHi, bHi, cHi)
    val stats = fileStats3(spark, dir)
    val keep = stats.filter { case (_, zmin, zmax) =>
      zmax >= zLo && zmin <= zHi }.map(_._1)
    (keep, stats.length.toLong)
  }

  /** File-level skip set via SPLIT 3-D Z-ranges — the BIGMIN read path for
    * [[zorderWrite3]] layouts ([[zorderFilesForSplit]]'s 3-D twin). Same
    * driver cost shape: O(numFiles · log ranges) after one O(numFiles)
    * stats aggregate — never data-sized.
    */
  def zorderFilesForSplit3(spark: org.apache.spark.sql.SparkSession,
      dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      cLo: Long, cHi: Long, maxRanges: Int = 64): (Seq[String], Long) = {
    val ranges = zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi, maxRanges)
    val stats = fileStats3(spark, dir)
    (filesOverlapping(stats, ranges), stats.length.toLong)
  }

  /** 3-D twin of [[zorderFilesForBoth]] — one stats pass for both covers. */
  def zorderFilesForBoth3(spark: org.apache.spark.sql.SparkSession,
      dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      cLo: Long, cHi: Long, maxRanges: Int = 64)
      : (Seq[String], Seq[String], Long) = {
    requireBox3(aLo, aHi, bLo, bHi, cLo, cHi)
    val zLo = mortonOf3(aLo, bLo, cLo)
    val zHi = mortonOf3(aHi, bHi, cHi)
    val ranges = zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi, maxRanges)
    val stats = fileStats3(spark, dir)
    val coarse = stats.filter { case (_, zmin, zmax) =>
      zmax >= zLo && zmin <= zHi }.map(_._1).toSeq
    (coarse, filesOverlapping(stats, ranges), stats.length.toLong)
  }

  /** What [[compactSmallFiles]] did, for callers/specs: counts are file
    * counts, bytes are input data-file bytes (small = below the threshold).
    */
  final case class CompactionStats(filesIn: Int, filesKeptAsIs: Int,
      filesWritten: Int, bytesIn: Long, smallBytesIn: Long)

  /** Small-file compaction — the table-maintenance half of the layout
    * story. A 100 TB table ingested in many increments accumulates
    * thousands of KB-sized parquet files; every scan then pays a per-file
    * open/footer/seek cost that dwarfs the data read, and the driver pays
    * O(files) planning. Compaction rewrites ONLY the fragments:
    *
    *  - files ≥ `smallThresholdBytes` are already well-sized — they are
    *    carried over byte-for-byte (a pure filesystem copy here; on a
    *    lakehouse table this is a metadata no-op, the file is simply kept),
    *    never decoded or re-encoded;
    *  - files below the threshold are read together and coalesced to
    *    ⌈smallBytes / targetBytes⌉ outputs. `coalesce` (not `repartition`)
    *    merges read-splits WITHOUT a shuffle — each output task streams a
    *    handful of small files end-to-end, so the whole rewrite moves each
    *    fragmented byte exactly once and moves well-sized bytes zero times.
    *
    * Driver-side work is one directory listing, O(numFiles) — never
    * data-sized. Row-set fidelity is oracle-gated (q54: residue-class
    * counts/checksums over the compacted dir equal DuckDB's over the
    * original table); the file-count reduction and the byte-identity of
    * carried files are pinned in LayoutSpec.
    */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long,
      smallThresholdBytes: Long): CompactionStats = {
    require(targetBytes > 0 && smallThresholdBytes > 0,
      s"sizes must be positive: target=$targetBytes small=$smallThresholdBytes")
    val conf = spark.sessionState.newHadoopConf()
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(conf)
    val files = fs.listStatus(inPath).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    val (small, large) = files.partition(_.getLen < smallThresholdBytes)
    val smallBytes = small.map(_.getLen).sum
    val nOut =
      if (small.isEmpty) 0
      else math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    if (small.nonEmpty) {
      spark.read.parquet(small.map(_.getPath.toString): _*)
        .coalesce(nOut)
        .write.mode("overwrite").parquet(outDir)
    } else {
      fs.mkdirs(outPath)
    }
    // report what was WRITTEN, not what was requested: coalesce caps at the
    // scan's partition count (the file-packing reader can open 64 fragments
    // as fewer splits than ⌈bytes/target⌉), so the actual count is the
    // directory's
    val written =
      if (small.isEmpty) 0
      else fs.listStatus(outPath).count(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    // carry the well-sized files over unread (rename-in on a lakehouse);
    // distinct names are guaranteed — spark part-file names carry a UUID
    large.foreach { st =>
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
        new org.apache.hadoop.fs.Path(outPath, st.getPath.getName),
        false, conf)
    }
    CompactionStats(files.size, large.size, written,
      files.map(_.getLen).sum, smallBytes)
  }

  private def requireBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long): Unit = {
    require(aLo <= aHi && bLo <= bHi, "empty box")
    // out-of-domain bounds would WRAP under mortonOf's 16-bit masks and
    // silently skip files containing matching rows (ADVICE r13)
    require(aLo >= 0 && aHi <= CoordMax && bLo >= 0 && bHi <= CoordMax,
      s"box coordinates must lie in [0, $CoordMax]: " +
        s"got a=[$aLo,$aHi] b=[$bLo,$bHi]")
  }

  private def requireBox3(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      cLo: Long, cHi: Long): Unit = {
    require(aLo <= aHi && bLo <= bHi && cLo <= cHi, "empty box")
    require(aLo >= 0 && aHi <= CoordMax && bLo >= 0 && bHi <= CoordMax &&
      cLo >= 0 && cHi <= CoordMax,
      s"box coordinates must lie in [0, $CoordMax]: " +
        s"got a=[$aLo,$aHi] b=[$bLo,$bHi] c=[$cLo,$cHi]")
  }

  /** Per-file zkey min/max FROM THE PARQUET FOOTERS — O(numFiles) metadata
    * reads, zero data decoded (optimization guide §6: skip-set planning must
    * ride file statistics, not a table scan; the previous form computed the
    * "same numbers a parquet footer carries" by aggregating the persisted
    * key over EVERY ROW, i.e. a full-table read per skip-set request —
    * data-sized at 100 TB). The zkey column is a non-null INT64 written by
    * the Spark parquet writer, so exact row-group min/max statistics are
    * always present; should a footer ever lack them (foreign writer,
    * suppressed stats), the data-scan twin below answers for the whole
    * directory so the skip set is NEVER built from partial knowledge.
    *
    * Files with zero rows are excluded, matching the scan form (a row-less
    * file has no `input_file_name()` group — and no key range to overlap).
    */
  private def fileStats(spark: org.apache.spark.sql.SparkSession,
      dir: String, key: String = "zkey"): Array[(String, Long, Long)] =
    try fileStatsFromFooters(spark, dir, key)
    catch {
      case e: Exception =>
        log.warn(s"footer stats unavailable for $dir ($key): ${e.getMessage}" +
          " — falling back to the data-scan form")
        fileStatsFromScan(spark, dir, key)
    }

  private def fileStatsFromFooters(spark: org.apache.spark.sql.SparkSession,
      dir: String, key: String): Array[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val files = fs.listStatus(path).filter(st => st.isFile && {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
    files.flatMap { st =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        if (blocks.map(_.getRowCount).sum == 0L) None
        else {
          var zmin = Long.MaxValue
          var zmax = Long.MinValue
          blocks.foreach { b =>
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == key)
              .getOrElse(throw new IllegalStateException(
                s"${st.getPath}: no column chunk for $key"))
            val stats = cc.getStatistics
            require(stats != null && !stats.isEmpty && stats.hasNonNullValue,
              s"${st.getPath}: footer carries no $key min/max")
            zmin = math.min(zmin,
              stats.genericGetMin.asInstanceOf[java.lang.Long].longValue)
            zmax = math.max(zmax,
              stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          }
          Some((st.getPath.toString, zmin, zmax))
        }
      } finally reader.close()
    }
  }

  /** Data-scan twin of [[fileStatsFromFooters]] — the pre-r16 form, kept
    * only as the fallback for footers without statistics.
    */
  private def fileStatsFromScan(spark: org.apache.spark.sql.SparkSession,
      dir: String, key: String): Array[(String, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(key).as("zmin"), max(key).as("zmax"))
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("zmin"),
        r.getAs[Long]("zmax")))

  /** [[fileStats]] for a [[zorderWrite3]] layout (persisted key `zkey3`). */
  private def fileStats3(spark: org.apache.spark.sql.SparkSession,
      dir: String): Array[(String, Long, Long)] =
    fileStats(spark, dir, "zkey3")

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

  /** Driver-side 3-D Morton key (same bit layout as [[zorderKey3]]). */
  def mortonOf3(a: Long, b: Long, c: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xffffL
      x = (x | (x << 32)) & 0x1f00000000ffffL
      x = (x | (x << 16)) & 0x1f0000ff0000ffL
      x = (x | (x << 8)) & 0x100f00f00f00f00fL
      x = (x | (x << 4)) & 0x10c30c30c30c30c3L
      (x | (x << 2)) & 0x1249249249249249L
    }
    spread(a) | (spread(b) << 1) | (spread(c) << 2)
  }

  /** Driver-side 3-D Morton inverse — exact inverse of [[mortonOf3]]
    * (LayoutSpec round-trips grid diagonals plus random points).
    */
  def mortonInverse3(z: Long): (Long, Long, Long) = {
    def unspread(v: Long): Long = {
      var x = v & 0x1249249249249249L
      x = (x | (x >> 2)) & 0x10c30c30c30c30c3L
      x = (x | (x >> 4)) & 0x100f00f00f00f00fL
      x = (x | (x >> 8)) & 0x1f0000ff0000ffL
      x = (x | (x >> 16)) & 0x1f00000000ffffL
      (x | (x >> 32)) & 0xffffL
    }
    (unspread(z), unspread(z >> 1), unspread(z >> 2))
  }

  /** The q55 oracle's SQL replica of [[spread16By3]] (string-built so the
    * six stages cannot drift from the Column form above; masks interpolate
    * as decimals, which both engines parse).
    */
  def spreadSql3(e: String): String = {
    // BIGINT cast up front: DuckDB range-checks `<< 32` against the LEFT
    // operand's width, so an INTEGER-typed input would throw Out of Range
    val x0 = s"((CAST(($e) AS BIGINT)) & 65535)"
    val x1 = s"(($x0 | ($x0 << 32)) & ${0x1f00000000ffffL})"
    val x2 = s"(($x1 | ($x1 << 16)) & ${0x1f0000ff0000ffL})"
    val x3 = s"(($x2 | ($x2 << 8)) & ${0x100f00f00f00f00fL})"
    val x4 = s"(($x3 | ($x3 << 4)) & ${0x10c30c30c30c30c3L})"
    s"(($x4 | ($x4 << 2)) & ${0x1249249249249249L})"
  }

  def zorderKey3Sql(a: String, b: String, c: String): String =
    s"(${spreadSql3(a)} | (${spreadSql3(b)} << 1) | (${spreadSql3(c)} << 2))"

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
