package graft

import org.apache.spark.sql.functions._

import graft.ops.{Layout, Sketches}

/** Z-order layout (the write-side pruning primitive) and the count-min
  * sketch: the properties the registry oracles can't see — actual file
  * skipping for a box query, and the CMS guarantee under adversarial
  * collisions.
  */
class LayoutSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))

  test("morton key: Column form, SQL form, and driver form agree bit-for-bit") {
    val rows = lineitem.limit(64)
      .select(pmod(col("l_partkey"), lit(65536)).as("a"),
        pmod(col("l_suppkey"), lit(65536)).as("b"),
        Layout.zorderKey2(pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_suppkey"), lit(65536))).as("z"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("z") ===
        Layout.mortonOf(r.getAs[Long]("a"), r.getAs[Long]("b")))
    }
    // the SQL replica (the q50 oracle) through Spark's own SQL engine
    lineitem.limit(64).createOrReplaceTempView("li_z")
    val sqlRows = spark.sql(
      s"""SELECT ${Layout.zorderKeySql("l_partkey % 65536", "l_suppkey % 65536")} AS z,
            l_partkey % 65536 AS a, l_suppkey % 65536 AS b FROM li_z""").collect()
    sqlRows.foreach { r =>
      assert(r.getAs[Long]("z") ===
        Layout.mortonOf(r.getAs[Long]("a"), r.getAs[Long]("b")))
    }
  }

  test("morton inverse round-trips every key form") {
    // full diagonal + edges + a deterministic pseudo-random scatter
    val pts = (0L to 65535L by 257L) ++ Seq(0L, 1L, 65534L, 65535L)
    for (a <- pts; b <- Seq(a, 65535L - a, (a * 31L + 7L) % 65536L)) {
      val z = Layout.mortonOf(a, b)
      assert(Layout.mortonInverse(z) === (a, b), s"round trip failed at ($a, $b)")
    }
  }

  test("morton key is monotone in each coordinate") {
    for (a <- Seq(0L, 1L, 77L, 65535L); b <- Seq(0L, 1L, 300L, 65535L)) {
      if (a < 65535L)
        assert(Layout.mortonOf(a, b) < Layout.mortonOf(a + 1, b))
      if (b < 65535L)
        assert(Layout.mortonOf(a, b) < Layout.mortonOf(a, b + 1))
    }
  }

  test("3-D morton: Column, SQL, and driver forms agree; inverse round-trips; monotone") {
    // Column form vs driver form over real data
    val rows = lineitem.limit(64)
      .select(pmod(col("l_partkey"), lit(65536)).as("a"),
        pmod(col("l_suppkey"), lit(65536)).as("b"),
        pmod(col("l_orderkey"), lit(65536)).as("c"),
        Layout.zorderKey3(pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_suppkey"), lit(65536)),
          pmod(col("l_orderkey"), lit(65536))).as("z"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("z") === Layout.mortonOf3(r.getAs[Long]("a"),
        r.getAs[Long]("b"), r.getAs[Long]("c")))
    }
    // the SQL replica (the q55 oracle) through Spark's own SQL engine
    lineitem.limit(64).createOrReplaceTempView("li_z3")
    spark.sql(s"""SELECT ${Layout.zorderKey3Sql("l_partkey % 65536",
        "l_suppkey % 65536", "l_orderkey % 65536")} AS z,
        l_partkey % 65536 AS a, l_suppkey % 65536 AS b,
        l_orderkey % 65536 AS c FROM li_z3""").collect()
      .foreach { r =>
        assert(r.getAs[Long]("z") === Layout.mortonOf3(r.getAs[Long]("a"),
          r.getAs[Long]("b"), r.getAs[Long]("c")))
      }
    // exact inverse over diagonal + edges + deterministic scatter
    val pts = (0L to 65535L by 509L) ++ Seq(0L, 1L, 65534L, 65535L)
    for (a <- pts) {
      val b = (a * 31L + 7L) % 65536L
      val c = 65535L - a
      val z = Layout.mortonOf3(a, b, c)
      assert(Layout.mortonInverse3(z) === ((a, b, c)),
        s"3-D round trip failed at ($a, $b, $c)")
    }
    // monotone in each coordinate (the pruning-soundness property)
    for (a <- Seq(0L, 77L, 65534L); b <- Seq(1L, 300L, 65534L);
         c <- Seq(0L, 4097L, 65534L)) {
      assert(Layout.mortonOf3(a, b, c) < Layout.mortonOf3(a + 1, b, c))
      assert(Layout.mortonOf3(a, b, c) < Layout.mortonOf3(a, b + 1, c))
      assert(Layout.mortonOf3(a, b, c) < Layout.mortonOf3(a, b, c + 1))
    }
  }

  test("zorderWrite: box query skips most files; a round-robin layout skips none") {
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val tmpN = java.nio.file.Files.createTempDirectory("graft_naive_").toString
    // a full 256×256 grid over the 16-bit key space (sf0.001's real key
    // domains are too narrow to exercise pruning — every key would sit
    // inside any interesting box)
    val grid = spark.range(65536L)
      .select(col("id"),
        shiftleft(col("id").bitwiseAND(lit(255L)), 8).as("ca"),
        shiftleft(shiftright(col("id"), 8).bitwiseAND(lit(255L)), 8).as("cb"))
    val a = col("ca")
    val b = col("cb")
    val nFiles = 16
    Layout.zorderWrite(grid, a, b, tmpZ, nFiles)
    // naive comparator: same zkey column, but round-robin placement — every
    // file's footer range spans nearly the whole key space
    grid.withColumn("zkey", Layout.zorderKey2(a, b))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(tmpN)

    // range partitioning ⇒ per-file key intervals are disjoint
    val zStats = spark.read.parquet(tmpZ)
      .groupBy(input_file_name().as("f"))
      .agg(min("zkey").as("zmin"), max("zkey").as("zmax"))
      .orderBy("zmin").collect()
    assert(zStats.length > 4, "range partitioner should emit many files")
    zStats.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("zmax") <= hi.getAs[Long]("zmin"),
          "zorder files must cover disjoint key intervals")
      case _ =>
    }

    // a small 2-D box: both dims constrained
    val (aLo, aHi, bLo, bHi) = (0L, 2047L, 0L, 2047L)
    val (keepZ, totalZ) = Layout.zorderFilesFor(spark, tmpZ, aLo, aHi, bLo, bHi)
    val (keepN, totalN) = Layout.zorderFilesFor(spark, tmpN, aLo, aHi, bLo, bHi)
    assert(keepZ.size.toDouble / totalZ <= 0.5,
      s"zorder layout should skip at least half the files for a 1/1024 box, kept ${keepZ.size}/$totalZ")
    assert(keepN.size.toDouble >= totalN * 0.9,
      s"round-robin layout should skip ~nothing, kept ${keepN.size}/$totalN")

    // soundness: the kept files contain every box row
    val expected = grid
      .filter(a.between(aLo, aHi) && b.between(bLo, bHi)).count()
    assert(expected === 64L, "8×8 grid cells inside the box")
    val got = spark.read.parquet(keepZ: _*)
      .filter(col("ca").between(aLo, aHi) && col("cb").between(bLo, bHi))
      .count()
    assert(got === expected, "file pruning must not drop box rows")
  }

  private def covered(rs: Seq[(Long, Long)], z: Long): Boolean =
    rs.exists(r => z >= r._1 && z <= r._2)

  test("zorderRanges: exact cover is disjoint, increasing, and exactly the box") {
    val (aLo, aHi, bLo, bHi) = (3L, 300L, 129L, 40000L)
    val rs = Layout.zorderRanges(aLo, aHi, bLo, bHi, maxRanges = Int.MaxValue)
    rs.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2, "disjoint and increasing")
      case _ =>
    }
    // exact quadtree cover: total keys covered == box area (no over-read)
    assert(rs.map(r => r._2 - r._1 + 1).sum ===
      (aHi - aLo + 1) * (bHi - bLo + 1))
    // every sampled box point is covered; seam-adjacent outside points are not
    for (a <- Seq(aLo, aHi, 77L, 256L); b <- Seq(bLo, bHi, 1024L, 32768L, 39999L))
      assert(covered(rs, Layout.mortonOf(a, b)), s"box point ($a,$b) must be covered")
    for ((a, b) <- Seq((aLo - 1, bLo), (aHi + 1, bHi), (aLo, bLo - 1),
        (aHi, bHi + 1), (0L, 0L), (65535L, 65535L)))
      assert(!covered(rs, Layout.mortonOf(a, b)),
        s"outside point ($a,$b) must not be covered by the exact cover")
  }

  test("zorderRanges: merged covers stay sound; maxRanges=1 degenerates to the coarse envelope") {
    val (aLo, aHi, bLo, bHi) = (100L, 5000L, 30000L, 35000L) // crosses the b=32768 seam
    val exact = Layout.zorderRanges(aLo, aHi, bLo, bHi, maxRanges = Int.MaxValue)
    for (m <- Seq(1, 4, 16, 64)) {
      val rs = Layout.zorderRanges(aLo, aHi, bLo, bHi, maxRanges = m)
      assert(rs.length <= m)
      // merging only over-covers: every exact range sits inside a merged one
      exact.foreach { case (lo, hi) =>
        assert(rs.exists(r => r._1 <= lo && hi <= r._2),
          s"maxRanges=$m dropped keys of an exact range")
      }
    }
    assert(Layout.zorderRanges(aLo, aHi, bLo, bHi, maxRanges = 1) ===
      Seq((Layout.mortonOf(aLo, bLo), Layout.mortonOf(aHi, bHi))))
  }

  test("zorderRanges rejects out-of-domain boxes that would wrap under the 16-bit masks") {
    intercept[IllegalArgumentException] {
      Layout.zorderRanges(0L, 65536L, 0L, 10L)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderFilesFor(spark, "/nonexistent", -1L, 10L, 0L, 10L)
    }
  }

  test("split envelope: sound, and strictly better than coarse on a seam-crossing box") {
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zsplit_").toString
    val grid = spark.range(65536L)
      .select(col("id"),
        shiftleft(col("id").bitwiseAND(lit(255L)), 8).as("ca"),
        shiftleft(shiftright(col("id"), 8).bitwiseAND(lit(255L)), 8).as("cb"))
    Layout.zorderWrite(grid, col("ca"), col("cb"), tmpZ, 16)
    // box crossing the b = 32768 seam: the coarse one-range envelope spans
    // the whole inter-half z gap, the split cover skips it
    val (aLo, aHi, bLo, bHi) = (0L, 2047L, 32512L, 33535L)
    val (coarse, total) = Layout.zorderFilesFor(spark, tmpZ, aLo, aHi, bLo, bHi)
    val (split, total2) = Layout.zorderFilesForSplit(spark, tmpZ, aLo, aHi, bLo, bHi)
    assert(total === total2)
    assert(split.toSet.subsetOf(coarse.toSet),
      "split ranges lie inside the coarse interval, so kept files must too")
    assert(split.size < coarse.size,
      s"split must prune strictly more on a seam box: split ${split.size} " +
        s"vs coarse ${coarse.size} of $total")
    // soundness: the kept files contain every box row
    val expected = grid.filter(col("ca").between(aLo, aHi) &&
      col("cb").between(bLo, bHi)).count()
    assert(expected === 32L)
    val got = spark.read.parquet(split: _*)
      .filter(col("ca").between(aLo, aHi) && col("cb").between(bLo, bHi))
      .count()
    assert(got === expected, "split file pruning must not drop box rows")
  }

  test("zorderFilesForBoth: one stats pass reproduces both covers exactly") {
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zboth_").toString
    val grid = spark.range(65536L)
      .select(col("id"),
        shiftleft(col("id").bitwiseAND(lit(255L)), 8).as("ca"),
        shiftleft(shiftright(col("id"), 8).bitwiseAND(lit(255L)), 8).as("cb"))
    Layout.zorderWrite(grid, col("ca"), col("cb"), tmpZ, 16)
    val (aLo, aHi, bLo, bHi) = (0L, 2047L, 32512L, 33535L)
    val (coarse1, total1) = Layout.zorderFilesFor(spark, tmpZ, aLo, aHi, bLo, bHi)
    val (split1, _) = Layout.zorderFilesForSplit(spark, tmpZ, aLo, aHi, bLo, bHi)
    val (coarse2, split2, total2) =
      Layout.zorderFilesForBoth(spark, tmpZ, aLo, aHi, bLo, bHi)
    assert(coarse2.sorted === coarse1.sorted)
    assert(split2.sorted === split1.sorted)
    assert(total2 === total1)
    intercept[IllegalArgumentException] {
      Layout.zorderFilesForBoth(spark, "/nonexistent", -1L, 10L, 0L, 10L)
    }
  }

  test("footer-based file stats agree with a data scan of the persisted key") {
    // the skip set must be buildable from footer metadata alone; this pins
    // that the footer min/max equal the scanned min/max per file (the
    // pre-r16 scan form survives only as the no-stats fallback)
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zfoot_").toString
    val grid = spark.range(4096L)
      .select(col("id"),
        shiftleft(col("id").bitwiseAND(lit(63L)), 10).as("ca"),
        shiftleft(shiftright(col("id"), 6).bitwiseAND(lit(63L)), 10).as("cb"))
    Layout.zorderWrite(grid, col("ca"), col("cb"), tmpZ, 8)
    val scanned = spark.read.parquet(tmpZ)
      .groupBy(input_file_name().as("file"))
      .agg(min("zkey").as("zmin"), max("zkey").as("zmax"))
      .collect()
      .map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))).sorted
    // the full-domain box keeps every file; its stats pass is footer-based
    val (all, total) = Layout.zorderFilesFor(spark, tmpZ,
      0L, Layout.CoordMax, 0L, Layout.CoordMax)
    assert(all.size.toLong === total)
    // per-file ranges from the footers must tile exactly like the scan's:
    // re-derive them by scanning the kept files one at a time
    val byFooter = all.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("zkey").as("zmin"), max("zkey").as("zmax")).head
      (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))
    }.sorted
    assert(byFooter === scanned.toSeq)
  }

  test("zorderRanges3: exact cover is disjoint, increasing, and exactly the box") {
    val (aLo, aHi, bLo, bHi, cLo, cHi) = (3L, 60L, 9L, 200L, 7L, 50L)
    val rs = Layout.zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi,
      maxRanges = Int.MaxValue)
    rs.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2, "disjoint and increasing")
      case _ =>
    }
    // exact octree cover: total keys covered == box volume (no over-read)
    assert(rs.map(r => r._2 - r._1 + 1).sum ===
      (aHi - aLo + 1) * (bHi - bLo + 1) * (cHi - cLo + 1))
    // every sampled box point is covered; seam-adjacent outside points not
    for (a <- Seq(aLo, aHi, 33L); b <- Seq(bLo, bHi, 128L); c <- Seq(cLo, cHi, 32L))
      assert(covered(rs, Layout.mortonOf3(a, b, c)),
        s"box point ($a,$b,$c) must be covered")
    for ((a, b, c) <- Seq((aLo - 1, bLo, cLo), (aHi + 1, bHi, cHi),
        (aLo, bLo - 1, cLo), (aHi, bHi + 1, cHi), (aLo, bLo, cLo - 1),
        (aHi, bHi, cHi + 1), (0L, 0L, 0L), (65535L, 65535L, 65535L)))
      assert(!covered(rs, Layout.mortonOf3(a, b, c)),
        s"outside point ($a,$b,$c) must not be covered by the exact cover")
  }

  test("zorderRanges3: merged covers stay sound; maxRanges=1 degenerates to the coarse envelope") {
    // crosses the b = 32768 seam (key bit 46)
    val (aLo, aHi, bLo, bHi, cLo, cHi) = (100L, 5000L, 30000L, 35000L, 7L, 900L)
    val exact = Layout.zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi,
      maxRanges = Int.MaxValue)
    for (m <- Seq(1, 4, 16, 64)) {
      val rs = Layout.zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi, maxRanges = m)
      assert(rs.length <= m)
      // merging only over-covers: every exact range sits inside a merged one
      exact.foreach { case (lo, hi) =>
        assert(rs.exists(r => r._1 <= lo && hi <= r._2),
          s"maxRanges=$m dropped keys of an exact range")
      }
    }
    assert(Layout.zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi, maxRanges = 1) ===
      Seq((Layout.mortonOf3(aLo, bLo, cLo), Layout.mortonOf3(aHi, bHi, cHi))))
  }

  test("zorderRanges3: split-budget exhaustion over-covers but never drops box keys") {
    // a box this large has an exact octree cover in the millions of cells —
    // the split budget must kick in, keep the range count at the requested
    // cap, and still cover every box point (over-cover only)
    val (aLo, aHi, bLo, bHi, cLo, cHi) =
      (100L, 50000L, 200L, 60000L, 300L, 40000L)
    val rs = Layout.zorderRanges3(aLo, aHi, bLo, bHi, cLo, cHi, maxRanges = 8)
    assert(rs.length <= 8)
    rs.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 < l2, "disjoint and increasing")
      case _ =>
    }
    val vol = (aHi - aLo + 1) * (bHi - bLo + 1) * (cHi - cLo + 1)
    assert(rs.map(r => r._2 - r._1 + 1).sum >= vol,
      "budgeted cover must still cover at least the box volume")
    for (a <- Seq(aLo, aHi, 32768L); b <- Seq(bLo, bHi, 4096L);
        c <- Seq(cLo, cHi, 16384L))
      assert(covered(rs, Layout.mortonOf3(a, b, c)),
        s"box point ($a,$b,$c) must survive budget exhaustion")
  }

  test("zorderRanges3 rejects out-of-domain boxes that would wrap under the 16-bit masks") {
    intercept[IllegalArgumentException] {
      Layout.zorderRanges3(0L, 65536L, 0L, 10L, 0L, 10L)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderFilesFor3(spark, "/nonexistent", 0L, 10L, -1L, 10L, 0L, 10L)
    }
  }

  test("3-D split envelope: sound, and strictly better than coarse on a seam-crossing box") {
    val tmpZ = java.nio.file.Files.createTempDirectory("graft_zsplit3_").toString
    // 32^3 grid scaled by 2048 so coordinates span the full 16-bit domain
    val grid = spark.range(32768L)
      .select(col("id"),
        shiftleft(col("id").bitwiseAND(lit(31L)), 11).as("ca"),
        shiftleft(shiftright(col("id"), 5).bitwiseAND(lit(31L)), 11).as("cb"),
        shiftleft(shiftright(col("id"), 10).bitwiseAND(lit(31L)), 11).as("cc"))
    Layout.zorderWrite3(grid, col("ca"), col("cb"), col("cc"), tmpZ, 16)
    // box crossing the c = 32768 seam (key bit 47, the topmost): the coarse
    // one-range envelope spans nearly the whole key space, the split cover
    // keeps two compact regions
    val (aLo, aHi) = (0L, 4095L)
    val (bLo, bHi) = (0L, 4095L)
    val (cLo, cHi) = (30720L, 34815L)
    val (coarse, total) = Layout.zorderFilesFor3(spark, tmpZ,
      aLo, aHi, bLo, bHi, cLo, cHi)
    val (split, total2) = Layout.zorderFilesForSplit3(spark, tmpZ,
      aLo, aHi, bLo, bHi, cLo, cHi)
    assert(total === total2)
    assert(split.toSet.subsetOf(coarse.toSet),
      "split ranges lie inside the coarse interval, so kept files must too")
    assert(split.size < coarse.size,
      s"split must prune strictly more on a seam box: split ${split.size} " +
        s"vs coarse ${coarse.size} of $total")
    // soundness: the kept files contain every box row
    val expected = grid.filter(col("ca").between(aLo, aHi) &&
      col("cb").between(bLo, bHi) && col("cc").between(cLo, cHi)).count()
    assert(expected === 8L)
    val got = spark.read.parquet(split: _*)
      .filter(col("ca").between(aLo, aHi) && col("cb").between(bLo, bHi) &&
        col("cc").between(cLo, cHi))
      .count()
    assert(got === expected, "split file pruning must not drop box rows")
  }

  test("zorderWritePartitioned: both levers hold — partition dirs + in-partition file skipping, row set exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zpart_").toString
    // 3 partitions × a 64×64 coordinate grid scaled by 1024
    val grid = spark.range(12288L)
      .select(col("id"),
        (col("id") % 3).as("p"),
        shiftleft(col("id").bitwiseAND(lit(63L)), 10).as("ca"),
        shiftleft(shiftright(col("id"), 6).bitwiseAND(lit(63L)), 10)
          .bitwiseAND(lit(65535L)).as("cb"))
    Layout.zorderWritePartitioned(grid, "p", col("ca"), col("cb"), tmp, 24)
    // lever 1: the layout is Hive-partitioned — one directory per p value
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(dirs.toSeq === Seq("p=0", "p=1", "p=2"))
    // lever 2: INSIDE one partition the persisted zkey still skips files
    // for a small box (the composition q57 gates through data at sf0.01)
    val (aLo, aHi, bLo, bHi) = (0L, 4095L, 0L, 4095L)
    val (keep, total) = Layout.zorderFilesForSplit(spark, s"$tmp/p=1",
      aLo, aHi, bLo, bHi)
    assert(total >= 4, s"partition should hold several files, got $total")
    assert(keep.size < total,
      s"box must skip files inside the partition: kept ${keep.size}/$total")
    // soundness + fidelity: the kept files contain every box row of p=1,
    // and the whole layout preserves the row set exactly
    val expected = grid.filter(col("p") === 1 && col("ca").between(aLo, aHi) &&
      col("cb").between(bLo, bHi)).count()
    val got = spark.read.parquet(keep: _*)
      .filter(col("ca").between(aLo, aHi) && col("cb").between(bLo, bHi))
      .count()
    assert(got === expected, "in-partition file pruning must not drop box rows")
    assert(spark.read.parquet(tmp).count() === 12288L)
    assert(spark.read.parquet(tmp)
      .agg(sum(col("id")).cast("long")).head.getLong(0) ===
      12288L * 12287L / 2)
  }

  test("count-min sketch never underestimates and is exact for unique-bucket tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha beta"), (2L, "alpha beta gamma delta"),
      (3L, "beta beta epsilon zeta"), (4L, "alpha zeta zeta zeta"))
      .toDF("doc_id", "text")
    val hh = Sketches.heavyHitters(docs, "text", k = 10, depth = 3, width = 1024)
      .collect()
    assert(hh.length === 6)
    hh.foreach { r =>
      assert(r.getAs[Long]("no_underestimate") === 1L,
        s"CMS must never underestimate: $r")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }
    // with 16 distinct (seed, token) cells in a width-1024 sketch the
    // collision odds are negligible — every estimate should be exact here
    val exact = hh.count(r => r.getAs[Long]("cms_est") === r.getAs[Long]("exact_cnt"))
    assert(exact === 6, "tiny corpus in a wide sketch: estimates must be exact")
    val alpha = hh.find(_.getAs[String]("tok") == "alpha").get
    assert(alpha.getAs[Long]("exact_cnt") === 5L)
  }

  test("count-min merge: per-shard sketches fold to EXACTLY the whole-corpus sketch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val shard1 = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val shard2 = docs.filter(col("doc_id") % 2 =!= 0)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val whole = Sketches.countMinSketch(toks, "tok", depth = 3, width = 256)
    val merged = Sketches.merge(
      Sketches.countMinSketch(shard1, "tok", depth = 3, width = 256),
      Sketches.countMinSketch(shard2, "tok", depth = 3, width = 256))
    // cell-wise sums: merged must equal whole exactly, not approximately
    assert(merged.exceptAll(whole).count() === 0L)
    assert(whole.exceptAll(merged).count() === 0L)
  }

  test("estimateFor: probes against a merged sketch honor the CMS guarantee; unseen token reads 0") {
    import spark.implicits._
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val toks = docs.select(explode(split(col("text"), "\\s+")).as("tok"))
    val sketch = Sketches.countMinSketch(toks, "tok", depth = 3, width = 1024)
    val probes = Seq("apple", "banana", "cherry", "durian").toDF("tok")
    val est = Sketches.estimateFor(sketch, probes, "tok", depth = 3, width = 1024)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_est")).toMap
    assert(est("apple") >= 2L && est("banana") >= 2L && est("cherry") >= 1L)
    assert(est("durian") === 0L, "a token no corpus token ever hashed with must read 0")
  }

  test("HLL registers: shard merge equals whole corpus; estimate within 5% of exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
    val whole = Sketches.hllRegisters(docs, "fp")
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(docs.filter(col("doc_id") % 2 === 0), "fp"),
      Sketches.hllRegisters(docs.filter(col("doc_id") % 2 =!= 0), "fp"))
    assert(merged.exceptAll(whole).count() === 0L)
    assert(whole.exceptAll(merged).count() === 0L)
    // at most m register rows, whatever the corpus size
    assert(whole.count() <= Sketches.HllRegisters.toLong)
    val exact = docs.select("fp").distinct().count().toDouble
    val est = Sketches.hllEstimate(merged).head.getAs[Double]("hll_est")
    assert(math.abs(est - exact) <= 0.05 * exact,
      s"HLL estimate $est vs exact $exact drifts beyond 5%")
  }

  test("HLL rank matches a reference leading-zero computation") {
    import spark.implicits._
    val keys = (0 until 256).map(i => s"key-$i").toDF("k")
    val rows = keys.select(col("k"),
        md5(col("k")).as("d"))
      .collect()
    val regs = Sketches.hllRegisters(keys, "k").collect()
      .map(r => r.getAs[Long]("register") -> r.getAs[Long]("rank")).toMap
    // reference recompute on the driver: register = first byte of
    // md5(md5-able key)... the op hashes the RAW key, so recompute that
    val byReg = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { r =>
      val d = r.getAs[String]("d")
      val reg = java.lang.Long.parseLong(d.substring(0, 3), 16) % 1024
      val w = java.lang.Long.parseLong(d.substring(3, 15), 16)
      val rank = if (w == 0) 49L else 49L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      byReg(reg) = math.max(byReg.getOrElse(reg, 0L), rank)
    }
    assert(regs === byReg.toMap)
  }

  test("histogram sketch: shard merge equals whole; quantile within one binWidth") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
    val bw = 4096L
    val whole = Sketches.histogram(li, col("pc"), bw, Seq("l_returnflag"))
    val merged = Sketches.histogramMerge(
      Sketches.histogram(li.filter(col("l_orderkey") % 2 === 0), col("pc"),
        bw, Seq("l_returnflag")),
      Sketches.histogram(li.filter(col("l_orderkey") % 2 =!= 0), col("pc"),
        bw, Seq("l_returnflag")))
    assert(merged.exceptAll(whole).count() === 0L)
    assert(whole.exceptAll(merged).count() === 0L)
    val est = Sketches.histogramQuantile(merged, 0.5, bw, Seq("l_returnflag"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("est")).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("pc"), lit(0.5)).as("p"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("p")).toMap
    exact.foreach { case (flag, p) =>
      assert(math.abs(est(flag) - p) <= bw.toDouble,
        s"flag $flag: histogram median ${est(flag)} vs exact $p beyond binWidth $bw")
    }
  }

  test("count-min sketch size is depth x width cells at most, regardless of corpus") {
    val docs = spark.read.parquet(s"$sf/../sf0.001/documents.parquet")
    val toks = docs.select(explode(split(col("text"), "\\s+")).as("tok"))
    val sketch = Sketches.countMinSketch(toks, "tok", depth = 3, width = 64)
    assert(sketch.count() <= 3L * 64)
    // every cell count is positive and the total mass equals depth x tokens
    val mass = sketch.agg(sum("cnt")).head.getLong(0)
    assert(mass === 3L * toks.count())
  }

  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  test("compactSmallFiles: 64 fragments bin-pack to the target count with the exact row set") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    docs.repartition(64).write.parquet(s"$tmp/frag")
    val fragFiles = dataFiles(s"$tmp/frag")
    assert(fragFiles.size === 64)
    val smallBytes = fragFiles.map(_.length).sum
    val stats = Layout.compactSmallFiles(spark, s"$tmp/frag", s"$tmp/out",
      targetBytes = math.max(1L, smallBytes / 4),
      smallThresholdBytes = Long.MaxValue)
    assert(stats.filesIn === 64)
    assert(stats.filesKeptAsIs === 0)
    // ⌈bytes/target⌉ with target = bytes/4 requests 4-5 outputs; the
    // file-packing scan may open the fragments as fewer splits (coalesce
    // never splits), so the bound is one-sided: few, and far below 64
    assert(stats.filesWritten >= 1 && stats.filesWritten <= 5,
      s"expected <=5 outputs, got ${stats.filesWritten}")
    assert(dataFiles(s"$tmp/out").size === stats.filesWritten)
    // fidelity: exact multiset of rows survives the rewrite
    val got = spark.read.parquet(s"$tmp/out")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("text").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = docs
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("text").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("compactSmallFiles: well-sized files carry over byte-identical, only fragments rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_mix_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // one well-sized file + many fragments, same schema, disjoint rows
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$tmp/in")
    val bigName = dataFiles(s"$tmp/in") match {
      case Seq(f) => f.getName
      case fs => fail(s"expected one coalesced file, got ${fs.size}")
    }
    docs.filter(col("doc_id") % 2 === 1).repartition(16)
      .write.mode("append").parquet(s"$tmp/in")
    val all = dataFiles(s"$tmp/in")
    assert(all.size === 17)
    val big = all.find(_.getName == bigName).get
    // threshold sits between the fragment sizes and the big file's
    val fragMax = all.filterNot(_.getName == bigName).map(_.length).max
    assert(fragMax < big.length, "fixture: fragments must be smaller")
    val stats = Layout.compactSmallFiles(spark, s"$tmp/in", s"$tmp/out",
      targetBytes = Long.MaxValue / 2, // all fragments into one output
      smallThresholdBytes = fragMax + 1)
    assert(stats.filesIn === 17)
    assert(stats.filesKeptAsIs === 1)
    assert(stats.filesWritten === 1)
    // the carried file is byte-identical — never decoded or re-encoded
    val copied = new java.io.File(s"$tmp/out", bigName)
    assert(copied.isFile, "carried file must keep its name in the output")
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(big.toPath),
      java.nio.file.Files.readAllBytes(copied.toPath)),
      "carried-over file must be byte-identical")
    // fidelity across the mixed layout
    val got = spark.read.parquet(s"$tmp/out").agg(count(lit(1)),
      sum("doc_id"), sum(length(col("text")).cast("long"))).head
    val want = docs.agg(count(lit(1)),
      sum("doc_id"), sum(length(col("text")).cast("long"))).head
    assert(got === want)
  }

  test("compactSmallFiles: nothing small is a pure carry-over") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_noop_").toString
    spark.read.parquet(s"$sf/documents.parquet").coalesce(2)
      .write.parquet(s"$tmp/in")
    val stats = Layout.compactSmallFiles(spark, s"$tmp/in", s"$tmp/out",
      targetBytes = 1L << 30, smallThresholdBytes = 1L)
    assert(stats.filesWritten === 0)
    assert(stats.filesKeptAsIs === stats.filesIn)
    assert(dataFiles(s"$tmp/out").size === stats.filesIn)
    assert(spark.read.parquet(s"$tmp/out").count() ===
      spark.read.parquet(s"$tmp/in").count())
  }
}
