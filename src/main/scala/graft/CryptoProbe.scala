package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._
import graft.functions.protect
import graft.queries.{GraftSession, GraftTables}

/** Dev-only decomposition probe for the per-value XOR physics question
  * (VERDICT r6/r7: committed string XOR best only 1.38× AES best; r1
  * envelope was ~2×). Times each layer of the path single-threaded — raw
  * keystream, serialize, full encryptCell, AES encryptCell — plus the
  * Spark floor (same cached batch, no crypto), so "where do the ns/row go"
  * is measured instead of argued.
  *
  * Usage: `sbt 'runMain graft.CryptoProbe [sfDir]'`
  */
object CryptoProbe {
  private def bestOf(iters: Int)(body: () => Unit): Double = {
    (0 until 2).foreach(_ => body()) // warm
    (0 until iters).map { _ =>
      val t0 = System.nanoTime()
      body()
      (System.nanoTime() - t0) / 1e6
    }.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = GraftTables.read(spark, sfDir, "lineitem")
      .select(
        concat_ws("|", col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
          .as("v_string"),
        col("l_orderkey").as("v_int64"))
      .cache()
    val n = li.count()
    println(s"rows=$n cached_partitions=${li.rdd.getNumPartitions}")

    // driver-side copies of the column for pure-JVM loops
    val strs = li.select("v_string").collect().map(r =>
      UTF8String.fromString(r.getString(0)))
    val longs = li.select("v_int64").collect().map(_.getLong(0))
    val totalBytes = strs.iterator.map(_.numBytes.toLong).sum
    println(f"strings: avg ${totalBytes.toDouble / n}%.1f B")

    val ctxS = ProtectionContext("bench-key", "v")
    val xorS = CellCryptor(org.apache.spark.sql.types.StringType, ctxS,
      CryptoCodec.Xor, perValue = true)
    val aesS = CellCryptor(org.apache.spark.sql.types.StringType, ctxS,
      CryptoCodec.AesDet, perValue = true)
    val xorL = CellCryptor(org.apache.spark.sql.types.LongType, ctxS,
      CryptoCodec.Xor, perValue = true)
    val aesL = CellCryptor(org.apache.spark.sql.types.LongType, ctxS,
      CryptoCodec.AesDet, perValue = true)
    var sink = 0L

    def report(name: String, ms: Double): Unit =
      println(f"$name%-28s ${ms}%8.1f ms  ${n / (ms / 1000) / 1e6}%6.2f M rows/s  ${ms * 1e6 / n}%7.1f ns/row")

    report("jvm_serialize_string", bestOf(5) { () =>
      var i = 0; while (i < strs.length) {
        sink += ValueSerde.serialize(org.apache.spark.sql.types.StringType, strs(i)).length; i += 1 }
    })
    report("jvm_xor_keystream_only", {
      val plains = strs.map(s => ValueSerde.serialize(org.apache.spark.sql.types.StringType, s))
      bestOf(5) { () =>
        var i = 0; while (i < plains.length) {
          val p = plains(i)
          val out = new Array[Byte](p.length)
          StableHash.xorKeystreamInto(12345L, p, out, 0)
          sink += out(0); i += 1 }
      }
    })
    report("jvm_encryptCell_xor_string", bestOf(5) { () =>
      var i = 0; while (i < strs.length) { sink += xorS.encryptCell(strs(i)).length; i += 1 }
    })
    report("jvm_encryptCell_aes_string", bestOf(3) { () =>
      var i = 0; while (i < strs.length) { sink += aesS.encryptCell(strs(i)).length; i += 1 }
    })
    report("jvm_encryptCell_xor_int64", bestOf(5) { () =>
      var i = 0; while (i < longs.length) { sink += xorL.encryptCell(longs(i)).length; i += 1 }
    })
    report("jvm_encryptCell_aes_int64", bestOf(3) { () =>
      var i = 0; while (i < longs.length) { sink += aesL.encryptCell(longs(i)).length; i += 1 }
    })

    report("spark_floor_sum_length", bestOf(5) { () =>
      li.agg(sum(length(col("v_string")))).collect(); ()
    })
    report("spark_xor_string", bestOf(5) { () =>
      li.select(protect.encrypt_value(col("v_string"), "bench-key",
        CryptoCodec.Xor, "v", perValue = true).as("ct"))
        .agg(sum(length(col("ct")))).collect(); ()
    })
    report("spark_aes_string", bestOf(3) { () =>
      li.select(protect.encrypt_value(col("v_string"), "bench-key",
        CryptoCodec.AesDet, "v", perValue = true).as("ct"))
        .agg(sum(length(col("ct")))).collect(); ()
    })
    report("spark_xor_string_32part", {
      val li32 = li.repartition(32).cache()
      li32.count()
      val r = bestOf(5) { () =>
        li32.select(protect.encrypt_value(col("v_string"), "bench-key",
          CryptoCodec.Xor, "v", perValue = true).as("ct"))
          .agg(sum(length(col("ct")))).collect(); ()
      }
      li32.unpersist(); r
    })
    println(s"sink=$sink")
    spark.stop()
  }
}
