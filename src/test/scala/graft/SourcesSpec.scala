package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.CryptoCodec
import graft.pipeline.{ColumnPolicy, PerValue, ProtectionPipeline}

/** Source/sink breadth (SURVEY.md §2.1): the engine must read/write every
  * mainstream format Spark supports, including protected (BinaryType +
  * metadata) columns surviving a parquet round trip.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString + "/data"

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/customer.parquet")

  test("parquet round trip preserves data and schema") {
    val p = tmp("parquet")
    base.write.mode("overwrite").parquet(p)
    val back = spark.read.parquet(p)
    assert(back.schema == base.schema)
    assert(back.count() == base.count())
  }

  test("csv round trip with header and explicit schema") {
    val p = tmp("csv")
    base.write.mode("overwrite").option("header", "true").csv(p)
    val back = spark.read.option("header", "true").schema(base.schema).csv(p)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("json lines round trip") {
    val p = tmp("json")
    base.write.mode("overwrite").json(p)
    val back = spark.read.schema(base.schema).json(p)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("orc round trip") {
    val p = tmp("orc")
    base.write.mode("overwrite").orc(p)
    val back = spark.read.orc(p)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("text source reads lines (values-file reader, S4 analog)") {
    val p = tmp("text")
    base.select(col("c_name")).write.mode("overwrite").text(p)
    val lines = spark.read.text(p).limit(10)
    assert(lines.count() == 10)
    assert(lines.schema == StructType(Seq(StructField("value", StringType))))
  }

  test("protected columns survive a parquet write/read round trip") {
    val p = tmp("protected")
    val enc = ProtectionPipeline.encrypt(base, Seq(
      ColumnPolicy("c_name", "disk-key", PerValue, CryptoCodec.AesDet),
      ColumnPolicy("c_acctbal", "disk-key", PerValue, CryptoCodec.Xor)))
    enc.write.mode("overwrite").parquet(p)
    val reloaded = spark.read.parquet(p)
    // metadata rides the parquet schema → decrypt is still self-describing
    assert(reloaded.schema("c_name").metadata
      .getString(ProtectionPipeline.KeyVersion) == ProtectionPipeline.AgentVersion)
    val dec = ProtectionPipeline.decrypt(reloaded)
    assert(dec.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("INT96-style fixed 12-byte binary round trips byte-exactly (SURVEY §7.4)") {
    // the reference's Int96Codec handles 12-byte legacy timestamps
    // (typed_buffer_codecs.h:70-103); our mapping is fixed-12 BinaryType
    val vals = Seq(
      Array.fill[Byte](12)(0x00),
      Array.fill[Byte](12)(0xff.toByte),
      (1 to 12).map(_.toByte).toArray)
    val df = vals.toDF("int96")
    val enc = ProtectionPipeline.encrypt(df,
      Seq(ColumnPolicy("int96", "i96-key", PerValue, CryptoCodec.AesDet)))
    val dec = ProtectionPipeline.decrypt(enc)
    val got = dec.collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(got == vals.map(_.toSeq).toSet)
  }
}
