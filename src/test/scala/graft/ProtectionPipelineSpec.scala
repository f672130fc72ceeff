package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{CryptoCodec, GraftInvalidInputException}
import graft.functions.protect
import graft.pipeline._

/** FIXTURES.md §1 translation: per-type round-trip suites with null patterns,
  * metadata/version semantics, boolean per-block fallback, determinism.
  */
class ProtectionPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(df: DataFrame, col_ : String, codec: String): Unit = {
    val enc = ProtectionPipeline.encrypt(df,
      Seq(ColumnPolicy(col_, "rt-key", PerValue, codec)))
    assert(enc.schema(col_).dataType == BinaryType)
    val dec = ProtectionPipeline.decrypt(enc)
    ProtectionPipeline.assertSchemaRestored(df.schema, dec.schema)
    val a = df.collect().map(_.toSeq).toSeq
    val b = dec.collect().map(_.toSeq).toSeq
    assert(bytesNorm(a) == bytesNorm(b), s"round trip mismatch for $col_ [$codec]")
  }

  private def bytesNorm(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.map(_.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }).sortBy(_.toString())

  // FIXTURES.md null patterns: none / leading / trailing / alternating / all-null
  private def withNullPatterns[T](values: Seq[T]): Seq[Seq[Option[T]]] = Seq(
    values.map(Some(_)),
    None +: values.tail.map(Some(_)),
    values.init.map(Some(_)) :+ None,
    values.zipWithIndex.map { case (v, i) => if (i % 2 == 0) Some(v) else None },
    values.map(_ => Option.empty[T]))

  for (codec <- Seq(CryptoCodec.Xor, CryptoCodec.AesDet)) {
    test(s"ints32 round trip [$codec]") {
      withNullPatterns(Seq(3344, 5566, 7788, -1, Int.MinValue, Int.MaxValue, 0))
        .foreach(vs => roundTrip(vs.toDF("id"), "id", codec))
    }
    test(s"ints64 round trip [$codec]") {
      withNullPatterns(Seq(1L << 62, -(1L << 62), 0L, Long.MinValue, Long.MaxValue))
        .foreach(vs => roundTrip(vs.toDF("id"), "id", codec))
    }
    test(s"floats round trip [$codec]") {
      withNullPatterns(Seq(1.5f, -2.25f, 3.14159f, 0.0f, -999.123456f,
        1234567.89f, -0.00001f, 42.0f, Float.MinPositiveValue))
        .foreach(vs => roundTrip(vs.toDF("x"), "x", codec))
    }
    test(s"doubles round trip [$codec]") {
      withNullPatterns(Seq(1.5, -2.25, math.Pi, 0.0, Double.MinPositiveValue,
        -4.9e-324, 1.7976931348623157e308))
        .foreach(vs => roundTrip(vs.toDF("x"), "x", codec))
    }
    test(s"strings round trip incl. UTF-8 and empties [$codec]") {
      withNullPatterns(Seq("user1@example.com", "user2@example.com",
        "café 🚀 树 🌍", "", "x" * 50000, "\t\n\"quoted\""))
        .foreach(vs => roundTrip(vs.toDF("email"), "email", codec))
    }
    test(s"binary (FLBA analog) round trip [$codec]") {
      withNullPatterns(Seq("Hello123", "World456", "Test7890")
        .map(_.getBytes("UTF-8")))
        .foreach(vs => roundTrip(vs.toDF("code"), "code", codec))
    }
    test(s"booleans round trip via per-block fallback [$codec]") {
      withNullPatterns(Seq(true, false, true)).foreach { vs =>
        val df = vs.toDF("flag")
        val enc = ProtectionPipeline.encrypt(df,
          Seq(ColumnPolicy("flag", "k", PerValue, codec)))
        // plan-time fallback recorded in metadata (reference:
        // BooleanTypeUsesPerBlockEncryption)
        assert(enc.schema("flag").metadata.getString(ProtectionPipeline.KeyMode)
          == PerBlock.name)
        val dec = ProtectionPipeline.decrypt(enc)
        assert(bytesNorm(df.collect().map(_.toSeq).toSeq) ==
          bytesNorm(dec.collect().map(_.toSeq).toSeq))
      }
    }
    test(s"timestamps and dates round trip [$codec]") {
      val ts = Seq(Timestamp.valueOf("1995-01-02 03:04:05.123456"),
        Timestamp.valueOf("2024-01-30 23:57:12"))
      withNullPatterns(ts).foreach(vs => roundTrip(vs.toDF("ts"), "ts", codec))
      val dates = Seq(java.sql.Date.valueOf("1995-01-02"),
        java.sql.Date.valueOf("2024-12-31"))
      withNullPatterns(dates).foreach(vs => roundTrip(vs.toDF("d"), "d", codec))
    }
    test(s"decimal round trip [$codec]") {
      val ds = Seq(BigDecimal("123456.78"), BigDecimal("-0.01"), BigDecimal("0.00"))
      withNullPatterns(ds).foreach { vs =>
        roundTrip(vs.toDF("amt").select(col("amt").cast("decimal(12,2)").as("amt")),
          "amt", codec)
      }
    }
  }

  test("metadata carries version/mode/codec/key/original type") {
    val enc = ProtectionPipeline.encrypt(Seq(1, 2).toDF("v"),
      Seq(ColumnPolicy("v", "meta-key", PerValue, CryptoCodec.AesDet)))
    val m = enc.schema("v").metadata
    assert(m.getString(ProtectionPipeline.KeyVersion) == ProtectionPipeline.AgentVersion)
    assert(m.getString(ProtectionPipeline.KeyMode) == PerValue.name)
    assert(m.getString(ProtectionPipeline.KeyCodec) == CryptoCodec.AesDet)
    assert(m.getString(ProtectionPipeline.KeyKeyId) == "meta-key")
    assert(DataType.fromJson(m.getString(ProtectionPipeline.KeyOrigType)) == IntegerType)
  }

  test("decrypt rejects wrong agent version (P5 prefix match)") {
    val enc = ProtectionPipeline.encrypt(Seq(1).toDF("v"),
      Seq(ColumnPolicy("v", "k", PerValue, CryptoCodec.Xor)))
    val badMeta = new MetadataBuilder()
      .withMetadata(enc.schema("v").metadata)
      .putString(ProtectionPipeline.KeyVersion, "v9.99-other").build()
    val tampered = enc.withColumn("v", col("v").as("v", badMeta))
    intercept[GraftInvalidInputException](ProtectionPipeline.decrypt(tampered))
  }

  test("decrypt of subset columns + missing-column policy errors") {
    val df = Seq((1, "a"), (2, "b")).toDF("i", "s")
    val enc = ProtectionPipeline.encrypt(df, Seq(
      ColumnPolicy("i", "k1"), ColumnPolicy("s", "k2")))
    val halfDec = ProtectionPipeline.decrypt(enc, Seq("i"))
    assert(halfDec.schema("i").dataType == IntegerType)
    assert(halfDec.schema("s").dataType == BinaryType)
    intercept[GraftInvalidInputException](ProtectionPipeline.decrypt(enc, Seq("nope")))
    intercept[GraftInvalidInputException](
      ProtectionPipeline.encrypt(df, Seq(ColumnPolicy("missing", "k"))))
  }

  test("deterministic codecs give stable ciphertext across evaluations") {
    val df = Seq("a", "b", "a").toDF("v")
      .withColumn("ct", protect.encrypt_value(col("v"), "k", CryptoCodec.AesDet, "v"))
    val cts = df.collect().map(r => r.getAs[Array[Byte]]("ct").toSeq)
    assert(cts(0) == cts(2), "equal plaintexts must give equal ciphertext")
    assert(cts(0) != cts(1))
    val again = df.collect().map(r => r.getAs[Array[Byte]]("ct").toSeq)
    assert(cts.toSeq == again.toSeq)
  }

  test("randomized codec produces differing ciphertexts but still decrypts") {
    val df = Seq("x", "x").toDF("v")
      .withColumn("ct", protect.encrypt_value(col("v"), "k", CryptoCodec.AesRnd, "v"))
      .withColumn("back", protect.decrypt_value(col("ct"), "k", StringType,
        CryptoCodec.AesRnd, "v"))
    val rows = df.collect()
    assert(rows.forall(_.getString(2) == "x"))
    assert(!rows(0).getAs[Array[Byte]]("ct").sameElements(rows(1).getAs[Array[Byte]]("ct")))
  }

  test("arbitrary junk bytes fail decrypt cleanly (no JVM crash)") {
    val rnd = new scala.util.Random(7)
    val junk = Seq.fill(50)(rnd.nextBytes(rnd.nextInt(40)))
    junk.foreach { j =>
      val df = Seq(j).toDF("ct")
        .withColumn("out", protect.decrypt_value(col("ct"), "k", StringType,
          CryptoCodec.Xor, "v"))
      val t = intercept[Throwable](df.collect())
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(t).exists(_.isInstanceOf[GraftInvalidInputException]),
        s"expected GraftInvalidInputException in cause chain, got $t")
    }
  }

  test("SQL surface: graft_encrypt/graft_decrypt_string round trip") {
    protect.register(spark)
    Seq("alpha", "beta").toDF("s").createOrReplaceTempView("t_sql")
    val out = spark.sql(
      """SELECT graft_decrypt_string(
        |  graft_encrypt(s, 'sql-key', 'aes_det', 'c'),
        |  'sql-key', 'aes_det', 'c') AS back FROM t_sql ORDER BY back"""
        .stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("alpha", "beta"))
  }

  test("whole-stage codegen path actually runs our expressions") {
    // A projection over a parquet scan goes through WholeStageCodegen; this
    // guards the doGenCode path (addReferenceObj call) against regressions.
    val df = spark.range(1000).select(col("id"))
      .withColumn("ct", protect.encrypt_value(col("id"), "cg", CryptoCodec.Xor, "id"))
      .withColumn("back", protect.decrypt_value(col("ct"), "cg", LongType,
        CryptoCodec.Xor, "id"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in plan:\n$plan")
    assert(df.filter(col("id") === col("back")).count() == 1000)
  }
}
