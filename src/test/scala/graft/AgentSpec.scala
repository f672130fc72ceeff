package graft.agent

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CryptoCodec, GraftInvalidInputException}

/** Local-agent surface tests — mirrors the reference's dbpa_local_test /
  * dbpa_remote_testapp round trips: per-type batches, nullability via the
  * level-bytes analog, version/type mismatch rejection.
  */
class AgentSpec extends AnyFunSuite {

  private def roundTrip(dt: DataType, values: Seq[Any], codec: String): Unit = {
    val agent = LocalProtectionAgent.init("agent-key", "c", dt, codec)
    val enc = agent.encrypt(values)
    assert(enc.payload.nonEmpty)
    val back = agent.decrypt(enc)
    (values zip back).foreach {
      case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
      case (a, b) => assert(a == b, s"$dt mismatch")
    }
  }

  for (codec <- Seq(CryptoCodec.Xor, CryptoCodec.AesDet)) {
    test(s"int32 batch with nulls [$codec]") {
      roundTrip(IntegerType, Seq(3344, null, 5566, 7788, null), codec)
    }
    test(s"int64/float/double batches [$codec]") {
      roundTrip(LongType, Seq(1L << 62, -(1L << 62), null), codec)
      roundTrip(FloatType, Seq(1.5f, -2.25f, 3.14159f, null), codec)
      roundTrip(DoubleType, Seq(math.Pi, null, -0.0), codec)
    }
    test(s"string batch incl. UTF-8, empty, 50KB [$codec]") {
      roundTrip(StringType,
        Seq("user1@example.com", null, "café 🚀 树 🌍", "", "x" * 50000), codec)
    }
    test(s"fixed-8 binary (FLBA analog) [$codec]") {
      roundTrip(BinaryType,
        Seq("Hello123".getBytes, "World456".getBytes, null), codec)
    }
    test(s"all-null and empty batches [$codec]") {
      roundTrip(IntegerType, Seq(null, null, null), codec)
      roundTrip(IntegerType, Nil, codec)
    }
  }

  test("ciphertext is deterministic for det codecs (equality preserved)") {
    val agent = LocalProtectionAgent.init("k", "c", StringType, CryptoCodec.AesDet)
    val a = agent.encrypt(Seq("same", "same"))
    val b = agent.encrypt(Seq("same", "same"))
    assert(a.payload.sameElements(b.payload))
  }

  test("version mismatch rejected (P5 prefix check)") {
    val agent = LocalProtectionAgent.init("k", "c", IntegerType)
    val enc = agent.encrypt(Seq(1, 2))
    val tampered = enc.copy(metadata =
      enc.metadata.updated(graft.pipeline.ProtectionPipeline.KeyVersion, "v9.99"))
    intercept[GraftInvalidInputException](agent.decrypt(tampered))
  }

  test("datatype mismatch rejected (A8 field match)") {
    val intAgent = LocalProtectionAgent.init("k", "c", IntegerType)
    val longAgent = LocalProtectionAgent.init("k", "c", LongType)
    val enc = intAgent.encrypt(Seq(1, 2))
    intercept[GraftInvalidInputException](longAgent.decrypt(enc))
  }

  test("payload corruption rejected cleanly") {
    val agent = LocalProtectionAgent.init("k", "c", IntegerType, CryptoCodec.AesDet)
    val enc = agent.encrypt(Seq(1, 2, 3))
    val corrupt = enc.payload.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x55).toByte
    intercept[GraftInvalidInputException](agent.decrypt(enc.copy(payload = corrupt)))
  }
}
