package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Pure-JVM crypto core tests — the translation of the reference's
  * byte-level unit suites (SURVEY.md §5): canonical-bytes pins, round trips,
  * adversarial malformed inputs (property-style via seeded ScalaCheck Gens;
  * the scalatestplus bridge isn't in the offline cache).
  */
class CryptoCoreSpec extends AnyFunSuite {

  /** Deterministic property loop: sample `gen` n times from a fixed seed. */
  private def forAll[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    val params = Gen.Parameters.default
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private val ctx = ProtectionContext("key-1", "col")
  private val xor = XorCodec(ctx)
  private val aesDet = AesCodec(ctx, deterministic = true)
  private val aesRnd = AesCodec(ctx, deterministic = false)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ---- canonical pins (independently computed from the FNV-1a-64 +
  // (h<<1)|(h>>>31) keystream definition; guards wire-format stability
  // like the reference's ManualBytes/Canonical tests).
  test("XOR canonical: seed for key-1:col:: context") {
    assert(StableHash.fnv1a64("key-1:col::") == 0xfa4c239567451a6aL)
    assert(hex(xor.encrypt("hello world".getBytes("UTF-8"))) ==
      "029b939390df88908d9299")
    assert(hex(xor.encrypt(Array[Byte](0xd2.toByte, 0x04, 0, 0))) == "b8faffff")
  }

  test("XOR is symmetric, deterministic, keystream restarts per call") {
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      data: Array[Byte] =>
        assert(xor.decrypt(xor.encrypt(data)).sameElements(data))
        assert(xor.encrypt(data).sameElements(xor.encrypt(data)))
    }
    // restart: encrypting x++x gives ct(x) ++ something-else, but two calls
    // on x give identical prefixes
    val a = xor.encrypt(Array[Byte](1, 2, 3))
    val b = xor.encrypt(Array[Byte](1, 2, 3, 9, 9))
    assert(a.sameElements(b.take(3)))
  }

  test("different contexts give different keystreams") {
    val other = XorCodec(ProtectionContext("key-1", "col2"))
    val pt = "same plaintext".getBytes
    assert(!xor.encrypt(pt).sameElements(other.encrypt(pt)))
  }

  test("AES deterministic (SIV) mode: stable ciphertext, exact round trip") {
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      data: Array[Byte] =>
        val ct1 = aesDet.encrypt(data)
        val ct2 = aesDet.encrypt(data)
        assert(ct1.sameElements(ct2), "det mode must be deterministic")
        assert(aesDet.decrypt(ct1).sameElements(data))
    }
  }

  test("AES randomized mode: fresh IVs, still round trips") {
    val pt = "payload".getBytes
    val ct1 = aesRnd.encrypt(pt)
    val ct2 = aesRnd.encrypt(pt)
    assert(!ct1.sameElements(ct2), "rnd mode must differ per call")
    assert(aesRnd.decrypt(ct1).sameElements(pt))
    assert(aesRnd.decrypt(ct2).sameElements(pt))
  }

  test("AES rejects tampered ciphertext and wrong key") {
    val ct = aesDet.encrypt("secret".getBytes)
    val tampered = ct.clone(); tampered(ct.length - 1) = (tampered(ct.length - 1) ^ 1).toByte
    intercept[GraftInvalidInputException](aesDet.decrypt(tampered))
    intercept[GraftInvalidInputException](aesDet.decrypt(Array[Byte](1, 2, 3)))
    val wrongKey = AesCodec(ProtectionContext("other", "col"), deterministic = true)
    intercept[GraftInvalidInputException](wrongKey.decrypt(ct))
  }

  // ---- §1.5 batch value-list wire format (encryptor_utils.h parity)
  test("value list fixed: header layout [0x01][count][elem_size]") {
    val elems = Seq(Array[Byte](1, 0, 0, 0), Array[Byte](2, 0, 0, 0))
    val out = WireFormat.encryptValueList(xor, elems, Some(4))
    assert(out(0) == WireFormat.FixedTag)
    val buf = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.get()
    assert(buf.getInt() == 2)      // element_count
    assert(buf.getInt() == 4)      // element_size
    assert(out.length == 9 + 8)
    val back = WireFormat.decryptValueList(xor, out)
    assert(back.map(_.toSeq) == elems.map(_.toSeq))
  }

  test("value list variable: header [0x00][count] + length-prefixed records") {
    val elems = Seq("a".getBytes, "".getBytes, "longer value".getBytes).map(_.asInstanceOf[Array[Byte]])
    val out = WireFormat.encryptValueList(aesDet, elems, None)
    assert(out(0) == WireFormat.VariableTag)
    val back = WireFormat.decryptValueList(aesDet, out)
    assert(back.map(new String(_)) == Seq("a", "", "longer value"))
  }

  test("value list: empty batch keeps header only") {
    val out = WireFormat.encryptValueList(xor, Nil, Some(4))
    assert(out.length == 9)
    assert(WireFormat.decryptValueList(xor, out).isEmpty)
  }

  test("value list malformed inputs fail cleanly") {
    // truncated header
    intercept[GraftInvalidInputException](
      WireFormat.decryptValueList(xor, Array[Byte](1, 2)))
    // unknown tag
    intercept[GraftInvalidInputException](
      WireFormat.decryptValueList(xor, Array[Byte](7, 0, 0, 0, 0)))
    // fixed: payload length mismatch
    val good = WireFormat.encryptValueList(xor, Seq(Array[Byte](1, 2, 3, 4)), Some(4))
    intercept[GraftInvalidInputException](
      WireFormat.decryptValueList(xor, good.dropRight(1)))
    // variable: length prefix exceeds remaining
    val varGood = WireFormat.encryptValueList(xor, Seq("abcdef".getBytes), None)
    val corrupt = varGood.clone()
    corrupt(5) = 0x7f // inflate first record length
    intercept[GraftInvalidInputException](WireFormat.decryptValueList(xor, corrupt))
    // trailing bytes
    intercept[GraftInvalidInputException](
      WireFormat.decryptValueList(xor, varGood :+ 0x00.toByte))
  }

  test("arbitrary bytes never crash decryptValueList with non-Graft exception") {
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      junk: Array[Byte] =>
        try WireFormat.decryptValueList(xor, junk)
        catch {
          case _: GraftInvalidInputException => // clean failure
        }
    }
  }

  test("joinWithLengthPrefix round trip + bounds check") {
    val (a, b) = (Array[Byte](1, 2, 3), Array[Byte](4, 5))
    val joined = WireFormat.joinWithLengthPrefix(a, b)
    val (a2, b2) = WireFormat.splitWithLengthPrefix(joined)
    assert(a2.sameElements(a) && b2.sameElements(b))
    intercept[GraftInvalidInputException](
      WireFormat.splitWithLengthPrefix(Array[Byte](9, 0, 0, 0, 1)))
  }

  test("cell framing: header fields + malformed rejections") {
    val cell = WireFormat.frameCell(WireFormat.ModePerValueFixed, 4, Array[Byte](9, 9, 9, 9))
    val (mode, plen, ct) = WireFormat.unframeCell(cell)
    assert(mode == WireFormat.ModePerValueFixed && plen == 4 && ct.length == 4)
    intercept[GraftInvalidInputException](WireFormat.unframeCell(Array[Byte](1)))
    val badMagic = cell.clone(); badMagic(0) = 0x00
    intercept[GraftInvalidInputException](WireFormat.unframeCell(badMagic))
    val badVersion = cell.clone(); badVersion(1) = 0x7f
    intercept[GraftInvalidInputException](WireFormat.unframeCell(badVersion))
    val badMode = cell.clone(); badMode(2) = 0x55
    intercept[GraftInvalidInputException](WireFormat.unframeCell(badMode))
  }
}
