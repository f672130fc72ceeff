package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.agent.{EncryptedBatch, LocalProtectionAgent}
import graft.pipeline.{PageSequencer, ProtectionPipeline}

/** Page-byte machinery tests — the port of the reference's grid
  * (`/root/reference/src/processing/parquet_utils_test.cpp`, 63 cases) plus
  * the sequencer round trips built the way `performance_test.cpp:133-225`
  * builds page payloads: level decode canonical pins, malformed-input
  * rejections, split/join round trips, and the per-value / per-block
  * fallback contract end-to-end through [[graft.agent.PageProtectionAgent]].
  */
class PageCodecSpec extends AnyFunSuite {
  import PageCodec._

  // ------------------------------------------------------------ builders --
  // Scala ports of the reference test fixtures (performance_test.cpp:133-225
  // and parquet_utils_test.cpp helpers).

  private def encodeUleb128(v: Int): Array[Byte] = {
    var x = v
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((x & ~0x7f) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }

  /** One RLE run: header = uleb(runLen<<1), value in ceil(bw/8) bytes. */
  private def rleDefPayload(runLen: Int, level: Int, bitWidth: Int): Array[Byte] = {
    val byteWidth = (bitWidth + 7) / 8
    encodeUleb128(runLen << 1) ++
      (0 until byteWidth).map(i => ((level >>> (8 * i)) & 0xff).toByte)
  }

  /** Bit-packed runs: header = uleb((groups<<1)|1), LSB-first packing. */
  private def bitPackedDefPayload(levels: Seq[Int], bitWidth: Int): Array[Byte] = {
    require(levels.size % 8 == 0)
    val groups = levels.size / 8
    val bits = new Array[Byte]((levels.size * bitWidth + 7) / 8)
    levels.zipWithIndex.foreach { case (lvl, i) =>
      (0 until bitWidth).foreach { b =>
        if (((lvl >>> b) & 1) == 1) {
          val abs = i * bitWidth + b
          bits(abs / 8) = (bits(abs / 8) | (1 << (abs % 8))).toByte
        }
      }
    }
    encodeUleb128((groups << 1) | 1) ++ bits
  }

  private def u32le(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def plainInt32(values: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * values.size).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(b.putInt); b.array()
  }

  private def plainInt64(values: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 * values.size).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(b.putLong); b.array()
  }

  private def plainByteArray(values: Seq[Array[Byte]]): Array[Byte] =
    values.flatMap(v => u32le(v.length) ++ v).toArray

  private def v1Attrs(numValues: Int, maxDef: Int = 0, maxRep: Int = 0,
      encoding: String = "PLAIN"): Map[String, String] = Map(
    "page_type" -> "DATA_PAGE_V1",
    "data_page_num_values" -> numValues.toString,
    "data_page_max_definition_level" -> maxDef.toString,
    "data_page_max_repetition_level" -> maxRep.toString,
    "page_v1_definition_level_encoding" -> "RLE",
    "page_v1_repetition_level_encoding" -> "RLE",
    "page_encoding" -> encoding)

  private def v2Attrs(numValues: Int, defBytes: Int, repBytes: Int,
      numNulls: Int, isCompressed: Boolean, maxDef: Int = 1, maxRep: Int = 1,
      encoding: String = "PLAIN"): Map[String, String] = Map(
    "page_type" -> "DATA_PAGE_V2",
    "data_page_num_values" -> numValues.toString,
    "data_page_max_definition_level" -> maxDef.toString,
    "data_page_max_repetition_level" -> maxRep.toString,
    "page_v2_definition_levels_byte_length" -> defBytes.toString,
    "page_v2_repetition_levels_byte_length" -> repBytes.toString,
    "page_v2_num_nulls" -> numNulls.toString,
    "page_v2_is_compressed" -> isCompressed.toString,
    "page_encoding" -> encoding)

  private def dictAttrs(numValues: Int, encoding: String = "PLAIN"): Map[String, String] =
    Map("page_type" -> "DICTIONARY_PAGE",
      "dict_page_num_values" -> numValues.toString,
      "page_encoding" -> encoding)

  /** V1 payload: [u32 rep block][u32 def block][values], whole page
    * compressed (performance_test.cpp BuildDataPageV1Payload). Level blocks
    * are real RLE payloads when a max level is positive.
    */
  private def buildV1(valueBytes: Array[Byte], defPayload: Option[Array[Byte]],
      repPayload: Option[Array[Byte]], compression: String): Array[Byte] = {
    val levels =
      repPayload.map(p => u32le(p.length) ++ p).getOrElse(Array.emptyByteArray) ++
        defPayload.map(p => u32le(p.length) ++ p).getOrElse(Array.emptyByteArray)
    PageCodec.compress(levels ++ valueBytes, compression)
  }

  private def cnt(payload: Array[Byte], n: Int, maxDef: Int): Int =
    countPresentValuesFromDefinitionLevelsV1(payload, n, maxDef)

  // ------------------------- V1 definition-level decode (canonical grid) --

  test("V1 def levels: RLE all present / all null") {
    assert(cnt(rleDefPayload(10, 1, 1), 10, 1) == 10)
    assert(cnt(rleDefPayload(10, 0, 1), 10, 1) == 0)
  }

  test("V1 def levels: bit-packed alternating 0xAA counts 4 of 8") {
    assert(cnt(Array[Byte](0x03, 0xAA.toByte), 8, 1) == 4)
  }

  test("V1 def levels: mixed RLE + bit-packed runs") {
    // 0x06,0x01 => RLE run_len=3 level=1; 0x03,0x0F => bit-packed 1,1,1,1,0,0,0,0
    assert(cnt(Array[Byte](0x06, 0x01, 0x03, 0x0F), 11, 1) == 7)
    val mixed = rleDefPayload(4, 1, 1) ++
      bitPackedDefPayload(Seq(0, 1, 0, 1, 0, 0, 0, 0), 1)
    assert(cnt(mixed, 12, 1) == 6)
  }

  test("V1 def levels: canonical bit-packed 0..7 = 88 C6 FA at bit width 3") {
    // Parquet Encodings.md canonical bytes; only value 7 hits max_def_level=7.
    assert(cnt(Array[Byte](0x03, 0x88.toByte, 0xC6.toByte, 0xFA.toByte), 8, 7) == 1)
    // bit-width-2 sibling: one value at level 3
    assert(cnt(bitPackedDefPayload(Seq(0, 1, 2, 3, 0, 1, 2, 0), 2), 8, 3) == 1)
  }

  test("V1 def levels: manual RLE bytes 0x08 0x01 decode as 4 × level 1") {
    assert(cnt(Array[Byte](0x08, 0x01), 4, 1) == 4)
  }

  test("V1 def levels: exhaustive one bit-packed group, all 256 patterns") {
    (0 to 0xff).foreach { packed =>
      val ones = Integer.bitCount(packed)
      assert(cnt(Array[Byte](0x03, packed.toByte), 8, 1) == ones, s"packed=$packed")
    }
  }

  test("V1 def levels: final bit-packed run may pad to a full group") {
    assert(cnt(Array[Byte](0x03, 0x07), 3, 1) == 3)
  }

  test("V1 def levels: malformed payloads are rejected") {
    // run_len > num_values
    intercept[GraftInvalidInputException] { cnt(rleDefPayload(9, 1, 1), 8, 1) }
    // level exceeds max
    intercept[GraftInvalidInputException] { cnt(rleDefPayload(1, 2, 1), 1, 1) }
    // truncated varint (continuation bit, no next byte)
    intercept[GraftInvalidInputException] { cnt(Array[Byte](0x80.toByte), 1, 1) }
    // truncated RLE value byte
    intercept[GraftInvalidInputException] { cnt(encodeUleb128(2), 1, 1) }
    // zero RLE run length
    intercept[GraftInvalidInputException] { cnt(Array[Byte](0x00, 0x00), 1, 1) }
    // zero bit-packed groups
    intercept[GraftInvalidInputException] { cnt(Array[Byte](0x01), 8, 1) }
    // trailing bytes after decoding
    intercept[GraftInvalidInputException] { cnt(Array[Byte](0x03, 0xAA.toByte, 0xFF.toByte), 8, 1) }
    // non-positive max_def_level / negative num_values
    intercept[GraftInvalidInputException] { cnt(rleDefPayload(1, 0, 1), 1, 0) }
    intercept[GraftInvalidInputException] { cnt(rleDefPayload(1, 1, 1), -1, 1) }
  }

  test("ULEB128 run headers: single byte, multi byte, truncation, oversize") {
    assert(readV1RunHeaderUleb128(Array[Byte](0x08), 0) == ((8, 1)))
    // 300 = 0xAC 0x02; offset advances past both bytes
    assert(readV1RunHeaderUleb128(Array[Byte](0x00, 0xAC.toByte, 0x02), 1) == ((300, 3)))
    intercept[GraftInvalidInputException] {
      readV1RunHeaderUleb128(Array[Byte](0x80.toByte), 0)
    }
    intercept[GraftInvalidInputException] { // 5 continuation bytes > 28-bit shift
      readV1RunHeaderUleb128(
        Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01), 0)
    }
  }

  // ------------------------------------------- level-bytes length + split --

  test("calculateLevelBytesLength: V2 sums attribute lengths; DICT is 0") {
    val raw = new Array[Byte](32)
    assert(calculateLevelBytesLength(raw,
      parseAttributes(v2Attrs(10, 3, 5, 0, isCompressed = false))) == 8)
    assert(calculateLevelBytesLength(raw, parseAttributes(dictAttrs(10))) == 0)
  }

  test("calculateLevelBytesLength: V2 negative and int-overflow totals rejected") {
    val raw = new Array[Byte](32)
    intercept[GraftInvalidInputException] {
      calculateLevelBytesLength(raw,
        parseAttributes(v2Attrs(100, -1, -5, 0, isCompressed = false)))
    }
    // ADVICE r3: 2^30 + 2^30 wraps negative as Int — must still be rejected
    // as invalid input, not surface as an uncontrolled copyOfRange error.
    intercept[GraftInvalidInputException] {
      calculateLevelBytesLength(raw,
        parseAttributes(v2Attrs(100, 1 << 30, 1 << 30, 0, isCompressed = false)))
    }
  }

  test("calculateLevelBytesLength: V1 with and without level blocks") {
    // no levels: nothing to skip
    assert(calculateLevelBytesLength(new Array[Byte](16),
      parseAttributes(v1Attrs(4))) == 0)
    // rep (5 bytes) + def (3 bytes) blocks, each with a 4-byte prefix
    val raw = u32le(5) ++ new Array[Byte](5) ++ u32le(3) ++ new Array[Byte](3) ++
      new Array[Byte](8)
    assert(calculateLevelBytesLength(raw,
      parseAttributes(v1Attrs(4, maxDef = 1, maxRep = 2))) == 16)
  }

  test("calculateLevelBytesLength: non-RLE V1 encoding and oversize totals rejected") {
    val attrs = parseAttributes(
      v1Attrs(4, maxDef = 1) ++ Map("page_v1_definition_level_encoding" -> "BIT_PACKED"))
    intercept[GraftInvalidInputException] {
      calculateLevelBytesLength(new Array[Byte](8), attrs)
    }
    // level total exceeding the payload
    intercept[GraftInvalidInputException] {
      calculateLevelBytesLength(new Array[Byte](4),
        parseAttributes(v2Attrs(10, 3, 5, 0, isCompressed = false)))
    }
  }

  test("parseAttributes: missing keys, bad ints, bad bools, bad page type") {
    intercept[GraftInvalidInputException] { parseAttributes(Map.empty) }
    intercept[GraftInvalidInputException] {
      parseAttributes(v1Attrs(4) - "data_page_num_values")
    }
    intercept[GraftInvalidInputException] {
      parseAttributes(v1Attrs(4) + ("data_page_num_values" -> "ten"))
    }
    intercept[GraftInvalidInputException] {
      parseAttributes(v2Attrs(4, 0, 0, 0, isCompressed = false) +
        ("page_v2_is_compressed" -> "yes"))
    }
    intercept[GraftInvalidInputException] {
      parseAttributes(Map("page_type" -> "DATA_PAGE_V3"))
    }
  }

  // -------------------------------------- decompressAndSplit / compressAndJoin --

  test("decompressAndSplit: V2 uncompressed and snappy-compressed value section") {
    val values = plainInt32(Seq(1, 2, 3, 4))
    val levels = Array.fill[Byte](8)(0xCC.toByte)
    val attrsU = parseAttributes(v2Attrs(4, 3, 5, 0, isCompressed = false))
    val u = decompressAndSplit(levels ++ values, Uncompressed, attrsU)
    assert(u.levelBytes.sameElements(levels) && u.valueBytes.sameElements(values))
    assert(u.numElements == 4)

    val attrsC = parseAttributes(v2Attrs(4, 3, 5, 1, isCompressed = true))
    val c = decompressAndSplit(levels ++ PageCodec.compress(values, Snappy), Snappy, attrsC)
    assert(c.valueBytes.sameElements(values))
    assert(c.numElements == 3) // num_values - num_nulls
  }

  test("decompressAndSplit: V2 num_nulls > num_values rejected; unknown codec unsupported") {
    intercept[GraftInvalidInputException] {
      decompressAndSplit(new Array[Byte](16), Uncompressed,
        parseAttributes(v2Attrs(2, 3, 5, 5, isCompressed = false)))
    }
    intercept[GraftUnsupportedException] {
      decompressAndSplit(new Array[Byte](16), "GZIP",
        parseAttributes(v2Attrs(2, 3, 5, 0, isCompressed = true)))
    }
  }

  test("decompressAndSplit: V1 required (no levels), nullable RLE, rep levels") {
    // required column: value section only, numElements = num_values
    val vals = plainInt32(Seq(7, 8, 9))
    val req = decompressAndSplit(buildV1(vals, None, None, Uncompressed),
      Uncompressed, parseAttributes(v1Attrs(3)))
    assert(req.levelBytes.isEmpty && req.valueBytes.sameElements(vals))
    assert(req.numElements == 3)

    // nullable: RLE def levels, 3 of 5 present
    val defP = rleDefPayload(2, 1, 1) ++ rleDefPayload(2, 0, 1) ++ rleDefPayload(1, 1, 1)
    val present = plainInt32(Seq(10, 20, 30))
    val nullable = decompressAndSplit(
      buildV1(present, Some(defP), None, Uncompressed),
      Uncompressed, parseAttributes(v1Attrs(5, maxDef = 1)))
    assert(nullable.numElements == 3)
    assert(nullable.valueBytes.sameElements(present))

    // with repetition levels present, bit-packed def levels
    val defBp = bitPackedDefPayload(Seq(1, 0, 1, 0, 1, 0, 1, 0), 1)
    val repP = rleDefPayload(8, 0, 1)
    val mixed = decompressAndSplit(
      buildV1(plainInt32(Seq(1, 2, 3, 4)), Some(defBp), Some(repP), Snappy),
      Snappy, parseAttributes(v1Attrs(8, maxDef = 1, maxRep = 1)))
    assert(mixed.numElements == 4)
  }

  test("decompressAndSplit: V1 invalid definition payload rejected") {
    val bad = buildV1(plainInt32(Seq(1)), Some(Array[Byte](0x80.toByte)), None, Uncompressed)
    intercept[GraftInvalidInputException] {
      decompressAndSplit(bad, Uncompressed, parseAttributes(v1Attrs(1, maxDef = 1)))
    }
  }

  test("compressAndJoin inverts decompressAndSplit for every page type") {
    // V1 snappy, nullable
    val defP = rleDefPayload(4, 1, 1)
    val v1 = buildV1(plainInt64(Seq(1L, 2L, 3L, 4L)), Some(defP), None, Snappy)
    val a1 = parseAttributes(v1Attrs(4, maxDef = 1))
    val s1 = decompressAndSplit(v1, Snappy, a1)
    assert(compressAndJoin(s1.levelBytes, s1.valueBytes, Snappy, a1).sameElements(v1))

    // V2 uncompressed and compressed
    val values = plainInt32(Seq(5, 6))
    val levels = Array.fill[Byte](4)(0xCC.toByte)
    val a2u = parseAttributes(v2Attrs(2, 4, 0, 0, isCompressed = false))
    val s2u = decompressAndSplit(levels ++ values, Uncompressed, a2u)
    assert(compressAndJoin(s2u.levelBytes, s2u.valueBytes, Uncompressed, a2u)
      .sameElements(levels ++ values))
    val a2c = parseAttributes(v2Attrs(2, 4, 0, 0, isCompressed = true))
    val page2c = levels ++ PageCodec.compress(values, Snappy)
    val s2c = decompressAndSplit(page2c, Snappy, a2c)
    assert(compressAndJoin(s2c.levelBytes, s2c.valueBytes, Snappy, a2c)
      .sameElements(page2c))

    // dictionary
    val ad = parseAttributes(dictAttrs(2))
    val dict = PageCodec.compress(values, Snappy)
    val sd = decompressAndSplit(dict, Snappy, ad)
    assert(sd.levelBytes.isEmpty)
    assert(compressAndJoin(sd.levelBytes, sd.valueBytes, Snappy, ad).sameElements(dict))
  }

  test("compressAndJoin: level bytes not matching attributes rejected") {
    val attrs = parseAttributes(v2Attrs(2, 4, 0, 0, isCompressed = false))
    intercept[GraftInvalidInputException] {
      compressAndJoin(new Array[Byte](3), plainInt32(Seq(1, 2)), Uncompressed, attrs)
    }
  }

  // ------------------------------------------------ typed value splitting --

  test("splitValueBytes round trips fixed-width types") {
    for ((pt, tl, width) <- Seq(("INT32", None, 4), ("FLOAT", None, 4),
        ("INT64", None, 8), ("DOUBLE", None, 8), ("INT96", None, 12),
        ("FIXED_LEN_BYTE_ARRAY", Some(5), 5))) {
      val buf = Array.tabulate[Byte](width * 3)(i => (i * 7).toByte)
      val parts = splitValueBytes(buf, 3, pt, tl, "PLAIN")
      assert(parts.size == 3 && parts.forall(_.length == width))
      assert(joinValueBytes(parts, pt, tl).sameElements(buf))
    }
  }

  test("splitValueBytes round trips BYTE_ARRAY incl. empty elements") {
    val elems = Seq("alpha".getBytes, Array.emptyByteArray, "xyz".getBytes)
    val buf = plainByteArray(elems)
    val parts = splitValueBytes(buf, 3, "BYTE_ARRAY", None, "PLAIN")
    assert(parts.map(_.toSeq) == elems.map(_.toSeq))
    assert(joinValueBytes(parts, "BYTE_ARRAY", None).sameElements(buf))
    // empty buffers are fine for zero elements
    assert(splitValueBytes(Array.emptyByteArray, 0, "INT32", None, "PLAIN").isEmpty)
    assert(splitValueBytes(Array.emptyByteArray, 0, "BYTE_ARRAY", None, "PLAIN").isEmpty)
  }

  test("splitValueBytes: unsupported encodings and BOOLEAN are feature gaps") {
    intercept[GraftUnsupportedException] {
      splitValueBytes(new Array[Byte](4), 1, "INT32", None, "RLE_DICTIONARY")
    }
    intercept[GraftUnsupportedException] {
      splitValueBytes(new Array[Byte](4), 1, "INT32", None, "DELTA_BINARY_PACKED")
    }
    intercept[GraftUnsupportedException] {
      splitValueBytes(new Array[Byte](4), 4, "BOOLEAN", None, "PLAIN")
    }
  }

  test("splitValueBytes: malformed inputs rejected") {
    // wrong total size for fixed width
    intercept[GraftInvalidInputException] {
      splitValueBytes(new Array[Byte](10), 3, "INT32", None, "PLAIN")
    }
    // FLBA length missing / non-positive
    intercept[GraftInvalidInputException] {
      splitValueBytes(new Array[Byte](10), 2, "FIXED_LEN_BYTE_ARRAY", None, "PLAIN")
    }
    intercept[GraftInvalidInputException] {
      splitValueBytes(new Array[Byte](10), 2, "FIXED_LEN_BYTE_ARRAY", Some(0), "PLAIN")
    }
    intercept[GraftInvalidInputException] {
      splitValueBytes(new Array[Byte](10), 2, "FIXED_LEN_BYTE_ARRAY", Some(-4), "PLAIN")
    }
    // BYTE_ARRAY: truncated prefix, oversize element, trailing bytes
    intercept[GraftInvalidInputException] {
      splitValueBytes(Array[Byte](1, 0), 1, "BYTE_ARRAY", None, "PLAIN")
    }
    intercept[GraftInvalidInputException] {
      splitValueBytes(u32le(99) ++ new Array[Byte](3), 1, "BYTE_ARRAY", None, "PLAIN")
    }
    intercept[GraftInvalidInputException] {
      splitValueBytes(plainByteArray(Seq("ab".getBytes)) ++ Array[Byte](0), 1,
        "BYTE_ARRAY", None, "PLAIN")
    }
    // unknown physical type
    intercept[GraftInvalidInputException] {
      splitValueBytes(new Array[Byte](4), 1, "UINT32", None, "PLAIN")
    }
  }

  // ------------------------------------- sequencer + agent page entry point --

  private def pageAgent(physicalType: String, typeLength: Option[Int] = None,
      compression: String = Uncompressed, codec: String = CryptoCodec.Xor) =
    LocalProtectionAgent.initPage("key-1", "col", physicalType, typeLength,
      compression, codec, userId = "u1", appContext = "app")

  private val roundTripGrid = Seq(
    // (name, physicalType, typeLength, valueBytes, presentCount)
    ("INT32", "INT32", None, plainInt32(Seq(1, -2, 3)), 3),
    ("INT64", "INT64", None, plainInt64(Seq(1L, Long.MinValue, 42L)), 3),
    ("DOUBLE", "DOUBLE", None,
      { val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putDouble(3.14); b.putDouble(-0.5); b.array() }, 2),
    ("BYTE_ARRAY", "BYTE_ARRAY", None,
      plainByteArray(Seq("hello".getBytes, "".getBytes, "worlds".getBytes)), 3),
    ("FLBA", "FIXED_LEN_BYTE_ARRAY", Some(4),
      Array.tabulate[Byte](12)(_.toByte), 3))

  test("page round trip: DATA_PAGE_V1 required × datatype grid, XOR and AES") {
    for ((name, pt, tl, vals, n) <- roundTripGrid;
         codec <- Seq(CryptoCodec.Xor, CryptoCodec.AesDet)) {
      val agent = pageAgent(pt, tl, Uncompressed, codec)
      val page = buildV1(vals, None, None, Uncompressed)
      val attrs = v1Attrs(n)
      val enc = agent.encryptPage(page, attrs)
      assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerValue,
        s"$name/$codec should take the per-value path")
      assert(enc.metadata(ProtectionPipeline.KeyVersion) == ProtectionPipeline.AgentVersion)
      assert(!enc.payload.sameElements(page), s"$name/$codec ciphertext == plaintext")
      assert(agent.decryptPage(enc, attrs).sameElements(page), s"$name/$codec")
    }
  }

  test("page round trip: nullable DATA_PAGE_V1 with RLE def levels, snappy") {
    // 5 logical values, 3 present; whole V1 page snappy-compressed
    val defP = rleDefPayload(2, 1, 1) ++ rleDefPayload(2, 0, 1) ++ rleDefPayload(1, 1, 1)
    val page = buildV1(plainInt32(Seq(10, 20, 30)), Some(defP), None, Snappy)
    val attrs = v1Attrs(5, maxDef = 1)
    val agent = pageAgent("INT32", compression = Snappy)
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerValue)
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("page round trip: DATA_PAGE_V2 with compressed value section and nulls") {
    val levels = Array.fill[Byte](6)(0xCC.toByte)
    val values = plainByteArray(Seq("aa".getBytes, "bb".getBytes))
    val page = levels ++ PageCodec.compress(values, Snappy)
    val attrs = v2Attrs(3, 2, 4, 1, isCompressed = true)
    val agent = pageAgent("BYTE_ARRAY", compression = Snappy)
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerValue)
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("page round trip: DICTIONARY_PAGE uses the dict-page mode key") {
    val values = plainByteArray(Seq("red".getBytes, "green".getBytes, "blue".getBytes))
    val page = PageCodec.compress(values, Snappy)
    val attrs = dictAttrs(3)
    val agent = pageAgent("BYTE_ARRAY", compression = Snappy)
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDictionaryPage) == PageSequencer.ModePerValue)
    assert(!enc.metadata.contains(PageSequencer.ModeKeyDataPage))
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("per-value page encryption is deterministic with deterministic codecs") {
    val page = buildV1(plainInt32(Seq(1, 2, 3)), None, None, Uncompressed)
    for (codec <- Seq(CryptoCodec.Xor, CryptoCodec.AesDet)) {
      val agent = pageAgent("INT32", codec = codec)
      val a = agent.encryptPage(page, v1Attrs(3))
      val b = agent.encryptPage(page, v1Attrs(3))
      assert(a.payload.sameElements(b.payload), codec)
    }
  }

  test("fallback: BOOLEAN pages go per-block and round trip") {
    val page = buildV1(Array[Byte](0x05), None, None, Uncompressed) // bit-packed bools
    val attrs = v1Attrs(8)
    val agent = pageAgent("BOOLEAN")
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerBlock)
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("fallback: RLE_DICTIONARY-encoded pages go per-block and round trip") {
    val page = Array[Byte](2, 1, 0, 2, 1) // dictionary indices, opaque
    val attrs = v1Attrs(5, encoding = "RLE_DICTIONARY")
    val agent = pageAgent("INT32")
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerBlock)
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("fallback: unsupported compression goes per-block and round trips") {
    val page = Array.tabulate[Byte](24)(i => (i * 3).toByte) // opaque "GZIP" page
    val attrs = v1Attrs(3)
    val agent = pageAgent("INT32", compression = "GZIP")
    val enc = agent.encryptPage(page, attrs)
    assert(enc.metadata(PageSequencer.ModeKeyDataPage) == PageSequencer.ModePerBlock)
    assert(agent.decryptPage(enc, attrs).sameElements(page))
  }

  test("no fallback for supported shapes: a genuine decode bug re-throws") {
    // Supported compression/encoding/datatype but V1 payload whose value
    // section disagrees with numElements: InvalidInput, NOT per-block.
    val page = buildV1(plainInt32(Seq(1, 2)), None, None, Uncompressed)
    val agent = pageAgent("INT32")
    intercept[GraftInvalidInputException] {
      agent.encryptPage(page, v1Attrs(3)) // claims 3 values, page holds 2
    }
  }

  test("decrypt: version and mode metadata are enforced") {
    val page = buildV1(plainInt32(Seq(1, 2, 3)), None, None, Uncompressed)
    val attrs = v1Attrs(3)
    val agent = pageAgent("INT32")
    val enc = agent.encryptPage(page, attrs)
    // missing version
    intercept[GraftInvalidInputException] {
      agent.decryptPage(EncryptedBatch(enc.payload,
        enc.metadata - ProtectionPipeline.KeyVersion), attrs)
    }
    // wrong version prefix
    intercept[GraftInvalidInputException] {
      agent.decryptPage(EncryptedBatch(enc.payload,
        enc.metadata + (ProtectionPipeline.KeyVersion -> "v9.99-other")), attrs)
    }
    // missing mode
    intercept[GraftInvalidInputException] {
      agent.decryptPage(EncryptedBatch(enc.payload,
        enc.metadata - PageSequencer.ModeKeyDataPage), attrs)
    }
    // invalid mode value
    intercept[GraftInvalidInputException] {
      agent.decryptPage(EncryptedBatch(enc.payload,
        enc.metadata + (PageSequencer.ModeKeyDataPage -> "per_page")), attrs)
    }
  }

  test("empty payloads and malformed attributes are rejected up front") {
    val agent = pageAgent("INT32")
    intercept[GraftInvalidInputException] {
      agent.encryptPage(Array.emptyByteArray, v1Attrs(0))
    }
    intercept[GraftInvalidInputException] {
      agent.decryptPage(EncryptedBatch(Array.emptyByteArray,
        Map(ProtectionPipeline.KeyVersion -> ProtectionPipeline.AgentVersion)), v1Attrs(0))
    }
    intercept[GraftInvalidInputException] {
      agent.encryptPage(Array[Byte](1), Map("page_type" -> "DATA_PAGE_V1"))
    }
    // FLBA without a positive length is a parameter-validation failure
    intercept[GraftInvalidInputException] {
      pageAgent("FIXED_LEN_BYTE_ARRAY").encryptPage(Array[Byte](1, 2), v1Attrs(1))
    }
    // unknown physical type rejected at init
    intercept[GraftInvalidInputException] {
      LocalProtectionAgent.initPage("key-1", "col", "UINT8")
    }
  }

  test("page ciphertext shares the cell path's value-list wire format") {
    // The per-value section of a page is WireFormat.encryptValueList output:
    // decrypting it directly with WireFormat yields the typed elements.
    val ints = Seq(11, 22, 33)
    val page = buildV1(plainInt32(ints), None, None, Uncompressed)
    val agent = pageAgent("INT32")
    val enc = agent.encryptPage(page, v1Attrs(3))
    val (_, encValues) = WireFormat.splitWithLengthPrefix(enc.payload)
    val codec = CryptoCodec(CryptoCodec.Xor, ProtectionContext("key-1", "col", "u1", "app"))
    val elems = WireFormat.decryptValueList(codec, encValues)
    assert(elems.map(e =>
      ByteBuffer.wrap(e).order(ByteOrder.LITTLE_ENDIAN).getInt) == ints)
  }
}
