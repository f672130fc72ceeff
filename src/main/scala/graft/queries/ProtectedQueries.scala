package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CryptoCodec
import graft.functions.protect
import graft.pipeline.{ColumnPolicy, PerBlock, PerValue, ProtectionPipeline}

/** Encrypt → (query) → decrypt sandwiches: the engine's protection operators
  * (SURVEY.md §2.3) proven through the relational oracle — the round trip must
  * be exact for the plaintext oracle to hash-match.
  */
object ProtectedQueries {
  import RelationalQueries.Q

  private def rd(s: SparkSession, dir: String, n: String) =
    GraftTables.read(s, dir, n)
  import QueryUtil.{cents, centsSql}

  val registry: Vector[(String, Q, Option[String])] = Vector(

    // Full pipeline round trip: per-value XOR on a string column + per-value
    // deterministic AES on a double column; metadata-driven decrypt.
    ("q21_protected_roundtrip", (s: SparkSession, dir: String) => {
      val c = rd(s, dir, "customer")
      val enc = ProtectionPipeline.encrypt(c, Seq(
        ColumnPolicy("c_name", keyId = "key-name", PerValue, CryptoCodec.Xor),
        ColumnPolicy("c_acctbal", keyId = "key-bal", PerValue, CryptoCodec.AesDet)))
      val dec = ProtectionPipeline.decrypt(enc)
      ProtectionPipeline.assertSchemaRestored(c.schema, dec.schema)
      dec.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("c_acctbal"))).as("bal_cents"),
          min(col("c_name")).as("min_name"),
          max(col("c_name")).as("max_name"))
        .orderBy("c_mktsegment")
    }, Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n,
        CAST(SUM(${centsSql("c_acctbal")}) AS BIGINT) AS bal_cents,
        MIN(c_name) AS min_name, MAX(c_name) AS max_name
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Deterministic per-value encryption preserves equality → join runs ON
    // CIPHERTEXT; oracle joins plaintext. (SURVEY.md §7.4 determinism note.)
    ("q22_ciphertext_equijoin", (s: SparkSession, dir: String) => {
      val o = rd(s, dir, "orders").withColumn("ck",
        protect.encrypt_value(col("o_custkey"), "join-key", CryptoCodec.Xor, "shared"))
      val c = rd(s, dir, "customer").withColumn("ck",
        protect.encrypt_value(col("c_custkey"), "join-key", CryptoCodec.Xor, "shared"))
      o.join(c, "ck")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("c_mktsegment")
    }, Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Raw per-block encryption (reference EncryptBlock parity, frameless)
    // round-tripped on an opaque payload column, then parsed.
    ("q23_block_roundtrip", (s: SparkSession, dir: String) => {
      rd(s, dir, "events")
        .withColumn("blob",
          protect.encrypt_block(col("props").cast("binary"), "blk-key",
            CryptoCodec.AesDet, "props"))
        .withColumn("props2",
          protect.decrypt_block(col("blob"), "blk-key", CryptoCodec.AesDet, "props")
            .cast("string"))
        .withColumn("k", regexp_extract(col("props2"), "(\\d+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type,
        CAST(SUM(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // Aggregation entirely ON CIPHERTEXT: deterministic encryption lets
    // groupBy run on the encrypted key; only the small aggregated result is
    // decrypted — at 100 TB the plaintext never materializes in the shuffle.
    ("q41_ciphertext_groupby", (s: SparkSession, dir: String) => {
      val o = rd(s, dir, "orders").withColumn("st_enc",
        protect.encrypt_value(col("o_orderstatus"), "grp-key", CryptoCodec.AesDet, "st"))
      o.groupBy("st_enc")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .withColumn("o_orderstatus",
          protect.decrypt_value(col("st_enc"), "grp-key",
            org.apache.spark.sql.types.StringType, CryptoCodec.AesDet, "st"))
        .select("o_orderstatus", "n", "total_cents")
        .orderBy("o_orderstatus")
    }, Some(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // DecimalType protection (reference FLBA/decimal path, SURVEY.md §1.2):
    // per-value AES on DECIMAL(12,2), decrypted, exact decimal aggregation.
    ("q24_protected_decimal", (s: SparkSession, dir: String) => {
      val o = rd(s, dir, "orders")
        .withColumn("o_totalprice", col("o_totalprice").cast("decimal(12,2)"))
      val enc = ProtectionPipeline.encrypt(o,
        Seq(ColumnPolicy("o_totalprice", "key-dec", PerValue, CryptoCodec.AesDet)))
      val dec = ProtectionPipeline.decrypt(enc)
      dec.groupBy("o_orderstatus")
        .agg((sum(col("o_totalprice")) * 100).cast("long").as("total_cents"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Per-block fallback on BOOLEAN (BooleanTypeUsesPerBlockEncryption) +
    // per-value on timestamp-derived long — exercised via filter after decrypt.
    ("q25_protected_mixed_types", (s: SparkSession, dir: String) => {
      val li = rd(s, dir, "lineitem")
        .withColumn("is_return", col("l_returnflag") === "R")
        .withColumn("ship_micros", col("l_shipdate"))
      val enc = ProtectionPipeline.encrypt(li, Seq(
        ColumnPolicy("is_return", "key-b", PerValue, CryptoCodec.Xor), // → falls back per_block
        ColumnPolicy("ship_micros", "key-t", PerValue, CryptoCodec.Xor),
        ColumnPolicy("l_linenumber", "key-i", PerValue, CryptoCodec.AesDet)))
      val dec = ProtectionPipeline.decrypt(enc)
      dec.filter(col("is_return") && year(col("ship_micros")) >= 1997)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy("l_linestatus")
    }, Some("""
      SELECT l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) >= 1997
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Page-mode protection run DISTRIBUTED (T3–T7 + the page sequencer,
    // SURVEY.md §2.2): each bucket of documents becomes one raw
    // DATA_PAGE_V1 payload in the reference's PLAIN BYTE_ARRAY layout
    // (u32-LE length-prefixed elements, performance_test.cpp:133-225),
    // encrypted per-value and decrypted back ON EXECUTORS. The oracle
    // recomputes the page structure (page count, element count, exact
    // payload bytes) from the raw table and pins the mode and round-trip
    // bits — any byte-level regression in the page machinery flips them.
    ("p01_page_roundtrip", (s: SparkSession, dir: String) => {
      import s.implicits._
      rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .groupByKey(_._1 % 64)
        .mapGroups { (bucket, rows) =>
          val texts = rows.toArray.sortBy(_._1)
            .map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val bb = java.nio.ByteBuffer
            .allocate(texts.iterator.map(_.length + 4).sum)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          texts.foreach { t => bb.putInt(t.length); bb.put(t) }
          val payload = bb.array()
          val attrs = Map(
            "page_type" -> "DATA_PAGE_V1",
            "data_page_num_values" -> texts.length.toString,
            "data_page_max_definition_level" -> "0",
            "data_page_max_repetition_level" -> "0",
            "page_v1_definition_level_encoding" -> "RLE",
            "page_v1_repetition_level_encoding" -> "RLE",
            "page_encoding" -> "PLAIN")
          val agent = graft.agent.LocalProtectionAgent.initPage(
            "key-page", "text", "BYTE_ARRAY")
          val enc = agent.encryptPage(payload, attrs)
          val dec = agent.decryptPage(enc, attrs)
          val ok = java.util.Arrays.equals(dec, payload) &&
            !java.util.Arrays.equals(enc.payload, payload)
          (bucket, texts.length.toLong, payload.length.toLong,
            enc.metadata(graft.pipeline.PageSequencer.ModeKeyDataPage),
            if (ok) 1L else 0L)
        }
        .toDF("bucket", "n_values", "payload_bytes", "mode", "ok")
        .agg(count(lit(1)).as("n_pages"),
          sum(col("n_values")).as("n_values"),
          sum(col("payload_bytes")).as("payload_bytes"),
          min(col("mode")).as("mode"),
          min(col("ok")).as("roundtrip_ok"))
    }, Some("""
      SELECT CAST(count(DISTINCT doc_id % 64) AS BIGINT) AS n_pages,
        CAST(count(*) AS BIGINT) AS n_values,
        CAST(sum(4 + octet_length(encode(text))) AS BIGINT) AS payload_bytes,
        'per_value' AS mode,
        CAST(1 AS BIGINT) AS roundtrip_ok
      FROM documents""")),

    // Typed/nullable page grid run DISTRIBUTED — the page shapes p01 leaves
    // out (VERDICT r4 #5, `encryption_sequencer_test.cpp` nullable cases):
    //  (a) DATA_PAGE_V1 with max_definition_level=1 and REAL RLE-encoded
    //      definition levels — the T5/T6 ULEB128+RLE decode computes the
    //      present count, and a miscount breaks the round trip;
    //  (b) FIXED_LEN_BYTE_ARRAY(16) page (md5 digests) — the typeLength
    //      path through T8/T13;
    //  (c) DATA_PAGE_V2 with SNAPPY-compressed values and the def-level
    //      section carried opaque, nulls declared via num_nulls.
    // The oracle recomputes page counts, present counts, and exact PLAIN
    // value-section byte sizes from the raw table; `mode` and the
    // round-trip bit pin per-value operation end-to-end.
    ("p02_typed_pages", (s: SparkSession, dir: String) => {
      import s.implicits._
      rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .groupByKey(_._1 % 32)
        .mapGroups { (bucket, rows) =>
          import java.nio.{ByteBuffer, ByteOrder}
          import graft.core.PageCodec
          val docs = rows.toArray.sortBy(_._1)
          // deterministic nulls: every doc_id divisible by 5
          val present = docs.filter(_._1 % 5 != 0)
            .map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          def plain(values: Array[Array[Byte]]): Array[Byte] = {
            val bb = ByteBuffer.allocate(values.iterator.map(_.length + 4).sum)
              .order(ByteOrder.LITTLE_ENDIAN)
            values.foreach { v => bb.putInt(v.length); bb.put(v) }
            bb.array()
          }
          def uleb(n: Int): Array[Byte] = {
            var v = n
            val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
            var continue = true
            while (continue) {
              var b = v & 0x7f
              v >>>= 7
              if (v != 0) b |= 0x80 else continue = false
              out += b.toByte
            }
            out.toArray
          }
          // parquet RLE runs over the 0/1 definition levels, one run per
          // stretch of equal values, u32-LE length-prefixed (V1 layout)
          def rleLevels(levels: Array[Int]): Array[Byte] = {
            val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            levels.foreach { l =>
              if (runs.nonEmpty && runs.last._1 == l) {
                val (v, c) = runs.last; runs(runs.size - 1) = (v, c + 1)
              } else runs += ((l, 1))
            }
            val body = runs.toArray.flatMap { case (v, c) =>
              uleb(c << 1) :+ v.toByte
            }
            ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
              .putInt(body.length).put(body).array()
          }
          def roundTrip(physicalType: String, typeLength: Option[Int],
              compression: String, payload: Array[Byte],
              attrs: Map[String, String]): (Boolean, String) = {
            val agent = graft.agent.LocalProtectionAgent.initPage(
              "key-p02", "text", physicalType, typeLength, compression)
            val enc = agent.encryptPage(payload, attrs)
            val dec = agent.decryptPage(enc, attrs)
            (java.util.Arrays.equals(dec, payload) &&
              !java.util.Arrays.equals(enc.payload, payload),
              enc.metadata(graft.pipeline.PageSequencer.ModeKeyDataPage))
          }

          // (a) nullable V1: RLE def levels + PLAIN values of present rows
          val defLevels = docs.map(d => if (d._1 % 5 != 0) 1 else 0)
          val v1Values = plain(present)
          val v1Page = rleLevels(defLevels) ++ v1Values
          val v1Attrs = Map(
            "page_type" -> "DATA_PAGE_V1",
            "data_page_num_values" -> docs.length.toString,
            "data_page_max_definition_level" -> "1",
            "data_page_max_repetition_level" -> "0",
            "page_v1_definition_level_encoding" -> "RLE",
            "page_v1_repetition_level_encoding" -> "RLE",
            "page_encoding" -> "PLAIN")
          // the engine's own T5/T6 decode computes the present count
          val v1Split = PageCodec.decompressAndSplit(v1Page, "UNCOMPRESSED",
            PageCodec.parseAttributes(v1Attrs))
          val (v1Ok, v1Mode) = roundTrip("BYTE_ARRAY", None, "UNCOMPRESSED",
            v1Page, v1Attrs)

          // (b) FLBA(16): md5 digest per doc, no nulls, fixed 16-byte elements
          val md5 = java.security.MessageDigest.getInstance("MD5")
          val flbaPage = docs.flatMap(d => md5.digest(
            d._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toArray
          val flbaAttrs = Map(
            "page_type" -> "DATA_PAGE_V1",
            "data_page_num_values" -> docs.length.toString,
            "data_page_max_definition_level" -> "0",
            "data_page_max_repetition_level" -> "0",
            "page_v1_definition_level_encoding" -> "RLE",
            "page_v1_repetition_level_encoding" -> "RLE",
            "page_encoding" -> "PLAIN")
          val (flbaOk, flbaMode) = roundTrip("FIXED_LEN_BYTE_ARRAY", Some(16),
            "UNCOMPRESSED", flbaPage, flbaAttrs)

          // (c) V2 + SNAPPY values: presence mask as opaque def-level bytes
          val v2Levels = docs.map(d => (if (d._1 % 5 != 0) 1 else 0).toByte)
          val v2Page = v2Levels ++ org.xerial.snappy.Snappy.compress(v1Values)
          val v2Attrs = Map(
            "page_type" -> "DATA_PAGE_V2",
            "data_page_num_values" -> docs.length.toString,
            "data_page_max_definition_level" -> "1",
            "data_page_max_repetition_level" -> "0",
            "page_v2_definition_levels_byte_length" -> docs.length.toString,
            "page_v2_repetition_levels_byte_length" -> "0",
            "page_v2_num_nulls" -> (docs.length - present.length).toString,
            "page_v2_is_compressed" -> "true",
            "page_encoding" -> "PLAIN")
          val v2Split = PageCodec.decompressAndSplit(v2Page, "SNAPPY",
            PageCodec.parseAttributes(v2Attrs))
          val (v2Ok, v2Mode) = roundTrip("BYTE_ARRAY", None, "SNAPPY",
            v2Page, v2Attrs)

          (bucket,
            v1Split.numElements.toLong, v1Split.valueBytes.length.toLong,
            docs.length.toLong, flbaPage.length.toLong,
            v2Split.numElements.toLong, v2Split.valueBytes.length.toLong,
            Seq(v1Mode, flbaMode, v2Mode).min,
            if (v1Ok && flbaOk && v2Ok) 1L else 0L)
        }
        .toDF("bucket", "v1_present", "v1_value_bytes", "flba_values",
          "flba_bytes", "v2_values", "v2_value_bytes", "mode", "ok")
        .agg(count(lit(1)).as("n_pages"),
          sum(col("v1_present")).as("v1_present"),
          sum(col("v1_value_bytes")).as("v1_value_bytes"),
          sum(col("flba_values")).as("flba_values"),
          sum(col("flba_bytes")).as("flba_bytes"),
          sum(col("v2_values")).as("v2_values"),
          sum(col("v2_value_bytes")).as("v2_value_bytes"),
          min(col("mode")).as("mode"),
          min(col("ok")).as("roundtrip_ok"))
    }, Some("""
      SELECT CAST(count(DISTINCT doc_id % 32) AS BIGINT) AS n_pages,
        CAST(count(*) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT) AS v1_present,
        CAST(sum(4 + octet_length(encode(text))) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT)
          AS v1_value_bytes,
        CAST(count(*) AS BIGINT) AS flba_values,
        CAST(16 * count(*) AS BIGINT) AS flba_bytes,
        CAST(count(*) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT) AS v2_values,
        CAST(sum(4 + octet_length(encode(text))) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT)
          AS v2_value_bytes,
        'per_value' AS mode,
        CAST(1 AS BIGINT) AS roundtrip_ok
      FROM documents"""))
  )
}
