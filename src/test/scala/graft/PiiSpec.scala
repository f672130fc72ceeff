package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.CryptoCodec
import graft.functions.protect
import graft.ops.Pii

/** PII detectors/redaction on hand-built fixtures, plus the selective
  * protection flow: extract PII spans → encrypt them with the engine's own
  * value codec → decrypt restores the original spans.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "mail alice.smith+x@corp.example.org now"),
    (2L, "call 415-555-1234 or 415.555.9999"),
    (3L, "host 192.168.0.1 ssn 123-45-6789"),
    (4L, "nothing to see here 12345"),
    (5L, "two mails a@b.io c@d.co one phone 555 123 4567"))
    .toDF("id", "text")

  test("detectors count each class, has_pii flags") {
    val got = fixture.select(Seq(col("id")) ++ Pii.detect(col("text")): _*)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 0L, 0L, 1L),
      (2L, 0L, 2L, 0L, 0L, 1L),
      (3L, 0L, 0L, 1L, 1L, 1L),
      (4L, 0L, 0L, 0L, 0L, 0L),
      (5L, 2L, 1L, 0L, 0L, 1L)))
  }

  test("redaction replaces every hit with its class token") {
    val got = fixture.select(col("id"), Pii.redact(col("text")).as("r"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "call <PHONE> or <PHONE>")
    assert(got(2) == "host <IP> ssn <SSN>")
    assert(got(3) == "nothing to see here 12345")
    assert(got(4) == "two mails <EMAIL> <EMAIL> one phone <PHONE>")
  }

  test("ssn is redacted as <SSN>, not mistaken for a phone") {
    val r = Seq((1L, "123-45-6789 and 123-456-7890")).toDF("id", "text")
      .select(Pii.redact(col("text"))).head().getString(0)
    assert(r == "<SSN> and <PHONE>")
  }

  test("selective protection: extract spans, encrypt, decrypt restores") {
    val spans = fixture
      .select(col("id"), explode(Pii.extractAll(col("text"), Pii.EmailRe))
        .as("pii"))
      .withColumn("ct",
        protect.encrypt_value(col("pii"), "pii-key", CryptoCodec.AesDet,
          "pii", true))
      .withColumn("back",
        protect.decrypt_value(col("ct"), "pii-key", StringType,
          CryptoCodec.AesDet, "pii", true))
    val rows = spans.collect()
    assert(rows.length == 3) // 3 emails in the fixture
    assert(rows.forall(r => r.getAs[String]("back") == r.getAs[String]("pii")))
    // the plaintext span must not survive into the ciphertext (individual
    // bytes like 0x40 may of course occur in random ciphertext)
    assert(rows.forall(r => !new String(r.getAs[Array[Byte]]("ct"), "ISO-8859-1")
      .contains(r.getAs[String]("pii"))))
  }
}
