package graft

import org.apache.spark.sql.functions._

import graft.core.CryptoCodec
import graft.functions.protect
import graft.queries.GraftSession

/** End-to-end smoke drive: the flagship entry query + adversarial probes
  * (tampered ciphertext must fail cleanly, null must stay null).
  * Run: sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println("== entry() flagship ==")
    val e = SparkEntry.entry(spark)
    e.show(10, truncate = false)
    require(e.count() > 0, "entry() returned 0 rows")

    println("== probe: encrypt→decrypt round trip with nulls ==")
    val df = Seq(Some("alice"), None, Some("bob"), Some("")).toDF("name")
    val rt = df.withColumn("ct",
        protect.encrypt_value(col("name"), "k1", CryptoCodec.AesDet, "name"))
      .withColumn("back",
        protect.decrypt_value(col("ct"), "k1",
          org.apache.spark.sql.types.StringType, CryptoCodec.AesDet, "name"))
    rt.show(truncate = false)
    val rows = rt.collect()
    require(rows.count(_.isNullAt(2)) == 1, "null did not stay null")
    require(rows.filter(!_.isNullAt(0)).forall(r => r.getString(0) == r.getString(2)),
      "round trip mismatch")

    println("== probe: tampered ciphertext fails cleanly ==")
    val tampered = Seq(Array[Byte](1, 2, 3)).toDF("ct")
      .withColumn("out", protect.decrypt_value(col("ct"), "k1",
        org.apache.spark.sql.types.StringType, CryptoCodec.AesDet, "name"))
    def hasGraftFailure(t: Throwable): Boolean = {
      def chain(x: Throwable): Seq[Throwable] =
        Option(x).toSeq.flatMap(y => y +: chain(y.getCause))
      chain(t).exists(_.isInstanceOf[graft.core.GraftInvalidInputException])
    }
    val failedCleanly =
      try { tampered.collect(); false }
      catch { case t: Throwable =>
        println(s"  got expected failure: ${t.getClass.getSimpleName}")
        hasGraftFailure(t)
      }
    require(failedCleanly, "tampered ciphertext did not fail with GraftInvalidInputException")

    println("== probe: wrong key fails AES-GCM auth ==")
    val wrongKey = Seq("secret").toDF("v")
      .withColumn("ct", protect.encrypt_value(col("v"), "k1", CryptoCodec.AesDet, "c"))
      .withColumn("out", protect.decrypt_value(col("ct"), "WRONG",
        org.apache.spark.sql.types.StringType, CryptoCodec.AesDet, "c"))
    val authFailed =
      try { wrongKey.collect(); false }
      catch { case t: Throwable =>
        println(s"  got expected failure: ${t.getClass.getSimpleName}")
        hasGraftFailure(t)
      }
    require(authFailed, "wrong key decrypt did not fail with GraftInvalidInputException")

    println("SMOKE OK")
    spark.stop()
  }
}
