package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual remedy when AQE's skew-join
  * split isn't enough (e.g. one key holding >10% of a 100 TB fact table).
  *
  * The skewed (large) side gets a deterministic salt derived from a
  * fingerprint of the whole row (`xxhash64(struct(*)) % factor`) — spreading
  * one hot key over `factor` reducers; the small side is replicated
  * `factor`× with every salt value so every (key, salt) partition finds its
  * match. Row-hash salting keeps the operator deterministic (no `rand()`),
  * so results stay reproducible and oracle-checkable.
  *
  * Cost model: duplicates the SMALL side `factor`× — choose the side and
  * factor accordingly; output equals the plain inner join exactly.
  */
object SkewJoin {
  def saltedInner(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(factor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(largeKey) === replicated(smallKey))
      .drop("_salt")
  }
}
