package graft

import org.apache.spark.sql.functions._

import graft.queries.GraftSession

/** Dev-only: sign-LSH bucket-size distribution for an embeddings table —
  * the skew diagnostic behind the s07 10× candidate-mass blowup (bucket
  * sizes drive Σm²; correlated dimensions can concentrate sign buckets
  * far beyond the uniform n/2^planes estimate).
  *
  * Usage: `sbt 'runMain graft.BucketHist <dir> <planes> [tables]'`
  */
object BucketHist {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val planes = args.lift(1).map(_.toInt).getOrElse(10)
    val tables = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    (0 until tables).foreach { t =>
      val h = emb.select(graft.functions.VectorFunctions
          .hyperplane_sig(col("embedding"), t * planes, planes).as("b"))
        .groupBy("b").count()
      val stats = h.agg(count(lit(1)).as("cells"), max("count").as("biggest"),
          sum(col("count") * col("count")).as("pair_mass")).head()
      println(f"table $t%2d: n=$n cells=${stats.getLong(0)}%5d " +
        f"biggest=${stats.getLong(1)}%8d pair_mass=${stats.getLong(2)}%.3e")
    }
    spark.stop()
  }
}
