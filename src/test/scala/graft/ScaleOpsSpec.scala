package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.queries.GraftTables

/** Scale-discipline operators: salted skew join, bucketed co-located join
  * (no shuffle), approximate distinct within error bounds.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // heavy skew: 90% of rows share key 1
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong else 1L, i))
      .toDF("k", "v")
    val small = (1L to 500L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val plain = large.join(small, col("k") === col("k2"))
      .select("k", "v", "name").orderBy("v").collect().toSeq
    val salted = SkewJoin.saltedInner(large, small, "k", "k2", factor = 8)
      .select("k", "v", "name").orderBy("v").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables across JVMs but their files
    // remain — clear the managed locations or saveAsTable refuses
    Seq("b_orders", "b_customer").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    GraftTables.read(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    GraftTables.read(spark, dir, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("b_customer")
    // disable broadcast so the co-located (bucketed) path is what's planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        GraftTables.read(spark, dir, "orders").join(
          GraftTables.read(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q49 registry query: bucketed merge join plans exchange-free") {
    // run the registry entry (writes the q49_* bucketed tables), then pin
    // that the hinted merge join over them has no shuffle exchange under it
    val q49 = SparkEntry.queries("q49_bucketed_join")
    assert(q49(spark, "/root/testdata/sf0.001").count() > 0)
    val joined = spark.table("q49_orders").hint("merge")
      .join(spark.table("q49_customer"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed q49 join must not shuffle:\n$plan")
  }

  test("partitioned write enables partition pruning at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    GraftTables.read(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").nonEmpty,
      s"expected non-empty PartitionFilters in:\n$plan")
    val expect = GraftTables.read(spark, "/root/testdata/sf0.001", "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expect && expect > 0)
  }

  test("parquet compression codecs round trip (snappy/gzip/zstd)") {
    val base = GraftTables.read(spark, "/root/testdata/sf0.001", "nation")
    Seq("snappy", "gzip", "zstd").foreach { codec =>
      val p = java.nio.file.Files.createTempDirectory(s"graft-$codec").toString + "/t"
      base.write.mode("overwrite").option("compression", codec).parquet(p)
      assert(spark.read.parquet(p).orderBy("n_nationkey").collect().toSeq ==
        base.orderBy("n_nationkey").collect().toSeq, s"codec $codec")
    }
  }

  test("seeded sample is deterministic and roughly sized") {
    val li = GraftTables.read(spark, "/root/testdata/sf0.001", "lineitem")
    val a = li.sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    val b = li.sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    assert(a == b, "same seed must give identical samples")
    val n = a.getLong(0).toDouble
    assert(n > li.count() * 0.05 && n < li.count() * 0.15)
  }

  test("approx_count_distinct within configured error of exact") {
    val li = GraftTables.read(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).collect().head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx too far from exact $exact")
  }
}
