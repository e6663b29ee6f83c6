package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lake-layout behaviors that matter at 100 TB: hive-partitioned writes
  * prune at the source, bucketed tables join without an exchange.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Seq(
    (1L, 10L, 100.0, "O"), (2L, 11L, 200.0, "F"), (3L, 12L, 300.0, "O"),
    (4L, 10L, 400.0, "P"), (5L, 13L, 500.0, "F"), (6L, 11L, 600.0, "O")
  ).toDF("okey", "ckey", "price", "status")

  test("partitioned write + filtered read prunes to matching partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    orders.write.mode("overwrite").partitionBy("status").parquet(dir)
    val filtered = spark.read.parquet(dir).filter($"status" === "F")
    val scan = filtered.queryExecution.executedPlan.toString
    // partition filter reaches the scan, and only the F partition is read
    assert(scan.contains("PartitionFilters: [isnotnull(status"), scan)
    assert(filtered.count() == 2)
    val allParts = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("status="))
    assert(allParts.toSet == Set("status=O", "status=F", "status=P"))
  }

  test("bucketed tables join without a shuffle exchange") {
    // DROP TABLE clears the (per-JVM, in-memory) catalog but not a stale
    // warehouse dir left by a previous test JVM — remove both.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    orders.write.bucketBy(4, "ckey").sortBy("ckey").saveAsTable("b_orders")
    Seq((10L, "alice"), (11L, "bob"), (12L, "carol"), (13L, "dave"))
      .toDF("ckey", "name")
      .write.bucketBy(4, "ckey").sortBy("ckey").saveAsTable("b_customer")
    val joined = spark.table("b_orders").join(spark.table("b_customer"), "ckey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 6)
  }
}
