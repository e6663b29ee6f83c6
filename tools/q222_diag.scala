// One-off diagnostic for the q222_rfm regression (round 13), part 3:
// run scoreMap in a loop so jstack can sample the hot frames.
// Usage: spark-shell -i tools/q222_diag.scala (see part 1 header)
import org.apache.spark.sql.functions._
import graft.ops.Ranking

val o = graft.Tables.orders(spark, "/root/testdata/sf0.1")
val horizon = o.agg(max(to_date(col("o_orderdate"))).as("__hz"))
val cust = o.groupBy(col("o_custkey").as("__c"))
  .agg(max(to_date(col("o_orderdate"))).as("__last"),
    count(lit(1)).as("frequency"),
    sum(col("o_totalprice").cast("decimal(18,2)")).as("__mon"))
  .crossJoin(broadcast(horizon))
  .select(col("__c"), datediff(col("__hz"), col("__last")).cast("long").as("recency_days"),
    col("frequency"), col("__mon"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
cust.count()
val nRow = cust.agg(count(lit(1)).as("__n"))
def scoreMap(metric: String, out: String) = {
  val counts = cust.groupBy(col(metric)).agg(count(lit(1)).as("__t"))
  Ranking.valueCountsBefore(counts, metric, "__t")
    .crossJoin(broadcast(nRow))
    .select(col(metric), (expr("(__before * 5) div __n") + 1).cast("long").as(out))
}
println("[diag] PID " + java.lang.ProcessHandle.current().pid())
val t0 = System.nanoTime()
var i = 0
while (System.nanoTime() - t0 < 60e9) {
  scoreMap("recency_days", "__sr").queryExecution.toRdd.count(); i += 1
}
println(f"[diag] ${i} iterations in 60s")
cust.unpersist()
System.exit(0)
