// Dump `.explain("formatted")` for named queries to plans/<round>/<q>_<tag>.txt
// -- the optimization-round evidence trail (guide s.1.1/s.7.2: read the plan,
// count Exchanges, check join strategies and PushedFilters before and after
// each change). Construction-time jobs (kCore's peel loop, bfsHops' frontier
// probes) run eagerly here; that's fine -- we want the plan of the RESULT.
// Usage:
//   SPARK_GRAFT_PLAN_QUERIES=q125_pagerank,q330_hits \
//   SPARK_GRAFT_PLAN_TAG=before SPARK_GRAFT_PLAN_DIR=plans/r16 \
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -i tools/dump_plans.scala
import java.nio.file.{Files, Paths}

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r16")
val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
val names = sys.env("SPARK_GRAFT_PLAN_QUERIES").split(",").map(_.trim).filter(_.nonEmpty)
Files.createDirectories(Paths.get(outDir))
names.foreach { name =>
  val fn = graft.SparkEntry.queries(name)
  val t0 = System.nanoTime()
  val df = fn(spark, sfDir)
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  val dt = (System.nanoTime() - t0) / 1e9
  Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
    (plan + f"%n// build+explain wall: $dt%.2f s%n").getBytes("UTF-8"))
  graft.QueryCleanup.drain(name)
  println(f"[plans] $name -> $outDir/${name}_$tag.txt (build $dt%.2f s)")
}
System.exit(0)
