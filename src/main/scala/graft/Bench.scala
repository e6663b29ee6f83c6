package graft
import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success, Try}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session once so the first timed query doesn't pay
    // codegen/classloading startup.
    spark.read.parquet(s"$sfDir/orders.parquet").count()
    // Each query runs `reps` times and reports the MEDIAN, so a one-off
    // JIT/GC/IO hiccup can't masquerade as a regression between rounds. A
    // query that throws is listed in `failed` and contributes no timing —
    // timing the exception path would report a crash as a fast success.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // Execute the query's own physical plan (all output columns
        // materialized). A bare .count() would let Catalyst prune every
        // per-row projection and time an empty scan instead.
        Try(fn(spark, sfDir).queryExecution.toRdd.count()) match {
          case Success(_) => Some((System.nanoTime() - t0) / 1e9)
          case Failure(e) =>
            System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
            None
        }
      }
      val ok = runs.flatten.sorted
      name -> (if (ok.size == reps) Some(ok(ok.size / 2)) else None)
    }
    val medians = timed.collect { case (k, Some(v)) => k -> v }
    val failed = timed.collect { case (k, None) => k }
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
