package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All queries take the scale-factor directory as a runtime parameter so the
  * same plan runs unchanged from sf0.001 to a 100 TB lake: the parquet scans
  * are lazy, Catalyst pushes filters/projections into them, and nothing here
  * materializes on the driver.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two `ts` physical types across driver
    * generations; normalize both to a session-TZ TimestampType column
    * (microsecond precision — Spark's native unit) so every downstream
    * query sees one schema:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright, so the
    *    legacy conf reads the nano epoch as a LONG and we truncate to
    *    micros here. Integer division — `/` would promote the nano epoch
    *    to double, whose 2^53 mantissa cannot hold ~1.7e18 ns exactly
    *    (up to ±128 ns drift, enough to flip a micro/second boundary vs.
    *    the oracle's exact trunc).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    TIMESTAMP_NTZ; cast to TimestampType keeps the wall-clock value
    *    under the engine's fixed UTC session timezone — the same instants
    *    the nanos path produced, and what DuckDB's naive-timestamp oracle
    *    reads.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ (or a future DATE-like): wall-clock cast
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def region(s: SparkSession, dir: String): DataFrame     = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = load(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame     = eventsRaw(s, dir)
  def documents(s: SparkSession, dir: String): DataFrame  = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
