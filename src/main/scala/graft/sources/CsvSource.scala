package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion with the reference's exact semantics (SURVEY §2.1 S1):
  * externally-declared schema (never inferSchema — reference hard-codes
  * the column list), `'?'` → null (`na_values='?'`), and leading-space
  * stripping (the `sep=', '` regex separator at naive-suppresion.py:14 is
  * comma + skipinitialspace in disguise).
  *
  * Scale: a declared schema keeps the read single-pass (inference would
  * scan twice); CSV scans parallelize per file split. Column pruning
  * reaches the parser (Spark's CSV reader parses only projected columns);
  * prefer converting to parquet at the lake boundary regardless.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("nullValue", "?")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)

  /** Write with the matching conventions so a round-trip is lossless
    * (S5 — the sink the reference lacks). */
  def write(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write
      .mode("overwrite")
      .option("header", header.toString)
      .option("nullValue", "?")
      .csv(path)

  /** Fetch an HTTP(S) URL to a local file and return that path — the
    * reference reads its census CSV straight from the UCI URL
    * (naive-suppresion.py:13-14); Spark scans filesystem/DFS paths, so
    * the engine contract is fetch-to-local (or to DFS) then [[read]].
    * Streams to a temp file and renames, so a partial download never
    * masquerades as the dataset; any HTTP error or timeout raises. */
  def fetch(url: String, dest: String,
            connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): String = {
    require(url.startsWith("http://") || url.startsWith("https://"),
      s"CsvSource.fetch: expected an http(s) URL, got '$url'")
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setInstanceFollowRedirects(true)
    val code = conn.getResponseCode
    if (code / 100 != 2)
      throw new java.io.IOException(s"CsvSource.fetch: HTTP $code for $url")
    val destPath = java.nio.file.Paths.get(dest)
    Option(destPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Files.createTempFile(
      Option(destPath.getParent).getOrElse(java.nio.file.Paths.get(".")),
      ".fetch-", ".tmp")
    val in = conn.getInputStream
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally { in.close(); conn.disconnect() }
    java.nio.file.Files.move(tmp, destPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest
  }
}
