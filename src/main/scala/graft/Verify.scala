package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Atomic dump publish: stage each query's parquet in a fresh
    // UUID-keyed temp dir, then rename(2) it into place. The old
    // `write.mode("overwrite").parquet(target)` staged INSIDE the target
    // dir, so a retried/concurrent gate run interleaving two writers
    // produced a readable-but-mixed `*.parquet` glob — right schema,
    // plausible rows, wrong hash (the r11–r13 q198 gate signature). With
    // rename the target is always a complete dump from exactly one
    // writer; a racing process merely last-writes a CONSISTENT one.
    def deleteRec(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally s.close()
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // construction AND consumption run inside the query's hook scope;
      // the drain then releases ONLY this query's caches/scratch — never
      // another in-flight query's (the q198 gate-only poisoning channel)
      try QueryCleanup.scoped(name) {
        val tmp = s"$outDir/.stage_${name}_" +
          java.util.UUID.randomUUID.toString.replace("-", "").take(12)
        val df = fn(spark, sfDir)
        // Dump-type gate (round 15): the driver reads dumps with pyarrow,
        // which turns a DECIMAL parquet column into Decimal objects that
        // hash `123.450000` vs the oracle's float64 `123.45` — the q198
        // 4-round red channel. Fail HERE, loudly, before a dump that can
        // never hash-match ships. CalendarInterval never round-trips
        // either; everything else the suite emits is pyarrow-stable.
        import org.apache.spark.sql.types._
        def hasDecimal(dt: DataType): Boolean = dt match {
          case _: DecimalType => true
          case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
          case a: ArrayType   => hasDecimal(a.elementType)
          case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
          case _ => false
        }
        df.schema.fields.foreach { f =>
          require(!hasDecimal(f.dataType),
            s"$name: dump column '${f.name}' is ${f.dataType.sql} — " +
              "DECIMAL dumps read back as pyarrow Decimal objects and " +
              "can never hash-match a float oracle; cast('double') (or " +
              "long for exact integers) at the output projection")
        }
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val target = Paths.get(s"$outDir/$name")
        deleteRec(target)
        Files.move(Paths.get(tmp), target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Provenance.drain(name).foreach(p =>
          Files.writeString(Paths.get(s"$outDir/$name.provenance.json"), p))
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally QueryCleanup.drain(name)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // invariant assertions for the no-oracle queries (ML nondeterminism,
    // zlib, BPE): pass/fail per query, emitted beside the dumps so the
    // rows-only entries carry a machine verdict too. A copy lands in the
    // repo root (SELFCHECK.json) for the round record.
    val selfResults = SelfChecks.run(spark, sfDir, only)
    if (selfResults.nonEmpty) {
      val sj = SelfChecks.toJson(selfResults)
      Files.writeString(Paths.get(s"$outDir/self_checks.json"), sj)
      scala.util.Try(Files.writeString(Paths.get("SELFCHECK.json"), sj))
    }
    spark.stop()
  }
}
