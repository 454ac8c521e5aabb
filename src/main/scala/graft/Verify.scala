package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict to these query names (dev iteration;
    // the driver always passes exactly two args → full run)
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
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
    val json = SparkEntry.oracleSql.filter(o => selected(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // rows-only manifest: for every query with no DuckDB oracle, run its
    // in-Spark self-check (SelfChecks) and record reason + verdict, so
    // the correctness artifact distinguishes "rows-only by design,
    // invariant verified" from breakage. Failures of the check runner
    // itself are recorded as pass=false, never swallowed.
    val rowsOnly = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .filter(selected).toSeq.sorted
    val manifest = rowsOnly.map { name =>
      val r = SelfChecks.checks.get(name) match {
        case None => SelfChecks.CheckResult(pass = false,
          "UNDECLARED rows-only query", "none", "no self-check registered")
        case Some(chk) =>
          try chk(spark, sfDir)
          catch { case e: Throwable =>
            SelfChecks.CheckResult(pass = false, "self-check crashed", "exception",
              String.valueOf(e.getMessage).take(300))
          }
      }
      System.err.println(s"[verify][rows-only] $name pass=${r.pass} ${r.detail}")
      s"""${q(name)}: {"pass": ${r.pass}, "reason": ${q(r.reason)}, "check": ${q(r.check)}, "detail": ${q(r.detail)}}"""
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/rows_only.json"), manifest)
    spark.stop()
  }
}
