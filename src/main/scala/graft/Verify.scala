package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated name filter for targeted re-verification
    // during development; unset (the driver's invocation) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // sidecar point-lookups push batch-key In predicates to parquet
      // as OR-of-eq up to 1000 keys (page/row-group exact; see KeyedSidecar)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Out-dir hygiene (r12 verdict #3): a renamed/retired query would
    // otherwise leave its stale result directory behind, and check.py
    // reports it as a phantom "no oracle" row. Sweep children that are
    // not in the live registry BEFORE writing — but only in full runs:
    // a filtered dev run (SPARK_GRAFT_ONLY) reuses a shared out-dir and
    // must not delete its siblings' fresh results.
    if (only.isEmpty) {
      val live = SparkEntry.queries.keySet + "oracle_sql.json"
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filterNot(f => live.contains(f.getName))
        .foreach { f =>
          System.err.println(s"[verify] removing stale out-dir entry ${f.getName}")
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
