package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName ...]")
    val sfDir = args(0)
    val outDir = args(1)
    // optional trailing query names restrict the dump (fast single-query
    // iteration; check.py takes the same filter). PREFIX match, like
    // Bench's SPARK_GRAFT_BENCH_ONLY ("q53" hits q53_per_group_cap); a
    // filter matching nothing is a typo and must FAIL, not silently
    // write an empty healthy-looking dump.
    val only = args.drop(2).toSet
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.startsWith)
    require(only.isEmpty || SparkEntry.queries.keys.exists(selected),
      s"query filter matches nothing: ${only.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(SparkTuning.ExcludedRulesKey, SparkTuning.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query wall seconds (construction + write) recorded next to the
    // dump: correctness runs double as a coarse perf-drift signal the
    // round-over-round diff can read without a separate bench run
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries
      .filter { case (name, _) => selected(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // repartition(1), NOT coalesce(1): coalesce folds the whole final
        // stage into one task, serializing every post-shuffle projection
        // (measured: q72's span-cut lambda went 49 s single-task vs ~5 s
        // parallel at sf0.1). repartition adds one tiny output-rows-only
        // shuffle and keeps the compute on all cores; the dump is still
        // a single parquet file for the driver's compare.
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
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
    val times = timings
      .map { case (k, v) =>
        val sec = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
        s"${q(k)}: $sec"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/timings.json"), times)
    spark.stop()
  }
}
