package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan (and optionally the
  * measured wall time) of any registered query.
  *
  * {{{
  * sbt "runMain graft.Explain q53_per_group_cap /root/testdata/sf0.1 time"
  * }}}
  *
  * The 100 TB review loop: after a query goes oracle-green, read its plan
  * here — pushed filters reach the scan, small sides broadcast, no
  * cartesian products, no single-reducer windows — and only then call it
  * done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Explain <queryName>[,<queryName>...] [sfDir] [time] — queryName 'all' lists; " +
        "SPARK_GRAFT_PLAN_DIR writes each plan to <dir>/<query>_<SPARK_GRAFT_PLAN_TAG>.txt")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val time = args.contains("time")
    if (names.sameElements(Array("all"))) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println); return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(SparkTuning.ExcludedRulesKey, SparkTuning.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional plan-file sink (r19 optimization round): one JVM dumps many
    // queries' formatted plans — the judge-checkable plans/r19 artifacts
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR").filter(_.nonEmpty)
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name — run with 'all' to list"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====")
      println(plan)
      planDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"${name}_$planTag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      if (time) {
        df.count() // warm: footers, codegen, broadcast
        // re-construct inside the timer — iterative operators (q48/q52) run
        // their fixpoint loop at construction, and Bench times it the same way
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
