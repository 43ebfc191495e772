package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Registry slice base: the Q record every slice's entries are made of
  * plus cross-family helpers. The per-family slices chain linearly
  * (each extends the previous) purely so that shared private helpers
  * stay visible in source order, exactly as in the single-file form
  * they were split from (r12); [[SparkEntry]] mixes in the last slice
  * and assembles the registry. */
private[graft] trait QueriesBase {

  private[graft] case class Q(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       sql: Option[String])

  /** Exact 2-dp decimal view of a double money/quantity column. */
  private[graft] def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Temp directory that is recursively deleted on JVM exit — for
    * query-local fixture/artifact dirs (the memoized per-(JVM, sf dir)
    * pattern), which otherwise accumulate under /tmp across bench and
    * verify runs. */
  private[graft] def scopedTempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }))
    dir.toString
  }

  /** DuckDB form of VectorFunctions.hyperplaneBucket over the same fixed
    * coefficients: integer-valued plane entries make every product exact,
    * and `t1 + t2 + ...` associates left like the Scala dot loop. */
  private[graft] def duckHyperplaneBucket(e: String, tbl: Int, bits: Int): String = {
    val bitExprs = (0 until bits).map { i =>
      val plane = graft.functions.VectorFunctions.HyperPlanes(tbl * bits + i)
      // COALESCE: embeddings shorter than the 64-dim plane contribute 0
      // for the missing dims, matching the Scala dot's min-length loop
      // (without it one NULL index would null the whole sum and collapse
      // every bucket to 0)
      val dot = plane.zipWithIndex.map { case (c, j) =>
        s"COALESCE(CAST($e[${j + 1}] AS DOUBLE),0.0)*(${c.toDouble})"
      }.mkString(" + ")
      s"(CASE WHEN $dot > 0 THEN ${1L << i} ELSE 0 END)"
    }
    "CAST(" + bitExprs.mkString(" + ") + " AS BIGINT)"
  }
}
