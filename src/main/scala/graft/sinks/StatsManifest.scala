package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics manifest — the lakehouse file-skipping
  * primitive (Delta `add.stats` / Iceberg manifests), as a plain-parquet
  * sink/source pair: a clustered write records each data file's min/max
  * for chosen columns in a `_graft_manifest` side table, and a pruned
  * read intersects a range predicate with the manifest FIRST, opening
  * only surviving files.
  *
  * Why this exists next to [[ZOrderLayout]]: z-order proves ROW-GROUP
  * pruning from parquet footers, which still requires listing and
  * opening every file's footer. At 100 TB / O(10⁵) files the win that
  * matters is not opening files at all — the manifest is one small
  * parquet a driver can filter in milliseconds, exactly why every table
  * format keeps file stats outside the files. The underscore prefix
  * makes the manifest invisible to plain `spark.read.parquet(path)`
  * readers (Spark skips `_`/`.`-prefixed paths), so the layout stays a
  * valid vanilla parquet table.
  *
  * Scale shape: the write is one `repartitionByRange` shuffle (tight
  * per-file ranges on the cluster column are what MAKE stats
  * selective); the stats pass re-reads only `statsCols` (column-pruned
  * footer-to-footer scan) and aggregates by `_metadata.file_path` —
  * all distributed. The pruned read collects ONLY surviving file paths
  * to the driver (bounded by the match, the same driver-side file list
  * every format's scan planning holds), then applies the exact
  * predicate as the scan filter — manifest pruning is an optimization,
  * never a semantics change.
  */
object StatsManifest {

  val ManifestDir = "_graft_manifest"

  /** Range-cluster `df` by `clusterCol`, write to `path`, and record a
    * per-file min/max manifest for `statsCols` (which should include
    * `clusterCol`; stats on extra correlated columns are free
    * selectivity, the z-order observation). */
  def writeWithManifest(df: DataFrame, path: String, clusterCol: String,
                        statsCols: Seq[String], numPartitions: Int): Unit = {
    require(numPartitions >= 1, s"numPartitions must be >= 1")
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    df.repartitionByRange(numPartitions, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .select((col("_metadata.file_path").as("file") +: statsCols.map(col)): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  /** The manifest as a DataFrame (one row per data file). */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$ManifestDir")

  /** Data files whose stats intervals overlap EVERY `[lo, hi]` range
    * (conjunctive pruning; a file lacking overlap on any range can hold
    * no matching row). */
  def selectFiles(spark: SparkSession, path: String,
                  ranges: Seq[(String, Long, Long)]): Seq[String] =
    selectFilesOf(manifest(spark, path), ranges)

  /** [[selectFiles]] over an already-built manifest frame — callers
    * that also probe the manifest schema share one DataFrame. */
  def selectFilesOf(manifest: DataFrame,
                    ranges: Seq[(String, Long, Long)]): Seq[String] = {
    require(ranges.nonEmpty, "ranges must be non-empty")
    // an empty interval (lo > hi) is unsatisfiable — interval-overlap
    // math would still keep files SPANNING it, so short-circuit
    if (ranges.exists { case (_, lo, hi) => lo > hi }) return Nil
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    }.reduce(_ && _)
    manifest.filter(pred)
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Read `path` under the conjunction of `[lo, hi]` range predicates,
    * opening only manifest-surviving files. Result EQUALS the plain
    * full-scan filter (the exact predicate is re-applied as the scan
    * filter); only the opened-file set shrinks. An empty survivor set
    * degrades to a constant-false filter over the plain path (schema
    * preserved, zero rows decoded). */
  def prunedRead(spark: SparkSession, path: String,
                 ranges: Seq[(String, Long, Long)]): DataFrame = {
    val pred = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val files = selectFiles(spark, path, ranges)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }

  // ------------------------------------------------------------- blooms

  private def bloomDir(path: String, column: String) =
    s"$path/_graft_bloom_$column"

  /** Per-file Bloom index for POINT lookups on a high-cardinality LONG
    * column — the case min/max stats cannot prune (every file spans the
    * full value range once keys are hash-scattered). Two-pass build:
    * the stats manifest's exact per-file row counts size each filter,
    * then one grouped pass inserts the keys (bounded memory: one
    * filter per in-flight group). Stored as a second underscore side
    * table; `fpp` trades bytes for the false-open rate (false
    * positives only OPEN an extra file — the exact filter still runs,
    * so results never change). */
  def addBloomIndex(df: DataFrame, path: String, column: String,
                    fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = manifest(spark, path).select(col("file"), col("n_rows"))
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        col(column).cast("long").as("k"))
      // a NULL key can never match a point lookup; keeping it would
      // also crash the non-nullable tuple decode below
      .filter(col("k").isNotNull)
      .join(sizes, "file")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        var bf: org.apache.spark.util.sketch.BloomFilter = null
        it.foreach { case (_, k, nRows) =>
          if (bf == null)
            bf = org.apache.spark.util.sketch.BloomFilter
              .create(math.max(nRows, 1L), fpp)
          bf.putLong(k)
        }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (file, bos.toByteArray)
      }
      .toDF("file", "bloom")
      .repartition(1)
      .write.mode("overwrite").parquet(bloomDir(path, column))
  }

  /** Files whose Bloom filter might contain ANY of `values`. The probe
    * runs DISTRIBUTED over the bloom side table (per-file filters can
    * be large at scale; only surviving file names reach the driver). */
  def prunedFilesIn(spark: SparkSession, path: String, column: String,
                    values: Seq[Long]): Seq[String] = {
    require(values.nonEmpty, "values must be non-empty")
    import spark.implicits._
    val vs = values.toArray
    spark.read.parquet(bloomDir(path, column))
      .as[(String, Array[Byte])]
      .mapPartitions(_.collect { case (f, b)
          if {
            val bf = org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(b))
            vs.exists(bf.mightContainLong)
          } => f
      })
      .collect().toSeq
  }

  /** Point-lookup read: open only bloom-surviving files, then apply
    * the exact IN filter (false positives only open extra files). */
  def prunedReadIn(spark: SparkSession, path: String, column: String,
                   values: Seq[Long]): DataFrame = {
    val files = prunedFilesIn(spark, path, column, values)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*)
      .filter(col(column).isin(values: _*))
  }
}
