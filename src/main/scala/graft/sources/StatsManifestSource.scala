package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.sinks.StatsManifest

/** The stats-manifest layout as a REGISTERED SPARK DATA SOURCE —
  * `spark.read.format("graft.sources.StatsManifestSource").load(path)`
  * — so file skipping happens inside Spark's own scan planning
  * (`PrunedFilteredScan`: the planner hands the pushed filters and the
  * required columns to [[StatsManifestRelation.buildScan]]) instead of
  * through a bespoke `prunedRead` call. A user query keeps the plain
  * `.filter(...)` shape; the source prunes the file list from the
  * manifest before any parquet footer is opened.
  *
  * V1 (`PrunedFilteredScan`) over DSv2, deliberately: V1's buildScan
  * receives pushed filters + required columns and may return any RDD —
  * the pruned parquet sub-read slots straight in. DSv2 would demand a
  * full PartitionReaderFactory re-implementation of the parquet read
  * path for ZERO additional pruning power (file-list pruning happens
  * before either API's scan). Minimal machinery for the same plan.
  *
  * Filter translation is CONSERVATIVE: per-column bounds are
  * intersected from >, >=, <, <=, =, IN on integral stats columns;
  * any filter shape it doesn't recognize simply prunes nothing (and
  * because `unhandledFilters` keeps every filter with Spark, the
  * engine re-applies them all above the scan — pruning can only drop
  * provably-empty files, never change results). Point predicates
  * (`=`, `IN`) additionally probe the per-file Bloom side table when
  * [[StatsManifest.addBloomIndex]] built one for that column — the
  * high-cardinality case where min/max prunes nothing.
  */
class StatsManifestSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-stats"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-stats needs a path"))
    new StatsManifestRelation(ctx, path)
  }
}

class StatsManifestRelation(ctx: SQLContext, path: String)
    extends BaseRelation with PrunedFilteredScan {

  private def spark = ctx.sparkSession

  override def sqlContext: SQLContext = ctx
  override val schema: StructType = spark.read.parquet(path).schema

  // every filter stays with Spark (re-applied above the scan):
  // pruning is pure optimization by construction
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** (column → [lo, hi]) bounds intersected from the pushed filters. */
  private[sources] def bounds(filters: Array[Filter]): Map[String, (Long, Long)] = {
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = acc.getOrElse(c, (Long.MinValue, Long.MaxValue))
      acc(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    filters.foreach {
      case GreaterThan(c, v) => asLong(v).foreach(l =>
        if (l < Long.MaxValue) tighten(c, l + 1, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => asLong(v).foreach(l =>
        tighten(c, l, Long.MaxValue))
      case LessThan(c, v) => asLong(v).foreach(l =>
        if (l > Long.MinValue) tighten(c, Long.MinValue, l - 1))
      case LessThanOrEqual(c, v) => asLong(v).foreach(l =>
        tighten(c, Long.MinValue, l))
      case EqualTo(c, v) => asLong(v).foreach(l => tighten(c, l, l))
      case In(c, vs) =>
        val ls = vs.flatMap(asLong)
        if (ls.nonEmpty && ls.length == vs.length)
          tighten(c, ls.min, ls.max)
      case _ => () // unknown shape: prunes nothing
    }
    acc.toMap
  }

  /** Point values per column (for the Bloom probe), when the filter is
    * exactly `=` or `IN`. */
  private[sources] def points(filters: Array[Filter]): Map[String, Seq[Long]] =
    filters.collect {
      case EqualTo(c, v) if asLong(v).isDefined => c -> Seq(asLong(v).get)
      case In(c, vs) if vs.nonEmpty && vs.forall(asLong(_).isDefined) =>
        c -> vs.flatMap(asLong).toSeq
    }.toMap

  /** Files surviving stats + bloom pruning for these filters — also
    * the spec's observability hook. */
  private[sources] def selectedFiles(filters: Array[Filter]): Seq[String] = {
    // ONE manifest DataFrame serves both the schema probe (.columns is a
    // footer read, no job) and the file-list job — re-building it per
    // consumer would launch redundant planning work on every scan
    val mf = StatsManifest.manifest(spark, path)
    val statCols = mf.columns
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSet
    val ranged = bounds(filters).filter { case (c, _) => statCols(c) }
    var files: Seq[String] =
      if (ranged.isEmpty)
        mf.select(col("file")).collect().map(_.getString(0)).toSeq
      else
        StatsManifest.selectFilesOf(mf,
          ranged.map { case (c, (lo, hi)) => (c, lo, hi) }.toSeq)
    points(filters).foreach { case (c, vs) =>
      val dir = s"$path/_graft_bloom_$c"
      if (new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(dir))) {
        val bloomSurvivors = StatsManifest.prunedFilesIn(spark, path, c, vs)
        files = files.filter(bloomSurvivors.toSet)
      }
    }
    files
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val files = selectedFiles(filters)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    // empty projection (e.g. count(*)) still needs a scan
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}
