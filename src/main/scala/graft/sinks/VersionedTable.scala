package graft.sinks

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned copy-on-write table with TIME TRAVEL — the
  * [[MergeInto]] layout grown a transaction log: merges never delete
  * data files; each merge writes its rewritten partitions as NEW files
  * and commits a log version listing the table's live files. Any past
  * version stays readable until [[vacuum]] reclaims it — snapshot
  * reads, audits, and reproducible training runs ("the corpus exactly
  * as version 7 saw it") on plain parquet.
  *
  * Layout:
  *   path/__part=N/part-*.parquet   data files, append-only
  *   path/_graft_log/versions/      (version, file) rows, append-only
  *   path/_graft_log/schema/        zero-row parquet carrying the schema
  *                                  (the empty-version read path)
  *
  * Scale shape: identical to [[MergeInto]] — merge cost is the changed
  * partitions only; the log is |files|-sized metadata (what every
  * table format keeps); storage between versions is SHARED (an
  * untouched partition's file appears in both versions' logs —
  * VersionedTableSpec pins the physical identity). Single-writer by
  * contract: new-file discovery lists the affected partition
  * directories against the union of logged files, which is only
  * correct when merges don't race (the usual plain-parquet boundary;
  * formats solve it with atomic log commits).
  */
object VersionedTable {

  val PartCol: String = MergeInto.PartCol
  private def logDir(path: String) = s"$path/_graft_log/versions"
  private def schemaDir(path: String) = s"$path/_graft_log/schema"

  private def partOf(key: org.apache.spark.sql.Column, nParts: Int) =
    pmod(xxhash64(key.cast("string")), lit(nParts.toLong)).cast("int")

  private def listFiles(spark: SparkSession, dirs: Seq[String]): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.flatMap { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }
  }

  private def commit(spark: SparkSession, path: String, version: Int,
                     files: Seq[String]): Unit = {
    import spark.implicits._
    files.map(f => (version, f)).toDF("version", "file")
      .repartition(1)
      .write.mode("append").parquet(logDir(path))
  }

  /** Create the table as version 0. */
  def create(df: DataFrame, path: String, keyCol: String, nParts: Int): Unit = {
    require(nParts >= 1)
    val spark = df.sparkSession
    df.withColumn(PartCol, partOf(col(keyCol), nParts))
      .write.mode("overwrite").partitionBy(PartCol).parquet(path)
    df.limit(0).write.mode("overwrite").parquet(schemaDir(path))
    val files = listFiles(spark,
      (0 until nParts).map(p => s"$path/$PartCol=$p"))
    commit(spark, path, 0, files)
  }

  def latestVersion(spark: SparkSession, path: String): Int =
    spark.read.parquet(logDir(path))
      .agg(max(col("version"))).head().getInt(0)

  private def filesAt(spark: SparkSession, path: String, v: Int): Seq[String] =
    spark.read.parquet(logDir(path))
      .filter(col("version") === v).select(col("file"))
      .collect().map(_.getString(0)).toSeq

  /** Snapshot read at `version` (default: latest). */
  def read(spark: SparkSession, path: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, path))
    val files = filesAt(spark, path, v)
    if (files.isEmpty)
      spark.read.parquet(schemaDir(path)).filter(lit(false))
    else
      // basePath keeps the partition column out of the row schema
      spark.read.option("basePath", path).parquet(files: _*).drop(PartCol)
  }

  /** MERGE as a new committed version; returns the version number.
    * Same semantics as [[MergeInto.mergeInto]] (upsert replaces/
    * inserts, delete wins on overlap), but prior versions' files are
    * never touched. */
  def merge(spark: SparkSession, path: String, keyCol: String, nParts: Int,
            upserts: DataFrame, deleteKeys: DataFrame): Int = {
    val cur = latestVersion(spark, path)
    val curFiles = filesAt(spark, path, cur)
    val up = upserts.withColumn(PartCol, partOf(col(keyCol), nParts))
    val del = deleteKeys.select(col(keyCol))
      .withColumn(PartCol, partOf(col(keyCol), nParts))
    val changeKeys = up.select(col(keyCol), col(PartCol))
      .unionByName(del).distinct()
    val affected = changeKeys.select(col(PartCol))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (affected.isEmpty) { commit(spark, path, cur + 1, curFiles); return cur + 1 }
    val affectedSet = affected.toSet
    def partOfFile(f: String): Int = {
      val m = s".*/$PartCol=(\\d+)/[^/]+$$".r
      f match { case m(p) => p.toInt; case _ => -1 }
    }
    val (affectedFiles, keptFiles) =
      curFiles.partition(f => affectedSet(partOfFile(f)))
    val target =
      if (affectedFiles.isEmpty)
        spark.read.parquet(schemaDir(path))
          .withColumn(PartCol, lit(0)).filter(lit(false))
      else spark.read.option("basePath", path).parquet(affectedFiles: _*)
    val survivors = target.join(
      changeKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
    val liveUpserts = up.join(del.select(col(keyCol)), Seq(keyCol), "left_anti")
    val merged = survivors.unionByName(liveUpserts).localCheckpoint()
    val before = listFiles(spark,
      affected.map(p => s"$path/$PartCol=$p")).toSet
    merged.write.mode("append").partitionBy(PartCol).parquet(path)
    val newFiles = listFiles(spark,
      affected.map(p => s"$path/$PartCol=$p")).filterNot(before)
    commit(spark, path, cur + 1, keptFiles ++ newFiles)
    cur + 1
  }

  /** Reclaim storage: delete data files referenced ONLY by versions
    * below `keepFrom`, and drop those versions from the log. Returns
    * the number of files deleted. Reads at vacuumed versions fail —
    * that is the contract of every table format's VACUUM. */
  def vacuum(spark: SparkSession, path: String, keepFrom: Int): Int = {
    val log = spark.read.parquet(logDir(path))
    val keep = log.filter(col("version") >= keepFrom)
    val doomed = log.filter(col("version") < keepFrom)
      .select(col("file")).distinct()
      .join(keep.select(col("file")).distinct(), Seq("file"), "left_anti")
      .collect().map(_.getString(0))
    val conf = spark.sparkContext.hadoopConfiguration
    doomed.foreach { f =>
      val p = new Path(f); p.getFileSystem(conf).delete(p, false)
    }
    val kept = keep.localCheckpoint()
    kept.write.mode("overwrite").parquet(logDir(path))
    doomed.length
  }

  /** Semantic diff between two committed versions — the CDC view time
    * travel makes answerable: which keys were added, removed, or had a
    * `compareCols` value change between vFrom and vTo (unchanged rows
    * are filtered BEFORE anything leaves the join). One key-equi join
    * of the two snapshot reads — at 100 TB both sides prune to their
    * versions' file lists first, and null-safe comparison (`<=>`) means
    * NULL-valued cells diff correctly. Output: (keyCol, change,
    * <c>_from, <c>_to per compare column). */
  def diff(spark: SparkSession, path: String, keyCol: String,
           vFrom: Int, vTo: Int, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    // presence markers, not key NULL-ness, decide the side: a row whose
    // KEY is null never joins, and classifying it by key nullability
    // would label a vFrom-only null-key row "added"
    val a = read(spark, path, Some(vFrom)).select(
      col(keyCol) +: lit(1).as("__pa") +:
        compareCols.map(c => col(c).as(s"${c}_from")): _*)
    val b = read(spark, path, Some(vTo)).select(
      col(keyCol).as("__kb") +: lit(1).as("__pb") +:
        compareCols.map(c => col(c).as(s"${c}_to")): _*)
    val joined = a.join(b, col(keyCol) === col("__kb"), "full_outer")
    val changed = compareCols
      .map(c => !(col(s"${c}_from") <=> col(s"${c}_to")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("__pa").isNull, lit("added"))
          .when(col("__pb").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .select(coalesce(col(keyCol), col("__kb")).as(keyCol) +:
        col("change") +:
        compareCols.flatMap(c => Seq(col(s"${c}_from"), col(s"${c}_to"))): _*)
  }
}
