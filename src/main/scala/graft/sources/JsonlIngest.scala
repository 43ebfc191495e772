package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import scala.jdk.CollectionConverters._

/** JSONL ingestion — the de-facto interchange format of LLM training
  * corpora (one JSON document per line). The two scale disciplines:
  *
  *   - EXPLICIT schema, never inference: `spark.read.json` without a
  *     schema runs a FULL extra pass over the data just to infer one —
  *     at 100 TB that doubles ingest cost and the inferred schema can
  *     drift per batch. The schema is part of the dataset contract.
  *   - corrupt records are DATA, not failure: PERMISSIVE mode routes
  *     every malformed line into a quarantine column, so one bad line
  *     in a billion doesn't kill the job (FAILFAST) or silently vanish
  *     (DROPMALFORMED) — it lands in an auditable count, the same
  *     ledger discipline as the media decode-drop columns.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt"

  /** Read a JSONL directory with an explicit schema; malformed lines
    * survive as rows with only [[CorruptCol]] set. NOTE: Spark refuses
    * any downstream query whose referenced columns prune to ONLY the
    * corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize
    * (cache/localCheckpoint) before slicing quarantine-only, as
    * [[audit]] does. */
  def readPermissive(spark: SparkSession, path: String,
                     schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already carries $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Test/fixture helper: dump a DataFrame as JSONL and drop `noise`
    * raw lines alongside it (same directory, read by the same glob) —
    * the deterministic corruption the ingest audit must quarantine. */
  def writeJsonlWithNoise(df: DataFrame, path: String,
                          noise: Seq[String]): Unit = {
    df.write.mode("overwrite").json(path)
    if (noise.nonEmpty)
      Files.write(Paths.get(path, "zz-noise.json"),
        noise.asJava, UTF_8)
  }

  /** Ingest audit over a permissive read: per-`srcCol` row/char counts
    * for clean rows plus one `__corrupt__` ledger row. The parsed read
    * materializes ONCE (localCheckpoint): the ok/corrupt branches are
    * two consumers — without it the JSON parse would run twice, and
    * Spark outright refuses a scan whose only referenced column is the
    * corrupt record (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is what
    * the quarantine branch prunes down to. */
  def audit(df0: DataFrame, srcCol: String, charsCol: String): DataFrame = {
    val df = df0.localCheckpoint()
    val ok = df.filter(col(CorruptCol).isNull)
      .groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_rows"), sum(col(charsCol)).as("n_chars"))
    val bad = df.filter(col(CorruptCol).isNotNull)
      .select(lit("__corrupt__").as("src"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_rows"), lit(0L).as("n_chars"))
    ok.unionByName(bad)
  }
}
