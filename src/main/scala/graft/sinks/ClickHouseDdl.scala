package graft.sinks

import graft.config.GraftConfig

/** CREATE TABLE DDL for the three output tables, derived from the live
  * config exactly as the reference documents them
  * (/root/reference/doc/quickstart.md:57-93): configured column renames
  * apply, dropped columns (empty configured name) are omitted, and the
  * table names come from the `[ClickHouse]` block. A user migrating from
  * the reference can bootstrap the target schema from the same TOML that
  * drives the pipeline — no hand-kept DDL to drift.
  *
  * Types follow the quickstart: DateTime64(3) for times, String for keys
  * (LowCardinality for the sample table's identity, as documented),
  * UInt64 for counters/deltas. Engine is left to the caller's suffix —
  * the quickstart's Memory engine is a demo, not a recommendation.
  */
object ClickHouseDdl {

  private def stmt(table: String, cols: Seq[(String, String)],
                   engineSuffix: String): String =
    cols.collect { case (name, typ) if name.nonEmpty => s"  $name $typ" }
      .mkString(s"CREATE TABLE $table (\n", ",\n", s")\n$engineSuffix")

  def queryTable(cfg: GraftConfig,
                 engineSuffix: String = "ENGINE = MergeTree ORDER BY tuple()"): String =
    stmt(cfg.queryTable, Seq(
      cfg.queryTimeColumn -> "DateTime64(3)",
      cfg.identityColumn -> "String",
      cfg.queryAddressColumn -> "String",
      cfg.questionNameColumn -> "String",
      cfg.questionTypeColumn -> "String",
      cfg.counterColumn -> "UInt64"), engineSuffix)

  def responseTable(cfg: GraftConfig,
                    engineSuffix: String = "ENGINE = MergeTree ORDER BY tuple()"): String =
    stmt(cfg.responseTable, Seq(
      cfg.responseTimeColumn -> "DateTime64(3)",
      cfg.identityColumn -> "String",
      cfg.responseStatusColumn -> "String",
      cfg.queryAddressColumn -> "String",
      cfg.questionNameColumn -> "String",
      cfg.questionTypeColumn -> "String",
      cfg.counterColumn -> "UInt64"), engineSuffix)

  def sampleTable(cfg: GraftConfig,
                  engineSuffix: String = "ENGINE = MergeTree ORDER BY tuple()"): String =
    stmt(cfg.queryResponseTimeTable, Seq(
      cfg.responseTimeColumn -> "DateTime64(3)",
      cfg.identityColumn -> "LowCardinality(String)",
      cfg.queryResponseTimeDeltaColumn -> "UInt64",
      cfg.counterColumn -> "UInt64"), engineSuffix)

  def all(cfg: GraftConfig): Seq[String] =
    Seq(queryTable(cfg), responseTable(cfg), sampleTable(cfg))
}
