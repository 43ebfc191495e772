package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules (the Deequ/Great-Expectations shape):
  * a pipeline states constraints — completeness, range, uniqueness,
  * referential integrity — and gets one violations card back, the gate
  * a 100 TB drop must clear before anything downstream trusts it.
  *
  * Scale shape: every per-table rule folds into ONE aggregation over
  * ONE scan of that table ([[checkTable]] — a rule is just a
  * conditional count, so n rules cost one pass, not n); uniqueness is
  * count−distinct inside the same pass (hashed keys, the q114
  * discipline); referential integrity is the only rule that joins —
  * a left-anti count against the (usually broadcastable) parent keys.
  * The card is |rules| rows; nothing data-sized survives the
  * aggregations.
  */
object QualityRules {

  /** One named predicate over a table: `violated` must be true where
    * the ROW violates the rule. */
  final case class Rule(name: String, violated: Column)

  /** All `rules` over one table in one aggregation pass:
    * (rule, n_checked, n_violations). */
  def checkTable(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "checkTable needs at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(s"__v_${r.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map(r => struct(lit(r.name).as("rule"),
      col("__n").as("n_checked"), col(s"__v_${r.name}").as("n_violations")))
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Key-uniqueness rule as a card row: n_checked = rows,
    * n_violations = rows − distinct keys (0 when unique). Composite
    * keys pass a struct column — counted EXACTLY over the key itself
    * (a stringified struct would conflate keys whose fields contain
    * the separator; a governance surface must not manufacture false
    * violations). The full key shuffles — acceptable here because
    * uniqueness keys are id-shaped; hash the key yourself upstream if
    * it is text-sized. */
  def checkUnique(df: DataFrame, name: String, key: Column): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(key)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match in `parent.parentKey`. One left-anti join; null child keys
    * count as violations (an FK that is null references nothing). */
  def checkReferential(child: DataFrame, name: String, childKey: Column,
                       parent: DataFrame, parentKey: Column): DataFrame = {
    val n = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.select(childKey.as("__ck"))
      .join(parent.select(parentKey.as("__ck")).distinct(),
        Seq("__ck"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    n.crossJoin(orphans)
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
  }
}
