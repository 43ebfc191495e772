package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the "same real-world thing,
  * different rows" problem every multi-source corpus has (crawl
  * mirrors, CRM imports, catalog feeds): OR-blocking generates
  * candidates, field-similarity scoring decides matches, transitive
  * closure groups them, and a survivorship rule elects the golden
  * record.
  *
  * Scale discipline (the Fellegi–Sunter architecture made
  * shuffle-shaped): the all-pairs comparison space is NEVER
  * materialized — candidates come from a UNION of per-key equi
  * self-joins (each blocking key is a cheap deterministic function of
  * the record: a band, a suffix, a phonetic code), so recall is the
  * union of the keys' recalls while cost stays Σ per-block² instead of
  * n². Scoring — the expensive exact comparisons, levenshtein included
  * — runs on candidates only (the CMS/PPJoin candidate-verify
  * discipline), and clustering reuses [[Dedup.connectedComponents]].
  * A pathological blocking key (half the table in one block) is a skew
  * bomb; keys should be banded/bucketed so block sizes are bounded —
  * the knob is the key definition itself, kept in the caller's hands.
  */
object RecordLinkage {

  /** Candidate pairs by OR-blocking: the union over `keys` of each
    * key's equi self-join, `id_a < id_b`, deduplicated. A null key
    * opts the record out of that key's block (SQL join semantics —
    * missing fields must not form a giant null block). */
  def blockPairs(records: DataFrame, idCol: String,
                 keys: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "blockPairs needs at least one blocking key")
    val withKeys = records.select(
      col(idCol).as("__rid") +:
        keys.zipWithIndex.map { case (k, i) => k.as(s"__bk$i") }: _*)
      .localCheckpoint()
    keys.indices.map { i =>
      val l = withKeys.select(col("__rid").as("id_a"), col(s"__bk$i").as("__k"))
      val r = withKeys.select(col("__rid").as("id_b"), col(s"__bk$i").as("__k"))
      l.join(r, Seq("__k")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }.reduce(_ union _).distinct()
  }

  /** Incremental blocking — the daily-drop form of [[blockPairs]]:
    * candidates are (delta × base) ∪ (delta × delta), NEVER
    * base × base — the base corpus was already resolved, so a
    * re-link of n_base² pairs per drop would make ER cost quadratic
    * in corpus age instead of linear in the drop (the q148/q61
    * incremental-probe discipline applied to linkage). Same OR-key
    * semantics; pairs are (id_a < id_b) dedup'd, so a delta pair is
    * reported once however many keys it shares. */
  def blockProbe(base: DataFrame, delta: DataFrame, idCol: String,
                 keys: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "blockProbe needs at least one blocking key")
    def withKeys(df: DataFrame) = df.select(
      col(idCol).as("__rid") +:
        keys.zipWithIndex.map { case (k, i) => k.as(s"__bk$i") }: _*)
    val b = withKeys(base).localCheckpoint()
    val d = withKeys(delta).localCheckpoint()
    keys.indices.map { i =>
      val dl = d.select(col("__rid").as("id_a"), col(s"__bk$i").as("__k"))
      val bothSides = b.select(col("__rid").as("id_b"), col(s"__bk$i").as("__k"))
        .union(d.select(col("__rid").as("id_b"), col(s"__bk$i").as("__k")))
      dl.join(bothSides, Seq("__k"))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
    }.reduce(_ union _).distinct()
  }

  /** Attach both sides' `cols` to a pair frame as `a_<col>` /
    * `b_<col>` — two equi-joins against the record table, the standard
    * prelude to pairwise scoring. */
  def attachSides(pairs: DataFrame, records: DataFrame, idCol: String,
                  cols: Seq[String]): DataFrame = {
    val a = records.select(col(idCol).as("id_a") +:
      cols.map(c => col(c).as(s"a_$c")): _*)
    val b = records.select(col(idCol).as("id_b") +:
      cols.map(c => col(c).as(s"b_$c")): _*)
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a") +: col("id_b") +:
        (cols.map(c => col(s"a_$c")) ++ cols.map(c => col(s"b_$c"))): _*)
  }

  /** Cluster card over matched pairs: transitive closure (min-id
    * components over the match graph), then per-cluster membership and
    * value-spread stats for clusters of ≥ 2 — the survivorship
    * surface a golden-record election reads. `valueCol` must be an
    * integer column (spread = max − min stays exact). */
  def clusterCard(records: DataFrame, idCol: String, matches: DataFrame,
                  valueCol: String): DataFrame = {
    val comp = Dedup.connectedComponents(
      records.select(col(idCol).as("id")),
      matches.select(col("id_a").as("src"), col("id_b").as("dst")))
    comp.join(records.select(col(idCol).as("id"), col(valueCol).as("__v")),
        Seq("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        (max(col("__v")) - min(col("__v"))).cast("long").as("val_spread"))
      .filter(col("n_members") >= 2)
  }
}
