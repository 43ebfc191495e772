package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityRules._

/** The quality card's three rule shapes: conditional counts in one
  * pass, uniqueness as count−distinct, referential integrity as a
  * left-anti count with null FKs counted as orphans. */
class QualityRulesSpec extends SparkSpec {

  test("checkTable folds all rules into one pass with per-rule counts") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 200.0), (4L, 50.0))
      .toDF("id", "v")
    val card = checkTable(df, Seq(
      Rule("v_nonneg", col("v") < 0),
      Rule("v_max100", col("v") > 100),
      Rule("never", lit(false))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(card == Map(
      "v_nonneg" -> ((4L, 1L)), "v_max100" -> ((4L, 1L)),
      "never" -> ((4L, 0L))))
  }

  test("checkUnique counts surplus rows over distinct keys, composite included") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k1", "k2")
    val single = checkUnique(df, "k1", col("k1")).head()
    assert((single.getString(0), single.getLong(1), single.getLong(2)) ==
      (("k1", 4L, 2L))) // 4 rows, 2 distinct k1
    val comp = checkUnique(df, "k12", struct(col("k1"), col("k2"))).head()
    assert((comp.getLong(1), comp.getLong(2)) == ((4L, 1L))) // one dup pair
  }

  test("checkReferential counts orphans, null FK included") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = checkReferential(child, "fk_ok", col("fk"), parent, col("pk"))
      .head()
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == (("fk_ok", 4L, 2L)))
  }
}
