package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Markov transition matrix: adjacency under the total order, first
  * events feed no cell, per-from probabilities in micro-units. */
class TransitionsSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("transitions count per user and normalize per from-state") {
    import spark.implicits._
    val df = Seq(
      // user 1: a -> b -> a ; user 2: a -> c
      (1L, 1L, t(1), "a"), (2L, 1L, t(2), "b"), (3L, 1L, t(3), "a"),
      (4L, 2L, t(1), "a"), (5L, 2L, t(2), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val m = Funnel.transitionMatrix(df, "user_id", "ts", "event_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from a: b once, c once -> 500000 each; from b: a once -> 1e6
    assert(m == Map(
      ("a", "b") -> ((1L, 500000L)),
      ("a", "c") -> ((1L, 500000L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("timestamp ties order by event id; cross-user adjacency never counts") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, t(5), "x"), (2L, 1L, t(5), "y"), // tie: x -> y by id
      (9L, 2L, t(5), "z")) // other user, same ts: no pair with x/y
      .toDF("event_id", "user_id", "ts", "event_type")
    val m = Funnel.transitionMatrix(df, "user_id", "ts", "event_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("x", "y")))
  }
}
