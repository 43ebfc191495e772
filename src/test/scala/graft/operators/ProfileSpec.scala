package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts, string min/max per column") {
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(10)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(7))
    ).toDF("id", "s", "v")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(got("id") == ((4L, 0L, 4L, Some("1"), Some("4"))))
    // distinct EXCLUDES nulls (the SQL convention the oracle shares)
    assert(got("s") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("v") == ((4L, 1L, 2L, Some("10"), Some("7")))) // STRING collation
    // column subset restricts the output
    assert(Profile.profile(df, Seq("id")).count() == 1)
  }

  test("an all-null column profiles without NPE: null min/max, zero distinct") {
    val df = Seq(Tuple1(null.asInstanceOf[String]), Tuple1(null.asInstanceOf[String]))
      .toDF("s")
    val r = Profile.profile(df).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
