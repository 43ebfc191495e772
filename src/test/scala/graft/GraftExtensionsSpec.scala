package graft

class GraftExtensionsSpec extends SparkSpec {

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT ip_v4_string(CAST(167772161 AS BIGINT)) AS a,
        |       ip_bytes_string(CAST(x'0a000001' AS BINARY)) AS b,
        |       cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).collect().head
    assert(r.getString(0) == "10.0.0.1")
    assert(r.getString(1) == "10.0.0.1")
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("extensions class injects the same functions at session build") {
    // same builders the spark.sql.extensions conf path would inject
    assert(GraftExtensions.descriptions.map(_._1.funcName).sorted ==
      Seq("cms_estimate", "cms_merge_agg", "cms_sketch_agg",
        "cosine_similarity", "dot_product", "ip_bytes_string", "ip_v4_string",
        "subvector_l2"))
  }

  test("subvector_l2 from SQL matches the expected arithmetic") {
    GraftExtensions.register(spark)
    // window [3.0, 4.0] at offset 1 vs [0.0, 0.0] -> 9 + 16
    val r = spark.sql(
      """SELECT subvector_l2(array(CAST(9.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), 1) AS d
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 25.0)
    // a non-literal offset is rejected loudly, not silently misbound
    val err = intercept[Exception] {
      spark.sql("SELECT subvector_l2(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)), CAST(NULL AS INT))")
        .collect()
    }
    assert(err.getMessage.contains("INT literal"))
    // an offset past the left array CLAMPS the window (the cosine/dot
    // min-length contract) — never an out-of-bounds Tungsten read
    val clamped = spark.sql(
      """SELECT subvector_l2(array(CAST(9.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), 1) AS d,
        |       subvector_l2(array(CAST(9.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT)), 5) AS beyond
        |""".stripMargin).collect().head
    assert(clamped.getDouble(0) == 9.0)  // only a[1]=3 pairs with b[0]
    assert(clamped.getDouble(1) == 0.0)  // fully out of range -> empty sum
  }

  test("dot_product from SQL matches the expected arithmetic") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |                   array(CAST(4.0 AS FLOAT), CAST(-1.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 5.0)
  }
}
