package graft

/** Session-level optimizer tuning shared by every entry point (Verify,
  * Bench, Explain, the streaming app, and the test fixture).
  *
  * `InferFiltersFromGenerate` is excluded: it synthesizes a
  * `size(arr) > 0 AND isnotnull(arr)` filter under every explode, and
  * once predicate pushdown drags that filter through the projections
  * that alias the array, the WHOLE array-building expression is
  * re-inlined into the predicate — for the shingle family that means
  * re-tokenizing the document inside every element_at of every window
  * (the "generator-token rule" the operators carefully avoid, resurrected
  * by the optimizer). Measured on the span-dedup pipeline at sf0.1:
  * 31 s → 1.1 s for the window-hash stage, ~20× end-to-end, identical
  * results — the rule only pre-drops rows the generate would drop
  * anyway.
  */
object SparkTuning {
  val ExcludedRulesKey = "spark.sql.optimizer.excludedRules"
  val ExcludedRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}
