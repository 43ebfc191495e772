package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec

/** The codegen'd Bloom membership probe (BloomMightContainLong). */
class BloomProbeSpec extends SparkSpec {

  test("probe admits every inserted key; false positives stay near fpp") {
    import spark.implicits._
    val bloom = BloomFilter.create(1000, 0.03)
    (0L until 1000L).foreach(bloom.putLong)
    val kept = (0L until 10000L).toDF("h")
      .filter(BloomProbe.mightContainLong(col("h"), bloom))
      .collect().map(_.getLong(0)).toSet
    // Bloom's contract: zero false negatives...
    assert((0L until 1000L).forall(kept.contains))
    // ...and a false-positive rate in the neighborhood of the configured
    // 3% (generous 3x headroom — this is a smoke bound, not a tight one)
    assert(kept.size - 1000 < 9000 * 0.09, s"fp=${kept.size - 1000}")
  }

  test("expression survives java serialization (the task-closure path)") {
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putLong(42L)
    val e = BloomMightContainLong(Literal(42L), BloomProbe.serialize(bloom))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(e); oos.close()
    val e2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[BloomMightContainLong]
    // interpreted eval path, post-round-trip (codegen is covered by the
    // DataFrame filter test above)
    assert(e2.eval(null) == true)
    // a definite miss exists among a handful of candidates at fpp 0.01
    val miss = (100L to 120L).find(v =>
      BloomMightContainLong(Literal(v), BloomProbe.serialize(bloom))
        .eval(null) == false)
    assert(miss.isDefined)
  }

  test("probes over equal sketch bytes are equal expressions") {
    // Catalyst semanticEquals / subexpression elimination depend on the
    // equals/hashCode contract — an Array field's default reference
    // equality silently defeats plan reuse
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putLong(42L)
    val b1 = BloomProbe.serialize(bloom)
    val b2 = b1.clone()
    val e1 = BloomMightContainLong(Literal(42L), b1)
    val e2 = BloomMightContainLong(Literal(42L), b2)
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    val other = BloomFilter.create(10, 0.01)
    other.putLong(43L)
    assert(e1 != BloomMightContainLong(Literal(42L), BloomProbe.serialize(other)))
  }

  test("non-BIGINT input is rejected at analysis") {
    import spark.implicits._
    val bloom = BloomFilter.create(10, 0.01)
    val err = intercept[Exception] {
      Seq("a").toDF("s")
        .filter(BloomProbe.mightContainLong(col("s"), bloom)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
  }
}
