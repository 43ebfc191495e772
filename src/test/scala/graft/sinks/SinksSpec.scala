package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("retrying sink follows the backoff schedule then surfaces failure") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = new BatchSink {
      override def write(df: DataFrame, batchId: Long): Unit = {
        calls += 1
        if (calls < 3) throw new RuntimeException("sink down")
      }
    }
    new RetryingSink(flaky, maxAttempts = 5, stepMs = 10000, maxMs = 300000,
      sleep = sleeps.append).write(null, 0L)
    // reference schedule: +10 s per failure (clickhouse.go:361-413)
    assert(calls == 3 && sleeps.toSeq == Seq(10000L, 20000L))

    val dead = new BatchSink {
      override def write(df: DataFrame, batchId: Long): Unit =
        throw new RuntimeException("always down")
    }
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    intercept[RuntimeException] {
      new RetryingSink(dead, maxAttempts = 3, stepMs = 10000, maxMs = 15000,
        sleep = sleeps2.append).write(null, 0L)
    }
    assert(sleeps2.toSeq == Seq(10000L, 15000L)) // capped at maxMs
  }

  test("column projection renames and drops; identity passes through") {
    import spark.implicits._
    val df = Seq((1L, "x", 2L)).toDF("a", "b", "c")
    val p = ColumnProjection(Seq("a" -> "alpha", "b" -> "", "c" -> "c"))
    assert(p(df).columns.toSeq == Seq("alpha", "c"))
    assert(ColumnProjection.identity(df).columns.toSeq == Seq("a", "b", "c"))
  }
}
