package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.WarcFiles

/** End-to-end STREAMING crawl funnel (r19): landed `.warc.gz` files →
  * byte-domain record walk → charset-certified text extraction →
  * continuously maintained near-dup clustering artifact — every stage
  * the batch funnel (q259/q263) runs, composed over the landing
  * directory, with the artifact's labeling equal to the full batch
  * closure over every document landed so far after EVERY wave. The
  * per-stage legs are pinned by their own specs (StreamWarcSpec,
  * StreamTextDedupSpec, StreamClusterSpec); this is the composition
  * certificate — schema boundaries, doc-id routing through the URI,
  * and the maintain contract (arriving ids are new) all have to line
  * up for it to pass. */
class StreamCrawlFunnelSpec extends SparkSpec {

  private val bodyA = "alpha beta gamma delta epsilon zeta eta theta"
  private val bodyB = "one two three four five six seven eight"
  private val bodyC = "red orange yellow green blue indigo violet amber"

  private def writeWave(dir: String, docs: Seq[(Long, String)],
                        prefix: String): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("funnel_wave").toString
    WarcFiles.writeUtf8ArchiveDir(
      docs.map { case (id, t) => (id, s"src${id % 2}", t) }
        .toDF("doc_id", "source", "text"), tmp, files = 2)
    java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).forEach { p =>
      java.nio.file.Files.move(p,
        java.nio.file.Paths.get(dir, prefix + p.getFileName.toString))
    }
  }

  private def fullClosure(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val edges = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, threshold = 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    Dedup.connectedComponents(df.select(col("doc_id").as("id")), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("landed archives flow file-source → record walk → text dispatch " +
    "→ clustering artifact; labeling == batch closure after every wave, " +
    "a later wave's doc bridges an earlier component") {
    val landing = Files.createTempDirectory("funnel_landing").toString
    val artifact = Files.createTempDirectory("funnel_artifact").toString
    val ckpt = Files.createTempDirectory("funnel_ckpt").toString
    val wave1 = Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB, 4L -> bodyC)
    writeWave(landing, wave1, "w1-")
    val extracted = StreamWarc.textRecords(spark, landing)
      .filter(col("ok"))
      .select(col("doc_id"), col("text"))
    val query = StreamCluster.maintain(extracted, "doc_id", "text",
      artifact, ckpt)
    def labels(): Map[Long, Long] =
      StreamCluster.readLabels(spark, artifact)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      query.processAllAvailable()
      assert(labels() === fullClosure(wave1),
        "wave-1 artifact diverged from the batch closure")
      assert(labels()(2L) === 1L)
      // wave 2: doc 6 joins wave 1's bodyA component (the cross-wave
      // bridge THROUGH the whole funnel), 7~8 pair inside the wave
      val wave2 = Seq(6L -> bodyA, 7L -> bodyB, 8L -> bodyB)
      writeWave(landing, wave2, "w2-")
      query.processAllAvailable()
      val all = wave1 ++ wave2
      assert(labels() === fullClosure(all),
        "wave-2 artifact diverged from the batch closure")
      assert(labels()(6L) === 1L, "cross-wave bridge lost")
      assert(labels()(7L) === 3L, "in-wave pair lost")
    } finally query.stop()
  }
}
