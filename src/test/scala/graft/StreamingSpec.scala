package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.ParquetTableIO
import graft.streaming.StreamingExtract

/** Streaming surface: AvailableNow drains the drop-box, the checkpoint
  * makes reruns incremental (files processed exactly once), and the
  * stateful url-dedup holds state across micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def writeBatch(dir: String, ids: Range, part: String): Unit =
    spark.createDataset(ids.map(i => graft.synth.Synth.page(42L, i.toLong)))
      .write.mode("append").parquet(dir)

  test("AvailableNow drains existing files; restart processes only new files") {
    val src = SparkTestBase.tempDir("stream_src")
    val wh = SparkTestBase.tempDir("stream_wh")
    val ckpt = SparkTestBase.tempDir("stream_ckpt")
    val io = new ParquetTableIO(wh)

    writeBatch(src, 0 until 40, "a")
    val q1 = StreamingExtract.run(spark, src, io, "sresults", ckpt)
    q1.awaitTermination()
    val n1 = io.readTable(spark, "sresults").count()
    assert(n1 == 40)

    // second drop: 20 new docs; restart from the same checkpoint
    writeBatch(src, 40 until 60, "b")
    val q2 = StreamingExtract.run(spark, src, io, "sresults", ckpt)
    q2.awaitTermination()
    val out = io.readTable(spark, "sresults")
    assert(out.count() == 60) // appended only the new 20, no reprocessing
    assert(out.select("url").distinct().count() == 60)
    // streaming output matches the batch extraction byte-for-byte
    val batchOut = graft.extract.ExtractJob.extractedDf(
      spark.createDataset((0 until 60).map(i => graft.synth.Synth.page(42L, i.toLong))).toDF())
      .select($"url", $"extracted.markdown".as("b_markdown"))
    val joined = out.join(batchOut, Seq("url"))
    assert(joined.filter(!($"markdown" <=> $"b_markdown")).count() == 0)
  }

  test("stateful url dedup: re-fetched urls in later batches are dropped") {
    val src = SparkTestBase.tempDir("dedup_src")
    val wh = SparkTestBase.tempDir("dedup_wh")
    val ckpt = SparkTestBase.tempDir("dedup_ckpt")
    val io = new ParquetTableIO(wh)

    writeBatch(src, 0 until 30, "a")
    StreamingExtract.run(spark, src, io, "dresults", ckpt, dedupUrls = true).awaitTermination()
    // re-drop the same 30 urls plus 10 new ones
    writeBatch(src, 0 until 30, "b")
    writeBatch(src, 30 until 40, "c")
    val q = StreamingExtract.run(spark, src, io, "dresults", ckpt, dedupUrls = true)
    q.awaitTermination()

    val out = io.readTable(spark, "dresults")
    assert(out.count() == 40, "state must drop the 30 re-fetched urls")
    assert(out.select("url").distinct().count() == 40)
    // the dedup state key must be the 64-bit url hash (8 bytes/entry at
    // 10^12 scale), not the raw url string
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
    val dedupNodes = exec.executedPlan.collect {
      case s: org.apache.spark.sql.execution.streaming.operators.stateful.StreamingDeduplicateExec => s
    }
    assert(dedupNodes.nonEmpty, exec.executedPlan.toString)
    val keyNames = dedupNodes.head.keyExpressions.map(_.name)
    assert(keyNames == Seq("url_h"), s"state key is $keyNames")
  }
}
