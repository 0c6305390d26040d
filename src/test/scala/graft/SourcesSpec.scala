package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source coverage (SURVEY §2.1 S1) and skew handling (§4.3): the
  * binaryFile ad-hoc ingestion path, and the salted repartition actually
  * spreading a Zipf-hot host over multiple tasks. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("binaryFile source: raw .html/.pdf files ingest into the extraction stage") {
    val dir = SparkTestBase.tempDir("binsrc")
    (0 until 6).foreach { i =>
      val p = graft.synth.Synth.page(42L, i.toLong)
      val ext = if (p.url.endsWith(".pdf")) "pdf" else "html"
      Files.write(Paths.get(dir, f"doc_$i%03d.$ext"), p.html)
    }
    val files = spark.read.format("binaryFile").load(dir)
      .select(col("path").as("url"), col("content").as("html"))
    val out = graft.extract.ExtractJob.extractedDf(files)
      .select(col("url"), col("extracted.status").as("status"))
    assert(out.count() == 6)
    assert(out.filter(col("status") === "ok").count() >= 5) // synth slice has no malformed rows here
  }

  test("salted repartition spreads the hottest host across multiple partitions") {
    val pages = graft.synth.Synth.pagesDs(spark, 2000L, seed = 42L).toDF()
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
    val hottest = pages.groupBy("host").count().orderBy(col("count").desc)
      .select("host").as[String].head()
    val salted = pages.repartition(32,
      pmod(xxhash64(col("url"), col("warc_ts")), lit(32)))
    val parts = salted.filter(col("host") === hottest)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts >= 8, s"hot host $hottest landed in only $parts partitions")
    // while an unsalted host-keyed partitioning pins it to exactly one
    val unsalted = pages.repartition(32, col("host"))
      .filter(col("host") === hottest)
      .select(spark_partition_id()).distinct().count()
    assert(unsalted == 1)
  }
}
