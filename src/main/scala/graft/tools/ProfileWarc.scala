package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC ingest profile: the same synth crawl corpus extracted (a) from
  * Common-Crawl-layout `.warc.gz` shards through the DSv2 WarcSource and
  * (b) from parquet — docs/s for both paths, so BASELINE.md can state
  * the WARC-path cost relative to the columnar path. Diagnostics on
  * stderr only (the Bench stdout contract). Env: PROFILE_WARC_DOCS
  * (default 100000), PROFILE_WARC_CPUS (default 12). */
object ProfileWarc {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_WARC_DOCS", "100000").toLong
    val cpus = sys.env.getOrElse("PROFILE_WARC_CPUS", "12").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("profile-warc")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("profile_warc").toString
    val warcDir = s"$base/warc"
    val pqDir = s"$base/parquet"
    val pages = graft.synth.Synth.pagesDs(spark, n, seed = 42L, parallelism = cpus * 4).toDF()
    graft.sources.Warc.write(pages.select($"url", $"warc_ts", lit(200).as("http_status"),
      lit("text/html; charset=utf-8").as("content_type"), $"html".as("body")), warcDir)
    pages.select($"url", $"warc_ts", $"html").write.mode("overwrite").parquet(pqDir)
    val nFiles = new java.io.File(warcDir).listFiles().count(_.getName.endsWith(".warc.gz"))
    System.err.println(s"corpus: $n docs, $nFiles warc shards, local[$cpus]")

    def extractCount(df: org.apache.spark.sql.DataFrame): Long =
      graft.extract.ExtractJob.extractedDf(df)
        .select(length($"extracted.markdown").as("l"))
        .agg(sum($"l")).as[Long].head()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$label%-28s ${dt}%7.2f s  ${n / dt}%9.0f docs/s  (chk=$r)")
    }

    for (round <- 1 to 3) {
      System.err.println(s"-- round $round")
      time("warc scan + extract") {
        extractCount(spark.read.format("graft.sources.WarcSource").load(warcDir)
          .select($"url", $"body".as("html")))
      }
      time("parquet scan + extract") {
        extractCount(spark.read.parquet(pqDir).select($"url", $"html"))
      }
      time("warc scan only (url+body)") {
        spark.read.format("graft.sources.WarcSource").load(warcDir)
          .select(length($"body").as("l")).agg(sum($"l")).as[Long].head()
      }
    }
    spark.stop()
  }
}
