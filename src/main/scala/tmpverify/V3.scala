package tmpverify
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object V3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 10 clones of the same 2-line text in one source
    val df = (0 until 10).map(i => (i.toLong, "s0", "aaa\nbbb")).toDF("doc_id","source","text")
    val r = graft.ops.Curation.stripBoilerplateLines(df, "doc_id", "source", "text", minDocs = 5)
    r.show(3, false)
    r.printSchema()
    println("nulls=" + r.filter(col("text").isNull).count())
    spark.stop()
  }
}
