package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam (SURVEY.md §7.1.9). Production binds this to Iceberg
  * (`spark.read.format("iceberg")`, append snapshots, a manifest table);
  * the sandbox has no Iceberg runtime jar, so the default implementation is
  * hive-partitioned parquet with the same layout and the same append/anti-join
  * resume contract. Swapping implementations changes no job code.
  */
trait TableIO {
  def readTable(spark: SparkSession, name: String): DataFrame
  def appendTable(df: DataFrame, name: String): Unit
  /** Overwrite only the hive partitions present in `df` (Iceberg: dynamic
    * partition overwrite). */
  def overwritePartitions(df: DataFrame, name: String, partitionCol: String): Unit
  def tableExists(spark: SparkSession, name: String): Boolean
}

/** Parquet implementation rooted at a warehouse directory. */
final class ParquetTableIO(warehouse: String) extends TableIO {
  private def path(name: String) = s"$warehouse/$name"

  override def readTable(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  override def appendTable(df: DataFrame, name: String): Unit =
    df.write.mode("append").parquet(path(name))

  override def overwritePartitions(df: DataFrame, name: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path(name))

  override def tableExists(spark: SparkSession, name: String): Boolean =
    new java.io.File(path(name)).exists()
}
