package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S1/S2 — the reference reads its
  * dimension tables from MySQL, data_processor.py:272-320, and writes
  * CSVs back to MySQL, 237-269).
  *
  * Thin declarative wrappers over Spark's built-in JDBC relation; at
  * cluster scale the important options are the partitioned read
  * (partitionColumn/bounds/numPartitions — without them a JDBC scan is
  * one task on one executor) and batch sizing on the write path. This
  * container has no database to integration-test against; the wrappers
  * are exercised only for option plumbing.
  */
object Jdbc {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      driver: String = "com.mysql.cj.jdbc.Driver")

  /** Full-table read. Prefer `readPartitioned` for anything large. */
  def read(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    base(spark, cfg, table).load()

  /** Parallel read split into `numPartitions` range slices of a numeric
    * partition column — the difference between one executor streaming
    * the whole table and a balanced parallel scan. */
  def readPartitioned(spark: SparkSession, cfg: JdbcConfig, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    base(spark, cfg, table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Overwrite-mode write (the reference's load_csv_to_mysql). */
  def write(df: DataFrame, cfg: JdbcConfig, table: String,
      mode: SaveMode = SaveMode.Overwrite, batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()

  private def base(spark: SparkSession, cfg: JdbcConfig, table: String) =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
}
