package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** CSV source/sink matching the reference's conventions (SURVEY.md §2.1
  * S4-S6): header row, `yyyy-MM-dd HH:mm:ss` timestamps, UTF-8, quoting
  * only when needed, scale-preserved decimals (DecimalType renders
  * `12.50`, never `12.5` — golden files depend on it).
  */
object Csv {

  /** Golden-style export (the reference's per-query data/qN.csv shape).
    * coalesce(1) mirrors the single-file export of the reference's
    * workflow; at scale drop the coalesce and let each partition write
    * its shard.
    */
  def writeGolden(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      // Parquet timestamp[ms] columns surface as TIMESTAMP_NTZ, which the
      // CSV writer formats via its OWN option — without it NTZ columns
      // render ISO-8601 and break golden parity.
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("encoding", "UTF-8")
      .csv(path)
  }

  /** App-style read (data-mgmt-streamlit.py:52-54): header + inferred
    * dtypes, the pandas.read_csv analog. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
}
