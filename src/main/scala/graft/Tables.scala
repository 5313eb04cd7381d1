package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All loaders are plain parquet scans: schema comes from the footer, and
  * Catalyst pushes filters/column pruning into the scan (verified via
  * `.explain` — `PushedFilters`, `ReadSchema`). At 100 TB these would be
  * partitioned table roots; the API is identical.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. The session reads nanos as raw INT64
    * (`spark.sql.legacy.parquet.nanosAsLong`, set once in GraftSession /
    * Verify / Bench — NOT mutated here) and this loader truncates to
    * microseconds — the same truncation DuckDB applies when it surfaces
    * the column as a µs TIMESTAMP, so oracle comparisons line up. The
    * `div` is integer division: the ns epoch (~1.7e18) exceeds double's
    * 2^53 exact range, so a float path would corrupt low digits.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
