package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Scale notes: each table is a single parquet file locally, but nothing here
  * assumes that — `spark.read.parquet(dir)` splits by row group via
  * `spark.sql.files.maxPartitionBytes`, so the same code fans out over a
  * 1000-executor cluster reading thousands of files. Filters/projections are
  * applied by callers *after* the read so Catalyst pushes them into the scan
  * (PushedFilters / ReadSchema pruning).
  */
object Tables {
  /** The documented TESTDATA.md table set; anything else fails fast here
    * rather than as a path error at action time. */
  val Known: Set[String] = Set("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(Known.contains(name), s"unknown test table '$name' (known: $Known)")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as either parquet TIMESTAMP(MICROS) (read
    * directly) or TIMESTAMP(NANOS), which Spark's vectorized reader rejects —
    * for the latter, read it as a raw nanos long (legacy conf) and truncate
    * to microseconds, the same truncation DuckDB applies implicitly when
    * bucketing to coarser grains. Adapt by the type actually read so the
    * battery survives testdata regeneration. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // sessions here run UTC, so this cast is wall-clock preserving; it
        // keeps `ts` the same TimestampType every downstream query was
        // written (and oracle-verified) against
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
