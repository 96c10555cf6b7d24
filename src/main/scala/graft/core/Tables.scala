package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixture tables (see TESTDATA.md).
  * All queries take an `sfDir` so the same code runs at any scale factor.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read-path overrides installed by [[graft.store.SplitLayout]]: a
    * content-identical, multi-split copy of a fixture table, keyed by
    * (applicationId, dir, name) so nothing leaks across sessions or
    * scale-factor dirs. Purely a physical-layout redirect — values are
    * byte-identical to the original file. */
  private val pathOverrides =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def overrideKey(spark: SparkSession, dir: String, name: String): String =
    s"${spark.sparkContext.applicationId}:$dir:$name"
  def hasOverride(key: String): Boolean = pathOverrides.containsKey(key)
  def registerOverride(key: String, path: String): Unit =
    pathOverrides.put(key, path): Unit

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = pathOverrides.get(overrideKey(spark, dir, name))
    spark.read.parquet(if (p != null) p else s"$dir/$name.parquet")
  }

  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses by default —
    * read nanos as long and integer-DIV to microseconds; long/long `/`
    * returns double and loses bits above 2^53) and plain TIMESTAMP(MICROS)
    * (pass through). Dispatch on the loaded type so either fixture works;
    * DuckDB reads both natively and the engines agree at ≥µs granularity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // TIMESTAMP(MICROS) with isAdjustedToUTC=false infers as
      // TIMESTAMP_NTZ (a third fixture generation) — normalize to the
      // instant type the engine standardizes on. The session timezone is
      // pinned to UTC by every entry point, so the cast is
      // value-preserving and DuckDB (which reads the column naively)
      // sees identical values.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
}
