package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the engine's fixture layout: one parquet
  * dataset per table under a scale-factor directory (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the access
  * pattern stays the same — a declarative `spark.read.parquet` scan that
  * Catalyst prunes (column pruning + predicate pushdown reach the Parquet
  * reader via `FileSourceScanExec`'s `ReadSchema`/`PushedFilters`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The fixture `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark's reader rejects; with
    * `spark.sql.legacy.parquet.nanosAsLong` (set by [[graft.GraftSession]])
    * it arrives as a nanos long. Other writers produce ordinary micro
    * timestamps. Normalize both encodings to the same surface: `ts_ns`
    * (exact nanos long) and a proper micros `ts` timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")

  /** Raw-directory corpus variant of the reference's source (SURVEY.md O1):
    * document identity = file name, as in `WordCount.java:88-90`. */
  def textDir(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.textFile(dir).toDF("text")
      .withColumn("doc", element_at(split(input_file_name(), "/"), -1))
  }
}
