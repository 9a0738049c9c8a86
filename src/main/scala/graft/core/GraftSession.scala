package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + test-table loader for the graft engine.
  *
  * The reference engine (vearch/gamma) is single-node and owns its own
  * storage (search/gamma_engine.cc:243-297); here a SparkSession plays the
  * role of the engine runtime and tables are plain parquet/DataFrames.
  */
object GraftSession {

  /** Local session tuned for the test harness (local[N], AQE on,
    * shuffle.partitions sized to cores instead of the 200 default).
    */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // graft rules: ANN top-k rewrite (opt-in by conf) + gamma SQL
      // UPDATE/MERGE conversion (analyzer rules bind at session build —
      // unlike optimizer rules they cannot be installed after the fact)
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // take/limit escalation: the default starts at 1 partition and
      // re-schedules 4x wider on a miss — a second ~120 ms driver
      // round-trip on every head()/sample-collect that doesn't fit in
      // partition 0 (k-means sample draws, point lookups). Scanning a few
      // partitions up-front is cheaper than a second scheduling round,
      // on a cluster as much as on local[32].
      .config("spark.sql.limit.initialNumPartitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    spark
  }

  /** Ensure graft SQL functions are present on an externally-built session. */
  def prepare(spark: SparkSession): SparkSession = {
    graft.functions.registerAll(spark)
    spark
  }
}

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects; read nanos as long and convert to a microsecond timestamp.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.expr
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        // TIMESTAMP(NANOS) read as long under nanosAsLong; integer
        // division: ns-since-epoch ~1.7e18 exceeds double precision
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ;
        // the oracle (DuckDB epoch_us) and every downstream consumer treat
        // the naive reading as a UTC instant. timestampdiff from the NTZ
        // epoch is session-timezone-independent — a plain cast would shift
        // by the session offset on non-UTC sessions.
        case TimestampNTZType =>
          df.withColumn("ts", expr(
            "timestamp_micros(timestampdiff(MICROSECOND, " +
              "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables as temp views so spark.sql can address them by the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
