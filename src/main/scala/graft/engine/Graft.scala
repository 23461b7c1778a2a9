package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table-loading core.
  *
  * The reference (hedmana/duckdb-retail-pipeline) opens one embedded DuckDB
  * connection per run (`/root/reference/src/run.py:46`) and addresses tables
  * by name. Our analog: one SparkSession, tables as parquet directories under
  * a scale-factor dir, loaded lazily and registered as temp views so both the
  * DataFrame API and `spark.sql` can address them.
  */
object Graft {

  /** Canonical table names shipped by the test harness (TESTDATA.md). */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** THE session builder — every main (Run/Verify/Bench/Plans) goes
    * through here so the config contract can't drift between entry
    * points (a missing `nanosAsLong` in one main once broke only the
    * paths that read `events`). `extraConf` is for per-main additions
    * (e.g. Plans disables size-based auto-broadcast).
    */
  def session(appName: String = "graft", defaultCpus: String = "32",
              extraConf: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects by default; read as long and convert in events().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = extraConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one named table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with its TIMESTAMP(NANOS) column normalized to a
    * proper microsecond TimestampType (requires
    * spark.sql.legacy.parquet.nanosAsLong=true, set in [[session]] and in
    * the Verify/Bench mains). Nanos→micros floor-divides in pure integer
    * arithmetic — `(ts - pmod(ts, 1000)) div 1000` stays in LongType, so
    * epoch-nano magnitudes (~1.7e18, beyond double's 2^53 exact range)
    * convert bit-exactly, matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast
    * for any sign of epoch.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000L")))
      case _ => raw
    }
  }

  /** Register every testdata table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
}
