package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → table registry over a parquet warehouse directory
  * (SURVEY.md §2.1 S6-S7, S10-S11; §2.10 M2).
  *
  * The reference keeps all tables in one embedded DuckDB file and
  * rebuilds with DROP-IF-EXISTS + CTAS (the src/models modules). The Spark
  * analog: one directory per table under a warehouse root,
  * `mode("overwrite")` subsuming the drop, and a temp view per table so
  * both the DataFrame API and `spark.sql` address the catalog. At scale
  * the warehouse root is an object-store prefix and saves pass
  * `partitionBy` so downstream scans prune partitions.
  */
final class Catalog(val spark: SparkSession, val warehouse: String) {

  /** S6/M2: CTAS — materialize and (re-)register. `sortBy` reproduces
    * the reference's ORDER BY-in-CTAS clustering (O1: layout, not
    * semantics); `partitionBy` and `codec` are the 100 TB knobs the
    * reference lacks — zstd trades ~2x smaller cold storage (and scan
    * I/O) for slightly more write CPU than the snappy default; sorted
    * clustering additionally tightens parquet min/max row-group stats
    * for scan skipping.
    */
  def save(name: String, df: DataFrame, sortBy: Seq[String] = Nil,
           partitionBy: Seq[String] = Nil,
           codec: String = "snappy"): DataFrame = {
    val clustered = if (sortBy.nonEmpty) df.sortWithinPartitions(
      sortBy.map(org.apache.spark.sql.functions.col): _*) else df
    val writer = clustered.write.mode("overwrite")
      .option("compression", codec)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(s"$warehouse/$name")
    val back = spark.read.parquet(s"$warehouse/$name")
    back.createOrReplaceTempView(name)
    back
  }

  /** Append rows to an existing table (creating it if absent) and
    * re-register — the incremental-ingest primitive `save`'s overwrite
    * semantics can't express.
    */
  def append(name: String, df: DataFrame): DataFrame = {
    df.write.mode("append").parquet(s"$warehouse/$name")
    val back = spark.read.parquet(s"$warehouse/$name")
    back.createOrReplaceTempView(name)
    back
  }

  /** Whether `name` has ever been materialized in this warehouse. */
  def exists(name: String): Boolean =
    new java.io.File(s"$warehouse/$name").exists()

  /** Bucketed CTAS: co-locates rows by `bucketCols` so joins and
    * aggregations on those keys skip the shuffle entirely (both sides
    * read pre-partitioned, pre-sorted buckets). The 100 TB pattern for
    * fact⋈fact joins repeated across a workload — pay the partitioning
    * once at write time. Registered through the session catalog
    * (bucketing metadata lives there, not in the parquet footer).
    */
  def saveBucketed(name: String, df: DataFrame, bucketCols: Seq[String],
                   nBuckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", s"$warehouse/$name")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
    spark.table(name)
  }

  /** S7: non-materialized view over the catalog. */
  def createView(name: String, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView(name)
    spark.table(name)
  }

  /** S7 (SQL-text path): create a view by executing a `.sql` file read
    * from disk — the reference's exact mechanism
    * (`/root/reference/analysis/analyze_monthly_sales.py:30-39` reads
    * `sql/views/monthly_sales_summary.sql` and executes the text).
    * The file must hold one CREATE [OR REPLACE] [TEMPORARY] VIEW
    * statement (`--` comments fine; trailing semicolon stripped).
    * `rewrites` re-points table identifiers (whole-word) before
    * execution, so a caller can bind the view to a query-scoped
    * registration instead of clobbering a session-global name.
    * Returns the created view.
    */
  def createViewFromSql(path: String,
                        rewrites: Map[String, String] = Map.empty): DataFrame = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val stmt = rewrites.foldLeft(text.trim.stripSuffix(";")) {
      case (t, (from, to)) => t.replaceAll(
        "\\b" + java.util.regex.Pattern.quote(from) + "\\b",
        java.util.regex.Matcher.quoteReplacement(to))
    }
    spark.sql(stmt)
    val name = "(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:GLOBAL\\s+|LOCAL\\s+)?(?:TEMPORARY\\s+|TEMP\\s+)?VIEW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)".r
      .findFirstMatchIn(stmt)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"$path does not contain a CREATE VIEW statement"))
    spark.table(name)
  }

  def table(name: String): DataFrame = spark.table(name)

  /** S10: introspection — registered table names (SHOW TABLES analog). */
  def tables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).sorted.toSeq

  /** S10: DESCRIBE analog. */
  def describe(name: String): Seq[(String, String)] =
    spark.table(name).schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq

  /** S11: database-file lifecycle — drop the warehouse directory. */
  def dropWarehouse(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val root = new java.io.File(warehouse)
    if (root.exists()) rm(root)
  }
}
