package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string the
  * driver runs over the same parquet tables (builder contract in
  * SparkEntry.scala). Column aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered query modules, in build order. */
  def modules: Seq[Seq[Q]] = Seq(
    CoreQueries.all,
    PipelineQueries.all,
    TextQueries.all,
    DedupQueries.all,
    SimilarityQueries.all,
    MultimodalQueries.all
  )
  lazy val all: Seq[Q] = modules.flatten
}
