package graft

import graft.queries.Registry
import org.apache.spark.sql.types._

/** Registry-wide output-contract lints — invariants every registered
  * query must satisfy for the driver's cross-engine gate to be able to
  * pass, checked BEFORE the driver does.
  *
  * The DecimalType ban exists because round 12 proved the driver's
  * hasher renders a DECIMAL output column differently on the
  * Spark-parquet and DuckDB sides (`Decimal('123')` vs `123.0`): the
  * only two registered queries emitting DECIMAL (a10/o8) were the only
  * two hash failures, while being cell-value-identical under str()
  * comparison. DECIMAL stays fine INTERNALLY (exact, order-independent
  * accumulation); at the output boundary every query must cast to a
  * hash-stable type (BIGINT, or DOUBLE where the values are exact
  * integers below 2^53). No allow-list — a query that genuinely needs
  * DECIMAL-typed output has no way to hash-match and must not be
  * registered as an oracle row.
  */
class RegistrySpec extends SparkTestBase {

  private def decimalFields(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          decimalFields(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimalFields(a.elementType, s"$path[]")
      case m: MapType =>
        decimalFields(m.keyType, s"$path.key") ++
          decimalFields(m.valueType, s"$path.value")
      case _ => Nil
    }

  test("no registered query's output schema contains DecimalType " +
      "(driver hash gate renders DECIMAL asymmetrically across engines)") {
    val offenders = Registry.all.flatMap { q =>
      // Building the frame is enough — schema inspection needs no job
      // for the declarative queries, and the drive-style builders
      // (o4/o6/o8/...) run their sf0.001 ingest exactly as Verify does.
      val schema = q.run(spark, sfDir).schema
      val hits = schema.fields.toSeq.flatMap(f =>
        decimalFields(f.dataType, f.name))
      if (hits.isEmpty) Nil else Seq(s"${q.name}: ${hits.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"DecimalType at a registered output boundary (cast to " +
        s"BIGINT/DOUBLE before emitting):\n  ${offenders.mkString("\n  ")}")
  }

  test("registered query names are unique") {
    val dupes = Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate registry names: ${dupes.mkString(", ")}")
  }
}
