package graft

import graft.engine.Graft
import graft.pipeline.{Invariants, RetailPipeline}

/** CLI entry point — the analog of the reference's
  * `python src/run.py --rawdir data/raw --db build/retail.duckdb
  * --rebuild` (`/root/reference/src/run.py:29-87`):
  * builds the full staged star schema into a parquet warehouse, logs
  * per-stage row counts, prints the catalog (inspect_db analog), shows
  * a monthly-view sample (analyze_monthly_sales analog), and aborts
  * with a nonzero exit if any invariant is violated (run.py:85-87).
  *
  *   sbt "runMain graft.Run <sfDir> <warehouseDir> [--rebuild]"
  */
object Run {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val warehouse = args.lift(1).getOrElse("/tmp/graft-warehouse")
    val rebuild = args.contains("--rebuild")
    val spark = Graft.session("graft-run")

    if (rebuild) new graft.engine.Catalog(spark, warehouse).dropWarehouse()

    val cat = RetailPipeline.build(spark, sfDir, warehouse)

    println("== catalog ==")
    cat.tables().foreach { t =>
      println(f"$t%-24s ${cat.table(t).count()}%10d rows")
    }

    println("== v_monthly_sales_summary (sample) ==")
    cat.table("v_monthly_sales_summary")
      .orderBy("year", "month", "country")
      .show(5, truncate = false)

    println("== invariants ==")
    val violations = Invariants.checkAll(cat).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    violations.foreach { case (n, v) => println(f"$n%-28s $v%6d") }
    spark.stop()
    if (violations.exists(_._2 != 0L)) {
      System.err.println("pipeline FAILED: invariant violations")
      sys.exit(1)
    }
  }
}
