package graft

import java.nio.file.Files
import graft.engine.{Catalog, Graft}

/** Bucketed co-located join: writing both sides bucketed+sorted on the
  * join key must eliminate the shuffle — the join plan contains no
  * Exchange below the SortMergeJoin, and results match the plain join.
  * Plus the ANN-store layout claim: a bucket-partitioned embedding
  * table must prune probes to the probed partition.
  */
class BucketSpec extends SparkTestBase {

  test("bucket-partitioned ANN store prunes the scan to the probed bucket") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft-annstore").toString
    val e = graft.queries.SimilarityQueries
      .withBucket(Graft.table(spark, sfDir, "embeddings"), "embedding")
    e.write.mode("overwrite").partitionBy("bucket").parquet(wh)
    val store = spark.read.parquet(wh)
    val probe = store.filter(col("bucket") === 3)
    // the bucket predicate must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group filtering within files)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("bucket"), plan.take(800))
    // and the scan's runtime metrics confirm only the probed partition's
    // files were read — strictly fewer than the whole store's
    probe.collect() // drives THIS queryExecution so its metrics populate
    val scan = probe.queryExecution.executedPlan.collectLeaves().head
    val probedFiles = scan.metrics("numFiles").value
    assert(probedFiles > 0 && probedFiles < store.inputFiles.length,
      s"probe read $probedFiles files of ${store.inputFiles.length}")
  }

  test("bucketed fact-fact join plans without a shuffle and matches plain join") {
    val wh = Files.createTempDirectory("graft-bkt").toString
    val cat = new Catalog(spark, wh)
    val li = Graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lb = cat.saveBucketed("bkt_lineitem", li, Seq("l_orderkey"), 8)
      val ob = cat.saveBucketed("bkt_orders", o, Seq("o_orderkey"), 8)
      val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1200)}")
      assert(plan.linesIterator.count(_.contains("SelectedBucketsCount")) == 2
        || plan.contains("Bucketed: true"), plan.take(1200))

      val bucketed = joined.count()
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(bucketed === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
