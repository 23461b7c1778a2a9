package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Registry

/** Plan-shape regression guards: the physical properties the 100 TB
  * design depends on must survive refactors — broadcast dims, filters
  * reaching the parquet scan, the composite fact join staying a real
  * shuffle join when the inputs are too big to broadcast, partitioned
  * (not single-task) windows, and whole-stage codegen around the native
  * expression.
  */
class PlanSpec extends SparkTestBase {

  private def df(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sfDir)

  private def formatted(name: String): String =
    df(name).queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("g5 rollup broadcasts both dimension joins") {
    // The registered g5 reads the per-dir memo (the reference's
    // agg_country_day-as-TABLE shape), so guard the plan of the memo's
    // BUILDER — the fused pipeline that actually executes once per
    // corpus — not the post-materialization scan.
    val p = graft.queries.CoreQueries.dailyCountryRollup(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("g6 reads the shared daily-rollup memo, not the lineitem pipeline again") {
    // the memo exists so five consumers stop re-running the fact-scale
    // pre-aggregation; a regression that re-inlines the builder into a
    // consumer would silently quintuple the rollup family's cost
    val p = formatted("g6_monthly_summary")
    val scans = p.linesIterator.filter(_.contains("Location")).mkString("\n")
    assert(!scans.contains("lineitem"), s"lineitem scanned directly:\n$scans")
    assert(scans.contains("daily_rollup"), scans)
  }

  test("p9 filter gauntlet pushes every predicate to the parquet scan") {
    val p = formatted("p9_filter_gauntlet")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    Seq("l_shipdate", "In(l_linenumber", "l_returnflag", "IsNotNull(l_quantity)")
      .foreach(f => assert(pushed.contains(f), s"missing pushed filter $f in: $pushed"))
  }

  test("j6 composite join shuffles when the fact sides can't broadcast") {
    // sf0.001 fits under the broadcast threshold, which would hide the
    // join strategy the query is designed around — disable it here.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = formatted("j6_fact_variants_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("j6 reads the shared fact frame from scratch parquet, not lineitem twice") {
    // The per-line fact frame is materialized once; both join sides must
    // scan the small projected scratch table — a plan that still scans
    // lineitem would re-read and re-project the full fact at 100 TB.
    val p = formatted("j6_fact_variants_join")
    val scans = p.linesIterator.filter(_.contains("Location")).mkString("\n")
    assert(!scans.contains("lineitem"), s"lineitem scanned directly:\n$scans")
    assert("j6_fact".r.findAllIn(scans).size >= 2, scans)
  }

  test("j6b bucketed fact join carries zero Exchange") {
    // the 100 TB shape: both fact variants written bucketBy+sortBy the
    // composite join key, so the fact⋈fact join streams co-located,
    // pre-sorted bucket files — no shuffle at all. Broadcast disabled
    // so a small SF can't hide the join strategy.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.queries.PipelineQueries.j6bJoined(spark, sfDir)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"),
        s"bucketed fact join must not shuffle:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("j6b matches j6's result exactly (bucketing is layout, not semantics)") {
    val j6 = df("j6_fact_variants_join").collect().map(_.toSeq)
    val j6b = df("j6b_fact_variants_bucketed").collect().map(_.toSeq)
    assert(j6.toSeq == j6b.toSeq)
  }

  test("w1p window is partitioned, not single-task") {
    val p = formatted("w1p_forward_fill_partitioned")
    val windowLine = p.linesIterator.find(_.trim.startsWith("Arguments: [last"))
      .orElse(p.linesIterator.find(_.contains("windowspecdefinition")))
      .getOrElse(fail(s"no window node found in plan:\n${p.take(1200)}"))
    assert(windowLine.contains("event_type"), windowLine)
  }

  test("c3 packing window is shard-partitioned, not global") {
    // Sequence packing must stay shard-local: a regression to a global
    // running-sum window would single-task the 100 TB corpus.
    val p = formatted("c3_sequence_pack")
    val windowLine = p.linesIterator.find(_.contains("windowspecdefinition"))
      .getOrElse(fail(s"no window node found in plan:\n${p.take(1200)}"))
    assert(windowLine.contains("lang"), windowLine)
  }

  test("c5/c6 curation windows are band/source-partitioned, not global") {
    // Both batching windows must partition on their bounded key — a
    // global window would single-task the 100 TB corpus.
    val c5 = formatted("c5_length_buckets")
    val c5w = c5.linesIterator.find(_.contains("windowspecdefinition"))
      .getOrElse(fail(s"no window node in c5 plan:\n${c5.take(1200)}"))
    assert(c5w.contains("band"), c5w)
    val c6 = formatted("c6_domain_cap")
    val c6w = c6.linesIterator.find(_.contains("windowspecdefinition"))
      .getOrElse(fail(s"no window node in c6 plan:\n${c6.take(1200)}"))
    assert(c6w.contains("source"), c6w)
  }

  test("x8 version diff is one co-partitioned join, never a broadcast of a version") {
    // Both versions are fact-scale at 100 TB: the diff must be a
    // shuffle join on the key (SortMergeJoin/ShuffledHashJoin), not a
    // BroadcastHashJoin (an OOM at scale) or a nested loop (all-pairs).
    val p = formatted("x8_version_diff")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"x8 must shuffle-join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin"), "x8 fell back to NL join")
    assert(p.contains("FullOuter"), "x8 must be a full-outer diff")
  }

  test("d10 joins the corpus to labels without recomputing cluster formation") {
    // The label side must be a storage scan (the memoized CC output),
    // not an inlined re-run of the component loop.
    val p = formatted("d10_dedup_corpus")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans >= 2, s"expected corpus + label parquet scans:\n${p.take(1200)}")
    assert(!p.contains("windowspecdefinition"),
      "d10 should be a plain join+project, no windows")
  }

  test("graft_dot runs inside whole-stage codegen over the scan") {
    // single-stage projection: AQE collapses multi-stage plans' inner
    // trees in toString, hiding the codegen markers a1 itself carries.
    val q = graft.engine.Graft.table(spark, sfDir, "embeddings")
      .selectExpr("graft_dot(embedding, embedding) AS d")
    val p = q.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*")), p.take(1200))
  }

  test("graft_strhash runs inside whole-stage codegen over the scan") {
    val q = graft.engine.Graft.table(spark, sfDir, "documents")
      .selectExpr("graft_strhash(text) AS h")
    val p = q.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("graft_strhash") && l.trim.startsWith("*")), p.take(1200))
  }

  test("graft_nfc runs inside whole-stage codegen over the scan") {
    val q = graft.engine.Graft.table(spark, sfDir, "documents")
      .selectExpr("graft_nfc(text) AS s")
    val p = q.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("graft_nfc") && l.trim.startsWith("*")), p.take(1200))
  }

  test("m5 payload dedup prunes the binary payload from the exchange") {
    // The digest shuffle must carry (h, doc_id, nb, kind) — the payload
    // bytes themselves never cross the wire. A plan that exchanges the
    // payload column ships the whole media corpus through the shuffle.
    val p = formatted("m5_payload_dedup")
    val exchanges = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange") => i
    }.toSeq
    assert(exchanges.nonEmpty, p.take(600))
    // every Exchange's argument list in the formatted plan omits payload
    val exchangeArgs = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
      .mkString("\n")
    assert(!exchangeArgs.contains("payload"),
      s"payload crossed an exchange:\n$exchangeArgs")
  }

  test("d15 digest-keyed decision exchange carries no segment text") {
    // The corpus-wide first-occurrence window shuffles (doc_id, start,
    // h) triples; segment literals may only cross the wire on the
    // bounded literal-confirm (seg-keyed) and doc_id-keyed rebuild
    // exchanges. A digest exchange whose input carries seg/tk/text
    // ships corpus strings through the decision shuffle.
    val p = formatted("d15_segment_dedup_rewrite")
    val blocks = p.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning(h#"))
    assert(blocks.nonEmpty, p.take(800))
    blocks.foreach { b =>
      val input = b.linesIterator.filter(_.startsWith("Input")).mkString
      Seq("seg#", "tk#", "text#").foreach(c =>
        assert(!input.contains(c),
          s"segment text crossed the digest exchange:\n$b"))
    }
  }

  test("x10 funnel's only data-sized exchange is the dedup hash partition") {
    // One hash partition on the content digest (which exact dedup needs
    // anyway), then a single-partition exchange for the global one-row
    // aggregate — any additional data-sized exchange means a stage flag
    // escaped the conditional-aggregate design.
    val p = formatted("x10_corpus_funnel")
    val hashParts = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(hashParts.size <= 1, s"extra hash exchanges:\n${hashParts.mkString("\n")}")
  }

  test("t16 encode joins the vocab back broadcast; corpus agg is map-side combined") {
    // The scale contract: the corpus-sized stage is ONE (doc_id, word)
    // hash exchange with partial aggregation before it (map-side
    // combine), and the encoded vocab rides back as a broadcast — a
    // shuffle join here would add a corpus-sized word-keyed exchange.
    // The registered query reads the memoized parquet; assert on the
    // computation plan itself.
    val p = graft.queries.TextQueries.bpeDocTokensPlan(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("x10b funnel label join broadcasts; one data-sized exchange total") {
    // Labels are near-dup participants only (broadcast-sized); the
    // funnel itself must not add a data-sized exchange beyond reading
    // the memoized label table.
    val p = formatted("x10b_corpus_funnel_neardup")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    val hashParts = p.linesIterator
      .filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(hashParts.isEmpty, s"extra hash exchanges:\n${hashParts.mkString("\n")}")
  }

  test("e7 salted aggregate is a real two-stage plan over the salt") {
    val p = formatted("e7_salted_agg")
    // stage 1 groups on (event_type, salt), stage 2 on event_type alone;
    // both survive as distinct hash aggregates with an exchange between.
    assert(p.contains("salt"), p.take(800))
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(800))
    assert("Exchange".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("connected-components round plan has no single-partition stage") {
    // The per-round label write used to carry a hardcoded coalesce(1):
    // fine at fixture scale, a serialized single task per round when the
    // label table is O(corpus). The round must end in an ordinary
    // aggregate shuffle that AQE right-sizes.
    import org.apache.spark.sql.functions.col
    val docs = graft.engine.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
    val labels = docs.select(col("a").as("v"), col("a").as("l"))
    val p = graft.queries.DedupQueries.ccStep(docs, labels)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Coalesce 1"), p.take(1200))
    assert(!p.contains("SinglePartition"), p.take(1200))
  }

  test("queries project only needed columns from wide tables") {
    val p = formatted("g4_conditional_distinct")
    val scan = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("o_orderkey") && scan.contains("o_orderstatus"))
    assert(!scan.contains("o_totalprice") && !scan.contains("o_orderpriority"),
      scan)
  }

  test("a5 knn-join shuffles on bucket when neither side can broadcast") {
    // The many-to-many retrieval shape: at corpus scale neither the
    // query table nor the candidate table broadcasts, so the bucket
    // join must plan as a real shuffle join — a nested-loop or a
    // forced broadcast here would be the all-pairs scan the LSH
    // bucketing exists to avoid.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = formatted("a5_knn_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(800))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("e11 interval join plans as a hash join on the bin key, never a nested loop") {
    // The bin-and-refine contract: a ts-BETWEEN interval join with no
    // equi-key would plan as CartesianProduct/BroadcastNestedLoopJoin —
    // the quadratic shape binning exists to avoid. The exploded hour
    // bucket must give Catalyst a real equi-key even when neither side
    // can broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = formatted("e11_interval_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(800))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a9b PQ scan broadcasts codebooks and distance tables; adc agg is map-combined") {
    // PQ's scale contract: the corpus-side scan joins only BROADCAST
    // sides (codebooks: k×m rows; per-query distance tables: q×m×k
    // rows) — a shuffle join on the corpus here would move the vector
    // table for structures that are bounded by the codebook size, not
    // the corpus.
    val p = formatted("a9b_pq_trained")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // the decimal ADC aggregate must arrive partial (map-side combine)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    // The 100 TB knob for fact⋈filtered-dim shuffle joins that can't
    // broadcast: Catalyst's InjectRuntimeFilter builds a bloom filter
    // from the selective side and applies it as a scan-side
    // might_contain predicate on the fact, cutting shuffle input before
    // the join. The thresholds default to cluster scale
    // (applicationSideScanSizeThreshold = 10GB), so at test scale we
    // lower them to prove the plan shape the production config relies
    // on; SCALE.md documents the production values.
    import org.apache.spark.sql.functions.col
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "-1") // force the shuffle join under test
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "0")
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val p = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("might_contain"),
        s"no bloom-filter runtime filter injected:\n${p.take(2000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("AQE splits a skewed join partition at runtime (the third skew lever)") {
    // The suite's skew levers are (1) manual salting (e5/e7 pattern),
    // (2) domain caps (c6), and (3) AQE's OptimizeSkewedJoin, which
    // re-splits an oversized shuffle partition at runtime without any
    // query rewrite. x12 is the census that flags the keys; this test
    // proves lever (3) actually engages on a planted hot key: one key
    // carries ~half of one side of a shuffle join, thresholds are
    // lowered to test scale (production defaults are cluster-sized,
    // SCALE.md documents them), and the FINAL adaptive plan must show
    // the skew split — the join reads more partitions than the static
    // shuffle produced for the hot side.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold", // force the shuffle join
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "-1")
    spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "1")
    spark.conf.set(keys(3), "64KB")
    spark.conf.set(keys(4), "32KB")
    spark.conf.set(keys(5), "false")
    try {
      // planted skew: key 0 holds 50k rows with a fat payload, the
      // other 5k rows spread over 5k keys; the probe side is uniform
      val hot = spark.range(55000).select(
        when(col("id") < 50000, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("v"), col("id").cast("string"),
          lit("x" * 64)).as("payload"))
      val probe = spark.range(5000).select(col("id").as("k"),
        col("id").as("w"))
      val joined = hot.join(probe, Seq("k"))
      // execute THIS dataset (collect, not count — count builds its own
      // QueryExecution) so AQE finalizes joined's own adaptive plan
      joined.collect()
      val p = joined.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      assert(p.contains("AQEShuffleRead"), s"no AQE read:\n${p.take(1500)}")
      // Spark marks the re-split read in the formatted plan
      assert(p.contains("skewed"),
        s"skew split did not engage:\n${p.take(3000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("o10 probe scan partition-prunes the cell-partitioned inverted file") {
    // The maintained IVF index is written partitionBy(cent_id); the
    // probe's isin filter over the collected cell ids must reach the
    // scan as a PARTITION filter (directory pruning — 'a probe reads 2
    // partitions'), not a post-scan predicate. A regression here makes
    // every probe a full-index scan, invisible at fixture scale.
    val p = formatted("o10_incremental_ivf")
    val pf = p.linesIterator
      .filter(_.contains("PartitionFilters:")).mkString("\n")
    assert(pf.contains("cent_id") && pf.contains("IN ("),
      s"probe scan lost the cent_id partition filter:\n$pf\n${p.take(800)}")
  }
}
