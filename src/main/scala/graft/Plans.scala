package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Registry

/** Plan-audit dump: writes `PLANS.md` with the formatted physical plan
  * of the headline queries, so plan shapes can be reviewed (and diffed
  * round-over-round) without running Spark. Regenerate with:
  *
  *   sbt "runMain graft.Plans /root/testdata/sf0.001 PLANS.md"
  */
object Plans {

  /** The queries whose plans carry the scale argument (SCALE.md). */
  val Headline: Seq[String] = Seq(
    "g5_daily_country_rollup", "g6_monthly_summary", "g9_topk_revenue",
    "j6_fact_variants_join", "pipe_monthly_summary",
    "d2_ngram_jaccard", "d3_minhash_lsh", "d4b_simhash_near",
    "d5_embedding_neardup", "d6_winnowing_decontam",
    "a2_ann_lsh_bucketed", "e7_salted_agg", "t6_tfidf_topterms",
    "w1p_forward_fill_partitioned", "e4_sessionize_batch",
    "c2_mixture_sample", "c3_sequence_pack", "d8_split_decontam",
    // round 8: chunking must stay map-only, the cohort matrix reuses
    // one user_id partitioning, the RANGE frame runs at date
    // cardinality, per-partition checksums stay one scan + one shuffle
    "c4_chunk_documents", "e10_retention_cohorts",
    "w4_moving_avg_range", "x6_partition_checksums",
    // round 9: the mixture filter must broadcast its rate table (doc
    // rows never shuffle pre-filter), BPE pair counting must run at
    // vocab cardinality, the epoch shuffle is one hash partition
    "c7_temperature_mixture", "c8_corpus_shuffle", "t12_bpe_pairs",
    // round 12: the interval join must stay a hash join on the bin
    // key (never a nested loop), the PQ scan must join only broadcast
    // sides, d12's reworked filter chain must keep one explode pass
    "e11_interval_join", "a9b_pq_trained", "d12_exact_substring",
    // round 12b: BM25 must probe only query-term postings (no corpus
    // self-join), the Gram stats must carry no data-path join (the
    // coordinate-sum side broadcasts d rows)
    "t17_bm25_topk", "a10_embedding_gram",
    // round 13: the hybrid fusion must join two top-k lists (both arms
    // already reduced — no corpus-sized input on either side of the
    // full-outer join), the drift profile must be one corpus scan into
    // a (feature, category)-cardinality aggregate, a8b's 6-plane
    // hard-negative join must shuffle on bucket like a5b
    "t19_hybrid_rrf", "x11_drift_profile", "a8b_hard_negatives_moreplanes",
    // round 13b: the segment rewrite's decision shuffle must carry
    // digests not text (PlanSpec pins it; the plan here documents it),
    // and the bloom probe must join only the broadcast bit set — build
    // rows never broadcast, probe rows never shuffle for membership
    "d15_segment_dedup_rewrite", "x14_bloom_semijoin",
    // round 14: the end-to-end corpus release must keep each stage's
    // scale shape through the fused plan; t19b's dense arm must reach
    // its candidates by a bucket HASH join (the nested loop is gone —
    // that's the row's reason to exist); x14's differential is one
    // aggregate job now, visible as a single plan
    "pipe_corpus_release", "t19b_hybrid_rrf_indexed",
    // round 14 rows that landed after the last regen (r14 verdict #4):
    // the bloom probe must join only the broadcast bit set; the probe
    // sweep must fan ONE centroid ranking by a 4-value explode and
    // reach candidates through the a3 cell hash join per rung
    "d16_bloom_decontam", "a12_ivf_probe_sweep",
    // round 15: incremental CC must run its loop on the CONTRACTED
    // graph only and re-label the table by one broadcast join; the
    // streaming decontam twin's read-side differential is one scan of
    // the sink into a 1-row aggregate (the stream itself is the plan's
    // precondition, not its body)
    "o12_incremental_cc", "d16s_decontam_stream",
    // round 16: both registry consumers must read the COMPACTED
    // delta log as a plain pruned scan (no merge aggregate — the
    // single-delta view), o11s/o12s read-side merges must group at
    // dictionary cardinality over the delta union, and the release's
    // label scan must hit the o12 warehouse table (the maintained
    // artifact, not the from-scratch memo)
    "o11_incremental_segments", "o12s_cc_label_stream")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    // Show the at-scale join strategy: size-based auto-broadcast off,
    // so only the EXPLICIT broadcast() hints (the bounded dims)
    // broadcast — exactly what a 100 TB input would plan.
    val spark = graft.engine.Graft.session("graft-plans", defaultCpus = "4",
      extraConf = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Registry: ${Registry.all.size} queries " +
      s"(${Headline.size} headline plan dumps + the all-query join census).\n")
    sb.append(s"Generated by `graft.Plans` on `$sfDir` with\n")
    sb.append("`autoBroadcastJoinThreshold=-1`, so joins show their\n")
    sb.append("at-scale strategy: explicitly hinted (bounded-dim)\n")
    sb.append("broadcasts survive, unhinted large joins shuffle. Plan\n")
    sb.append("SHAPES are scale-independent; sizes in the dump are not.\n")
    sb.append("Regenerate: `sbt \"runMain graft.Plans <sfDir> PLANS.md\"`.\n")
    // build every query ONCE — several builders carry real side effects
    // (o4's ingests, the streaming one-shots, scratch materializations),
    // so explaining a query twice would double the generation cost
    val plans: Map[String, String] = Registry.all.map { q =>
      q.name -> q.run(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
    }.toMap
    Headline.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        sb.append(s"\n## $name\n\n${q.doc}\n\n```\n${plans(name)}```\n")
      }
    }

    // The registered g5/g6/s7/g9 read the per-dir daily-rollup memo
    // (the reference's agg_country_day-as-TABLE shape), so their plans
    // above are scans; the fused pipeline that builds that memo — the
    // plan that actually runs once per corpus — is shown here.
    sb.append("\n## dailyCountryRollup (builder of the g5/g6/s7/g9 memo)\n\n")
    sb.append("The lineitem-per-order pre-aggregation + broadcast-dim " +
      "join + (date, country) rollup executed once per corpus to " +
      "materialize the shared daily aggregate.\n\n```\n")
    sb.append(graft.queries.CoreQueries.dailyCountryRollup(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted")))
    sb.append("```\n")

    // Join-strategy census over EVERY registered query: one line per
    // query counting physical join operators, and a hard failure on an
    // unplanned cartesian/nested-loop — the regression this artifact
    // exists to catch (a dropped join key degrades silently into an
    // all-pairs scan that works at sf0.001 and melts at 100 TB).
    // Sanctioned exceptions, each with a bounded side by design:
    //   a1/a6 — exact / quantized ANN baselines: corpus x broadcast
    //         5-row query set
    //   w1p — dense grid construction: date series x distinct keys
    //         (date-cardinality x key-cardinality, both bounded)
    //   t6/t9 — a 1-row corpus-total scalar joined onto every row
    //         (the broadcast-scalar alternative to a driver .first())
    //   a3/a4 — IVF assignment: every vector scores ALL k centroids
    //         (broadcast k-row side; O(corpus x k) IS the algorithm)
    //   t11 — every row banded against the broadcast 1-row decile
    //         bounds array (same scalar shape as t6/t9)
    //   d11 — SemDeDup centroid assignment: every vector scores the
    //         broadcast k-row codebook (same shape as a3/a4)
    //   c9 — the broadcast 1-row normalizer joined onto the
    //        domain-cardinality counts frame (same scalar shape as t11)
    //   a7 — the exact-baseline arm of the recall report scores the
    //        broadcast query set against the corpus (same shape as a1)
    //   d11b — same broadcast k-row codebook shape as d11, with the
    //        codebook trained (a4b) instead of hashed-seeded
    //   a7b/a7c — recall reports: the exact-baseline arm scores the
    //        broadcast query set against the corpus (same shape as a7)
    //   c9b — same broadcast 1-row normalizer shape as c9, over the
    //        BPE-token counts
    //   d11c — three broadcast SCALAR frames (cluster totals, the
    //        p99 row, the over-2x-avg count — each ≤1 row by
    //        construction) cross-joined onto k-row / 1-row frames;
    //        the t6/t9/c9 broadcast-scalar shape, never corpus-sized
    //   t17 — the broadcast 1-row corpus-stats frame (N, total tokens)
    //        joined onto the query-term postings (t6's scalar shape)
    //   a9c — the 5-row query set scores the broadcast k-row coarse
    //        codebook to pick probe cells (the a3/d11 assignment
    //        shape: bounded × broadcast-bounded, never corpus-sized)
    //   a11 — the a7 recall-harness shape: both the exact arm and the
    //        truncated arm score the broadcast 5-row query set
    //        against the corpus (deliberate full scans — ground truth
    //        and unblocked truncated ranking both require them)
    val CrossAllowed = Set("a1_ann_bruteforce", "a6_ann_quantized",
      "w1p_forward_fill_partitioned", "t6_tfidf_topterms", "t9_vocab_topk",
      "a3_ann_ivf", "a4_ivf_train", "t11_equidepth_histogram",
      "d11_semantic_dedup", "c9_token_budget", "a7_ann_recall",
      "a4b_ivf_train_iters", "d11b_semantic_dedup_trained",
      "a7b_ivf_recall", "a7c_quantized_recall", "c9b_token_budget_bpe",
      "d11c_semantic_cluster_stats", "t17_bm25_topk", "a9c_ivfadc",
      // t18 — the broadcast 1-row corpus-count frame joined onto the
      //      vocabulary-cardinality first-seen frame (t6's scalar shape)
      "a11_mrl_recall", "t18_vocab_growth",
      // t17b — t17's scalar corpus-stats shape, with the 1-row frame
      //      read from the maintained postings table instead of agg'd
      // a9d — a9c's probe-cell assignment shape with trained codebooks
      // o10 — a3's broadcast k-row centroid assignment shape, run per
      //      ingest batch against the maintained inverted file
      "t17b_bm25_maintained", "a9d_ivfadc_trained",
      "o10_incremental_ivf",
      // x11 — the broadcast 1-row snapshot-totals frame joined onto
      //      the (feature, category)-cardinality counts (t6's scalar
      //      shape, never corpus-sized)
      // t19 — t17's scalar corpus-stats shape inside the BM25 arm;
      //      the fusion itself joins two top-k lists
      "x11_drift_profile", "t19_hybrid_rrf",
      // t19b — the BM25 arm keeps t17's broadcast scalar corpus-stats
      //      shape; the DENSE arm is the point of the row: a bucket
      //      equi-join, hash-joinable, no nested loop
      // a12 — a3's broadcast k-row centroid assignment plus the
      //      a7-harness exact ground-truth arm (deliberate full scans)
      "t19b_hybrid_rrf_indexed", "a12_ivf_probe_sweep")
    sb.append("\n## Join-strategy census (all queries)\n\n")
    sb.append("| query | BHJ | SMJ | SHJ | BNLJ | cartesian |\n")
    sb.append("|---|---|---|---|---|---|\n")
    Registry.all.foreach { q =>
      val plan = plans(q.name)
      // count the "(n) OpName" detail headers only — the tree section
      // prints every node a second time
      def n(op: String) = s"\\(\\d+\\) $op".r.findAllIn(plan).size
      val (bnlj, cart) = (n("BroadcastNestedLoopJoin"), n("CartesianProduct"))
      require(bnlj + cart == 0 || CrossAllowed(q.name),
        s"${q.name}: unplanned cartesian/nested-loop join\n${plan.take(1500)}")
      sb.append(s"| ${q.name} | ${n("BroadcastHashJoin")} " +
        s"| ${n("SortMergeJoin")} | ${n("ShuffledHashJoin")} " +
        s"| $bnlj | $cart |\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
