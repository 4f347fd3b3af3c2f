package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[Queries]]; each is one SURVEY §2 operator expressed
  * through the graft library with a DuckDB oracle where SQL-expressible. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.registry.head._2.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap

  /** CHEAP-STABLE queries excluded from the bench JSON line only (Verify,
    * the CORRECTNESS gate, and the bench's BENCH_LOCAL.json full record
    * still run and time them): the driver records exactly the last 2000
    * chars of the bench's stdout, and one entry past the budget truncates
    * the head of the line (the total) away. Membership policy (round 12,
    * per the round-11 verdict): the LINE must carry every expensive query
    * — anything whose BENCH_LOCAL time is ≥ ~1.5 s at sf0.1 stays ON the
    * line (the driver gate must time the registry's heaviest work, or a
    * regression in exactly the queries most likely to regress is
    * invisible to the round record) — so the exclusions are the CHEAPEST,
    * most stable entries (sub-second scans/projections whose plans
    * haven't changed in rounds), rotated out to pay the line budget for
    * new heavy queries. NOT new-by-default: a new heavy query displaces
    * another cheap-stable entry instead of hiding here. Every name here
    * must exist in [[queries]] and carry an oracle (BenchSpec asserts
    * both, and that nothing here is expensive). */
  val nonBenchQueries: Set[String] =
    Set("aug_mstl", "q_top3_parts_per_brand", "doc_sample_stratified",
      "doc_split", "doc_shard", "doc_dup_spans", "doc_bm25",
      "q06_forecast_revenue", "q_filter_pushdown", "evt_mapfilter",
      "evt_delay_1h", "q_case_agg", "q_anti_join", "evt_limit3",
      "doc_fingerprint", "mkt_trades", "evt_cohort", "evt_hist", "doc_mixwts",
      "q01_pricing_summary", "evt_tumbling_1d", "q_semi_join",
      // round 13: rotated out (0.7 s sub-second JSON projection, plan
      // unchanged since round 5) to pay the line budget for the two new
      // heavy emb_decontam_inc/_hier entries
      "evt_json_extract",
      // round 13 second batch: two more sub-0.2 s stable scans rotated
      // out for the doc_dsir / doc_hybrid_rrf additions
      "evt_pctiles", "evt_running_count",
      // round 13 third batch: two sub-0.25 s stable scans rotated out for
      // the doc_dedup_segments / doc_dedup_bloom additions
      "evt_difference", "evt_distinct_consec",
      // round 13 fourth batch: a sub-0.25 s stable scan rotated out for
      // the doc_heavy_tokens addition
      "evt_cumsum",
      // round 13 fifth batch: three sub-0.55 s stable scans rotated out
      // for evt_pctile_cert / doc_token_budget / doc_source_cap
      "evt_buffer10", "q_events_daily", "q_distinct_parts",
      // round 13 sixth batch: a sub-0.45 s stable projection (plan
      // unchanged since round 5) rotated out for doc_quality_pctile
      "mm_frame_sample",
      // round 13 seventh batch: three sub-0.55 s stable entries (the
      // TPC-H q03 broadcast join, the VWAP window pair, the sessionize
      // window chain — plans unchanged since the early rounds;
      // doc_dedup_* is never-excludable) rotated out for doc_bpe_train /
      // doc_bpe_encode / doc_bpe_oov
      "q03_shipping_priority", "mkt_vwap", "evt_sessionize_1h",
      // round 14: three sub-0.7 s stable entries (the mm feature-stub
      // projection, plan unchanged since round 6; the EWMA half-life
      // variant of the same per-tick scan as evt_ewma, which stays on
      // the line; the OHLCV window agg, stable since round 3 —
      // book_top/book_depth3 keep the market family on the line)
      // rotated out for doc_bpe_train_bytes / doc_bpe_encode_bytes
      "mm_features", "evt_ewma_hl", "mkt_ohlc",
      // round 14 second batch: a sub-0.7 s stable feedback-epoch window
      // chain (plan unchanged since round 9; its parity + golden gates
      // stay) rotated out for the composed doc_curate_e2e entry
      "evt_feedback_epochs",
      // round 14 third batch: three sub-0.7 s stable entries (the
      // funnel window chain — streaming twin + goldens stay; the
      // combine merge variant — evt_merge stays on the line; the
      // dynamic-group window chain, plan unchanged since round 6)
      // rotated out for doc_overlap_matrix / doc_ppl_buckets
      "evt_funnel", "evt_combine", "dyn_group",
      // round 14 fourth batch: a sub-1 s stable timer-delay scan (plan
      // unchanged since round 6; parity + golden gates stay) rotated
      // out for emb_cluster_cap
      "evt_delay_reset",
      // round 14 fifth batch: two sub-0.9 s stable TPC-H broadcast
      // joins (plans unchanged since round 3; book_top/book_depth3 and
      // the q_* scans keep join coverage on the line) rotated out for
      // doc_eval_contam_report / doc_winnow
      "q05_regional_revenue", "q10_returns",
      // round 15: two sub-0.8 s stable entries rotated out for
      // aug_dtw / aug_cluster (the §2.8 ops joining the line) — the ETS
      // recurrence (golden + oracle + recursive-CTE gate stay; the aug
      // family keeps 7 entries on the line) and the throttle bucket scan
      // (plan unchanged since round 3; parity + exact-throttle goldens
      // stay)
      "aug_ets", "evt_throttle_1h",
      // round 15 second batch: a sub-0.6 s stable sliding-window scan
      // (plan unchanged since round 5; its oracle stays) rotated out
      // for emb_outlier
      "doc_chunk",
      // round 15 third batch: a sub-0.7 s stable as-of scan (plan
      // unchanged since round 3; parity + golden gates stay) rotated
      // out for doc_pack_efficiency
      "evt_sample_asof",
      // round 18: a sub-0.8 s stable cumulative-stats window chain
      // (plan unchanged since round 4; oracle + two-heap-median goldens
      // stay) rotated out to pay the ~18-char line budget of the
      // continuous capacity tracer's ctlb [p50, p90] certificate
      "evt_cumulative_stats",
      // round 18 second batch: a sub-0.7 s stable time-weighted rolling
      // scan (plan unchanged since round 4; oracle + goldens stay;
      // evt_tw_cumulative / evt_tw_timewin / evt_tw_median keep the
      // time-weighted family on the line) rotated out for the per-pass
      // hypervisor steal certificate (ctls)
      "evt_tw_rolling",
      // round 16: a sub-0.4 s stable running-accumulate window scan
      // (plan unchanged since round 2; its oracle stays) rotated out
      // for aug_ets_roll (the per-tick sliding-refit ETS joining the
      // line — the forecast family's closest-to-reference form)
      "evt_accumulate",
      // round 17: a sub-0.6 s stable token-count projection (plan
      // unchanged since round 6; its oracle stays; doc_quality /
      // doc_gopher / doc_lang_guess keep the text family on the line)
      // rotated out for aug_seasons_roll (the per-tick rolling ACF
      // joining the line)
      "doc_token_stats",
      // round 17 second batch: a sub-0.55 s stable greedy-packing scan
      // (plan unchanged since round 14; its oracle stays;
      // doc_pack_efficiency keeps the packing family on the line)
      // rotated out to pay for the ctlp noise-probe array joining the
      // stdout line
      "doc_pack_sequences",
      // round 17 third batch: a sub-0.65 s stable two-stream zip-latest
      // merge (plan unchanged since round 3; parity + oracle stay;
      // evt_join_latest/evt_join_passive/evt_join3 keep the
      // multi-stream family on the line) rotated out for the ctld disk
      // probe's line budget
      "evt_merge")

  /** The bench line's query set: the registry minus [[nonBenchQueries]]. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries -- nonBenchQueries
}
