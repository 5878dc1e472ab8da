package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, posexplode}

import graft.etl.{Marts, Metrics}
import graft.ops.{Dedup, Events, Multimodal, Relational, Similarity, TextAnalysis}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 appears once in `queries`, with a
  * DuckDB-runnable oracle twin in `oracleSql` (same column names — the driver sorts
  * columns by name before hashing). Numeric determinism strategy: see
  * [[graft.core.Num]] — exact decimal aggregation, decimal-domain rounding, doubles
  * only for per-row IEEE-deterministic arithmetic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Metrics.salesIncentive(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_csv_ingest"       -> ((s, d) => Relational.csvIngest(s, d)),
    "q02_filter"           -> ((s, d) => Relational.filterShipments(s, d)),
    "q03_pricing_summary"  -> ((s, d) => Relational.pricingSummary(s, d)),
    "q04_distinct"         -> ((s, d) => Relational.distinctFlags(s, d)),
    "q05_union_all"        -> ((s, d) => Relational.unionSlices(s, d)),
    "q06_running_total"    -> ((s, d) => Relational.runningCustomerSpend(s, d)),
    "q07_rank_in_group"    -> ((s, d) => Relational.rankCustomersByBalance(s, d)),
    "q08_top_per_group"    -> ((s, d) => Relational.topOrderPerCustomer(s, d)),
    "q09_scalar_funcs"     -> ((s, d) => Relational.scalarShowcase(s, d)),
    "q10_customer_mart"    -> ((s, d) => Marts.customerMart(s, d)),
    "q11_sales_mart"       -> ((s, d) => Marts.salesTeamMart(s, d)),
    "q12_customer_monthly" -> ((s, d) => Metrics.customerMonthly(s, d)),
    "q13_sales_incentive"  -> ((s, d) => Metrics.salesIncentive(s, d)),
    "q14_hourly_rollup"    -> ((s, d) => Events.hourlyRollup(s, d)),
    "q15_sessionize"       -> ((s, d) => Events.sessionize(s, d)),
    "q16_dedup_exact"      -> ((s, d) => Dedup.exact(s, d)),
    "q17_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q18_minhash_sig"      -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "q19_lsh_pairs"        -> ((s, d) => Dedup.lshCandidatePairs(s, d)),
    "q20_simhash"          -> ((s, d) => Dedup.simhash(s, d)),
    "q21_token_stats"      -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "q22_text_quality"     -> ((s, d) => TextAnalysis.textQuality(s, d)),
    "q23_lang_id"          -> ((s, d) => TextAnalysis.langId(s, d)),
    "q24_fingerprint"      -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q25_cosine_topk"      -> ((s, d) => Similarity.cosineTopK(s, d)),
    "q26_ann_topk"         -> ((s, d) => Similarity.annBucketTopK(s, d)),
    "q27_embed_neardup"    -> ((s, d) => Similarity.nearDupPairs(s, d)),
    "q28_binary_features"  -> ((s, d) => Multimodal.binaryFeatures(s, d)),
    "q29_media_decode"     -> ((s, d) => Multimodal.decodeFeatures(s, d).toDF()),
    "q30_stream_hourly"    -> ((s, d) => EventStream.hourlyRollupAvailableNow(s, d)),
    "q31_jdbc_roundtrip"   -> ((s, d) => graft.io.IoQueries.jdbcRoundtrip(s, d)),
    "q34_stream_sessionize" -> ((s, d) => graft.streaming.SessionStream.sessionizeAvailableNow(s, d)),
    "q35_simhash_pairs"    -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q36_ivf_topk"         -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q37_media_resize"     -> ((s, d) => Multimodal.resizeFeatures(s, d).toDF()),
    "q38_frame_sample"     -> ((s, d) => Multimodal.frameSample(s, d).toDF()),
    "q39_stream_ingest"    -> ((s, d) => graft.streaming.CsvStreamIngest.ingestLineitemAvailableNow(s, d)),
    "q40_corpus_filter"    -> ((s, d) => graft.ops.Corpus.trainingFilter(s, d)),
    "q41_monthly_bitcompat" -> ((s, d) => Metrics.customerMonthlyBitCompat(s, d)),
    "q42_rollup"           -> ((s, d) => Relational.pricingRollup(s, d)),
    "q43_semi_join"        -> ((s, d) => Relational.ordersFromSegment(s, d)),
    "q44_outer_join"       -> ((s, d) => Relational.customerOrderCounts(s, d)),
    "q45_pivot"            -> ((s, d) => Relational.quantityPivot(s, d)),
    "q46_anti_join"        -> ((s, d) => Relational.ordersFullyShippedBefore(s, d)),
    "q47_asof_join"        -> ((s, d) => graft.ops.Joins.eventPrevClick(s, d)),
    "q48_range_join"       -> ((s, d) => graft.ops.Joins.partPriceBands(s, d)),
    "q49_quantiles"        -> ((s, d) => Relational.priceQuantiles(s, d)),
    "q50_hash_split"       -> ((s, d) => graft.ops.Corpus.hashSplit(s, d)),
    "q51_shuffle_shards"   -> ((s, d) => graft.ops.Corpus.shuffleShards(s, d)),
    "q52_doc_chunks"       -> ((s, d) => graft.ops.Corpus.docChunks(s, d)),
    "q53_pii_redact"       -> ((s, d) => graft.ops.Corpus.piiRedact(s, d)),
    "q54_stratified_sample" -> ((s, d) => graft.ops.Corpus.stratifiedSample(s, d)),
    "q55_dup_clusters"     -> ((s, d) => graft.ops.Graph.dupClusters(s, d)),
    "q56_term_topk"        -> ((s, d) => graft.ops.TermStats.topTermsPerLang(s, d)),
    "q57_tfidf"            -> ((s, d) => graft.ops.TermStats.tfidfTopTerms(s, d)),
    "q58_revenue_deltas"   -> ((s, d) => Relational.dailyRevenueDeltas(s, d)),
    "q59_cube"             -> ((s, d) => Relational.pricingCube(s, d)),
    "q60_stream_join"      -> ((s, d) => EventStream.purchaseClickJoinAvailableNow(s, d)),
    // q61 has NO oracleSql on purpose: the HLL sketch value is engine-specific
    // (rows-only gate); its error bound is pinned by EventsSpec instead
    "q61_approx_distinct"  -> ((s, d) => Events.approxDistinctUsers(s, d)),
    "q62_minhash_est"      -> ((s, d) => Dedup.minhashEstimate(s, d)),
    "q63_moving_avg"       -> ((s, d) => Relational.movingRevenueAvg(s, d)),
    "q64_deciles"          -> ((s, d) => Relational.customerBalanceDeciles(s, d)),
    "q65_json_props"       -> ((s, d) => Events.propsFieldStats(s, d)),
    "q66_sequence_pack"    -> ((s, d) => graft.ops.Corpus.sequencePack(s, d)),
    "q67_deduped_corpus"   -> ((s, d) => graft.ops.Corpus.dedupedCorpus(s, d)),
    "q68_native_topk"      -> ((s, d) => graft.plans.TopKPerGroup.topK(
      graft.core.Tables.orders(s, d),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select("o_orderkey", "o_custkey", "o_totalprice")),
    "q69_stream_dedup"     -> ((s, d) => EventStream.dedupRedeliveredAvailableNow(s, d)),
    "q70_salted_join"      -> ((s, d) => Relational.saltedOrderCustomerJoin(s, d)),
    // q71 has NO oracleSql on purpose: sketch values are engine-specific
    // (rows-only gate); the error bound is pinned by RelationalSketchSpec
    "q71_approx_quantiles" -> ((s, d) => Relational.approxPriceQuantiles(s, d)),
    "q72_grouping_sets"    -> ((s, d) => Relational.pricingGroupingSets(s, d)),
    "q73_set_ops"          -> ((s, d) => Relational.orderKeySetOps(s, d)),
    "q74_string_funcs"     -> ((s, d) => Relational.stringShowcase(s, d)),
    "q75_decontaminate"    -> ((s, d) => graft.ops.Curation.decontaminate(s, d)),
    "q76_repetition"       -> ((s, d) => graft.ops.Curation.repetitionStats(s, d)),
    "q77_kmeans_step"      -> ((s, d) => Similarity.kmeansStep(s, d)),
    "q78_session_paths"    -> ((s, d) => Events.sessionPaths(s, d)),
    "q79_stream_segment"   -> ((s, d) => EventStream.segmentRollupAvailableNow(s, d)),
    "q80_scd2"             -> ((s, d) => Relational.orderPriorityScd2(s, d)),
    "q81_quality_reps"     -> ((s, d) => graft.ops.Curation.qualityRepresentatives(s, d)),
    "q82_sessionize_rocksdb" -> ((s, d) => graft.streaming.SessionStream.sessionizeRocksDbAvailableNow(s, d)),
    "q83_decontam_external" -> ((s, d) => graft.ops.Curation.decontaminateExternal(s, d)),
    "q84_sessionize_tws"   -> ((s, d) => graft.streaming.SessionStream.sessionizeTwsAvailableNow(s, d)),
    "q85_upsert_latest"    -> ((s, d) => Relational.customerUpsert(s, d)),
    "q86_passage_dedup"    -> ((s, d) => graft.ops.Curation.passageDedup(s, d)),
    "q87_heavy_hitters"    -> ((s, d) => graft.ops.TermStats.heavyTermsPerLang(s, d)),
    "q88_bloom_join"       -> ((s, d) => graft.ops.Joins.urgentLineitems(s, d)),
    // exploded to (vec_id, d, qv) for the gate: the hash compare sorts rows,
    // which an array column defeats (q18 precedent)
    "q89_quantize_vecs"    -> ((s, d) => Similarity.quantizeVecs(s, d)
      .select(col("vec_id"), posexplode(col("qvec")).as(Seq("d", "qv")))),
    "q90_quantized_ann"    -> ((s, d) => Similarity.quantizedTopK(s, d)),
    "q91_quality_sample"   -> ((s, d) => graft.ops.Corpus.qualitySample(s, d)),
    "q92_source_mix"       -> ((s, d) => graft.ops.Corpus.sourceMix(s, d)),
    "q93_zorder"           -> ((s, d) => Relational.zOrderedParts(s, d)),
    "q94_stream_trending"  -> ((s, d) => EventStream.trendingPropsAvailableNow(s, d)),
    "q95_corpus_diff"      -> ((s, d) => graft.ops.Corpus.corpusDiff(s, d)),
    "q96_funnel"           -> ((s, d) => Events.conversionFunnel(s, d)),
    "q97_key_skew"         -> ((s, d) => graft.ops.Skew.keySkewReport(
      graft.core.Tables.lineitem(s, d), "l_suppkey")),
    "q98_incremental_agg"  -> ((s, d) => Relational.incrementalMonthlyRevenue(s, d)),
    "q99_retention"        -> ((s, d) => Events.retentionCohorts(s, d)),
    "q100_curated_corpus"  -> ((s, d) => graft.ops.Corpus.curatedCorpus(s, d)),
    "q101_corpus_refresh"  -> ((s, d) => graft.ops.Refresh.refreshedCorpus(s, d)),
    "q102_adaptive_join"   -> ((s, d) => graft.ops.Skew.adaptiveJoinDemo(s, d)),
    "q103_merge_into"      -> ((s, d) => graft.ops.Merge.customerMerge(s, d)),
    "q104_props_evolution" -> ((s, d) => Events.propsEvolution(s, d)),
    "q105_session_window"  -> ((s, d) => Events.sessionizeNative(s, d)),
    "q106_pq_codes"        -> ((s, d) => Similarity.pqCodes(s, d)),
    "q108_embed_clusters"  -> ((s, d) => Similarity.embeddingDupClusters(s, d)),
    "q109_ivfpq_search"    -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "q107_pq_search"       -> ((s, d) => Similarity.pqRerankTopK(s, d)),
    "q110_bigram_lm"       -> ((s, d) => graft.ops.LanguageModel.bigramLmScores(s, d)),
    "q111_dsir_weights"    -> ((s, d) => graft.ops.LanguageModel.importanceWeights(s, d)),
    "q112_part_entities"   -> ((s, d) => graft.ops.Entity.partEntities(s, d)),
    "q113_hopping_window"  -> ((s, d) => Events.hoppingRollup(s, d)),
    "q114_stream_jdbc"     -> ((s, d) => EventStream.hourlyRollupJdbcRoundtrip(s, d)),
    "q115_compaction"      -> ((s, d) => graft.ops.Compaction.compactedLineitem(s, d)),
    "q116_stream_ljoin"    -> ((s, d) => EventStream.purchaseClickLeftJoinAvailableNow(s, d)),
    "q117_bpe_merges"      -> ((s, d) => graft.ops.Bpe.bpeMerges(s, d)),
    "q119_table_stats"     -> ((s, d) => graft.ops.Stats.tableStats(s, d)),
    "q120_json_source"     -> ((s, d) => graft.io.IoQueries.jsonSourceRoundtrip(s, d)),
    "q121_orc_roundtrip"   -> ((s, d) => graft.io.IoQueries.orcRoundtrip(s, d)),
    "q122_decayed_pop"     -> ((s, d) => Events.decayedPopularity(s, d)),
    "q123_entity_multipass" -> ((s, d) => graft.ops.Entity.partEntitiesMultiPass(s, d)),
    "q124_report_card"     -> ((s, d) => graft.ops.ReportCard.sourceReportCard(s, d)),
    "q125_stream_hopping"  -> ((s, d) => EventStream.hoppingRollupAvailableNow(s, d)),
    "q126_incr_stats"      -> ((s, d) => graft.ops.Stats.incrementalTableStats(s, d)),
    "q127_expectations"    -> ((s, d) => graft.ops.Expectations.checkSuite(s, d)),
    "q128_unpivot"         -> ((s, d) => Relational.pricingSummaryLong(s, d)),
    "q129_training_mix"    -> ((s, d) => graft.ops.TrainingMix.mixManifest(s, d)),
    "q130_cross_links"     -> ((s, d) => Similarity.crossCorpusLinks(s, d)),
    // q131 has NO oracleSql on purpose, like q61/q71: DataSketches HLL
    // estimates are engine-specific (rows-only gate); StatsSketchSpec pins
    // slice-invariance of the merge and the 3-sigma bound vs exact NDV
    "q131_approx_stats"    -> ((s, d) => graft.ops.Stats.approxTableStats(s, d)),
    "q132_time_travel"     -> ((s, d) => graft.io.IoQueries.versionedAsOf(s, d)),
    "q133_change_feed"     -> ((s, d) => graft.io.IoQueries.versionedChanges(s, d)),
    "q134_join_view_maint" -> ((s, d) => graft.ops.ViewMaintenance.incrementalJoinView(s, d)),
    "q135_data_skipping"   -> ((s, d) => graft.io.IoQueries.clusteredRangeRead(s, d)),
    "q136_versioned_merge" -> ((s, d) => graft.io.IoQueries.versionedMergeState(s, d)),
    "q137_optimize_vacuum" -> ((s, d) => graft.io.IoQueries.versionedMaintained(s, d)),
    "q138_schema_evolution" -> ((s, d) => graft.io.IoQueries.evolvedDocsSnapshot(s, d)),
    "q139_bucketed_join"   -> ((s, d) => graft.ops.Layout.bucketedOrderRevenue(s, d)),
    "q140_dpp_scan"        -> ((s, d) => graft.ops.Layout.dppHotTypeStats(s, d)),
    "q141_hourly_spikes"   -> ((s, d) => graft.ops.Events.hourlySpikes(s, d)),
    "q142_transitions"     -> ((s, d) => graft.ops.Events.eventTransitions(s, d)),
    "q143_regression"      -> ((s, d) => Relational.priceQuantityRegression(s, d)),
    "q144_histogram"       -> ((s, d) => Relational.priceHistogram(s, d)),
    "q145_pagerank"        -> ((s, d) => graft.ops.Graph.pageRank(s, d)),
    "q146_kmeans"          -> ((s, d) => graft.ops.Clustering.kmeansAssignments(s, d)),
    "q147_window_showcase" -> ((s, d) => Relational.windowShowcase(s, d)),
    "q148_bloom_lookup"    -> ((s, d) => graft.io.IoQueries.bloomPointLookup(s, d)),
    "q149_gap_fill"        -> ((s, d) => graft.ops.Events.gapFilledHourly(s, d)),
    "q150_winsorize"       -> ((s, d) => graft.ops.Statistics.winsorizedPricing(s, d)),
    "q151_chisq"           -> ((s, d) => graft.ops.Statistics.chiSquareFlagStatus(s, d)),
    "q152_bm25"            -> ((s, d) => graft.ops.TermStats.bm25Scores(s, d)),
    "q153_entropy"         -> ((s, d) => graft.ops.TermStats.tokenEntropyBySource(s, d)),
    "q154_array_hof"       -> ((s, d) => graft.ops.TermStats.arrayFunctionShowcase(s, d)),
    "q155_psi_drift"       -> ((s, d) => graft.ops.Statistics.priceDriftPsi(s, d)),
    "q156_quantile_table"  -> ((s, d) => graft.ops.Statistics.quantileTable(s, d)),
    "q157_nullsafe_join"   -> ((s, d) => Relational.nullSafeJoinCounts(s, d)),
    "q158_hybrid_search"   -> ((s, d) => graft.ops.TermStats.hybridSearch(s, d)),
    "q159_evolving_merge"  -> ((s, d) => graft.io.IoQueries.evolvedMergeState(s, d)),
    "q160_salted_agg"      -> ((s, d) => graft.ops.Skew.saltedEventAgg(s, d)),
    "q161_filtered_aggs"   -> ((s, d) => Relational.filteredAggs(s, d)),
    "q162_subqueries"      -> ((s, d) => Relational.lateOrdersAboveAverage(s, d)),
    "q163_stream_psi"      -> ((s, d) => EventStream.psiMonitorAvailableNow(s, d)),
    "q164_concurrent_writers" -> ((s, d) => graft.io.IoQueries.concurrentWritersState(s, d)),
    "q165_gk_bound"        -> ((s, d) => graft.ops.Statistics.gkQuantileBound(s, d)),
    "q166_triangles"       -> ((s, d) => graft.ops.Graph.triangleStats(s, d)),
    "q167_class_balance"   -> ((s, d) => graft.ops.Corpus.classBalance(s, d)),
    "q168_weighted_sample" -> ((s, d) => graft.ops.Corpus.weightedSample(s, d)),
    "q169_basket_pairs"    -> ((s, d) => graft.ops.Market.basketPairs(s, d)),
    "q170_feature_bins"    -> ((s, d) => graft.ops.Statistics.equiDepthBins(s, d)),
    "q171_restore"         -> ((s, d) => graft.io.IoQueries.restoredState(s, d)),
    "q172_mad_outliers"    -> ((s, d) => graft.ops.Statistics.madOutliers(s, d)),
    "q173_bfs_hops"        -> ((s, d) => graft.ops.Graph.bfsHops(s, d)),
    "q174_rfm_segments"    -> ((s, d) => graft.ops.Market.rfmSegments(s, d)),
    "q175_inverted_index"  -> ((s, d) => graft.ops.TermStats.invertedIndex(s, d)),
    "q176_stream_upsert"   -> ((s, d) => EventStream.latestEventsUpsertState(s, d)),
    "q177_cdc_apply"       -> ((s, d) => graft.io.IoQueries.cdcReplicaState(s, d)),
    "q178_skyline"         -> ((s, d) => Relational.orderSkyline(s, d)),
    "q179_dim_stats"       -> ((s, d) => graft.ops.Stats.embeddingDimStats(s, d)),
    "q180_term_pmi"        -> ((s, d) => graft.ops.TermStats.termPmi(s, d)),
    "q181_attribution"     -> ((s, d) => Events.lastTouchAttribution(s, d)),
    "q182_rolling_distinct" -> ((s, d) => Events.rollingDistinctUsers(s, d)),
    "q183_table_diff"      -> ((s, d) => graft.io.IoQueries.tableDiffReport(s, d)),
    "q184_global_rank"     -> ((s, d) => Relational.globalPriceRank(s, d)),
    "q185_hll_bound"       -> ((s, d) => Events.hllBound(s, d)),
    "q186_log_odds"        -> ((s, d) => graft.ops.TermStats.logOddsTerms(s, d)),
    "q187_zipf"            -> ((s, d) => graft.ops.TermStats.zipfSlope(s, d)),
    "q188_bpe_fertility"   -> ((s, d) => graft.ops.Bpe.bpeFertility(s, d)),
    "q189_quantile_rank"   -> ((s, d) => Relational.globalPriceRankQuantile(s, d)),
    "q190_linear_attrib"   -> ((s, d) => Events.linearAttribution(s, d)),
    "q191_k_anonymity"     -> ((s, d) => graft.ops.Privacy.kAnonymityAudit(s, d)),
    "q192_hits"            -> ((s, d) => graft.ops.Graph.hits(s, d)),
    "q193_temperature_mix" -> ((s, d) => graft.ops.TrainingMix.temperatureMix(s, d)),
    "q194_daily_anomaly"   -> ((s, d) => graft.ops.Statistics.dailyAnomalies(s, d)),
    "q195_quality_clf"     -> ((s, d) => graft.ops.Curation.qualityClassifier(s, d)),
    "q196_cusum"           -> ((s, d) => graft.ops.Statistics.cusumShift(s, d)),
    "q197_position_attrib" -> ((s, d) => Events.positionAttribution(s, d)),
    "q198_retention_decay" -> ((s, d) => Events.retentionHalfLife(s, d)),
    "q199_pct_normalize"   -> ((s, d) => graft.ops.Corpus.percentileNormalize(s, d)),
    "q200_scaled_profile"  -> ((s, d) => graft.ops.Stats.scaledDimProfile(s, d)),
    "q201_kcore"           -> ((s, d) => graft.ops.Graph.kCore(s, d)),
    "q202_assortativity"   -> ((s, d) => graft.ops.Graph.degreeAssortativity(s, d)),
    "q203_ks_test"         -> ((s, d) => graft.ops.Statistics.ksTest(s, d)),
    "q204_rank_sum"        -> ((s, d) => graft.ops.Statistics.rankSum(s, d)),
    "q205_gini"            -> ((s, d) => graft.ops.Statistics.giniBySegment(s, d)),
    "q206_benford"         -> ((s, d) => graft.ops.Statistics.benfordDigits(s, d)),
    "q207_item_cf"         -> ((s, d) => graft.ops.Recommend.itemItemCf(s, d)),
    "q208_adamic_adar"     -> ((s, d) => graft.ops.Recommend.adamicAdar(s, d)),
    "q209_label_prop"      -> ((s, d) => graft.ops.Graph.labelPropagation(s, d)),
    "q210_acf"             -> ((s, d) => graft.ops.TimeSeries.revenueAcf(s, d)),
    "q211_ewma"            -> ((s, d) => graft.ops.TimeSeries.ewmaRevenue(s, d)),
    "q212_burstiness"      -> ((s, d) => graft.ops.TimeSeries.userBurstiness(s, d)),
    "q213_dow_seasonality" -> ((s, d) => graft.ops.TimeSeries.dowSeasonality(s, d)),
    "q214_ri_audit"        -> ((s, d) => graft.ops.Expectations.referentialAudit(s, d)),
    "q215_gram_novelty"    -> ((s, d) => graft.ops.Curation.gramNovelty(s, d)),
    "q216_hard_negatives"  -> ((s, d) => graft.ops.Similarity.hardNegatives(s, d)),
    "q217_class_separation" -> ((s, d) => graft.ops.Similarity.classSeparation(s, d)),
    "q218_pca_power"       -> ((s, d) => graft.ops.Similarity.pcaPower(s, d)),
    "q219_jl_distortion"   -> ((s, d) => graft.ops.Similarity.jlDistortion(s, d)),
    "q220_langid_confusion" -> ((s, d) => graft.ops.TextAnalysis.langConfusion(s, d)),
    "q221_theil_sen"       -> ((s, d) => graft.ops.TimeSeries.theilSen(s, d)),
    "q222_kaplan_meier"    -> ((s, d) => graft.ops.TimeSeries.kaplanMeier(s, d)),
    "q223_forecast_backtest" -> ((s, d) => graft.ops.TimeSeries.forecastBacktest(s, d)),
    "q224_ab_test"         -> ((s, d) => graft.ops.Experiment.abTest(s, d)),
    "q225_cuped"           -> ((s, d) => graft.ops.Experiment.cuped(s, d)),
    "q226_stream_ab"       -> ((s, d) => EventStream.abMonitorAvailableNow(s, d)),
    "q227_conformal"       -> ((s, d) => graft.ops.TimeSeries.conformalForecast(s, d)),
    "q228_bootstrap_ci"    -> ((s, d) => graft.ops.Statistics.bootstrapCi(s, d)),
    "q229_table_tags"      -> ((s, d) => graft.io.IoQueries.versionedByTag(s, d)),
    "q230_containment"     -> ((s, d) => graft.ops.Dedup.containmentPairs(s, d)),
    "q231_cohort_ltv"      -> ((s, d) => Events.cohortLtv(s, d)),
    "q232_split_leakage"   -> ((s, d) => graft.ops.Curation.splitLeakage(s, d)),
    "q233_price_elasticity" -> ((s, d) => graft.ops.Market.priceElasticity(s, d)),
    "q234_span_corruption" -> ((s, d) => graft.ops.Corpus.spanCorruption(s, d)),
    "q235_roc_auc"         -> ((s, d) => graft.ops.Evaluation.rocAuc(s, d)),
    "q236_calibration"     -> ((s, d) => graft.ops.Evaluation.calibrationBins(s, d)),
    "q237_gk_equidepth"    -> ((s, d) => graft.ops.Statistics.equiDepthBinsSketch(s, d)),
    "q238_gk_winsorize"    -> ((s, d) => graft.ops.Statistics.winsorizedPricingSketch(s, d)),
    "q239_auc_by_segment"  -> ((s, d) => graft.ops.Evaluation.rocAucBySegment(s, d)),
    "q240_stratified_es"   -> ((s, d) => graft.ops.Corpus.stratifiedWeightedSample(s, d)),
    "q241_session_funnel"  -> ((s, d) => graft.ops.Events.sessionFunnel(s, d)),
    "q242_threshold_metrics" -> ((s, d) => graft.ops.Evaluation.thresholdMetrics(s, d)),
    "q243_chi_square"      -> ((s, d) => graft.ops.Statistics.chiSquareLangLength(s, d)),
    "q244_pmi_collocations" -> ((s, d) => graft.ops.TermStats.pmiCollocations(s, d)),
    "q245_split_divergence" -> ((s, d) => graft.ops.TermStats.splitDivergence(s, d)),
    "q246_funnel_stream"   -> ((s, d) => graft.streaming.SessionStream.funnelAvailableNow(s, d)),
    "q247_rolling_median"  -> ((s, d) => graft.ops.TimeSeries.rollingMedianRevenue(s, d)),
    "q248_nelson_aalen"    -> ((s, d) => graft.ops.TimeSeries.nelsonAalen(s, d)),
    "q249_concentration"   -> ((s, d) => graft.ops.Statistics.revenueConcentration(s, d)),
    "q250_cramers_v"       -> ((s, d) => graft.ops.Statistics.cramersV(s, d)),
    "q251_seasonal_decomp" -> ((s, d) => graft.ops.TimeSeries.seasonalDecompose(s, d)),
    "q252_substring_dedup" -> ((s, d) => graft.ops.Dedup.substringDedup(s, d)),
    "q253_calibration_drift" -> ((s, d) => graft.ops.Evaluation.calibrationBySource(s, d)),
    "q254_seasonal_cusum"  -> ((s, d) => graft.ops.TimeSeries.seasonalCusum(s, d)),
    "q255_sweep_stream"    -> ((s, d) => graft.streaming.ScoreStream.thresholdSweepAvailableNow(s, d)),
    "q256_mann_kendall"    -> ((s, d) => graft.ops.TimeSeries.mannKendall(s, d)),
    "q257_ols_two_feature" -> ((s, d) => graft.ops.Statistics.olsTwoFeature(s, d)),
    "q258_kruskal_wallis"  -> ((s, d) => graft.ops.Statistics.kruskalWallis(s, d)),
    "q259_anova_f"         -> ((s, d) => graft.ops.Statistics.anovaF(s, d)),
    "q260_brown_forsythe"  -> ((s, d) => graft.ops.Statistics.brownForsythe(s, d)),
    "q261_residual_diag"   -> ((s, d) => graft.ops.TimeSeries.residualDiagnostics(s, d)),
    "q262_cross_corr"      -> ((s, d) => graft.ops.TimeSeries.crossCorrelation(s, d)),
    "q263_decomp_strength" -> ((s, d) => graft.ops.TimeSeries.decompositionStrength(s, d)),
    "q264_kendall_tau"     -> ((s, d) => graft.ops.TimeSeries.kendallTau(s, d)),
    "q265_cohens_kappa"    -> ((s, d) => graft.ops.Evaluation.cohensKappa(s, d)),
    "q266_seasonal_mk"     -> ((s, d) => graft.ops.TimeSeries.seasonalMannKendall(s, d)),
    "q267_ols_influence"   -> ((s, d) => graft.ops.Statistics.olsInfluence(s, d)),
    "q268_anomaly_stream"  -> ((s, d) => graft.streaming.OrderStream.dailyAnomalyAvailableNow(s, d)),
    "q269_silhouette"      -> ((s, d) => graft.ops.Similarity.silhouette(s, d)),
    "q270_davies_bouldin"  -> ((s, d) => graft.ops.Similarity.daviesBouldin(s, d)),
    "q271_jarque_bera"     -> ((s, d) => graft.ops.Statistics.jarqueBera(s, d)),
    "q272_welch_t"         -> ((s, d) => graft.ops.Statistics.welchT(s, d)),
    "q273_heaps_fit"       -> ((s, d) => graft.ops.TermStats.heapsFit(s, d)),
    "q274_mcnemar"         -> ((s, d) => graft.ops.Evaluation.mcnemar(s, d)),
    "q275_decile_lift"     -> ((s, d) => graft.ops.Evaluation.decileLift(s, d)),
    "q276_classifier_ks"   -> ((s, d) => graft.ops.Evaluation.classifierKs(s, d)),
    "q277_clustering_coef" -> ((s, d) => graft.ops.Graph.clusteringCoefficient(s, d)),
    "q278_contamination"   -> ((s, d) => graft.ops.Curation.contaminationMatrix(s, d)),
    "q279_cluster_sizes"   -> ((s, d) => graft.ops.Graph.clusterSizeHistogram(s, d)),
    "q280_pacf"            -> ((s, d) => graft.ops.TimeSeries.pacf(s, d)),
    "q281_term_burstiness" -> ((s, d) => graft.ops.TermStats.termBurstiness(s, d)),
    "q282_info_gain"       -> ((s, d) => graft.ops.Evaluation.infoGain(s, d)),
    "q283_forecast_compare" -> ((s, d) => graft.ops.TimeSeries.forecastCompare(s, d)),
    "q284_spearman"        -> ((s, d) => graft.ops.TimeSeries.spearman(s, d)),
    "q285_theil_u"         -> ((s, d) => graft.ops.TimeSeries.theilU(s, d)),
    "q286_path_entropy"    -> ((s, d) => graft.ops.Events.pathEntropy(s, d)),
    "q287_point_biserial"  -> ((s, d) => graft.ops.Evaluation.pointBiserial(s, d)),
    "q288_cliffs_delta"    -> ((s, d) => graft.ops.Statistics.cliffsDelta(s, d)),
    "q289_hosmer_lemeshow" -> ((s, d) => graft.ops.Evaluation.hosmerLemeshow(s, d)),
    "q290_wasserstein"     -> ((s, d) => graft.ops.Statistics.wasserstein1d(s, d)),
    "q291_cochrans_q"      -> ((s, d) => graft.ops.Evaluation.cochransQ(s, d)),
    "q292_runs_test"       -> ((s, d) => graft.ops.TimeSeries.runsTest(s, d)),
    "q293_degree_powerlaw" -> ((s, d) => graft.ops.Graph.degreePowerLaw(s, d)),
    "q294_markov_stationary" -> ((s, d) => graft.ops.Events.markovStationary(s, d)),
    "q295_source_divergence" -> ((s, d) => graft.ops.TermStats.sourceDivergence(s, d)),
    "q296_ann_recall"      -> ((s, d) => Similarity.annRecall(s, d)),
    "q297_funnel_wilson"   -> ((s, d) => graft.ops.Events.funnelWilson(s, d)),
    "q298_source_perplexity" -> ((s, d) => graft.ops.TermStats.sourcePerplexity(s, d)),
    "q299_cluster_split"   -> ((s, d) => graft.ops.Curation.clusterSplit(s, d)),
    "q300_split_profile"   -> ((s, d) => graft.ops.Curation.splitProfile(s, d)),
    "q301_good_turing"     -> ((s, d) => graft.ops.TermStats.goodTuringCoverage(s, d)),
    "q302_freq_spectrum"   -> ((s, d) => graft.ops.TermStats.frequencySpectrum(s, d)),
    "q303_order_gaps"      -> ((s, d) => graft.ops.TimeSeries.orderGapProfile(s, d)),
    "q304_monthly_psi"     -> ((s, d) => graft.ops.Statistics.monthlyMixPsi(s, d)),
    "q305_brand_hhi"       -> ((s, d) => graft.ops.Statistics.brandHhi(s, d)),
    "q306_seasonal_index"  -> ((s, d) => graft.ops.TimeSeries.monthlySeasonalIndex(s, d)),
    "q307_vocab_jaccard"   -> ((s, d) => graft.ops.TermStats.sourceVocabJaccard(s, d)),
    "q308_order_size_vmr"  -> ((s, d) => graft.ops.Statistics.orderSizeVmr(s, d)),
    "q309_ship_lag_drift"  -> ((s, d) => graft.ops.TimeSeries.shipLagDrift(s, d)),
    "q310_cluster_folds"   -> ((s, d) => graft.ops.Curation.clusterFolds(s, d)),
    "q311_negative_samples" -> ((s, d) => graft.ops.Corpus.negativeSamples(s, d)),
    "q312_class_weights"   -> ((s, d) => graft.ops.Corpus.classWeights(s, d)),
    "q313_dedup_savings"   -> ((s, d) => graft.ops.Curation.dedupSavings(s, d)),
    "q314_perplexity_filter" -> ((s, d) => graft.ops.LanguageModel.perplexityFilter(s, d)),
    "q315_lsh_recall"      -> ((s, d) => Dedup.lshRecall(s, d)),
    "q316_stream_decontam" -> ((s, d) => graft.streaming.ScoreStream.contaminationMonitorAvailableNow(s, d)),
    "q317_fold_eval"       -> ((s, d) => graft.ops.Curation.foldEval(s, d)),
    "q318_robust_anomaly"  -> ((s, d) => graft.ops.Statistics.robustDailyAnomalies(s, d)),
    "q319_vocab_growth"    -> ((s, d) => graft.ops.TermStats.vocabularyGrowth(s, d)),
    "q320_lsh_cost"        -> ((s, d) => Dedup.lshCandidateCost(s, d)),
    "q321_stream_robust"   -> ((s, d) => graft.streaming.OrderStream.robustDailyAnomalyAvailableNow(s, d)),
    "q322_length_pcts"     -> ((s, d) => graft.ops.TextAnalysis.lengthPercentiles(s, d)),
    "q323_fertility"       -> ((s, d) => graft.ops.TextAnalysis.tokenizerFertility(s, d)),
    "q324_sim_histogram"   -> ((s, d) => Dedup.similarityHistogram(s, d)),
    "q325_budget_curve"    -> ((s, d) => graft.ops.Corpus.qualityBudgetCurve(s, d)),
    "q326_ivf_nprobe"      -> ((s, d) => Similarity.ivfRecallCurve(s, d)),
    "q327_multiprobe"      -> ((s, d) => Similarity.multiProbeRecall(s, d)),
    "q328_leak_hotspots"   -> ((s, d) => graft.ops.Curation.evalLeakHotspots(s, d)),
    "q329_family_profile"  -> ((s, d) => graft.ops.Curation.dupFamilyProfile(s, d)),
    "q330_vocab_stream"    -> ((s, d) => graft.streaming.ScoreStream.vocabGrowthAvailableNow(s, d)),
    "q331_passage_decontam" -> ((s, d) => graft.ops.Curation.passageDecontaminate(s, d)),
    "q332_domain_mix"      -> ((s, d) => graft.ops.TrainingMix.domainMix(s, d)),
    "q333_family_drift"    -> ((s, d) => graft.ops.Curation.familyDrift(s, d)),
    "q334_decontam_savings" -> ((s, d) => graft.ops.Curation.decontamSavings(s, d)),
    "q335_temp_feasibility" -> ((s, d) => graft.ops.TrainingMix.temperatureFeasibility(s, d)),
    "q336_mix_sample"      -> ((s, d) => graft.ops.TrainingMix.mixSample(s, d)),
    "q337_mix_stream"      -> ((s, d) => graft.streaming.ScoreStream.domainMixAvailableNow(s, d)),
    "q338_source_contam"   -> ((s, d) => graft.ops.Curation.sourceContamination(s, d)),
    "q339_mix_epochs"      -> ((s, d) => graft.ops.TrainingMix.mixSampleEpochs(s, d)),
    "q340_source_contam_stream" -> ((s, d) => graft.streaming.ScoreStream.sourceContamAvailableNow(s, d)),
    "q341_savings_by_source" -> ((s, d) => graft.ops.Curation.decontamSavingsBySource(s, d)),
    "q342_contam_by_quality" -> ((s, d) => graft.ops.Curation.contaminationByQuality(s, d)),
    "q343_contam_escape"   -> ((s, d) => graft.ops.Curation.familyContamination(s, d)),
    "q344_clean_mix"       -> ((s, d) => graft.ops.TrainingMix.cleanDomainMix(s, d)),
    "q345_epoch_accounting" -> ((s, d) => graft.ops.TrainingMix.epochAccounting(s, d)),
    "q346_passage_stream"  -> ((s, d) => graft.streaming.ScoreStream.passageDecontamAvailableNow(s, d)),
    "q347_pool_mix"        -> ((s, d) => graft.ops.TrainingMix.poolMix(s, d)),
    "q348_eval_saturation" -> ((s, d) => graft.ops.Curation.evalSaturation(s, d)),
    "q349_burned_items"    -> ((s, d) => graft.ops.Curation.burnedEvalItems(s, d)),
    "q350_burn_stream"     -> ((s, d) => graft.streaming.ScoreStream.burnMonitorAvailableNow(s, d)),
    "q351_release_card"    -> ((s, d) => graft.ops.ReportCard.releaseReadiness(s, d)),
    "q352_burn_drift"      -> ((s, d) => graft.ops.Curation.burnDrift(s, d)),
    "q353_pool_ablation"   -> ((s, d) => graft.ops.TrainingMix.poolAblation(s, d)),
    "q354_semantic_decontam" -> ((s, d) => graft.ops.Similarity.semanticDecontam(s, d)),
    "q355_semantic_stream" -> ((s, d) => graft.streaming.ScoreStream.semanticDecontamAvailableNow(s, d)),
    "q356_semantic_ivf"    -> ((s, d) => graft.ops.Similarity.semanticDecontamIvf(s, d)),
    "q357_semantic_by_source" -> ((s, d) => graft.ops.Similarity.semanticLeakBySource(s, d)),
    "q358_leak_spans"      -> ((s, d) => graft.ops.Curation.leakSpans(s, d)),
    "q359_leak_severity"   -> ((s, d) => graft.ops.Curation.leakSeverityProfile(s, d)),
    "q360_graduated_policy" -> ((s, d) => graft.ops.Curation.graduatedPolicy(s, d)),
    "q361_severity_by_source" -> ((s, d) => graft.ops.Curation.leakSeverityBySource(s, d)),
    "q362_severity_drift"  -> ((s, d) => graft.ops.Curation.severityDrift(s, d)),
    "q363_rare_gram_decontam" -> ((s, d) => graft.ops.Curation.rareGramDecontaminate(s, d)),
    "q364_graduated_pool"  -> ((s, d) => graft.ops.TrainingMix.graduatedPoolMix(s, d)),
    "q365_semantic_external" -> ((s, d) => graft.ops.Similarity.semanticDecontamExternal(s, d)),
    "q366_widened_savings" -> ((s, d) => graft.ops.Curation.widenedSavings(s, d)),
    "q367_severity_stream" -> ((s, d) => graft.streaming.ScoreStream.severityProfileAvailableNow(s, d)),
    "q368_graduated_by_source" -> ((s, d) => graft.ops.Curation.graduatedSavingsBySource(s, d)),
    "q369_release_diff"    -> ((s, d) => graft.ops.ReportCard.releaseDiff(s, d)),
    "q370_graduated_sample" -> ((s, d) => graft.ops.TrainingMix.graduatedMixSample(s, d)),
    "q371_widened_stream"  -> ((s, d) => graft.streaming.ScoreStream.widenedSavingsAvailableNow(s, d)),
    "q372_graduated_epochs" -> ((s, d) => graft.ops.TrainingMix.graduatedEpochAccounting(s, d)),
    "q373_excised_corpus"  -> ((s, d) => graft.ops.Curation.excisedCorpus(s, d)),
    "q374_excision_audit"  -> ((s, d) => graft.ops.Curation.excisionAudit(s, d)),
    "q375_graduated_corpus" -> ((s, d) => graft.ops.Curation.graduatedCorpus(s, d)),
    "q118_bpe_tokens"      -> ((s, d) => graft.ops.Bpe.bpeTokenCounts(s, d)),
    "q32_sink_roundtrip"   -> ((s, d) => graft.io.IoQueries.partitionedSinkRoundtrip(s, d)),
    "q33_pipeline_e2e"     -> ((s, d) => graft.io.IoQueries.pipelineEndToEnd(s, d)))

  /** Shared oracle fragments (DuckDB SQL). */
  /** The gap-sessionization oracle, shared verbatim by q15 (batch), q34
    * (flatMapGroupsWithState), q82 (RocksDB provider), and q84
    * (transformWithState): all four are the same semantics by design, and one
    * fragment keeps them from silently diverging.
    */
  /** The session-seq assignment CTEs alone (ending at `sess`), shared by
    * [[sessionizeOracle]] and the q241 sessionized funnel — event_type rides
    * along for q241's stage filters (projected away by the other consumers).
    */
  private val sessionSeqCtes: String =
    """flagged AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
      |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged)""".stripMargin

  private val sessionizeOracle: String =
    s"""WITH $sessionSeqCtes
      |SELECT user_id, session_seq,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sess GROUP BY 1, 2""".stripMargin

  /** The chi-square grid CTEs (observed over the FULL lang×band grid,
    * marginals, expectations, per-cell terms, quantized-fold total), shared
    * verbatim by q243 (the per-cell table) and q250 (Cramér's V).
    */
  private val chiSquareCtes: String =
    """d AS (
      |  SELECT COALESCE(lang, chr(0)) AS lang,
      |    CASE WHEN n_chars < 200 THEN 'short'
      |         WHEN n_chars < 400 THEN 'medium'
      |         ELSE 'long' END AS band
      |  FROM documents),
      |obs AS (SELECT lang, band, CAST(count(*) AS BIGINT) AS o
      |  FROM d GROUP BY 1, 2),
      |langs AS (SELECT DISTINCT lang FROM obs),
      |bands AS (SELECT DISTINCT band FROM obs),
      |rts AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
      |cts AS (SELECT band, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS nl,
      |  CAST(count(DISTINCT band) AS BIGINT) AS nb FROM obs),
      |cells AS (
      |  SELECT l.lang, b.band, COALESCE(obs.o, CAST(0 AS BIGINT)) AS o,
      |    rts.rt, cts.ct,
      |    CAST(rts.rt AS DOUBLE) * CAST(cts.ct AS DOUBLE)
      |      / CAST(tot.n AS DOUBLE) AS expected,
      |    nl, nb
      |  FROM langs l CROSS JOIN bands b
      |  LEFT JOIN obs ON obs.lang = l.lang AND obs.band = b.band
      |  JOIN rts ON rts.lang = l.lang
      |  JOIN cts ON cts.band = b.band
      |  CROSS JOIN tot),
      |cc AS (SELECT *,
      |  (CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)
      |    / expected AS cell_chi2
      |  FROM cells),
      |total AS (SELECT
      |  CAST(CAST(sum(CAST(CAST(cell_chi2 AS VARCHAR) AS DECIMAL(28,9)))
      |    AS VARCHAR) AS DOUBLE) AS chi2,
      |  max((nl - 1) * (nb - 1)) AS dof FROM cc)""".stripMargin

  /** The survival risk-set CTEs (lifetimes → per-t death/censor counts →
    * suffix-sum risk sets), shared verbatim by Kaplan–Meier (q222) and
    * Nelson–Aalen (q248) — one fragment so the two estimators can never
    * disagree about who was at risk.
    */
  private val survivalRiskCtes: String =
    """h AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
      |life AS (
      |  SELECT
      |    CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
      |      max(CAST(o_orderdate AS DATE))) AS BIGINT) AS t,
      |    date_diff('day', max(CAST(o_orderdate AS DATE)), h.max_d) > 90 AS event
      |  FROM orders, h GROUP BY o_custkey, h.max_d),
      |byt AS (
      |  SELECT t, CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM life GROUP BY 1),
      |risk AS (
      |  SELECT t, d, c, CAST(sum(d + c) OVER (ORDER BY t
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM byt)""".stripMargin

  /** The sessionized-funnel oracle, shared VERBATIM by batch q241 and
    * streaming q246 — the same batch/stream-parity contract the A/B monitor
    * (q224/q226) established.
    */
  private val sessionFunnelOracle: String =
    s"""WITH $sessionSeqCtes,
      |v AS (
      |  SELECT user_id, session_seq, min(ts) AS view_ts FROM sess
      |  WHERE event_type = 'view' GROUP BY 1, 2),
      |c AS (
      |  SELECT e.user_id, e.session_seq, min(e.ts) AS click_ts
      |  FROM sess e JOIN v ON e.user_id = v.user_id AND e.session_seq = v.session_seq
      |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
      |    AND e.ts <= v.view_ts + INTERVAL 10 MINUTE
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT e.user_id, e.session_seq, min(e.ts) AS purchase_ts
      |  FROM sess e JOIN c ON e.user_id = c.user_id AND e.session_seq = c.session_seq
      |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      |    AND e.ts <= c.click_ts + INTERVAL 30 MINUTE
      |  GROUP BY 1, 2)
      |SELECT v.user_id, v.session_seq, v.view_ts, c.click_ts, p.purchase_ts,
      |  CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
      |            WHEN c.click_ts IS NOT NULL THEN 2
      |            ELSE 1 END AS BIGINT) AS stage,
      |  epoch_us(c.click_ts) - epoch_us(v.view_ts) AS click_lat_us,
      |  epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS purchase_lat_us
      |FROM v LEFT JOIN c USING (user_id, session_seq)
      |  LEFT JOIN p USING (user_id, session_seq)""".stripMargin

  private val enrichJoin: String =
    """FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey""".stripMargin

  private val totalCost = "l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)"

  /** DuckDB twin of [[graft.ops.TextAnalysis.normText]]: whitespace-normalized
    * lowercase text. DuckDB regexp_replace needs the explicit 'g' flag (Spark's
    * is always global).
    */
  private val normText = "regexp_replace(lower(text), '\\s+', ' ', 'g')"

  /** DuckDB twin of Dedup.shingles(text, q): distinct character q-grams of the
    * normalized text. `range(1, n+1-q)` = Spark `sequence(1, n-(q-1))`.
    */
  private def shingles(q: Int): String =
    s"list_distinct(list_transform(range(1, length($normText) - ${q - 2}), " +
      s"i -> substr($normText, CAST(i AS INT), $q)))"

  /** DuckDB twin of the 16-function MinHash signature (Dedup.minhashSignatures):
    * one md5 per shingle parsed to a 32-bit int, then the same fixed affine
    * family (A(i)·v + B(i)) mod P embedded as literals from [[graft.ops.Dedup]].
    */
  private val minhashSigs: String = {
    val aList = graft.ops.Dedup.hashA.mkString("[", ", ", "]")
    val bList = graft.ops.Dedup.hashB.mkString("[", ", ", "]")
    s"""docs AS (SELECT doc_id, ${shingles(4)} AS grams FROM documents),
       |hg AS (SELECT doc_id,
       |         list_transform(grams, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hgrams
       |       FROM docs),
       |sigs AS (
       |  SELECT doc_id, h.i AS h_idx,
       |    list_min(list_transform(hgrams,
       |      v -> ($aList[CAST(h.i AS INT) + 1] * v + $bList[CAST(h.i AS INT) + 1]) % ${graft.ops.Dedup.HashP})) AS minhash
       |  FROM hg CROSS JOIN (SELECT unnest(range(0, 16)) AS i) h)""".stripMargin
  }

  /** DuckDB twin of the LSH banding + candidate pairing (Dedup
    * .lshCandidatePairs), shared by the q17/q19/q55/q62/q67 oracles so the
    * banding scheme exists in exactly one place.
    */
  private lazy val bandsCandCtes: String =
    """bands AS (
      |  SELECT doc_id, h_idx // 4 AS band_idx,
      |    string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY h_idx) AS band_key
      |  FROM sigs GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      |   AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared CTE chain for the near-dup connected-components oracles (q55,
    * q67): MinHash sigs → bands → candidates → exact-Jaccard verify → edges →
    * recursive min-label closure. `edges` is MATERIALIZED — DuckDB 1.0
    * otherwise inlines the whole chain into the recursive member and
    * recomputes it every fixpoint iteration. The recursive member prunes
    * labels that can never win (`r.lbl < e.dst`): a node's own id is already
    * its upper bound, so only smaller labels need to flow.
    */
  private lazy val dupCcCtes: String =
    s"""$minhashSigs,
       |$bandsCandCtes,
       |docs3 AS (
       |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS grams FROM documents),
       |verified AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand c
       |  JOIN docs3 x ON c.doc_a = x.doc_id
       |  JOIN docs3 y ON c.doc_b = y.doc_id
       |  WHERE x.lang = y.lang AND abs(x.n_chars - y.n_chars) <= 20
       |    AND CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
       |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) >= 0.5),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM verified
       |  UNION ALL SELECT doc_b, doc_a FROM verified),
       |reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
       |  WHERE r.lbl < e.dst)""".stripMargin

  /** DuckDB twin of LanguageModel.perDocTotals — the add-one-smoothed bigram
    * LM in exact ppm fixed point, ending at `per_doc` (doc_id, ppm_sum,
    * n_bigrams; one row per doc with ≥ 1 bigram) with the tokenized corpus
    * still visible as `d`. Shared by q110 (corpus-mean flag) and q314
    * (percentile filter) so both oracles score under the identical model.
    */
  private lazy val bigramLmCtes: String =
    """d AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN len(toks) >= 2 THEN
      |      list_transform(range(1, len(toks)),
      |        i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])
      |    ELSE [] END) AS bigram
      |  FROM d),
      |db AS (SELECT doc_id, bigram, count(*) AS n FROM b GROUP BY 1, 2),
      |c12 AS (SELECT bigram, sum(n) AS c12 FROM db GROUP BY 1),
      |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(n) AS c1 FROM db GROUP BY 1),
      |v AS (SELECT count(DISTINCT t.term) AS v
      |      FROM (SELECT unnest(toks) AS term FROM d) t),
      |scored AS (
      |  SELECT db.doc_id, db.n,
      |    ((c12.c12 + 1) * 1000000) // (c1.c1 + v.v) AS ppm
      |  FROM db
      |  JOIN c12 ON db.bigram = c12.bigram
      |  JOIN c1 ON split_part(db.bigram, ' ', 1) = c1.w1
      |  CROSS JOIN v),
      |per_doc AS (
      |  SELECT doc_id, sum(n * ppm) AS ppm_sum, sum(n) AS n_bigrams
      |  FROM scored GROUP BY 1)""".stripMargin

  /** DuckDB twin of Curation.decontaminate — shared verbatim by q75 (batch)
    * and q316 (the streaming contamination monitor), so the parity pair is
    * gated by ONE SQL string.
    */
  private lazy val decontaminateOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, is_eval,
      |    CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END AS grams
      |  FROM d),
      |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_eval),
      |t AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT is_eval),
      |hits AS (
      |  SELECT t.doc_id, count(*) AS n_grams, count(e.gram) AS n_hits
      |  FROM t LEFT JOIN e ON t.gram = e.gram GROUP BY t.doc_id)
      |SELECT g.doc_id,
      |  CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  COALESCE(h.n_hits, 0) > 0 AS is_contaminated
      |FROM g LEFT JOIN hits h USING (doc_id)
      |WHERE NOT g.is_eval""".stripMargin

  /** Shared passage-verdict CTE spine (q331's construction through the
    * per-passage flags, plus the non-eval (doc, source, token) frame) —
    * the spine of q334 (corpus savings), q341 (per-source savings) and
    * q342 (quality × contamination).
    */
  private lazy val passageVerdictCtes: String =
    """d AS (
      |  SELECT doc_id, source,
      |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |e AS (
      |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE is_eval),
      |s AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
      |  FROM d WHERE NOT is_eval AND len(toks) >= 5),
      |pg AS (
      |  SELECT DISTINCT doc_id, (i - 1) // 8 AS passage,
      |    md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')) AS gram
      |  FROM s),
      |hits AS (
      |  SELECT pg.doc_id, pg.passage, count(e.gram) > 0 AS is_flagged
      |  FROM pg LEFT JOIN e ON pg.gram = e.gram GROUP BY 1, 2),
      |tr AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks
      |       FROM d WHERE NOT is_eval)""".stripMargin

  /** DuckDB twin of Curation.sourceContamination — shared verbatim by q338
    * (batch) and q340 (the streaming twin), the ninth batch/stream parity
    * pair; q75's verdict CTE is the spine.
    */
  private lazy val sourceContamOracle: String =
    s"""WITH v AS ($decontaminateOracle),
       |m AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
       |      AS n_toks
       |  FROM documents
       |  WHERE CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT)
       |    % 1000 >= 200)
       |SELECT m.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN v.is_contaminated THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  CAST(sum(CASE WHEN v.is_contaminated THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS contamination_rate,
       |  CAST(sum(m.n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.is_contaminated THEN m.n_toks ELSE 0 END) AS BIGINT)
       |    AS contaminated_tokens
       |FROM v JOIN m USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** DuckDB twin of TrainingMix.domainMix — shared verbatim by q332
    * (batch) and q337 (the streaming twin), the eighth batch/stream
    * parity pair; also the spine CTE of q336's sampler oracle.
    */
  private lazy val domainMixOracle: String = domainMixOracleOver(
    """cells AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS avail_tokens
      |  FROM documents GROUP BY 1, 2)""".stripMargin)

  /** DuckDB twin of Curation.evalSaturation — q348's entry, and one arm of
    * q351's release card.
    */
  private lazy val evalSaturationOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE NOT is_eval),
      |df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY 1),
      |e AS (
      |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE is_eval)
      |SELECT CAST(count(*) AS BIGINT) AS n_eval_grams,
      |  CAST(count(df.df) AS BIGINT) AS n_leaked_grams,
      |  CAST(count(df.df) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    AS leaked_gram_share,
      |  CAST(coalesce(sum(df.df), 0) AS BIGINT) AS leak_instances
      |FROM e LEFT JOIN df USING (gram)""".stripMargin

  /** DuckDB twin of Curation.decontamSavings — q334's entry, and one arm of
    * q351's release card.
    */
  private lazy val decontamSavingsOracle: String =
    s"""WITH $passageVerdictCtes,
      |df AS (SELECT doc_id, bool_or(is_flagged) AS doc_flagged
      |       FROM hits GROUP BY 1),
      |t AS (SELECT tr.doc_id, tr.n_toks, coalesce(df.doc_flagged, false) AS doc_flagged
      |      FROM tr LEFT JOIN df USING (doc_id)),
      |a1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_toks) AS BIGINT) AS total_tokens,
      |    CAST(sum(CASE WHEN doc_flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
      |    CAST(sum(CASE WHEN doc_flagged THEN 0 ELSE n_toks END) AS BIGINT)
      |      AS retained_doc_grain
      |  FROM t),
      |a2 AS (
      |  SELECT CAST(coalesce(sum(least(8, tr.n_toks - h.passage * 8)), 0) AS BIGINT)
      |    AS removed_passage
      |  FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged)
      |SELECT n_docs, total_tokens, n_docs_flagged, retained_doc_grain,
      |  total_tokens - removed_passage AS retained_passage_grain,
      |  CAST(total_tokens - removed_passage - retained_doc_grain AS DOUBLE)
      |    / CAST(total_tokens AS DOUBLE) AS tokens_rescued_share
      |FROM a1 CROSS JOIN a2""".stripMargin

  /** DuckDB twin of Curation.dedupSavings — q313's entry, and one arm of
    * q351's release card.
    */
  private lazy val dedupSavingsOracle: String =
    s"""WITH RECURSIVE $dupCcCtes,
       |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
       |t AS (
       |  SELECT d.doc_id,
       |    CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS BIGINT) AS n_toks,
       |    (l.doc_id = l.cluster_id) AS is_rep
       |  FROM documents d JOIN lab l ON d.doc_id = l.doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_reps,
       |  CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
       |  CAST(sum(CASE WHEN is_rep THEN n_toks ELSE 0 END) AS BIGINT) AS deduped_tokens,
       |  CAST(sum(n_toks) - sum(CASE WHEN is_rep THEN n_toks ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(n_toks) AS DOUBLE) AS token_savings
       |FROM t""".stripMargin

  /** DuckDB twin of Curation.burnedEvalItems — shared verbatim by q349
    * (batch) and q350 (the streaming twin), the eleventh batch/stream
    * parity pair.
    */
  private lazy val burnedItemsOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |tg AS (
      |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE NOT is_eval),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE is_eval),
      |hits AS (
      |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(count(tg.gram) AS BIGINT) AS n_leaked
      |  FROM g LEFT JOIN tg USING (gram) GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(coalesce(h.n_leaked, 0) AS BIGINT) AS n_leaked,
      |  CASE WHEN coalesce(h.n_grams, 0) > 0
      |       THEN CAST(coalesce(h.n_leaked, 0) AS DOUBLE)
      |         / CAST(h.n_grams AS DOUBLE) END AS leak_share,
      |  coalesce(h.n_grams, 0) > 0
      |    AND coalesce(h.n_leaked, 0) = coalesce(h.n_grams, 0) AS is_burned
      |FROM d LEFT JOIN hits h USING (doc_id)
      |WHERE d.is_eval""".stripMargin

  /** DuckDB twin of Curation.passageDecontaminate — shared verbatim by q331
    * (batch) and q346 (the streaming twin), the tenth batch/stream parity
    * pair.
    */
  private lazy val passageDecontamOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |e AS (
      |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 3),
      |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
      |    ELSE [] END) AS gram
      |  FROM d WHERE is_eval),
      |s AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
      |  FROM d WHERE NOT is_eval AND len(toks) >= 5),
      |pg AS (
      |  SELECT DISTINCT doc_id, (i - 1) // 8 AS passage,
      |    md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')) AS gram
      |  FROM s)
      |SELECT pg.doc_id, CAST(pg.passage AS BIGINT) AS passage,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(count(e.gram) AS BIGINT) AS n_hits,
      |  count(e.gram) > 0 AS is_flagged
      |FROM pg LEFT JOIN e ON pg.gram = e.gram
      |GROUP BY 1, 2""".stripMargin

  /** The ONE severity CASE the q359/q360/q361/q362 oracles share — the SQL
    * twin of Curation.severityClass; a threshold edit lands in every
    * consumer or none.
    */
  private def severityCase(run: String): String =
    s"""CASE WHEN $run = 0 THEN 'clean'
       |             WHEN $run <= 8 THEN 'quote'
       |             WHEN $run <= 32 THEN 'passage'
       |             ELSE 'wholesale' END""".stripMargin

  /** DuckDB twin of Curation.leakSpans — q358's verdicts + longest
    * consecutive-leak run (gaps-and-islands on positional gram hits),
    * SHARED VERBATIM with q359's severity rollup.
    */
  private lazy val leakSpansOracle: String =
    s"""WITH v AS ($decontaminateOracle),
       |d AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |e AS (
       |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
       |      list_distinct(list_transform(range(1, len(toks) - 3),
       |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
       |    ELSE [] END) AS gram
       |  FROM d WHERE is_eval),
       |s AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
       |      FROM d WHERE NOT is_eval AND len(toks) >= 5),
       |g AS (SELECT doc_id, i,
       |        md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')) AS gram
       |      FROM s),
       |h AS (SELECT g.doc_id, g.i FROM g JOIN e USING (gram)),
       |isl AS (SELECT doc_id,
       |          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |        FROM h),
       |runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, grp),
       |mx AS (SELECT doc_id, max(run) AS longest FROM runs GROUP BY 1)
       |SELECT v.doc_id, v.n_grams, v.n_hits,
       |  CAST(coalesce(mx.longest, 0) AS BIGINT) AS longest_run_grams,
       |  CAST(CASE WHEN coalesce(mx.longest, 0) > 0 THEN mx.longest + 4 ELSE 0 END AS BIGINT)
       |    AS longest_span_tokens,
       |  v.is_contaminated
       |FROM v LEFT JOIN mx USING (doc_id)""".stripMargin

  /** The per-doc graduated-verdict join CTEs (ending at
    * `gj(doc_id, source, lang, n_toks, removed, sev)`) — q358's and q331's
    * oracles embedded VERBATIM with the shared severity CASE and q334's
    * min(w, len − w·p) span arithmetic — the spine shared by q360 (corpus
    * policy row), q364 (graduated trainable pool) and q368 (per-source
    * arms), so the three can never desynchronize.
    */
  private lazy val graduatedJoinCtes: String =
    s"""ls AS ($leakSpansOracle),
       |pdg AS ($passageDecontamOracle),
       |gdt AS (SELECT doc_id, source, lang,
       |          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
       |            AS n_toks
       |        FROM documents),
       |grem AS (SELECT pdg.doc_id,
       |           CAST(sum(least(8, gdt.n_toks - pdg.passage * 8)) AS BIGINT) AS removed
       |         FROM pdg JOIN gdt USING (doc_id) WHERE pdg.is_flagged GROUP BY 1),
       |gj AS (SELECT ls.doc_id, gdt.source, gdt.lang, gdt.n_toks,
       |         coalesce(grem.removed, 0) AS removed,
       |         ${severityCase("ls.longest_run_grams")} AS sev
       |       FROM ls JOIN gdt USING (doc_id) LEFT JOIN grem USING (doc_id))""".stripMargin

  /** DuckDB twin of Curation.graduatedPolicy — q360's severity-aware
    * policy row, SHARED VERBATIM with the release card's severity arm.
    */
  private lazy val graduatedPolicyOracle: String =
    s"""WITH $graduatedJoinCtes,
       |j AS (SELECT doc_id, n_toks, removed, sev FROM gj)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN sev = 'quote' THEN 1 ELSE 0 END) AS BIGINT) AS n_quote,
       |  CAST(sum(CASE WHEN sev = 'passage' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_passage_class,
       |  CAST(sum(CASE WHEN sev = 'wholesale' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_wholesale,
       |  CAST(sum(CASE WHEN sev = 'clean' THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS retained_doc_grain,
       |  CAST(sum(n_toks) - sum(removed) AS BIGINT) AS retained_passage_grain,
       |  CAST(sum(n_toks)
       |    - sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END)
       |    - sum(CASE WHEN sev = 'passage' THEN removed ELSE 0 END) AS BIGINT)
       |    AS retained_graduated,
       |  CAST(sum(n_toks)
       |    - sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END)
       |    - sum(CASE WHEN sev = 'passage' THEN removed ELSE 0 END)
       |    - sum(CASE WHEN sev = 'clean' THEN n_toks ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(n_toks) AS DOUBLE) AS graduated_rescued_share
       |FROM j""".stripMargin

  /** DuckDB twin of Curation.leakSeverityProfile — SHARED VERBATIM by q359
    * (batch) and q367 (the streaming severity monitor), the 13th
    * batch/stream parity pair; q358's oracle embedded VERBATIM, the
    * severity CASE shared.
    */
  private lazy val leakSeverityOracle: String =
    s"""WITH ls AS ($leakSpansOracle),
       |dt AS (SELECT doc_id,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
       |           AS n_alpha_toks
       |       FROM documents),
       |j AS (SELECT ls.doc_id, ls.longest_run_grams, ls.longest_span_tokens,
       |        dt.n_alpha_toks,
       |        ${severityCase("ls.longest_run_grams")} AS severity
       |      FROM ls JOIN dt USING (doc_id)),
       |a AS (SELECT severity, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(n_alpha_toks) AS BIGINT) AS total_tokens,
       |        CAST(sum(longest_span_tokens) AS BIGINT) AS leaked_span_tokens
       |      FROM j GROUP BY 1),
       |t AS (SELECT CAST(sum(n_alpha_toks) AS BIGINT) AS train_tokens FROM j)
       |SELECT s.severity,
       |  CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       |  CAST(coalesce(a.total_tokens, 0) AS BIGINT) AS total_tokens,
       |  CAST(coalesce(a.leaked_span_tokens, 0) AS BIGINT) AS leaked_span_tokens,
       |  CASE WHEN t.train_tokens > 0
       |    THEN CAST(coalesce(a.total_tokens, 0) AS DOUBLE) / CAST(t.train_tokens AS DOUBLE)
       |  END AS token_share
       |FROM (VALUES ('clean'), ('quote'), ('passage'), ('wholesale')) s(severity)
       |LEFT JOIN a USING (severity) CROSS JOIN t""".stripMargin

  /** DuckDB twin of Curation.graduatedSavingsBySource (q368) — q360's three
    * policy arms at the feed grain, off the SAME graduated-verdict spine.
    */
  private lazy val graduatedBySourceOracle: String =
    s"""WITH $graduatedJoinCtes
       |SELECT gj.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN sev = 'quote' THEN 1 ELSE 0 END) AS BIGINT) AS n_quote,
       |  CAST(sum(CASE WHEN sev = 'passage' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_passage_class,
       |  CAST(sum(CASE WHEN sev = 'wholesale' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_wholesale,
       |  CAST(sum(CASE WHEN sev = 'clean' THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS retained_doc_grain,
       |  CAST(sum(n_toks) - sum(removed) AS BIGINT) AS retained_passage_grain,
       |  CAST(sum(n_toks)
       |    - sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END)
       |    - sum(CASE WHEN sev = 'passage' THEN removed ELSE 0 END) AS BIGINT)
       |    AS retained_graduated,
       |  CAST(sum(n_toks)
       |    - sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END)
       |    - sum(CASE WHEN sev = 'passage' THEN removed ELSE 0 END)
       |    - sum(CASE WHEN sev = 'clean' THEN n_toks ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(n_toks) AS DOUBLE) AS graduated_rescued_share
       |FROM gj
       |GROUP BY 1""".stripMargin

  /** DuckDB twin of TrainingMix.graduatedPoolMix (q364) — the SAME solver
    * body over the graduated pool: q55 representatives ∩ q195 quality keeps,
    * with the severity-graduated decontamination gate (clean/quote enter
    * whole, passage-class at n_toks − removed, wholesale dropped);
    * alpha-token census (the unit passage surgery is priced in).
    */
  private lazy val graduatedPoolMixOracle: String = domainMixOracleOver(
    s"""RECURSIVE $dupCcCtes,
       |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
       |$graduatedJoinCtes,
       |$qualityScoreCtes,
       |gpool AS (SELECT gj.doc_id, gj.source, gj.lang,
       |            CASE WHEN gj.sev = 'passage' THEN gj.n_toks - gj.removed
       |                 ELSE gj.n_toks END AS nt
       |          FROM gj
       |          JOIN lab ON gj.doc_id = lab.doc_id AND gj.doc_id = lab.cluster_id
       |          JOIN qscore q ON gj.doc_id = q.doc_id AND q.zq >= 0
       |          WHERE gj.sev <> 'wholesale'),
       |cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |            CAST(sum(nt) AS BIGINT) AS avail_tokens
       |          FROM gpool GROUP BY 1, 2)""".stripMargin)

  /** DuckDB twin of Curation.widenedSavings (q366) — q334's two arms plus
    * the widened-cut arm: the per-doc interval union of flagged-passage
    * spans and matching-gram spans [start, start+n−1], gaps-and-islands
    * exact (island cost = max(end) − min(start) + 1, break where the next
    * start exceeds running max(end) + 1).
    */
  /** The widened-cut interval-union CTE chain (ending at
    * `ui(doc_id, s0, e0)` — one row per merged removal island), shared by
    * q366/q371's accounting and q373's materialized surgery so the price
    * and the knife can never disagree (the Scala side shares
    * `removalIntervals`/`islandUnion` the same way).
    */
  private lazy val widenedIslandCtes: String =
    s"""$passageVerdictCtes,
       |wg AS (SELECT doc_id, i,
       |         md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')) AS gram
       |       FROM s),
       |hp AS (SELECT wg.doc_id, wg.i FROM wg JOIN e USING (gram)),
       |giv AS (SELECT doc_id, CAST(i AS BIGINT) AS s_pos,
       |          CAST(i + 4 AS BIGINT) AS e_pos FROM hp),
       |piv AS (SELECT h.doc_id, CAST(h.passage * 8 + 1 AS BIGINT) AS s_pos,
       |          CAST(least((h.passage + 1) * 8, tr.n_toks) AS BIGINT) AS e_pos
       |        FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged),
       |iv AS (SELECT * FROM giv UNION ALL SELECT * FROM piv),
       |mrk AS (SELECT doc_id, s_pos, e_pos,
       |          max(e_pos) OVER (PARTITION BY doc_id ORDER BY s_pos, e_pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |        FROM iv),
       |isl2 AS (SELECT doc_id, s_pos, e_pos,
       |          sum(CASE WHEN s_pos > coalesce(pm, 0) + 1 THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY doc_id ORDER BY s_pos, e_pos
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |        FROM mrk),
       |ui AS (SELECT doc_id, CAST(min(s_pos) AS BIGINT) AS s0,
       |         CAST(max(e_pos) AS BIGINT) AS e0
       |       FROM isl2 GROUP BY doc_id, grp)""".stripMargin

  private lazy val widenedSavingsOracle: String =
    s"""WITH $widenedIslandCtes,
       |rw AS (SELECT CAST(coalesce(sum(e0 - s0 + 1), 0) AS BIGINT)
       |         AS removed_widened FROM ui),
       |df AS (SELECT doc_id, bool_or(is_flagged) AS doc_flagged
       |       FROM hits GROUP BY 1),
       |t AS (SELECT tr.doc_id, tr.n_toks, coalesce(df.doc_flagged, false) AS doc_flagged
       |      FROM tr LEFT JOIN df USING (doc_id)),
       |a1 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN doc_flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
       |    CAST(sum(CASE WHEN doc_flagged THEN 0 ELSE n_toks END) AS BIGINT)
       |      AS retained_doc_grain
       |  FROM t),
       |a2 AS (
       |  SELECT CAST(coalesce(sum(least(8, tr.n_toks - h.passage * 8)), 0) AS BIGINT)
       |    AS removed_passage
       |  FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged)
       |SELECT n_docs, total_tokens, n_docs_flagged, retained_doc_grain,
       |  total_tokens - removed_passage AS retained_passage_grain,
       |  removed_widened,
       |  total_tokens - removed_widened AS retained_widened_grain,
       |  removed_widened - removed_passage AS widened_extra_tokens,
       |  CAST(total_tokens - removed_widened - retained_doc_grain AS DOUBLE)
       |    / CAST(total_tokens AS DOUBLE) AS widened_rescued_share
       |FROM a1 CROSS JOIN a2 CROSS JOIN rw""".stripMargin

  /** DuckDB twin of Curation.excisedCorpus (q373) — the widened-cut islands
    * chain embedded VERBATIM, then the same row-local segment rebuild:
    * segment i spans (prev island end, next island start) exclusive,
    * empty gaps filtered, segments joined by the out-of-alphabet " | ".
    */
  private lazy val excisedCorpusOracle: String =
    s"""WITH $widenedIslandCtes,
       |ct AS (SELECT doc_id,
       |         list_sort(list({'s': s0, 'e': e0})) AS cuts,
       |         CAST(sum(e0 - s0 + 1) AS BIGINT) AS removed
       |       FROM ui GROUP BY doc_id),
       |j AS (SELECT tr.doc_id, tr.n_toks, d.toks,
       |        coalesce(ct.cuts, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS ct,
       |        CAST(coalesce(ct.removed, 0) AS BIGINT) AS removed
       |      FROM tr JOIN d ON tr.doc_id = d.doc_id
       |      LEFT JOIN ct ON tr.doc_id = ct.doc_id),
       |k AS (SELECT doc_id, n_toks, removed,
       |        list_filter(list_transform(range(0, len(ct) + 1), i ->
       |          list_slice(toks,
       |            CAST(CASE WHEN i = 0 THEN 1 ELSE ct[i].e + 1 END AS BIGINT),
       |            CAST(CASE WHEN i = CAST(len(ct) AS BIGINT)
       |                 THEN CAST(len(toks) AS BIGINT)
       |                 ELSE ct[i + 1].s - 1 END AS BIGINT))),
       |          seg -> len(seg) > 0) AS segs
       |      FROM j)
       |SELECT doc_id, n_toks, removed AS n_removed_toks,
       |  CAST(n_toks - removed AS BIGINT) AS n_kept_toks,
       |  CAST(len(segs) AS BIGINT) AS n_segments,
       |  -- a fully-excised doc has zero segments: DuckDB's array_to_string
       |  -- returns NULL on [], Spark's array_join returns '' — align on ''
       |  coalesce(array_to_string(
       |    list_transform(segs, seg -> array_to_string(seg, ' ')), ' | '), '')
       |    AS excised_text
       |FROM k""".stripMargin

  /** DuckDB twin of Curation.graduatedCorpus (q375) — q360's keep/excise/
    * drop policy materialized: the flagged-passage islands only (never the
    * widened gram spans), the shared severity CASE, and the same row-local
    * segment rebuild as q373's oracle; drop rows carry NULL streams.
    */
  private lazy val graduatedCorpusOracle: String =
    s"""WITH $passageVerdictCtes,
       |lsx AS ($leakSpansOracle),
       |piv3 AS (SELECT h.doc_id, CAST(h.passage * 8 + 1 AS BIGINT) AS s_pos,
       |           CAST(least((h.passage + 1) * 8, tr.n_toks) AS BIGINT) AS e_pos
       |         FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged),
       |mrk3 AS (SELECT doc_id, s_pos, e_pos,
       |           max(e_pos) OVER (PARTITION BY doc_id ORDER BY s_pos, e_pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |         FROM piv3),
       |isl3 AS (SELECT doc_id, s_pos, e_pos,
       |           sum(CASE WHEN s_pos > coalesce(pm, 0) + 1 THEN 1 ELSE 0 END)
       |             OVER (PARTITION BY doc_id ORDER BY s_pos, e_pos
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |         FROM mrk3),
       |ui3 AS (SELECT doc_id, CAST(min(s_pos) AS BIGINT) AS s0,
       |          CAST(max(e_pos) AS BIGINT) AS e0
       |        FROM isl3 GROUP BY doc_id, grp),
       |ct3 AS (SELECT doc_id, list_sort(list({'s': s0, 'e': e0})) AS cuts,
       |          CAST(sum(e0 - s0 + 1) AS BIGINT) AS removed
       |        FROM ui3 GROUP BY doc_id),
       |cls AS (SELECT doc_id,
       |          ${severityCase("longest_run_grams")} AS severity
       |        FROM lsx),
       |j3 AS (SELECT tr.doc_id, tr.n_toks, d.toks, cls.severity,
       |         CASE WHEN cls.severity = 'wholesale' THEN 'drop'
       |              WHEN cls.severity = 'passage' THEN 'excise'
       |              ELSE 'keep' END AS action,
       |         CASE WHEN cls.severity = 'passage'
       |              THEN coalesce(ct3.cuts, CAST([] AS STRUCT(s BIGINT, e BIGINT)[]))
       |              ELSE CAST([] AS STRUCT(s BIGINT, e BIGINT)[]) END AS ct,
       |         CASE WHEN cls.severity = 'wholesale' THEN tr.n_toks
       |              WHEN cls.severity = 'passage'
       |              THEN CAST(coalesce(ct3.removed, 0) AS BIGINT)
       |              ELSE CAST(0 AS BIGINT) END AS removed
       |       FROM tr JOIN d ON tr.doc_id = d.doc_id
       |       JOIN cls ON tr.doc_id = cls.doc_id
       |       LEFT JOIN ct3 ON tr.doc_id = ct3.doc_id),
       |k3 AS (SELECT doc_id, n_toks, severity, action, removed,
       |         list_filter(list_transform(range(0, len(ct) + 1), i ->
       |           list_slice(toks,
       |             CAST(CASE WHEN i = 0 THEN 1 ELSE ct[i].e + 1 END AS BIGINT),
       |             CAST(CASE WHEN i = CAST(len(ct) AS BIGINT)
       |                  THEN CAST(len(toks) AS BIGINT)
       |                  ELSE ct[i + 1].s - 1 END AS BIGINT))),
       |           seg -> len(seg) > 0) AS segs
       |       FROM j3)
       |SELECT doc_id, severity, action, n_toks,
       |  removed AS n_removed_toks,
       |  CAST(n_toks - removed AS BIGINT) AS n_kept_toks,
       |  CASE WHEN action = 'drop' THEN NULL
       |       ELSE CAST(len(segs) AS BIGINT) END AS n_segments,
       |  CASE WHEN action = 'drop' THEN NULL
       |       ELSE coalesce(array_to_string(
       |         list_transform(segs, seg -> array_to_string(seg, ' ')), ' | '), '')
       |  END AS graduated_text
       |FROM k3""".stripMargin

  /** DuckDB twin of Curation.excisionAudit (q374) — q373's oracle embedded
    * VERBATIM, segments re-split on the literal ' | ', re-ground with q75's
    * gram spelling and scored against the SAME eval set; the gated
    * expectation is all-clean (n_hits_post = 0 on every row).
    */
  private lazy val excisionAuditOracle: String =
    s"""WITH exc AS ($excisedCorpusOracle),
       |dd AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |ev AS (SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
       |    list_distinct(list_transform(range(1, len(toks) - 3),
       |      i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
       |  ELSE [] END) AS gram FROM dd WHERE is_eval),
       |sg AS (SELECT doc_id, unnest(string_split(excised_text, ' | ')) AS seg
       |       FROM exc),
       |gg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 5 THEN
       |         list_distinct(list_transform(range(1, len(t) - 3),
       |           i -> md5(array_to_string(list_slice(t, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
       |       ELSE [] END) AS gram
       |       FROM (SELECT doc_id, regexp_extract_all(lower(seg), '[a-z0-9]+') AS t
       |             FROM sg) s2),
       |h AS (SELECT gg.doc_id, CAST(count(*) AS BIGINT) AS n,
       |        CAST(count(ev.gram) AS BIGINT) AS hh
       |      FROM gg LEFT JOIN ev USING (gram) GROUP BY 1)
       |SELECT exc.doc_id,
       |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_grams_post,
       |  CAST(coalesce(h.hh, 0) AS BIGINT) AS n_hits_post,
       |  coalesce(h.hh, 0) = 0 AS is_clean
       |FROM exc LEFT JOIN h USING (doc_id)""".stripMargin

  /** DuckDB twin of Similarity.semanticDecontamExternal (q365) — q354's NN
    * scoring through the external-relation code path, suite = the 50‰
    * suite_v2 hash slice of the embeddings (the decontaminateExternal
    * convention, embedding channel); no gram columns — an arbitrary suite
    * carries no corpus gram verdicts.
    */
  private lazy val semanticExternalOracle: String =
    s"""WITH $scaledVecs,
       |q AS (SELECT vec_id AS eval_id, svec AS qvec, norm2 AS qnorm2 FROM w
       |      WHERE CAST('0x' || substr(md5(vec_id || ':suite_v2'), 1, 8) AS BIGINT)
       |        % 1000 < 50),
       |t AS (SELECT vec_id, svec, norm2 FROM w
       |      WHERE CAST('0x' || substr(md5(vec_id || ':suite_v2'), 1, 8) AS BIGINT)
       |        % 1000 >= 50),
       |c AS (SELECT eval_id, vec_id,
       |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
       |      FROM q, t),
       |nn AS (SELECT eval_id, vec_id AS nn_train_id, cosine,
       |         row_number() OVER (PARTITION BY eval_id
       |           ORDER BY cosine DESC, vec_id ASC) AS rk
       |       FROM c QUALIFY rk = 1)
       |SELECT eval_id AS doc_id, nn_train_id, cosine,
       |  cosine >= 0.4 AS is_semantic_match
       |FROM nn""".stripMargin

  /** The version-parameterized (source, lang) raw-census cells CTE — the
    * mix arm of [[releaseMiniCardOracle]], q332's census over any docs
    * relation.
    */
  private def versionCellsSql(docsSql: String): String =
    s"""cells AS (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |      AS avail_tokens
       |  FROM ($docsSql) GROUP BY 1, 2)""".stripMargin

  /** One release mini-card row over any (doc_id, source, lang, text)
    * relation — DuckDB twin of ReportCard.releaseDiff's per-version arms
    * (q75's contamination core, q349's burn core, q332's solver embedded).
    */
  private def releaseMiniCardOracle(docsSql: String): String =
    s"""WITH dd AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM ($docsSql)),
       |gg AS (
       |  SELECT doc_id, is_eval,
       |    CASE WHEN len(toks) >= 5 THEN
       |      list_distinct(list_transform(range(1, len(toks) - 3),
       |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
       |    ELSE [] END AS grams
       |  FROM dd),
       |ee AS (SELECT DISTINCT unnest(grams) AS gram FROM gg WHERE is_eval),
       |tt AS (SELECT doc_id, unnest(grams) AS gram FROM gg WHERE NOT is_eval),
       |th AS (SELECT tt.doc_id, count(ee.gram) AS n_hits
       |       FROM tt LEFT JOIN ee ON tt.gram = ee.gram GROUP BY tt.doc_id),
       |verd AS (SELECT gg.doc_id, coalesce(th.n_hits, 0) > 0 AS is_contaminated
       |         FROM gg LEFT JOIN th USING (doc_id) WHERE NOT gg.is_eval),
       |vol AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(sum(len(toks)) AS BIGINT) AS raw_tokens FROM dd),
       |ca AS (SELECT CAST(count(*) AS BIGINT) AS n_train_docs,
       |         CAST(sum(CASE WHEN is_contaminated THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_docs_flagged
       |       FROM verd),
       |tgs AS (SELECT DISTINCT unnest(grams) AS gram FROM gg WHERE NOT is_eval),
       |eg AS (SELECT doc_id, unnest(grams) AS gram FROM gg WHERE is_eval),
       |bh AS (SELECT eg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(count(tgs.gram) AS BIGINT) AS n_leaked
       |       FROM eg LEFT JOIN tgs USING (gram) GROUP BY 1),
       |burn AS (SELECT CAST(coalesce(sum(CASE WHEN n_leaked = n_grams
       |             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_burned_items
       |         FROM bh),
       |mixarm AS (SELECT CAST(sum(CASE WHEN NOT feasible THEN 1 ELSE 0 END) AS BIGINT)
       |             AS mix_infeasible_cells
       |           FROM (${domainMixOracleOver(versionCellsSql(docsSql))}) mx)
       |SELECT vol.n_docs, vol.raw_tokens, ca.n_train_docs, ca.n_docs_flagged,
       |  CASE WHEN ca.n_train_docs > 0 THEN
       |    CAST(ca.n_docs_flagged AS DOUBLE) / CAST(ca.n_train_docs AS DOUBLE)
       |  END AS contamination_rate,
       |  burn.n_burned_items, mixarm.mix_infeasible_cells
       |FROM vol CROSS JOIN ca CROSS JOIN burn CROSS JOIN mixarm""".stripMargin

  private val v1DocsSql: String =
    "SELECT doc_id, source, lang, text FROM documents"

  private val v2DocsSql: String =
    """SELECT doc_id, source, lang,
      |  CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |FROM documents WHERE doc_id % 11 <> 3""".stripMargin

  /** DuckDB twin of ReportCard.releaseDiff (q369) — V1/V2 mini-cards plus
    * the exact delta row (BIGINT differences, one IEEE rate difference).
    */
  private lazy val releaseDiffOracle: String =
    s"""WITH c1 AS (${releaseMiniCardOracle(v1DocsSql)}),
       |c2 AS (${releaseMiniCardOracle(v2DocsSql)})
       |SELECT 'v1' AS version, * FROM c1
       |UNION ALL
       |SELECT 'v2' AS version, * FROM c2
       |UNION ALL
       |SELECT 'delta' AS version,
       |  c2.n_docs - c1.n_docs AS n_docs,
       |  c2.raw_tokens - c1.raw_tokens AS raw_tokens,
       |  c2.n_train_docs - c1.n_train_docs AS n_train_docs,
       |  c2.n_docs_flagged - c1.n_docs_flagged AS n_docs_flagged,
       |  c2.contamination_rate - c1.contamination_rate AS contamination_rate,
       |  c2.n_burned_items - c1.n_burned_items AS n_burned_items,
       |  c2.mix_infeasible_cells - c1.mix_infeasible_cells AS mix_infeasible_cells
       |FROM c1 CROSS JOIN c2""".stripMargin

  /** DuckDB twin of Similarity.semanticDecontam — q354's embedding-channel
    * leak audit, SHARED VERBATIM with the streaming monitor q355 (the 12th
    * batch/stream parity pair): exact integer-scaled cosine NN per eval
    * item (ties to lowest id), τ=0.4 match flag, gram-verdict join,
    * paraphrase-leak verdict.
    */
  private lazy val semanticDecontamOracle: String =
    s"""WITH $scaledVecs,
       |q AS (SELECT vec_id AS eval_id, svec AS qvec, norm2 AS qnorm2 FROM w
       |      WHERE CAST('0x' || substr(md5(vec_id || ':eval_v1'), 1, 8) AS BIGINT)
       |        % 1000 < 200),
       |t AS (SELECT vec_id, svec, norm2 FROM w
       |      WHERE CAST('0x' || substr(md5(vec_id || ':eval_v1'), 1, 8) AS BIGINT)
       |        % 1000 >= 200),
       |c AS (SELECT eval_id, vec_id,
       |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
       |      FROM q, t),
       |nn AS (SELECT eval_id, vec_id AS nn_train_id, cosine,
       |         row_number() OVER (PARTITION BY eval_id
       |           ORDER BY cosine DESC, vec_id ASC) AS rk
       |       FROM c QUALIFY rk = 1),
       |gv AS ($decontaminateOracle)
       |SELECT nn.eval_id AS doc_id, nn.nn_train_id, nn.cosine,
       |  nn.cosine >= 0.4 AS is_semantic_match,
       |  gv.is_contaminated AS nn_gram_flagged,
       |  nn.cosine >= 0.4 AND NOT gv.is_contaminated AS paraphrase_leak
       |FROM nn JOIN gv ON nn.nn_train_id = gv.doc_id""".stripMargin

  /** The epoch-plan + remainder-draw + readout CTEs over any `mix` and `d`
    * (docs with nt + mix hash) — factored out (r18) so q339's raw-census
    * sampler oracle and q370's graduated-pool one realize their plans with
    * ONE spelling (the Scala side shares `epochDraw` the same way).
    */
  private val epochSampleTail: String =
    """r AS (
      |  SELECT source, lang, n_docs, avail_tokens, required_tokens,
      |    CASE WHEN avail_tokens > 0
      |         THEN required_tokens // avail_tokens ELSE 0 END AS epochs,
      |    CASE WHEN avail_tokens > 0
      |         THEN ((required_tokens % avail_tokens) * 1000) // avail_tokens
      |         ELSE 1000 END AS remainder_permille
      |  FROM mix),
      |sm AS (
      |  SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS rd,
      |    CAST(sum(d.nt) AS BIGINT) AS rt
      |  FROM d JOIN r USING (source, lang)
      |  WHERE d.h < r.remainder_permille GROUP BY 1, 2)
      |SELECT r.source, r.lang, r.avail_tokens, r.required_tokens,
      |  CAST(r.epochs AS BIGINT) AS epochs,
      |  CAST(r.remainder_permille AS BIGINT) AS remainder_permille,
      |  CAST(coalesce(sm.rd, 0) AS BIGINT) AS remainder_docs,
      |  CAST(coalesce(sm.rt, 0) AS BIGINT) AS remainder_tokens,
      |  CAST(r.epochs * r.avail_tokens + coalesce(sm.rt, 0) AS BIGINT)
      |    AS drawn_tokens,
      |  CAST(r.epochs * r.n_docs + coalesce(sm.rd, 0) AS BIGINT) AS n_draws,
      |  CASE WHEN r.required_tokens > 0
      |       THEN CAST(r.epochs * r.avail_tokens + coalesce(sm.rt, 0) AS DOUBLE)
      |         / CAST(r.required_tokens AS DOUBLE) END AS achieved_ratio
      |FROM r LEFT JOIN sm USING (source, lang)""".stripMargin

  /** DuckDB twin of TrainingMix.mixSampleEpochs — q339's table, aggregated
    * verbatim by q345's accounting row.
    */
  private lazy val mixEpochsOracle: String =
    s"""WITH mix AS ($domainMixOracle),
       |d AS (
       |  SELECT source, lang,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nt,
       |    CAST('0x' || substr(md5(doc_id || ':mix_v1'), 1, 8) AS BIGINT)
       |      % 1000 AS h
       |  FROM documents),
       |$epochSampleTail""".stripMargin

  /** DuckDB twin of TrainingMix.graduatedMixSample (q370) — the SAME epoch
    * tail over the graduated pool: `d` is the gpool per-doc frame (q364's
    * census grain) with the mix hash, `mix` is q364's solution embedded
    * VERBATIM, aggregated verbatim by q372's accounting row.
    */
  private lazy val graduatedMixSampleOracle: String =
    s"""WITH RECURSIVE $dupCcCtes,
       |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
       |$graduatedJoinCtes,
       |$qualityScoreCtes,
       |gpool AS (SELECT gj.doc_id, gj.source, gj.lang,
       |            CASE WHEN gj.sev = 'passage' THEN gj.n_toks - gj.removed
       |                 ELSE gj.n_toks END AS nt
       |          FROM gj
       |          JOIN lab ON gj.doc_id = lab.doc_id AND gj.doc_id = lab.cluster_id
       |          JOIN qscore q ON gj.doc_id = q.doc_id AND q.zq >= 0
       |          WHERE gj.sev <> 'wholesale'),
       |d AS (SELECT source, lang, CAST(nt AS BIGINT) AS nt,
       |        CAST('0x' || substr(md5(doc_id || ':mix_v1'), 1, 8) AS BIGINT)
       |          % 1000 AS h
       |      FROM gpool),
       |cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |            CAST(sum(nt) AS BIGINT) AS avail_tokens
       |          FROM gpool GROUP BY 1, 2),
       |mix AS (WITH $domainMixSolverSql),
       |$epochSampleTail""".stripMargin

  /** DuckDB twin of TrainingMix.poolMix (q347) — the SAME solver body over
    * the fully-curated trainable pool: q55 representatives ∩ q195 quality
    * keeps ∩ q75 clears.
    */
  private lazy val poolMixOracle: String = domainMixOracleOver(
    s"""RECURSIVE $dupCcCtes,
       |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
       |v AS ($decontaminateOracle),
       |$qualityScoreCtes,
       |cells AS (
       |  SELECT doc.source, doc.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(doc.text), '\\s+'))) AS BIGINT)
       |      AS avail_tokens
       |  FROM documents doc
       |  JOIN lab ON doc.doc_id = lab.doc_id AND doc.doc_id = lab.cluster_id
       |  JOIN v ON doc.doc_id = v.doc_id AND NOT v.is_contaminated
       |  JOIN qscore q ON doc.doc_id = q.doc_id AND q.zq >= 0
       |  GROUP BY 1, 2)""".stripMargin)

  /** DuckDB twin of TrainingMix.cleanDomainMix (q344) — the SAME solver body
    * over the decontaminated census (q75's verdict CTE as the filter).
    */
  private lazy val cleanDomainMixOracle: String = domainMixOracleOver(
    s"""v AS ($decontaminateOracle),
       |cells AS (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |      AS avail_tokens
       |  FROM documents JOIN v USING (doc_id)
       |  WHERE NOT v.is_contaminated GROUP BY 1, 2)""".stripMargin)

  /** The solver body over any `cells(source, lang, n_docs, avail_tokens)`
    * CTE chain — one spelling for q332/q337's raw census and q344's
    * decontaminated one, so the solver arithmetic can never desynchronize.
    */
  private def domainMixOracleOver(cellsCtes: String): String =
    s"""WITH $cellsCtes,
       |$domainMixSolverSql""".stripMargin

  /** The solver CTEs + SELECT over an in-scope `cells` relation — split from
    * [[domainMixOracleOver]] (r18) so q370 can embed the solver as a CTE
    * referencing an OUTER `cells` (re-deriving the recursive dup-CC chain
    * inside a nested scope trips DuckDB's duplicate-alias check).
    */
  private lazy val domainMixSolverSql: String =
        s"""st AS (SELECT source, CAST(sum(avail_tokens) AS BIGINT) AS tok_s
          |       FROM cells GROUP BY 1),
          |lt AS (SELECT lang, CAST(sum(avail_tokens) AS BIGINT) AS tok_l
          |       FROM cells GROUP BY 1),
          |tt AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS tok_t,
          |         CAST(sum(avail_tokens) // 2 AS BIGINT) AS budget_tokens
          |       FROM cells),
          |p AS (
          |  SELECT c.source, c.lang, c.n_docs, c.avail_tokens, tt.budget_tokens,
          |    CAST(c.avail_tokens AS DOUBLE) / CAST(tt.tok_t AS DOUBLE) AS avail_share,
          |    CAST(CAST(CAST(CAST(
          |      (CAST(st.tok_s AS DOUBLE) / CAST(tt.tok_t AS DOUBLE)) *
          |      (CAST(lt.tok_l AS DOUBLE) / CAST(tt.tok_t AS DOUBLE))
          |      AS VARCHAR) AS DECIMAL(18,14)) AS VARCHAR) AS DOUBLE) AS p_raw
          |  FROM cells c
          |  JOIN st USING (source) JOIN lt USING (lang) CROSS JOIN tt),
          |z AS (SELECT CAST(CAST(sum(CAST(CAST(p_raw AS VARCHAR) AS DECIMAL(38,14)))
          |        AS VARCHAR) AS DOUBLE) AS z FROM p)
          |SELECT source, lang, n_docs, avail_tokens, avail_share,
          |  p_raw / z.z AS target_share,
          |  (p_raw / z.z) / avail_share AS weight,
          |  CAST(floor((p_raw / z.z) * budget_tokens) AS BIGINT) AS required_tokens,
          |  CAST(floor((p_raw / z.z) * budget_tokens) AS BIGINT) <= avail_tokens
          |    AS feasible,
          |  budget_tokens
          |FROM p CROSS JOIN z""".stripMargin

  /** DuckDB twin of TermStats.vocabularyGrowth — shared verbatim by q319
    * (batch) and q330 (the streaming twin), the seventh batch/stream parity
    * pair.
    */
  private lazy val vocabGrowthOracle: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST('0x' || substr(md5(doc_id || ':crawl_v1'), 1, 8) AS BIGINT)
      |      % 1000 % 8 AS batch,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |cells AS (SELECT source, term, batch, CAST(count(*) AS BIGINT) AS n
      |          FROM t GROUP BY 1, 2, 3),
      |pb AS (SELECT source, batch, CAST(sum(n) AS BIGINT) AS n_tokens,
      |         CAST(count(*) AS BIGINT) AS batch_vocab
      |       FROM cells GROUP BY 1, 2),
      |fs AS (SELECT source, term, min(batch) AS batch FROM cells GROUP BY 1, 2),
      |nw AS (SELECT source, batch, CAST(count(*) AS BIGINT) AS n_new_terms
      |       FROM fs GROUP BY 1, 2)
      |SELECT pb.source, pb.batch, pb.n_tokens, pb.batch_vocab,
      |  CAST(coalesce(nw.n_new_terms, 0) AS BIGINT) AS n_new_terms,
      |  CAST(sum(coalesce(nw.n_new_terms, 0)) OVER (PARTITION BY pb.source
      |    ORDER BY pb.batch) AS BIGINT) AS cum_vocab,
      |  CAST(coalesce(nw.n_new_terms, 0) AS DOUBLE) / CAST(pb.n_tokens AS DOUBLE)
      |    AS new_term_rate
      |FROM pb LEFT JOIN nw USING (source, batch)""".stripMargin

  /** DuckDB twin of Statistics.robustFromDaily over the orders dailies —
    * shared verbatim by q318 (batch) and q321 (the streaming twin), the
    * sixth batch/stream parity pair.
    */
  private lazy val robustAnomalyOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |      AS total_cents
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT day, total_cents, list_sort(array_agg(total_cents) OVER (ORDER BY day
      |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS buf
      |  FROM daily),
      |m AS (SELECT day, total_cents, buf,
      |        CASE WHEN len(buf) = 7 THEN buf[4] END AS med_prior FROM b),
      |m2 AS (
      |  SELECT day, total_cents, med_prior,
      |    CASE WHEN med_prior IS NOT NULL
      |         THEN list_sort(list_transform(buf, v -> abs(v - med_prior)))[4]
      |    END AS mad_prior
      |  FROM m)
      |SELECT day, total_cents, med_prior, mad_prior,
      |  CASE WHEN mad_prior > 0
      |       THEN CAST(total_cents - med_prior AS DOUBLE) / mad_prior
      |  END AS dev_over_mad,
      |  coalesce(abs(total_cents - med_prior) > 5 * mad_prior, false) AS is_anomaly
      |FROM m2""".stripMargin

  /** DuckDB twin of TextAnalysis.qualityScore, shared by q40/q67/q81. */
  private lazy val qualityScoreSql: String =
    """CAST(len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')) * 0.5
      |    + CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / n_chars * 0.2
      |    + CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')) * 0.05""".stripMargin

  /** DuckDB twin of Corpus.trainingFilter, shared by q40 and q67. */
  private lazy val trainingFilterSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    $qualityScoreSql AS quality_score,
       |    row_number() OVER (PARTITION BY md5($normText) ORDER BY doc_id) AS rn
       |  FROM documents)
       |SELECT doc_id, lang, n_chars, n_tokens, quality_score
       |FROM q
       |WHERE rn = 1 AND n_chars BETWEEN 50 AND 100000 AND quality_score >= 0.05""".stripMargin

  /** Shared CTE chain for the product-quantization oracles (q106/q107):
    * scaled subvectors → deterministic codebook init (vec_id < PqK) →
    * PqIters UNROLLED Lloyd rounds (L2 assignment by |c|²−2·x·c, floored-mean
    * update — exact int64 throughout) → final code assignment `af`. Mirrors
    * Similarity.pqCodebook/pqCodes iteration for iteration; constants are
    * embedded from graft.ops.Similarity so the two can't drift.
    */
  private lazy val pqCtes: String = {
    val M = graft.ops.Similarity.PqM
    val S = graft.ops.Similarity.PqSubDim
    val K = graft.ops.Similarity.PqK
    def sdot(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, ${S + 1}), " +
        s"i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)])), (x, y) -> x + y)"
    def assignCte(name: String, cents: String, out: String) =
      s"""${name}r AS (SELECT sub.vec_id, sub.m, sub.sub, c.cent_id,
         |  row_number() OVER (PARTITION BY sub.vec_id, sub.m
         |    ORDER BY ${sdot("c.cvec", "c.cvec")} - 2 * ${sdot("sub.sub", "c.cvec")} ASC,
         |      c.cent_id ASC) AS rn
         |  FROM sub JOIN $cents c ON sub.m = c.m),
         |$out AS (SELECT vec_id, m, sub, cent_id FROM ${name}r WHERE rn = 1)""".stripMargin
    val rounds = (1 to graft.ops.Similarity.PqIters).map { t =>
      s"""${assignCte(s"a$t", s"c${t - 1}", s"a$t")},
         |ex$t AS (SELECT m, cent_id AS cell, d.i, sub[CAST(d.i AS INT)] AS val
         |  FROM a$t CROSS JOIN (SELECT unnest(range(1, ${S + 1})) AS i) d),
         |cm$t AS (SELECT m, cell, i,
         |    CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
         |  FROM ex$t GROUP BY 1, 2, 3),
         |c$t AS (SELECT m, cell AS cent_id, array_agg(comp ORDER BY i) AS cvec
         |  FROM cm$t GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""$scaledVecs,
       |sub AS (SELECT vec_id, mm.m,
       |    list_slice(svec, CAST(mm.m * $S + 1 AS INT), CAST(mm.m * $S + $S AS INT)) AS sub
       |  FROM w CROSS JOIN (SELECT unnest(range(0, $M)) AS m) mm),
       |c0 AS (SELECT m, vec_id AS cent_id, sub AS cvec FROM sub WHERE vec_id < $K),
       |$rounds,
       |${assignCte("af", s"c${graft.ops.Similarity.PqIters}", "af")}""".stripMargin
  }

  /** DuckDB twin of Corpus.curatedCorpus (q100): near-dup CC representatives
    * ∧ training filter ∧ decontamination survivors, composed.
    */
  private lazy val curatedCorpusOracle: String =
    s"""WITH RECURSIVE $dupCcCtes,
       |labels AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
       |reps AS (SELECT id FROM labels WHERE id = comp),
       |filtered AS ($trainingFilterSql),
       |dd AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |gg AS (
       |  SELECT doc_id, is_eval,
       |    CASE WHEN len(toks) >= 5 THEN
       |      list_distinct(list_transform(range(1, len(toks) - 3),
       |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
       |    ELSE [] END AS grams
       |  FROM dd),
       |ee AS (SELECT DISTINCT unnest(grams) AS gram FROM gg WHERE is_eval),
       |tt AS (SELECT doc_id, unnest(grams) AS gram FROM gg WHERE NOT is_eval),
       |hh AS (
       |  SELECT tt.doc_id, count(ee.gram) AS n_hits
       |  FROM tt LEFT JOIN ee ON tt.gram = ee.gram GROUP BY tt.doc_id),
       |clean AS (
       |  SELECT gg.doc_id FROM gg LEFT JOIN hh USING (doc_id)
       |  WHERE NOT gg.is_eval AND COALESCE(hh.n_hits, 0) = 0)
       |SELECT f.doc_id, f.lang, f.n_chars, f.n_tokens, f.quality_score
       |FROM filtered f
       |JOIN reps ON f.doc_id = reps.id
       |JOIN clean ON f.doc_id = clean.doc_id""".stripMargin

  /** The q101 oracle: [[curatedCorpusOracle]] retargeted at the derived V2
    * corpus (Refresh.docsV2's scheme — drop doc_id ≡ 3 (mod 11), suffix every
    * 5th text, n_chars recomputed from the version's text). The textual
    * retarget runs BEFORE the documents_v2 CTE (which reads the real table)
    * is spliced in, so the base `FROM documents` inside it survives.
    */
  private lazy val refreshedCorpusOracle: String = {
    val v2Cte =
      """documents_v2 AS (
        |  SELECT doc_id, lang, text, length(text) AS n_chars FROM (
        |    SELECT doc_id, lang,
        |      CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |    FROM documents WHERE doc_id % 11 <> 3))""".stripMargin
    curatedCorpusOracle
      .replace("FROM documents", "FROM documents_v2")
      .replace("WITH RECURSIVE ", s"WITH RECURSIVE $v2Cte,\n")
  }

  /** DuckDB twin of the SimHash fingerprint (Dedup.simhash): token hashes via
    * the 48-bit Horner polynomial, ±1 votes per bit, bit set iff positive.
    */
  private val simhashCte: String =
    """h AS (
      |  SELECT doc_id,
      |    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |      t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(1, length(t) + 1),
      |               j -> CAST(ascii(substr(t, CAST(j AS INT), 1)) AS BIGINT))),
      |             (acc, c) -> (acc * 131 + c) % 281474976710656)) AS hashes
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 48),
      |      b -> CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                       list_transform(hashes, v -> (v >> CAST(b AS INT)) % 2 * 2 - 1)),
      |                       (s, x) -> s + x) > 0
      |           THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS simhash
      |  FROM h)""".stripMargin

  /** DuckDB twin of Similarity's integer-scaled vectors + exact int64 norms. */
  private val scaledVecs: String =
    """v AS (SELECT vec_id,
      |        list_transform(embedding, x -> CAST(floor(x * 1e8) AS BIGINT)) AS svec
      |      FROM embeddings),
      |w AS (SELECT vec_id, svec,
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(svec, x -> x * x)), (a, b) -> a + b) AS norm2
      |      FROM v)""".stripMargin

  /** Exact int64 dot product of two scaled 64-dim vectors (DuckDB twin of idot). */
  private def idot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  private def cosine(a: String, b: String, na2: String, nb2: String): String =
    s"CAST(${idot(a, b)} AS DOUBLE) / (sqrt(CAST($na2 AS DOUBLE)) * sqrt(CAST($nb2 AS DOUBLE)))"

  /** Sign-LSH bucket key over the scaled vector (Similarity.signBucket). */
  private def signBucket(vec: String, bits: Int = 4): String =
    (0 until bits).map(i => s"(CASE WHEN $vec[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")

  /** Shared oracle of q132 explicit time travel and q229 tag-resolved read. */
  private val timeTravelV2Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus IN ('F', 'O') AND o_totalprice >= 50000""".stripMargin

  /** Shared oracle of the q224 batch A/B test and the q226 streaming monitor. */
  private val abTestSql: String =
    """WITH u AS (
        |  SELECT user_id,
        |    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |      THEN 1 ELSE 0 END AS BIGINT) AS converted
        |  FROM events GROUP BY 1),
        |ua AS (
        |  SELECT *, CASE WHEN CAST('0x' || substr(md5(user_id || ':exp1'), 1, 8) AS BIGINT) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm
        |  FROM u),
        |ar AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(converted) AS BIGINT) AS x
        |       FROM ua GROUP BY 1),
        |wide AS (
        |  SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
        |  FROM (SELECT n, x FROM ar WHERE arm = 'A') a,
        |       (SELECT n, x FROM ar WHERE arm = 'B') b)
        |SELECT n_a, x_a, n_b, x_b,
        |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |  CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff,
        |  (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / sqrt(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |      * (CAST(1.0 AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) AS z,
        |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    - CAST(1.96 AS DOUBLE) * sqrt(
        |      CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        * (CAST(1.0 AS DOUBLE) - CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        / CAST(n_a AS DOUBLE)
        |      + CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        * (CAST(1.0 AS DOUBLE) - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        / CAST(n_b AS DOUBLE)) AS ci_lo,
        |  CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    + CAST(1.96 AS DOUBLE) * sqrt(
        |      CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        * (CAST(1.0 AS DOUBLE) - CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        / CAST(n_a AS DOUBLE)
        |      + CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        * (CAST(1.0 AS DOUBLE) - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        / CAST(n_b AS DOUBLE)) AS ci_hi,
        |  abs((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / sqrt(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |      * (CAST(1.0 AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))) > CAST(1.96 AS DOUBLE) AS significant
        |FROM wide""".stripMargin

  /** DuckDB twin of TextAnalysis.langId (q23), shared verbatim by the q220
    * confusion matrix built on top of it.
    */
  private val langIdSql: String =
    """SELECT doc_id, labeled_lang,
      |  hits_en, hits_de, hits_es, hits_fr, hits_zh,
      |  CASE WHEN mx = 0 THEN 'und'
      |       WHEN hits_en = mx THEN 'en' WHEN hits_de = mx THEN 'de'
      |       WHEN hits_es = mx THEN 'es' WHEN hits_fr = mx THEN 'fr'
      |       ELSE 'zh' END AS guessed_lang
      |FROM (
      |  SELECT doc_id, lang AS labeled_lang,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that)\b')) AS BIGINT) AS hits_en,
      |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein)\b')) AS BIGINT) AS hits_de,
      |    CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los|es)\b')) AS BIGINT) AS hits_es,
      |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|de|et|les|est|une)\b')) AS BIGINT) AS hits_fr,
      |    CAST(len(regexp_extract_all(lower(text), '(的|是|不|了|在|人|有)')) AS BIGINT) AS hits_zh,
      |    greatest(
      |      len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that)\b')),
      |      len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein)\b')),
      |      len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los|es)\b')),
      |      len(regexp_extract_all(lower(text), '\b(le|la|de|et|les|est|une)\b')),
      |      len(regexp_extract_all(lower(text), '(的|是|不|了|在|人|有)'))) AS mx
      |  FROM documents)""".stripMargin

  /** DuckDB twin of Similarity.pcaPower: centered exact-int Gram, then
    * `rounds` power-iteration rounds unrolled as CTEs with the identical
    * DECIMAL(38,12)/DECIMAL(18,12) quantization ladder. Oracle dims are
    * 1-based internally; the output shifts to the operator's 0-based dims.
    */
  private def pcaOracle(rounds: Int): String = {
    // every per-round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and an
    // 8-round unroll would re-inline the Gram chain exponentially (measured:
    // fd exhaustion from thousands of re-opened parquet scans)
    def mv(src: String, prev: String, out: String): String =
      s"""$src AS MATERIALIZED (SELECT gb.i, CAST(CAST(sum(CAST(CAST(gb.gv * $prev.vv AS VARCHAR)
         |    AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS $out
         |  FROM gb JOIN $prev ON gb.j = $prev.j GROUP BY 1)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""${mv(s"w$r", s"v${r - 1}", "w")},
         |m$r AS (SELECT max(abs(w)) AS m FROM w$r),
         |u$r AS (SELECT i, w / m AS u FROM w$r, m$r),
         |n$r AS (SELECT sqrt(CAST(CAST(sum(CAST(CAST(u * u AS VARCHAR)
         |    AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)) AS nrm FROM u$r),
         |v$r AS MATERIALIZED (SELECT i AS j, u / nrm AS vv FROM u$r, n$r)""".stripMargin
    }.mkString(",\n")
    val vf = s"v$rounds"
    s"""WITH $scaledVecs,
       |mu AS (SELECT d.i AS i,
       |    CAST(floor(CAST(sum(svec[CAST(d.i AS INT)]) AS DOUBLE) / count(*)) AS BIGINT) AS m
       |  FROM w CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d GROUP BY 1),
       |dev AS (SELECT w.vec_id, d.i AS i, svec[CAST(d.i AS INT)] - mu.m AS dv
       |  FROM w CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d JOIN mu ON mu.i = d.i),
       |g AS (SELECT a.i AS i, b.i AS j, sum(CAST(a.dv AS HUGEINT) * b.dv) AS gsum
       |  FROM dev a JOIN dev b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |gr AS (SELECT i, j, CAST(CAST(gsum AS VARCHAR) AS DOUBLE) AS gv FROM g),
       |gmx AS (SELECT max(abs(gv)) AS gm FROM gr),
       |gb AS MATERIALIZED (SELECT i, j, gv / gm AS gv FROM gr, gmx),
       |v0 AS (SELECT CAST(u AS BIGINT) AS j,
       |    CASE WHEN u = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS vv
       |  FROM (SELECT unnest(range(1, 65)) AS u)),
       |$roundCtes,
       |${mv("rr", vf, "r")},
       |lam AS (SELECT
       |    CAST(CAST(sum(CAST(CAST($vf.vv * rr.r AS VARCHAR) AS DECIMAL(18,12)))
       |      AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(sum(CAST(CAST($vf.vv * $vf.vv AS VARCHAR) AS DECIMAL(18,12)))
       |      AS VARCHAR) AS DOUBLE) AS lambda_scaled
       |  FROM rr JOIN $vf ON rr.i = $vf.j)
       |SELECT CAST($vf.j - 1 AS BIGINT) AS dim, $vf.vv AS component,
       |  lam.lambda_scaled * gmx.gm AS lambda
       |FROM $vf, lam, gmx""".stripMargin
  }

  /** DuckDB twin of Bpe.train: ⌈k/B⌉ unrolled BATCHED merge rounds over the
    * word dictionary. Each round counts adjacent symbol pairs (tab-joined,
    * so the tie order `cnt DESC, p` is byte-identical to Spark's), takes the
    * top-B candidates (`c$r`), keeps the candidate-prefix symbol-disjoint
    * subset (`sel$r` — a candidate survives iff NO higher-ranked candidate
    * shares a symbol, Bpe.trainUncached's exact rule), and folds the kept
    * merges over segmentations IN RANK ORDER with the same left-to-right
    * non-overlapping `replace` Spark uses (list_reduce over the ordered
    * pattern list; the replacement ' a b '→' ab ' is recomputed from the
    * pattern, symbols never contain spaces). A round with nothing selected
    * folds the empty list and leaves segmentations unchanged — mirroring
    * Bpe's `exhausted` early stop.
    */
  private def bpeCtes(k: Int, b: Int): String = {
    val nRounds = (k + b - 1) / b
    val rounds = (0 until nRounds).map { r =>
      s"""p$r AS (
         |  SELECT unnest(list_transform(range(1, len(l)), i ->
         |    l[CAST(i AS INT)] || chr(9) || l[CAST(i + 1 AS INT)])) AS p, freq
         |  FROM (SELECT freq, string_split(trim(seg), ' ') AS l FROM s$r)),
         |c$r AS MATERIALIZED (
         |  SELECT split_part(p, chr(9), 1) AS a, split_part(p, chr(9), 2) AS b,
         |    row_number() OVER (ORDER BY cnt DESC, p) AS rk
         |  FROM (SELECT p, sum(freq) AS cnt FROM p$r GROUP BY 1
         |        ORDER BY cnt DESC, p LIMIT $b)),
         |sel$r AS MATERIALIZED (
         |  SELECT a, b, rk FROM c$r c
         |  WHERE NOT EXISTS (SELECT 1 FROM c$r d WHERE d.rk < c.rk
         |    AND (d.a = c.a OR d.a = c.b OR d.b = c.a OR d.b = c.b))),
         |s${r + 1} AS MATERIALIZED (
         |  SELECT word, freq,
         |    list_reduce(
         |      list_prepend(seg, coalesce(
         |        (SELECT list(' ' || a || ' ' || b || ' ' ORDER BY rk) FROM sel$r),
         |        [])),
         |      (acc, pat) -> replace(acc, pat,
         |        ' ' || replace(trim(pat), ' ', '') || ' ')) AS seg
         |  FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""d AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |dict AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(toks) AS word FROM d) GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg
       |  FROM dict),
       |$rounds""".stripMargin
  }

  private val BpeK = 64
  private val BpeRounds = (BpeK + graft.ops.Bpe.BatchB - 1) / graft.ops.Bpe.BatchB

  /** DuckDB twin of Stats.tableStats: one UNION ALL branch per lineitem
    * column, typed min/max exactly as the operator surfaces them.
    */
  private def tableStatsOracle: String = {
    val cols = Seq(
      "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
      "l_linenumber" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
      "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "str",
      "l_linestatus" -> "str", "l_shipdate" -> "ts")
    val branches = cols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "num" => (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        case "ts" => (s"CAST(epoch_us(min($c)) AS DOUBLE)",
          s"CAST(epoch_us(max($c)) AS DOUBLE)")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      val (ms, xs) =
        if (kind == "str") (s"min($c)", s"max($c)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$c' AS column_name, (SELECT n_rows FROM n) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS ndv,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM lineitem""".stripMargin
    }
    s"""WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** From-scratch twin of the incremental (mergeable) stats — no NDV. */
  private def incrStatsOracle: String = {
    val cols = Seq(
      "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
      "l_linenumber" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
      "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "str",
      "l_linestatus" -> "str", "l_shipdate" -> "ts")
    val branches = cols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "num" => (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        case "ts" => (s"CAST(epoch_us(min($c)) AS DOUBLE)",
          s"CAST(epoch_us(max($c)) AS DOUBLE)")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      val (ms, xs) =
        if (kind == "str") (s"min($c)", s"max($c)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
         |FROM lineitem""".stripMargin
    }
    branches.mkString("\nUNION ALL\n")
  }

  /** Parse hex char pair (1-indexed positions p, p+1 of hex string h) to a byte. */
  private def hexByte(h: String, p: Int): String =
    s"((strpos('0123456789abcdef', substr($h, $p, 1)) - 1) * 16 + " +
      s"strpos('0123456789abcdef', substr($h, ${p + 1}, 1)) - 1)"

  /** DuckDB twin of Graph.pageRank: `iters` unrolled synchronous iterations.
    * Contributions round to DECIMAL(28,18) before the exact per-destination
    * sum and cross back to double through the VARCHAR bridge, mirroring
    * Num.decToDouble. The damping constants are interpolated from the SAME
    * Scala doubles the operator uses (1.0 − 0.85 is NOT 0.15 in binary).
    * The double→decimal ENTRY casts are VARCHAR-bridged too: Spark's
    * Cast(double→decimal) rounds the shortest-string representation
    * (BigDecimal.valueOf) while DuckDB's direct cast rounds the exact
    * binary expansion — bridging makes DuckDB round the same shortest
    * string Spark does.
    */
  /** DuckDB twin of Events.markovStationary: q142's cells restricted to
    * states with outgoing mass, then `iters` unrolled sum-normalized power
    * rounds — contributions VARCHAR-bridged into DECIMAL(28,18) exactly as
    * [[pageRankOracle]] does (Spark's double→decimal cast rounds the
    * shortest string; DuckDB's rounds the binary expansion).
    */
  private def markovOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT to_type,
         |    CAST(CAST(sum(CAST(CAST(prob * p AS VARCHAR) AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS raw
         |  FROM pm JOIN d${i - 1} ON pm.from_type = d${i - 1}.state
         |  GROUP BY 1),
         |t$i AS (SELECT CAST(CAST(sum(CAST(CAST(raw AS VARCHAR) AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS t
         |  FROM r$i),
         |d$i AS MATERIALIZED (SELECT s.state, COALESCE(r.raw, CAST(0 AS DOUBLE)) / t AS prob
         |  FROM states s LEFT JOIN r$i r ON s.state = r.to_type CROSS JOIN t$i)"""
        .stripMargin
    }
    s"""WITH pp AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |                           ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |cells AS MATERIALIZED (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c_ft
       |  FROM pp WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |states AS MATERIALIZED (SELECT DISTINCT from_type AS state FROM cells),
       |kept AS (SELECT c.from_type, c.to_type, c.c_ft
       |         FROM cells c JOIN states s ON c.to_type = s.state),
       |den AS (SELECT from_type, CAST(sum(c_ft) AS BIGINT) AS c_f
       |        FROM kept GROUP BY 1),
       |pm AS MATERIALIZED (SELECT k.from_type, k.to_type,
       |         CAST(k.c_ft AS DOUBLE) / CAST(d.c_f AS DOUBLE) AS p
       |       FROM kept k JOIN den d USING (from_type)),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
       |d0 AS (SELECT state, CAST(1.0 AS DOUBLE) / CAST(k AS DOUBLE) AS prob
       |       FROM states CROSS JOIN kk),
       |${steps.mkString(",\n")}
       |SELECT state AS event_type, prob AS stationary_p FROM d$iters""".stripMargin
  }

  private def pageRankOracle(iters: Int, damping: Double): String = {
    val steps = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.dst,
         |    CAST(CAST(sum(CAST(CAST(r.rank / d.deg AS VARCHAR) AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS inbound
         |  FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
         |  GROUP BY 1),
         |r$i AS (SELECT id, CAST(${1.0 - damping} AS DOUBLE) / n
         |    + CAST($damping AS DOUBLE) * COALESCE(inbound, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes LEFT JOIN s$i ON nodes.id = s$i.dst CROSS JOIN nn)"""
        .stripMargin
    }
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
       |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS id FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / n AS rank FROM nodes CROSS JOIN nn),
       |${steps.mkString(",\n")}
       |SELECT r.id AS part_id, r.rank, deg.deg AS out_degree
       |FROM r$iters r JOIN deg ON r.id = deg.src""".stripMargin
  }

  /** DuckDB twin of Clustering.kmeansAssignments: deterministic seed
    * centroids (the first k vec_ids present, ORDER BY vec_id LIMIT k),
    * `iters` unrolled Lloyd rounds with decimal distances/means exactly as
    * the operator computes them.
    */
  private def kmeansOracle(k: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val dist =
        s"""d$i AS (SELECT e.vec_id, c.cid,
           |    sum(CAST(CAST((e.x - c.c) * (e.x - c.c) AS VARCHAR) AS DECIMAL(30,18))) AS dist
           |  FROM e JOIN c${i - 1} c ON e.dim = c.dim
           |  GROUP BY 1, 2),
           |a$i AS (SELECT vec_id, cid, dist FROM (
           |    SELECT vec_id, cid, dist,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |    FROM d$i) WHERE rn = 1)""".stripMargin
      val update =
        s""",
           |c$i AS (SELECT a.cid, e.dim,
           |    CAST(CAST(sum(CAST(CAST(e.x AS VARCHAR) AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
           |      / count(*) AS c
           |  FROM a$i a JOIN e ON a.vec_id = e.vec_id
           |  GROUP BY 1, 2)""".stripMargin
      if (i < iters) dist + update else dist
    }
    s"""WITH e AS (SELECT vec_id,
       |    unnest(range(0, len(embedding))) AS dim,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid,
       |    unnest(range(0, len(embedding))) AS dim,
       |    CAST(unnest(embedding) AS DOUBLE) AS c
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k)),
       |${steps.mkString(",\n")}
       |SELECT vec_id, cid AS cluster, CAST(CAST(dist AS VARCHAR) AS DOUBLE) AS dist
       |FROM a$iters""".stripMargin
  }

  /** DuckDB twin of Graph.hits: `iters` unrolled hub/authority rounds over
    * the bipartite customer→part edge set, sum-normalized (the operator's
    * documented deviation from L2). Same bridging discipline as
    * [[pageRankOracle]]: entry casts to DECIMAL(28,18) go through VARCHAR
    * (Spark's double→decimal rounds the shortest string), exact decimal
    * sums bridge back to double through VARCHAR; normalization divisions
    * are IEEE-correctly-rounded on both engines. `CAST(1.0 AS DOUBLE)` in
    * the init: a bare 1.0 is DECIMAL in DuckDB and would divide in the
    * decimal domain.
    */
  private def hitsOracle(iters: Int): String = {
    def dsum(x: String) =
      s"CAST(CAST(sum(CAST(CAST($x AS VARCHAR) AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      s"""hr$i AS (
         |  SELECT e.c, ${dsum(s"a${i - 1}.a")} AS h
         |  FROM e JOIN a${i - 1} ON e.p = a${i - 1}.p GROUP BY 1),
         |ht$i AS (SELECT ${dsum("h")} AS t FROM hr$i),
         |h$i AS (SELECT c, h / (SELECT t FROM ht$i) AS h FROM hr$i),
         |ar$i AS (
         |  SELECT e.p, ${dsum(s"h$i.h")} AS a
         |  FROM e JOIN h$i ON e.c = h$i.c GROUP BY 1),
         |at$i AS (SELECT ${dsum("a")} AS t FROM ar$i),
         |a$i AS (SELECT p, a / (SELECT t FROM at$i) AS a FROM ar$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |a0 AS (
       |  SELECT p, CAST(1.0 AS DOUBLE) / (SELECT count(DISTINCT p) FROM e) AS a
       |  FROM (SELECT DISTINCT p FROM e)),
       |$steps
       |SELECT 'hub' AS kind, c AS id, h AS score FROM h$iters
       |UNION ALL
       |SELECT 'auth', p, a FROM a$iters""".stripMargin
  }

  /** ln 2 as the SAME Scala double `Events.retentionHalfLife` multiplies
    * with (shortest-round-trip toString → DuckDB parses identical bits);
    * DuckDB's own `ln(2)` may differ by an ulp.
    */
  private def ln2ForOracle: String = math.log(2.0).toString

  /** DuckDB twin of Graph.kCore: `rounds` unrolled induced-degree peels of
    * the part co-purchase graph — integer counting only, no bridging.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    // every per-round CTE is MATERIALIZED: the peel references its inputs
    // twice per round, and DuckDB's default CTE inlining would re-expand
    // the whole chain exponentially (measured as thousands of parquet
    // re-opens — "Too many open files" — at 8 rounds)
    def degOf(e: String, d: String) =
      s"""$d AS MATERIALIZED (
         |  SELECT id, count(*) AS deg FROM (
         |    SELECT u AS id FROM $e UNION ALL SELECT v AS id FROM $e)
         |  GROUP BY 1)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""al$r AS MATERIALIZED (SELECT id FROM d${r - 1} WHERE deg >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT u, v FROM e${r - 1}
         |  WHERE u IN (SELECT id FROM al$r) AND v IN (SELECT id FROM al$r)),
         |${degOf(s"e$r", s"d$r")}""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |${degOf("e0", "d0")},
       |$steps
       |SELECT id, CAST(deg AS BIGINT) AS core_deg
       |FROM d$rounds WHERE deg >= $k""".stripMargin
  }

  /** The q152 BM25 oracle body — also the lexical arm of q158's fusion.
    * The k1/b/terms constants are INTERPOLATED from [[graft.ops.TermStats]]'s
    * defaults (the same Scala doubles `bm25Scores` folds with; Double.toString
    * is shortest-round-trip, so DuckDB's literal parse recovers the identical
    * bits) — a hardcoded `2.2` would only match while `k1 + 1.0` happens to
    * equal that literal exactly, and would silently diverge if the default
    * moved.
    */
  private def bm25OracleSql: String = {
    val k1 = graft.ops.TermStats.Bm25K1
    val b = graft.ops.TermStats.Bm25B
    val termsIn =
      graft.ops.TermStats.Bm25DefaultTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH d2 AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |d3 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len FROM d2),
        |corpus AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(CAST(len AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE)
        |      / count(*) AS avg_len
        |  FROM d3),
        |tf AS (
        |  SELECT doc_id, len, t, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, len, unnest(toks) AS t FROM d3)
        |  WHERE t IN ($termsIn)
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |SELECT doc_id,
        |  CAST(CAST(sum(CAST(CAST(
        |    CAST(CAST(CAST(CAST(
        |      ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
        |          + CAST(1.0 AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    * (tf * CAST(${k1 + 1.0} AS DOUBLE))
        |    / (tf + CAST($k1 AS DOUBLE)
        |        * (CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE)
        |           + CAST($b AS DOUBLE) * len / avg_len))
        |    AS VARCHAR) AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS score,
        |  CAST(count(*) AS BIGINT) AS n_terms_matched
        |FROM tf JOIN df USING (t) CROSS JOIN corpus
        |GROUP BY 1""".stripMargin
  }

  /** The fixed-weight quality-score CTEs (f/z/e + the stable sigmoid),
    * shared verbatim by q195 (the classifier itself) and the model-eval
    * tier scoring the same model (q235 AUC, q236 calibration) — one
    * fragment keeps the three from silently diverging. Weights are
    * interpolated from the operator's Scala doubles; ln bridged to 12
    * decimals; sigmoid in the STABLE exp(-|z|) form with z quantized to 6
    * decimals and the (0,1]-bounded exp bridged to 9 decimals (see the
    * operator scaladoc for why the naive exp(-z) bridge fails at scale).
    */
  private val qualityScoreCtes: String =
    s"""qf AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text),
       |      '\\b(the|a|and|of|to|in|is|it|that|for)\\b')) AS DOUBLE)
       |      / len(regexp_split_to_array(trim(text), '\\s+')) AS sr,
       |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
       |      / n_chars AS ppc,
       |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
       |      / len(regexp_split_to_array(trim(text), '\\s+')) AS mwl,
       |    CAST(CAST(CAST(CAST(ln(CAST(n_chars AS DOUBLE)) AS VARCHAR)
       |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS lnc
       |  FROM documents),
       |qz AS (
       |  SELECT doc_id,
       |    CAST(CAST(CAST(CAST(
       |      ${-2.0} + ${4.0} * sr + ${-6.0} * ppc + ${0.3} * mwl
       |        + ${0.15} * lnc
       |      AS VARCHAR) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS zq
       |  FROM qf),
       |qe AS (
       |  SELECT doc_id, zq,
       |    CAST(CAST(CAST(CAST(exp(-abs(zq)) AS VARCHAR) AS DECIMAL(18,9))
       |      AS VARCHAR) AS DOUBLE) AS e
       |  FROM qz),
       |qscore AS (
       |  SELECT doc_id, zq,
       |    CASE WHEN zq >= 0 THEN CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + e)
       |         ELSE e / (CAST(1.0 AS DOUBLE) + e) END AS score
       |  FROM qe)""".stripMargin

  /** Quality score joined with the binary English label — shared by the
    * model-eval oracles (q235/q236).
    */
  private val qualityLabeledCtes: String =
    s"""$qualityScoreCtes,
       |qlab AS (
       |  SELECT s.doc_id, s.score,
       |    CASE WHEN d.lang = 'en' THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS y
       |  FROM qscore s JOIN documents d ON s.doc_id = d.doc_id)""".stripMargin

  /** The nine-decile threshold sweep over the quality score — shared
    * VERBATIM by batch q242 and streaming q255 (the q241/q246 parity
    * contract).
    */
  private val thresholdSweepSql: String =
    s"""WITH $qualityLabeledCtes,
       |counts AS (
       |  SELECT score AS x, CAST(sum(y) AS BIGINT) AS c1,
       |    CAST(sum(1 - y) AS BIGINT) AS c2
       |  FROM qlab GROUP BY 1),
       |ts AS (
       |  SELECT CAST(i AS DOUBLE) / 10.0 AS t
       |  FROM (SELECT unnest(generate_series(1, 9)) AS i)),
       |cm AS (
       |  SELECT t,
       |    CAST(sum(CASE WHEN x >= t THEN c1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN x >= t THEN c2 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN x < t THEN c1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN x < t THEN c2 ELSE 0 END) AS BIGINT) AS tn
       |  FROM counts CROSS JOIN ts GROUP BY 1)
       |SELECT t, tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
       |  CASE WHEN tp + fn > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rec,
       |  CASE WHEN 2 * tp + fp + fn > 0
       |    THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
       |  END AS f1
       |FROM cm""".stripMargin

  /** q251's decomposition pipeline as shared CTEs (daily cents → dow →
    * centered 7-observed-day trend → per-dow seasonal → residual), ending in
    * `res` — shared VERBATIM by q251 and the q254 residual CUSUM.
    */
  private val seasonalDecompCtes: String =
    """daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |d2 AS (
      |  SELECT day, x,
      |    CAST(date_diff('day', DATE '1990-01-01', day) % 7 AS BIGINT) AS dow
      |  FROM daily),
      |t AS (
      |  SELECT day, x, dow,
      |    CAST(sum(x) OVER w AS BIGINT) AS w_sum,
      |    CAST(count(*) OVER w AS BIGINT) AS n_window
      |  FROM d2
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |tr AS (
      |  SELECT day, x, dow, n_window,
      |    CAST(w_sum AS DOUBLE) / CAST(n_window AS DOUBLE) AS trend,
      |    CAST(x AS DOUBLE)
      |      - CAST(w_sum AS DOUBLE) / CAST(n_window AS DOUBLE) AS detrended
      |  FROM t),
      |s AS (
      |  SELECT dow,
      |    CAST(CAST(sum(CAST(CAST(detrended AS VARCHAR) AS DECIMAL(28,6)))
      |      AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS seasonal
      |  FROM tr GROUP BY 1),
      |res AS (
      |  SELECT tr.day, tr.x, tr.n_window, tr.trend, tr.dow, s.seasonal,
      |    tr.detrended - s.seasonal AS residual
      |  FROM tr JOIN s ON tr.dow = s.dow)""".stripMargin

  /** The k-sample tests' shared input (q258/q259/q260): per-(value, group)
    * counts of order-total cents by priority — mirrors
    * [[graft.ops.Statistics.centsByPriority]] verbatim.
    */
  private val priorityCentsCtes: String =
    """bvg AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |    o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  /** The q77 one-step chain extended with the per-vector top-2 centroid
    * cosines — shared by the cluster-quality audits q269/q270. Ends in
    * `t2(vec_id, cell, cos1, cos2)` (cos1 = own/argmax centroid, cos2 =
    * runner-up) and keeps `c1n` in scope for centroid-pair separations.
    */
  private lazy val oneStepTop2Ctes: String =
    s"""$scaledVecs,
       |c0 AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
       |a0r AS (SELECT w.vec_id, w.svec, w.norm2, c0.cent_id,
       |         row_number() OVER (PARTITION BY w.vec_id
       |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, c0.cent_id ASC) AS rn
       |       FROM w CROSS JOIN c0),
       |a0 AS (SELECT vec_id, svec, norm2, cent_id AS cell0 FROM a0r WHERE rn = 1),
       |ex AS (SELECT cell0, d.i, svec[CAST(d.i AS INT)] AS val
       |       FROM a0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
       |cm AS (SELECT cell0, i, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
       |       FROM ex GROUP BY 1, 2),
       |c1 AS (SELECT cell0 AS cent_id, array_agg(comp ORDER BY i) AS cvec FROM cm GROUP BY 1),
       |c1n AS (SELECT cent_id, cvec,
       |          list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(cvec, x -> x * x)), (a, b) -> a + b) AS cnorm2
       |        FROM c1),
       |r2c AS (SELECT a0.vec_id, c1n.cent_id,
       |         ${cosine("a0.svec", "c1n.cvec", "a0.norm2", "c1n.cnorm2")} AS cent_cos,
       |         row_number() OVER (PARTITION BY a0.vec_id
       |           ORDER BY ${cosine("a0.svec", "c1n.cvec", "a0.norm2", "c1n.cnorm2")} DESC, c1n.cent_id ASC) AS rn
       |       FROM a0 CROSS JOIN c1n),
       |t2 AS (SELECT vec_id,
       |         min(CASE WHEN rn = 1 THEN cent_id END) AS cell,
       |         min(CASE WHEN rn = 1 THEN cent_cos END) AS cos1,
       |         min(CASE WHEN rn = 2 THEN cent_cos END) AS cos2
       |       FROM r2c WHERE rn <= 2 GROUP BY 1)""".stripMargin

  /** q194's trailing-window z oracle — shared VERBATIM with the streaming
    * twin q268 (whose Spark side reuses the identical batch tail on the
    * drained per-day state).
    */
  private val dailyAnomalySql: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT day, n_orders,
      |    CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS x,
      |    count(*) OVER win AS cnt,
      |    CAST(CAST(sum(tot) OVER win AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(tot * tot) OVER win AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM d
      |  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |m1 AS (
      |  SELECT *, CASE WHEN cnt = 7 THEN sx / cnt END AS mean_prior FROM w),
      |m2 AS (
      |  SELECT *, CASE WHEN cnt = 7 THEN
      |      sqrt(greatest((sxx - sx * mean_prior) / (cnt - 1),
      |        CAST(0 AS DOUBLE))) END AS sd_prior
      |  FROM m1)
      |SELECT day, n_orders, x AS total, mean_prior, sd_prior,
      |  CASE WHEN sd_prior > 0 THEN (x - mean_prior) / sd_prior END AS z,
      |  CASE WHEN sd_prior > 0 THEN abs((x - mean_prior) / sd_prior) > 2.0
      |    ELSE false END AS is_anomaly
      |FROM m2""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_csv_ingest" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem""".stripMargin,

    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_quantity < CAST(25 AS DOUBLE)""".stripMargin,

    "q03_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q04_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q05_union_all" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'O'""".stripMargin,

    "q06_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,

    "q07_rank_in_group" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS balance_rank
        |  FROM customer)
        |WHERE balance_rank <= 3""".stripMargin,

    "q08_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin,

    "q09_scalar_funcs" ->
      """SELECT c_custkey,
        |  c_name || ' / ' || c_mktsegment AS display_name,
        |  concat_ws('-', substr(c_name, 1, 8), c_mktsegment) AS name_key,
        |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
        |       WHEN c_acctbal < 5000 THEN 'MID'
        |       ELSE 'HIGH' END AS balance_band,
        |  CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 0.02, 2) AS DOUBLE) AS service_fee
        |FROM customer""".stripMargin,

    "q10_customer_mart" ->
      s"""SELECT c_custkey AS customer_id, c_name AS customer_name, n_name AS nation_name,
         |  c_mktsegment AS mktsegment,
         |  strftime(o_orderdate, '%Y-%m-%d') AS sales_date,
         |  $totalCost AS total_cost
         |$enrichJoin""".stripMargin,

    "q11_sales_mart" ->
      s"""SELECT n_nationkey AS store_id, n_name AS store_name,
         |  s_suppkey AS sales_person_id, s_name AS sales_person_name,
         |  o_orderkey AS order_id,
         |  strftime(o_orderdate, '%Y-%m-%d') AS sales_date,
         |  $totalCost AS total_cost,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month
         |$enrichJoin""".stripMargin,

    "q12_customer_monthly" ->
      s"""SELECT c_custkey AS customer_id, c_name AS full_name,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month,
         |  CAST(SUM(CAST($totalCost AS DECIMAL(22,4))) AS DOUBLE) AS total_sales
         |$enrichJoin
         |GROUP BY 1, 2, 3""".stripMargin,

    "q13_sales_incentive" ->
      s"""WITH t AS (
         |  SELECT n_nationkey AS store_id, s_suppkey AS sales_person_id, s_name AS full_name,
         |    strftime(o_orderdate, '%Y-%m') AS sales_month,
         |    SUM(CAST($totalCost AS DECIMAL(22,4))) AS total_dec
         |  $enrichJoin
         |  GROUP BY 1, 2, 3, 4),
         |r AS (
         |  SELECT *, rank() OVER (PARTITION BY store_id, sales_month ORDER BY total_dec DESC) AS rnk
         |  FROM t)
         |SELECT store_id, sales_person_id, full_name, sales_month,
         |  CAST(total_dec AS DOUBLE) AS total_sales_every_month,
         |  CASE WHEN rnk = 1 THEN CAST(round(total_dec * 0.01, 2) AS DOUBLE)
         |       ELSE CAST(0 AS DOUBLE) END AS incentive
         |FROM r""".stripMargin,

    "q14_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q15_sessionize" ->
      sessionizeOracle,

    // ANALYZE-style stats: one wide single-pass aggregate, typed min/max
    "q119_table_stats" -> tableStatsOracle,

    // incremental ANALYZE: snapshot+delta partial merge must equal this
    // from-scratch pass bit for bit (the q98 contract applied to stats)
    "q126_incr_stats" -> incrStatsOracle,

    // cross-corpus ANN linkage: bucket-co-partitioned two-table join, no
    // broadcast (both sides corpus-scale)
    "q130_cross_links" ->
      s"""WITH $scaledVecs,
         |e2 AS (
         |  SELECT w.vec_id, w.svec, w.norm2, e.label,
         |    ${signBucket("w.svec", 6)} AS bucket
         |  FROM w JOIN embeddings e ON w.vec_id = e.vec_id),
         |a AS (SELECT vec_id AS a_id, svec AS avec, norm2 AS an2, bucket
         |      FROM e2 WHERE label % 2 = 0),
         |b AS (SELECT vec_id AS b_id, svec AS bvec, norm2 AS bn2, bucket
         |      FROM e2 WHERE label % 2 = 1),
         |j AS (
         |  SELECT a_id, b_id, ${cosine("avec", "bvec", "an2", "bn2")} AS cosine
         |  FROM a JOIN b USING (bucket))
         |SELECT a_id, b_id,
         |  CAST(row_number() OVER (PARTITION BY a_id
         |    ORDER BY cosine DESC, b_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM j QUALIFY rk <= 3""".stripMargin,

    // the composed training-mix manifest: exact-dedup survivors x bigram-LM
    // keep x DSIR affinity x BPE token budget, per source — every stage is
    // an already-gated operator, composed with namespaced CTEs
    "q129_training_mix" ->
      s"""WITH ${bpeCtes(BpeK, graft.ops.Bpe.BatchB)},
         |bcnt AS (
         |  SELECT word, len(string_split(trim(seg), ' ')) AS n_sub FROM s$BpeRounds),
         |bdw AS (SELECT doc_id, unnest(toks) AS word FROM d),
         |btokj AS (
         |  SELECT bdw.doc_id, sum(c.n_sub) AS n_subword_tokens
         |  FROM bdw JOIN bcnt c USING (word) GROUP BY 1),
         |btok AS (
         |  SELECT d.doc_id, coalesce(btokj.n_subword_tokens, 0) AS n_subword_tokens
         |  FROM d LEFT JOIN btokj USING (doc_id)),
         |lmb AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(toks) >= 2 THEN
         |      list_transform(range(1, len(toks)),
         |        i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])
         |    ELSE [] END) AS bigram
         |  FROM d),
         |lmdb AS (SELECT doc_id, bigram, count(*) AS n FROM lmb GROUP BY 1, 2),
         |lmc12 AS (SELECT bigram, sum(n) AS c12 FROM lmdb GROUP BY 1),
         |lmc1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(n) AS c1
         |         FROM lmdb GROUP BY 1),
         |lmv AS (SELECT count(DISTINCT t.term) AS v
         |        FROM (SELECT unnest(toks) AS term FROM d) t),
         |lms AS (
         |  SELECT lmdb.doc_id, lmdb.n,
         |    ((lmc12.c12 + 1) * 1000000) // (lmc1.c1 + lmv.v) AS ppm
         |  FROM lmdb
         |  JOIN lmc12 ON lmdb.bigram = lmc12.bigram
         |  JOIN lmc1 ON split_part(lmdb.bigram, ' ', 1) = lmc1.w1
         |  CROSS JOIN lmv),
         |lmpd AS (SELECT doc_id, sum(n * ppm) AS ppm_sum, sum(n) AS n_bigrams
         |         FROM lms GROUP BY 1),
         |lmca AS (SELECT CAST(sum(ppm_sum) AS DOUBLE) / sum(n_bigrams) AS corpus_avg
         |         FROM lmpd),
         |lmkeep AS (
         |  SELECT d.doc_id
         |  FROM d LEFT JOIN lmpd p USING (doc_id) CROSS JOIN lmca
         |  WHERE NOT coalesce(
         |    CAST(p.ppm_sum AS DOUBLE) / p.n_bigrams < lmca.corpus_avg, false)),
         |dsd AS (SELECT doc_id, source FROM documents),
         |dsf AS (
         |  SELECT lmdb.doc_id, dsd.source = 'src0' AS is_target,
         |    CAST('0x' || substr(md5(lmdb.bigram), 1, 8) AS BIGINT) % 4096 AS bucket,
         |    sum(n) AS n
         |  FROM lmdb JOIN dsd USING (doc_id) GROUP BY 1, 2, 3),
         |dstb AS (SELECT bucket, sum(n) AS t_b FROM dsf WHERE is_target GROUP BY 1),
         |dsrb AS (SELECT bucket, sum(n) AS r_b FROM dsf WHERE NOT is_target GROUP BY 1),
         |dstot AS (
         |  SELECT sum(CASE WHEN is_target THEN n ELSE 0 END) AS t_total,
         |         sum(CASE WHEN NOT is_target THEN n ELSE 0 END) AS r_total
         |  FROM dsf),
         |dss AS (
         |  SELECT dsf.doc_id, dsf.n,
         |    ((coalesce(dstb.t_b, 0) + 1) * 1000000) // (dstot.t_total + 4096) AS tp,
         |    ((coalesce(dsrb.r_b, 0) + 1) * 1000000) // (dstot.r_total + 4096) AS rp
         |  FROM dsf
         |  LEFT JOIN dstb USING (bucket)
         |  LEFT JOIN dsrb USING (bucket)
         |  CROSS JOIN dstot),
         |dspd AS (SELECT doc_id, sum(n * (tp - rp)) AS weight_ppm FROM dss GROUP BY 1),
         |aff AS (
         |  SELECT dsd.doc_id, coalesce(dspd.weight_ppm, 0) > 0 AS target_like
         |  FROM dsd LEFT JOIN dspd USING (doc_id)),
         |surv AS (
         |  SELECT doc_id, source FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
         |SELECT s.source, count(*) AS n_docs,
         |  CAST(sum(btok.n_subword_tokens) AS BIGINT) AS total_subword_tokens,
         |  CAST(sum(CASE WHEN aff.target_like THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like
         |FROM surv s
         |JOIN lmkeep USING (doc_id)
         |JOIN aff USING (doc_id)
         |JOIN btok USING (doc_id)
         |GROUP BY 1""".stripMargin,

    // UNPIVOT: the q03 summary melted long; count_order cast to double so
    // the value column unifies
    "q128_unpivot" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |    CAST(SUM(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |    CAST(COUNT(*) AS DOUBLE) AS count_order
        |  FROM lineitem
        |  WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |  GROUP BY l_returnflag, l_linestatus)
        |UNPIVOT s
        |ON sum_qty, sum_base_price, sum_disc_price, avg_qty, count_order
        |INTO NAME metric VALUE value""".stripMargin,

    // declarative data-quality expectations, one row per check
    "q127_expectations" ->
      """SELECT 'lineitem_orderkey_not_null' AS check_name,
        |  count(*) AS n_checked,
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_key_unique', CAST(sum(cnt) AS BIGINT),
        |  CAST(sum(cnt - 1) AS BIGINT), sum(cnt - 1) = 0
        |FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |UNION ALL
        |SELECT 'discount_in_unit_range', count(*),
        |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'shipdate_before_2000', count(*),
        |  CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'orderkey_in_orders',
        |  (SELECT count(*) FROM lineitem),
        |  count(*), count(*) = 0
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL""".stripMargin,

    // streaming hopping windows: same boundaries as q113, minus the
    // countDistinct streaming aggregation cannot hold incrementally
    "q125_stream_hopping" ->
      """WITH h AS (SELECT unnest(range(0, 4)) AS k),
        |e AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - to_minutes(CAST(k * 15 AS BIGINT)) AS window_start,
        |         event_type, value
        |  FROM events CROSS JOIN h)
        |SELECT window_start,
        |  window_start + INTERVAL '1 hour' AS window_end,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    // the dataset report card: the q16 dup criterion + q21 token counts
    // composed per source
    "q124_report_card" ->
      """WITH f AS (SELECT md5(text) AS h, count(*) AS fam FROM documents GROUP BY 1)
        |SELECT d.source,
        |  count(*) AS n_docs,
        |  CAST(sum(CASE WHEN f.fam > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  count(DISTINCT d.lang) AS n_langs,
        |  CAST(sum(CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT))
        |    AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(d.n_chars) AS DOUBLE) / count(*) AS mean_chars
        |FROM documents d JOIN f ON md5(d.text) = f.h
        |GROUP BY 1""".stripMargin,

    // multi-pass blocking ER: edges unioned across two blocking keys (first
    // and last token), one clustering over the union
    "q123_entity_multipass" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        |nb AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n),
        |nb2 AS (SELECT p_name, split_part(p_name, ' ', -1) AS blk FROM n),
        |e AS (
        |  SELECT a.p_name AS src, b.p_name AS dst
        |  FROM nb a JOIN nb b
        |  ON a.blk = b.blk AND a.p_name < b.p_name
        |    AND levenshtein(a.p_name, b.p_name) <= 3
        |  UNION
        |  SELECT a.p_name AS src, b.p_name AS dst
        |  FROM nb2 a JOIN nb2 b
        |  ON a.blk = b.blk AND a.p_name < b.p_name
        |    AND levenshtein(a.p_name, b.p_name) <= 3),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, lbl) AS (
        |  SELECT p_name, p_name FROM n
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
        |  WHERE r.lbl < e.dst),
        |lab AS (SELECT id AS p_name, min(lbl) AS entity_name FROM reach GROUP BY 1)
        |SELECT p.p_partkey, p.p_name, l.entity_name,
        |  p.p_name = l.entity_name AS is_canonical
        |FROM part p JOIN lab l USING (p_name)""".stripMargin,

    // exponential time decay in exact shifted fixed point: shift-and-floor
    // divide is bit-identical across engines; sums run in DECIMAL(38,0)
    "q122_decayed_pop" ->
      """WITH m AS (SELECT CAST(max(ts) AS DATE) AS max_day FROM events),
        |e AS (
        |  SELECT event_type,
        |    least(date_diff('day', CAST(ts AS DATE), max_day), 62) AS age,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events CROSS JOIN m)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(CAST(sum((cents * 1073741824)
        |      // (CAST(1 AS BIGINT) << CAST(age AS INT))) AS DECIMAL(38,0))
        |    AS DOUBLE) AS decayed_value
        |FROM e GROUP BY 1""".stripMargin,

    // format round trips are lossless against the source tables
    "q120_json_source" -> "SELECT * FROM documents",
    "q121_orc_roundtrip" -> "SELECT * FROM lineitem",

    // versioned table: the oracle recomputes the versioned states straight
    // from the source table, so commit protocol + manifest fold + CoW
    // rewrite + change-feed except must all be lossless to hash-match.
    // q132: AS OF v2 = initial F load + O batch, minus the <50000 purge
    // q229 reads the SAME v2 snapshot through a named tag — one oracle for
    // both proves ref resolution changes nothing about the data
    "q132_time_travel" -> timeTravelV2Sql,
    "q229_table_tags" -> timeTravelV2Sql,

    // q164: multi-writer optimistic concurrency — final state after two
    // FORCED version races (a blind-append retry and a delete that must
    // re-resolve its rewrite set against the interleaved append). The oracle
    // recomputes the expected table straight from the source: all orders
    // surviving the delete plus the high-value duplicate batch (bag
    // semantics via UNION ALL), so a lost or clobbered commit on either
    // side breaks the hash.
    "q164_concurrent_writers" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_totalprice >= CAST(50000 AS DOUBLE)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_totalprice >= CAST(400000 AS DOUBLE)""".stripMargin,

    // q165: the GK-sketch swap for the exact quantile table, epsilon-gated —
    // the oracle recomputes the exact order statistics and pins
    // within_bound = TRUE, so a sketch answer drifting past ±εn ranks of
    // ⌈p·n⌉ breaks the hash (the same spec-pinned-bound pattern as HLL's)
    "q165_gk_bound" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT flag, CAST(p AS DOUBLE) AS p, price AS value,
        |  TRUE AS within_bound
        |FROM r CROSS JOIN (VALUES (0.5), (0.95)) v(p)
        |WHERE rn = ceil(CAST(p AS DOUBLE) * n)""".stripMargin,

    // q166: triangle census — the oracle counts triangles with naive
    // id-ordering (each triangle once as u<v<w); the engine counts with
    // degree orientation; the censuses are equal because both count each
    // undirected triangle exactly once
    "q166_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |d AS (
        |  SELECT id, count(*) AS deg
        |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) FROM d) AS n_wedges,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM e e1 JOIN e e2 ON e1.v = e2.u
        |   JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles""".stripMargin,

    // q167: class balancing — per-language row_number over the same
    // content-addressed rank key, capped at the minority class's count
    "q167_class_balance" ->
      """WITH d AS (
        |  SELECT doc_id, lang, md5(doc_id || '#balance_v1') AS rank_key
        |  FROM documents),
        |t AS (
        |  SELECT CAST(min(n) AS BIGINT) AS target
        |  FROM (SELECT count(*) AS n FROM d GROUP BY lang)),
        |r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_key, doc_id) AS BIGINT) AS rn
        |  FROM d)
        |SELECT doc_id, lang, rn, target FROM r CROSS JOIN t WHERE rn <= target""".stripMargin,

    // q168: Efraimidis–Spirakis weighted top-k — u from the md5 prefix,
    // ln through the 12-decimal VARCHAR bridge (see q155's psi oracle),
    // one further division by the weight; ties break by doc_id
    "q168_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST('0x' || substr(md5(doc_id || ':wsample_v1'), 1, 8) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(CAST(CAST(CAST(ln(CAST(h + 1 AS DOUBLE) / 4294967297.0)
        |    AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    / CAST(n_chars AS DOUBLE) AS es_key
        |FROM s
        |ORDER BY es_key DESC, doc_id
        |LIMIT 200""".stripMargin,

    // q240: stratified A-ES sample — q168's key per language with a
    // row_number-per-stratum filter; same 12-decimal ln bridge
    "q240_stratified_es" ->
      """WITH s AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST('0x' || substr(md5(doc_id || ':strat_v1'), 1, 8) AS BIGINT) AS h
        |  FROM documents),
        |keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(CAST(CAST(CAST(ln(CAST(h + 1 AS DOUBLE) / 4294967297.0)
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |      / CAST(n_chars AS DOUBLE) AS es_key
        |  FROM s),
        |r AS (
        |  SELECT doc_id, lang, n_chars, es_key,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY es_key DESC, doc_id) AS rn
        |  FROM keyed)
        |SELECT doc_id, lang, n_chars, es_key FROM r WHERE rn <= 50""".stripMargin,

    // q169: association rules over baskets — support / confidence / lift
    // as single divisions of exact integer counts
    "q169_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY pk),
        |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
        |pc AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_both
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_both, ia.n AS n_a, ib.n AS n_b, n_orders,
        |  CAST(n_both AS DOUBLE) / ia.n AS confidence,
        |  CAST(n_both * n_orders AS DOUBLE) / (ia.n * ib.n) AS lift
        |FROM pc
        |JOIN ic ia ON pc.part_a = ia.pk
        |JOIN ic ib ON pc.part_b = ib.pk
        |CROSS JOIN tot""".stripMargin,

    // q170: equi-depth binning — boundaries at the q156 order statistics,
    // bin = 1 + #boundaries strictly below the value (ties fall low)
    "q170_feature_bins" ->
      """WITH p AS (SELECT o_totalprice AS price FROM orders),
        |r AS (
        |  SELECT price, row_number() OVER (ORDER BY price) AS rn,
        |    count(*) OVER () AS n
        |  FROM p),
        |b AS (
        |  SELECT price AS bv
        |  FROM r CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) v(i)
        |  WHERE rn = ceil(CAST(i AS DOUBLE) * n / 10)),
        |binned AS (
        |  SELECT price,
        |    CAST(1 + (SELECT count(*) FROM b WHERE bv < price) AS BIGINT) AS bin
        |  FROM p)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(price) AS min_price, max(price) AS max_price,
        |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM binned GROUP BY bin""".stripMargin,

    // q171: RESTORE undoes the mistaken delete — the final snapshot is
    // exactly the pre-delete table, recomputed by the oracle from source
    "q171_restore" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderstatus IN ('F', 'O')""".stripMargin,

    // q172: median/MAD robust outliers — both medians are lower order
    // statistics (rank ceil(n/2)), so every number is an observed value or
    // an exact count; the 3*mad compare is one IEEE product per row
    "q172_mad_outliers" ->
      """WITH v AS (SELECT event_type AS g, value AS x FROM events),
        |med AS (
        |  SELECT g, x AS med FROM (
        |    SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        |      count(*) OVER (PARTITION BY g) AS n FROM v)
        |  WHERE rn = ceil(n / 2.0)),
        |dev AS (SELECT v.g, v.x, abs(v.x - med.med) AS d FROM v JOIN med USING (g)),
        |mad AS (
        |  SELECT g, d AS mad FROM (
        |    SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
        |      count(*) OVER (PARTITION BY g) AS n FROM dev)
        |  WHERE rn = ceil(n / 2.0))
        |SELECT dev.g, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  max(med.med) AS med, max(mad.mad) AS mad
        |FROM dev JOIN med USING (g) JOIN mad USING (g)
        |GROUP BY 1""".stripMargin,

    // q173: multi-source BFS — the frontier-expansion loop gated against
    // declarative reachability (recursive CTE, min hop per node)
    "q173_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |bfs(id, hop) AS (
        |  SELECT DISTINCT u AS id, 0 AS hop FROM e WHERE u % 500 = 0
        |  UNION
        |  SELECT e.v, bfs.hop + 1 FROM bfs JOIN e ON bfs.id = e.u WHERE bfs.hop < 3)
        |SELECT CAST(hop AS BIGINT) AS hop, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT id, min(hop) AS hop FROM bfs GROUP BY id)
        |GROUP BY 1""".stripMargin,

    // q174: RFM quartile scores via the q170 boundary convention (exact
    // order statistics, score = 1 + #boundaries strictly below; recency
    // inverted so recent = 4)
    "q174_rfm_segments" ->
      """WITH rfm AS (
        |  SELECT o_custkey AS cust,
        |    CAST(date_diff('day', max(o_orderdate),
        |      (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |rb AS (
        |  SELECT CAST(recency AS DOUBLE) AS b FROM (
        |    SELECT recency, row_number() OVER (ORDER BY recency) AS rn,
        |      count(*) OVER () AS n FROM rfm)
        |  CROSS JOIN (VALUES (1),(2),(3)) v(i)
        |  WHERE rn = ceil(CAST(i AS DOUBLE) * n / 4)),
        |fb AS (
        |  SELECT CAST(freq AS DOUBLE) AS b FROM (
        |    SELECT freq, row_number() OVER (ORDER BY freq) AS rn,
        |      count(*) OVER () AS n FROM rfm)
        |  CROSS JOIN (VALUES (1),(2),(3)) v(i)
        |  WHERE rn = ceil(CAST(i AS DOUBLE) * n / 4)),
        |mb AS (
        |  SELECT monetary AS b FROM (
        |    SELECT monetary, row_number() OVER (ORDER BY monetary) AS rn,
        |      count(*) OVER () AS n FROM rfm)
        |  CROSS JOIN (VALUES (1),(2),(3)) v(i)
        |  WHERE rn = ceil(CAST(i AS DOUBLE) * n / 4))
        |SELECT cust, recency, freq, monetary,
        |  CAST(4 - (SELECT count(*) FROM rb WHERE b < recency) AS BIGINT) AS r_score,
        |  CAST(1 + (SELECT count(*) FROM fb WHERE b < freq) AS BIGINT) AS f_score,
        |  CAST(1 + (SELECT count(*) FROM mb WHERE b < monetary) AS BIGINT) AS m_score
        |FROM rfm""".stripMargin,

    // q175: inverted index — postings serialized as a comma-joined string
    // (value-hash-safe), top-5 by (tf desc, doc asc), hapax tail cut at df
    "q175_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, t.term FROM documents,
        |    LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)),
        |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY tf DESC, doc_id)[:5], ',')
        |    AS top_docs
        |FROM tf GROUP BY term HAVING count(*) >= 50""".stripMargin,

    // q176: streaming upsert into the versioned table — the final snapshot
    // must be each user's latest event by (ts, event_id)
    "q176_stream_upsert" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    // q177: CDC apply — the replica rolled forward by the v1→v3 change feed
    // must equal the primary's v3 state, recomputed here from source
    "q177_cdc_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O') AND o_totalprice >= CAST(50000 AS DOUBLE)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'P'""".stripMargin,

    // q178: 2-D skyline via two max-windows (strictly-earlier-days RANGE
    // frame + same-day partition max) — no pairwise dominance join
    "q178_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
        |    o_totalprice AS price,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
        |  FROM orders),
        |w AS (
        |  SELECT o_orderkey, day, price,
        |    max(price) OVER (PARTITION BY day) AS day_max,
        |    max(price) OVER (ORDER BY day_num
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_earlier
        |  FROM o)
        |SELECT o_orderkey, day, price FROM w
        |WHERE price = day_max AND (best_earlier IS NULL OR price > best_earlier)""".stripMargin,

    // q179: per-dimension embedding stats — float→double widening is exact;
    // the sum crosses decimals with the VARCHAR bridge on BOTH casts (FP
    // traps #1/#2, Num scaladoc); the mean is one IEEE division
    "q179_dim_stats" ->
      """WITH d AS (
        |  SELECT CAST(s.i - 1 AS BIGINT) AS dim, CAST(embedding[s.i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i))
        |SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,10)))
        |    AS VARCHAR) AS DOUBLE) AS sum_x,
        |  min(x) AS min_x, max(x) AS max_x,
        |  CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,10)))
        |    AS VARCHAR) AS DOUBLE) / count(*) AS mean_x
        |FROM d GROUP BY dim""".stripMargin,

    // q180: PMI over frequent term pairs — exact-long ratio through one
    // division, ln through the 12-decimal bridge
    "q180_term_pmi" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, t.term FROM documents,
        |    LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)),
        |df AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt
        |  GROUP BY 1 HAVING count(*) >= 50),
        |freq AS (SELECT dt.doc_id, dt.term FROM dt JOIN df USING (term)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |p AS (
        |  SELECT a.term AS term_a, b.term AS term_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM freq a JOIN freq b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING count(*) >= 25)
        |SELECT term_a, term_b, n_ab, da.df AS df_a, db.df AS df_b,
        |  CAST(CAST(CAST(CAST(ln(CAST(n_ab * n_docs AS DOUBLE) / (da.df * db.df))
        |    AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS pmi
        |FROM p
        |JOIN df da ON p.term_a = da.term
        |JOIN df db ON p.term_b = db.term
        |CROSS JOIN nd""".stripMargin,

    // q181: last-touch attribution — two aligned IGNORE NULLS windows pick
    // the ts and channel of the SAME most-recent non-purchase touch
    "q181_attribution" ->
      """WITH w AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tts,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tchannel
        |  FROM events)
        |SELECT event_id AS purchase_id, user_id, ts,
        |  CASE WHEN tts >= ts - INTERVAL 30 MINUTE THEN tchannel END AS channel
        |FROM w WHERE event_type = 'purchase'""".stripMargin,

    // q182: rolling 7-day distinct users — declarative range-join oracle vs
    // the engine's explode-expansion; both count each (window, user) once
    "q182_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM du)
        |SELECT days.d AS window_day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_users
        |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
        |GROUP BY 1""".stripMargin,

    // q183: anti-entropy diff — the oracle recomputes every corruption
    // class straight from the rules the corrupted copy was built with
    "q183_table_diff" ->
      """WITH exp AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderstatus IN ('F', 'O') AND o_totalprice >= CAST(50000 AS DOUBLE)
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
        |SELECT o_orderkey, 'missing_in_right' AS diff_type FROM exp
        |WHERE o_orderkey % 97 = 0
        |UNION ALL
        |SELECT o_orderkey, 'changed' FROM exp
        |WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
        |UNION ALL
        |SELECT o_orderkey + 10000000, 'missing_in_left' FROM exp
        |WHERE o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0""".stripMargin,

    // q184: two-phase distributed ranking must reproduce the single
    // declarative window exactly, ties and all
    "q184_global_rank" ->
      """SELECT o_orderkey AS id, o_totalprice AS price,
        |  CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
        |    AS global_rank
        |FROM orders""".stripMargin,

    // q190: linear multi-touch attribution — credits are IEEE divisions
    // (correctly rounded on both engines), folded per channel in decimal
    // through the VARCHAR bridge (trap #2: double→decimal must round the
    // shortest string on both sides)
    "q190_linear_attrib" ->
      """WITH t AS (
        |  SELECT user_id, ts AS tts, event_type AS channel
        |  FROM events WHERE event_type <> 'purchase'),
        |p AS (
        |  SELECT user_id, event_id AS pid, ts AS pts, value
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.pid, p.value, t.channel
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 30 MINUTE),
        |n AS (SELECT pid, count(*) AS n FROM j GROUP BY 1),
        |c AS (
        |  SELECT j.channel, j.value / n.n AS credit
        |  FROM j JOIN n USING (pid)
        |  UNION ALL
        |  SELECT 'organic', p.value FROM p
        |  WHERE p.pid NOT IN (SELECT pid FROM n))
        |SELECT channel, count(*) AS n_credits,
        |  CAST(CAST(sum(CAST(CAST(credit AS VARCHAR) AS DECIMAL(28,14)))
        |    AS VARCHAR) AS DOUBLE) AS credit_total
        |FROM c GROUP BY 1""".stripMargin,

    // q192: bipartite HITS, 2 unrolled sum-normalized rounds
    "q192_hits" -> hitsOracle(iters = 2),

    // q195: fixed-weight logistic quality classifier — the score CTEs live
    // in [[qualityScoreCtes]], shared verbatim with the q235/q236 evals
    "q195_quality_clf" ->
      s"""WITH $qualityScoreCtes
         |SELECT doc_id, score, zq >= 0 AS keep
         |FROM qscore""".stripMargin,

    // q235: ROC-AUC of the quality score vs the English label — the
    // Mann–Whitney identity on per-score counts: 2·U₁ stays exact BIGINT
    // (strictly-below pairs twice, ties once) until one final division.
    // The oracle may run a plain cumulative window; the operator routes the
    // same algebra through the q203/q204 two-phase engine.
    "q235_roc_auc" ->
      s"""WITH $qualityLabeledCtes,
         |counts AS (
         |  SELECT score AS x, CAST(sum(y) AS BIGINT) AS c1,
         |    CAST(sum(1 - y) AS BIGINT) AS c2
         |  FROM qlab GROUP BY 1),
         |cum AS (
         |  SELECT x, c1, c2,
         |    CAST(sum(c2) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
         |  FROM counts),
         |s AS (
         |  SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
         |    CAST(sum(c2) AS BIGINT) AS n_neg,
         |    CAST(sum(c1 * (2 * cum2 - c2)) AS BIGINT) AS auc_num2
         |  FROM cum)
         |SELECT n_pos, n_neg, auc_num2,
         |  CAST(auc_num2 AS DOUBLE)
         |    / (CAST(2.0 AS DOUBLE) * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc,
         |  CAST(2.0 AS DOUBLE) * (CAST(auc_num2 AS DOUBLE)
         |    / (CAST(2.0 AS DOUBLE) * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
         |    - CAST(1.0 AS DOUBLE) AS gini_rank
         |FROM s""".stripMargin,

    // q239: per-length-band ROC-AUC — q235's exact-BIGINT identity with
    // every window PARTITION BY segment; single-class segments yield NULL
    // auc via the same guard in both engines
    "q239_auc_by_segment" ->
      s"""WITH $qualityScoreCtes,
         |qlab2 AS (
         |  SELECT s.doc_id, s.score,
         |    CASE WHEN d.n_chars < 200 THEN 'short'
         |         WHEN d.n_chars < 400 THEN 'medium'
         |         ELSE 'long' END AS segment,
         |    CASE WHEN d.lang = 'en' THEN CAST(1 AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS y
         |  FROM qscore s JOIN documents d ON s.doc_id = d.doc_id),
         |counts AS (
         |  SELECT segment, score AS x, CAST(sum(y) AS BIGINT) AS c1,
         |    CAST(sum(1 - y) AS BIGINT) AS c2
         |  FROM qlab2 GROUP BY 1, 2),
         |cum AS (
         |  SELECT segment, x, c1, c2,
         |    CAST(sum(c2) OVER (PARTITION BY segment ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
         |  FROM counts),
         |s AS (
         |  SELECT segment, CAST(sum(c1) AS BIGINT) AS n_pos,
         |    CAST(sum(c2) AS BIGINT) AS n_neg,
         |    CAST(sum(c1 * (2 * cum2 - c2)) AS BIGINT) AS auc_num2
         |  FROM cum GROUP BY 1)
         |SELECT segment, n_pos, n_neg, auc_num2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    CAST(auc_num2 AS DOUBLE)
         |      / (CAST(2.0 AS DOUBLE) * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
         |  END AS auc,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    CAST(2.0 AS DOUBLE) * (CAST(auc_num2 AS DOUBLE)
         |      / (CAST(2.0 AS DOUBLE) * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
         |      - CAST(1.0 AS DOUBLE)
         |  END AS gini_rank
         |FROM s""".stripMargin,

    // q256: Mann–Kendall trend test — S an exact integer over the
    // calendar-bounded day-pair join (sign as an explicit CASE over long
    // cents, never a double signum); the tie-corrected variance NUMERATOR
    // stays an exact BIGINT; only /18 and the continuity-corrected z are
    // doubles (fixed trees). DuckDB lateral alias reference computes z once
    "q256_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT CAST(date_diff('day', DATE '1990-01-01', day) AS BIGINT) AS dn, x
        |  FROM daily),
        |s AS (
        |  SELECT CAST(coalesce(sum(
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
        |  FROM d2 a JOIN d2 b ON b.dn > a.dn),
        |ties AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d2 GROUP BY x)),
        |k AS (
        |  SELECT n_days, s_stat,
        |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var_numer
        |  FROM s CROSS JOIN ties)
        |SELECT n_days, s_stat, var_numer,
        |  CASE WHEN s_stat > 0 THEN
        |      CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var_numer AS DOUBLE) / 18.0)
        |    WHEN s_stat < 0 THEN
        |      CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var_numer AS DOUBLE) / 18.0)
        |    ELSE CAST(0 AS DOUBLE) END AS z,
        |  abs(z) > CAST(1.96 AS DOUBLE) AS trend_at_95
        |FROM k""".stripMargin,

    // q257: two-feature OLS by normal equations — nine exact-decimal moment
    // folds (the q143 cast class: 2-decimal money / integer quantities are
    // exact at scale 4 under BOTH engines' double→decimal rules), then
    // Cramer's rule as one fixed double tree spelled term for term like the
    // Scala side
    "q257_ols_two_feature" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(l_quantity AS DECIMAL(19,4))) AS s1_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4))) AS s2_d,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS s11_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS s22_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS s12_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS s1y_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS s2y_d,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy_d
        |  FROM lineitem),
        |v AS (
        |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS n,
        |    CAST(CAST(s1_d AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(s2_d AS VARCHAR) AS DOUBLE) AS s2,
        |    CAST(CAST(sy_d AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(s11_d AS VARCHAR) AS DOUBLE) AS s11,
        |    CAST(CAST(s22_d AS VARCHAR) AS DOUBLE) AS s22,
        |    CAST(CAST(s12_d AS VARCHAR) AS DOUBLE) AS s12,
        |    CAST(CAST(s1y_d AS VARCHAR) AS DOUBLE) AS s1y,
        |    CAST(CAST(s2y_d AS VARCHAR) AS DOUBLE) AS s2y,
        |    CAST(CAST(syy_d AS VARCHAR) AS DOUBLE) AS syy
        |  FROM m),
        |k AS (
        |  SELECT n_rows, n, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM v)
        |SELECT n_rows,
        |  det0 / det AS beta0,
        |  det1 / det AS beta_qty,
        |  det2 / det AS beta_disc,
        |  CAST(1.0 AS DOUBLE)
        |    - (syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y))
        |    / (syy - sy * sy / n) AS r2
        |FROM k""".stripMargin,

    // q258: Kruskal–Wallis — doubled midranks keep tied ranks integer
    // (2R_g = Σ c·(2·below + t + 1)); the cross-group Σ R_g²/n_g squares
    // per group in DOUBLE (2R_g² can pass 2⁶³) then folds 12-decimal
    // quantized; tie term and N³ stay exact BIGINT
    "q258_kruskal_wallis" ->
      s"""WITH $priorityCentsCtes,
        |bv AS (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM bvg GROUP BY 1),
        |cum AS (
        |  SELECT x, t, CAST(coalesce(sum(t) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS below
        |  FROM bv),
        |pg AS (
        |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * (2 * below + t + 1)) AS BIGINT) AS r2x
        |  FROM bvg JOIN cum USING (x) GROUP BY 1),
        |folded AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(CAST(CAST(r2x AS DOUBLE) * CAST(r2x AS DOUBLE)
        |      / (4.0 * CAST(n_g AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,12)))
        |      AS term_sum_d
        |  FROM pg),
        |ties AS (
        |  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie3
        |  FROM bv)
        |SELECT k, n, tie3,
        |  12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |    * CAST(CAST(term_sum_d AS VARCHAR) AS DOUBLE)
        |    - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
        |  h / (1.0 - CAST(tie3 AS DOUBLE)
        |    / CAST(n * n * n - n AS DOUBLE)) AS h_adj,
        |  k - 1 AS df
        |FROM folded CROSS JOIN ties""".stripMargin,

    // q259: one-way ANOVA — cents² sums fold in HUGEINT (DuckDB) /
    // DECIMAL(38,0) (Spark), both exact, both VARCHAR-bridged; each group's
    // SSW term is a fixed double tree quantized to 12 before the exact fold
    "q259_anova_f" ->
      s"""WITH $priorityCentsCtes,
        |pg AS (
        |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * x) AS BIGINT) AS s_g,
        |    sum(CAST(c AS HUGEINT) * x * x) AS ss_g
        |  FROM bvg GROUP BY 1),
        |folded AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS BIGINT) AS s, sum(ss_g) AS ss,
        |    sum(CAST(CAST(CAST(CAST(ss_g AS VARCHAR) AS DOUBLE)
        |      - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,12))) AS ssw_d
        |  FROM pg),
        |k2 AS (
        |  SELECT k, n,
        |    CAST(CAST(ss AS VARCHAR) AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS sst,
        |    CAST(CAST(ssw_d AS VARCHAR) AS DOUBLE) AS ssw
        |  FROM folded)
        |SELECT k, n, sst - ssw AS ssb, ssw,
        |  ((sst - ssw) / CAST(k - 1 AS DOUBLE))
        |    / (ssw / CAST(n - k AS DOUBLE)) AS f_stat,
        |  (sst - ssw) / sst AS eta_sq
        |FROM k2""".stripMargin,

    // q260: Brown–Forsythe — group LOWER medians (rank ⌈n_g/2⌉, the
    // q156/q172 convention) off per-group cumulative counts, deviations
    // exact longs on the counted frame, then the q259 fold verbatim on d
    "q260_brown_forsythe" ->
      s"""WITH $priorityCentsCtes,
        |cum AS (
        |  SELECT grp, x, c, CAST(sum(c) OVER (PARTITION BY grp ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum
        |  FROM bvg),
        |np AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g FROM bvg GROUP BY 1),
        |med AS (
        |  SELECT grp, min(x) AS med
        |  FROM cum JOIN np USING (grp)
        |  WHERE cum >= (n_g + 1) // 2 GROUP BY 1),
        |dev AS (
        |  SELECT grp, c, abs(x - med) AS d
        |  FROM bvg JOIN med USING (grp)),
        |pg AS (
        |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * d) AS BIGINT) AS s_g,
        |    sum(CAST(c AS HUGEINT) * d * d) AS ss_g
        |  FROM dev GROUP BY 1),
        |folded AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS BIGINT) AS s, sum(ss_g) AS ss,
        |    sum(CAST(CAST(CAST(CAST(ss_g AS VARCHAR) AS DOUBLE)
        |      - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,12))) AS ssw_d
        |  FROM pg),
        |k2 AS (
        |  SELECT k, n,
        |    CAST(CAST(ss AS VARCHAR) AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS sst,
        |    CAST(CAST(ssw_d AS VARCHAR) AS DOUBLE) AS ssw
        |  FROM folded)
        |SELECT k, n, sst - ssw AS ssb_dev, ssw AS ssw_dev,
        |  ((sst - ssw) / CAST(k - 1 AS DOUBLE))
        |    / (ssw / CAST(n - k AS DOUBLE)) AS w_stat
        |FROM k2""".stripMargin,

    // q261: residual whiteness — q251's CTEs verbatim; residual quantized
    // to 12 decimals, DW squares are fixed double trees over bridged exact
    // differences folded 12-decimal-quantized; runs counted over explicit
    // CASE signs (quantized-zero residuals drop, the standard convention)
    "q261_residual_diag" ->
      s"""WITH $seasonalDecompCtes,
        |e AS (
        |  SELECT day, CAST(CAST(residual AS VARCHAR) AS DECIMAL(24,12)) AS e
        |  FROM res),
        |lagged AS (
        |  SELECT e, lag(e, 1) OVER (ORDER BY day) AS e_prev FROM e),
        |sq AS (
        |  SELECT
        |    CAST(sum(CAST(CAST(CAST(CAST(e AS VARCHAR) AS DOUBLE)
        |      * CAST(CAST(e AS VARCHAR) AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sum_e2,
        |    CAST(sum(CASE WHEN e_prev IS NOT NULL THEN
        |      CAST(CAST(CAST(CAST(e - e_prev AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(e - e_prev AS VARCHAR) AS DOUBLE) AS VARCHAR)
        |        AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS sum_d2,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM lagged),
        |signs AS (
        |  SELECT day, CASE WHEN e > 0 THEN 1 WHEN e < 0 THEN -1 ELSE 0 END AS s
        |  FROM e),
        |nz AS (SELECT day, s FROM signs WHERE s <> 0),
        |runs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_signed,
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(1 + sum(CASE WHEN s_prev IS NOT NULL AND s <> s_prev
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        |  FROM (SELECT s, lag(s, 1) OVER (ORDER BY day) AS s_prev FROM nz)),
        |r2 AS (SELECT *, n_signed - n_pos AS n_neg FROM runs)
        |SELECT n_days,
        |  CAST(CAST(sum_d2 AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum_e2 AS VARCHAR) AS DOUBLE) AS dw,
        |  n_pos, n_neg, n_runs,
        |  2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
        |    / CAST(n_signed AS DOUBLE) + 1.0 AS mu_runs,
        |  (CAST(n_runs AS DOUBLE) - mu_runs)
        |    / sqrt((mu_runs - 1.0) * (mu_runs - 2.0)
        |      / (CAST(n_signed AS DOUBLE) - 1.0)) AS z_runs
        |FROM sq CROSS JOIN r2""".stripMargin,

    // q262: lead–lag cross-correlation — q210's n-scaling trick on the
    // paired (revenue, order-count) series; numerators/denominators fold
    // in HUGEINT/DECIMAL(38,0), one bridged double division per lag
    "q262_cross_corr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT CAST(date_diff('day', DATE '1990-01-01', day) AS BIGINT) AS dn, x, y
        |  FROM daily),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy
        |  FROM d2),
        |dev AS (
        |  SELECT dn, n * x - sx AS ax, n * y - sy AS ay
        |  FROM d2 CROSS JOIN tot),
        |den AS (
        |  SELECT sum(CAST(ax AS HUGEINT) * ax) AS dax,
        |    sum(CAST(ay AS HUGEINT) * ay) AS day_
        |  FROM dev),
        |lags AS (SELECT CAST(unnest(generate_series(-7, 7)) AS BIGINT) AS "lag"),
        |num AS (
        |  SELECT "lag", CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(a.ay AS HUGEINT) * b.ax) AS num
        |  FROM dev a CROSS JOIN lags JOIN dev b ON b.dn = a.dn + "lag"
        |  GROUP BY 1)
        |SELECT "lag", n_pairs,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / sqrt(CAST(CAST(dax AS VARCHAR) AS DOUBLE)
        |      * CAST(CAST(day_ AS VARCHAR) AS DOUBLE)) AS r
        |FROM num CROSS JOIN den""".stripMargin,

    // q263: decomposition strength — q251's CTEs verbatim; the three
    // series' Σv / Σv² fold 12-decimal-quantized, population variances and
    // the strength clamps spelled as the same fixed trees on both sides
    "q263_decomp_strength" ->
      s"""WITH $seasonalDecompCtes,
        |base AS (
        |  SELECT CAST(CAST(residual AS VARCHAR) AS DECIMAL(24,12)) AS r,
        |    CAST(CAST(CAST(x AS DOUBLE) - seasonal AS VARCHAR)
        |      AS DECIMAL(24,12)) AS tr2,
        |    CAST(CAST(CAST(x AS DOUBLE) - trend AS VARCHAR)
        |      AS DECIMAL(24,12)) AS sr
        |  FROM res),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(r) AS s_r,
        |    sum(CAST(CAST(CAST(CAST(r AS VARCHAR) AS DOUBLE)
        |      * CAST(CAST(r AS VARCHAR) AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(38,12))) AS ss_r,
        |    sum(tr2) AS s_tr,
        |    sum(CAST(CAST(CAST(CAST(tr2 AS VARCHAR) AS DOUBLE)
        |      * CAST(CAST(tr2 AS VARCHAR) AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(38,12))) AS ss_tr,
        |    sum(sr) AS s_sr,
        |    sum(CAST(CAST(CAST(CAST(sr AS VARCHAR) AS DOUBLE)
        |      * CAST(CAST(sr AS VARCHAR) AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(38,12))) AS ss_sr
        |  FROM base),
        |v AS (
        |  SELECT n,
        |    (CAST(CAST(ss_r AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(s_r AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(s_r AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS var_resid,
        |    (CAST(CAST(ss_tr AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(s_tr AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(s_tr AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS var_deseasonalized,
        |    (CAST(CAST(ss_sr AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(s_sr AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(s_sr AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS var_detrended
        |  FROM m)
        |SELECT n AS n_days, var_resid, var_deseasonalized, var_detrended,
        |  greatest(CAST(0.0 AS DOUBLE),
        |    1.0 - var_resid / var_deseasonalized) AS trend_strength,
        |  greatest(CAST(0.0 AS DOUBLE),
        |    1.0 - var_resid / var_detrended) AS seasonal_strength
        |FROM v""".stripMargin,

    // q264: Kendall τ-b — q256's day-pair join with the sign PRODUCT an
    // explicit nested CASE; all counts exact BIGINT, τ one fixed tree
    "q264_kendall_tau" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT CAST(date_diff('day', DATE '1990-01-01', day) AS BIGINT) AS dn, x, y
        |  FROM daily),
        |p AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(coalesce(sum(
        |      (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |      * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)),
        |      0) AS BIGINT) AS s,
        |    CAST(coalesce(sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n1,
        |    CAST(coalesce(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n2
        |  FROM d2 a JOIN d2 b ON b.dn > a.dn)
        |SELECT n0 AS n_pairs, s AS s_stat, n1 AS ties_x, n2 AS ties_y,
        |  CAST(s AS DOUBLE) / sqrt(CAST(n0 - n1 AS DOUBLE)
        |    * CAST(n0 - n2 AS DOUBLE)) AS tau_b
        |FROM p""".stripMargin,

    // q265: Cohen's kappa — κ as ONE division of exact BIGINTs
    // (N·Σdiag − Σ r·g over shared classes) / (N² − Σ r·g); NULL labels an
    // explicit '(null)' class
    "q265_cohens_kappa" ->
      s"""WITH p AS ($langIdSql),
        |p2 AS (
        |  SELECT coalesce(labeled_lang, '(null)') AS t, guessed_lang AS g
        |  FROM p),
        |cells AS (SELECT t, g, CAST(count(*) AS BIGINT) AS n FROM p2 GROUP BY 1, 2),
        |marg AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN t = g THEN n ELSE 0 END) AS BIGINT) AS diag
        |  FROM cells),
        |rt AS (SELECT t, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT g, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
        |pe AS (
        |  SELECT CAST(coalesce(sum(r * c), 0) AS BIGINT) AS pe_num
        |  FROM rt JOIN ct ON rt.t = ct.g)
        |SELECT nn AS n_docs, diag AS n_agree, pe_num,
        |  CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE) AS po,
        |  CAST(pe_num AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS pe,
        |  CAST(nn * diag - pe_num AS DOUBLE)
        |    / CAST(nn * nn - pe_num AS DOUBLE) AS kappa
        |FROM marg CROSS JOIN pe""".stripMargin,

    // q266: seasonal Mann–Kendall — q256's arithmetic per dow series,
    // S and variance numerators summed exact, z off the totals; the q243
    // repeated-total convention for the combined columns
    "q266_seasonal_mk" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |d3 AS (
        |  SELECT CAST(date_diff('day', DATE '1990-01-01', day) AS BIGINT) AS dn,
        |    CAST(date_diff('day', DATE '1990-01-01', day) % 7 AS BIGINT) AS dow,
        |    x
        |  FROM daily),
        |sper AS (
        |  SELECT a.dow, CAST(coalesce(sum(
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END), 0)
        |    AS BIGINT) AS s_dow
        |  FROM d3 a JOIN d3 b ON b.dow = a.dow AND b.dn > a.dn GROUP BY 1),
        |tper AS (
        |  SELECT dow, CAST(sum(t) AS BIGINT) AS n_dow,
        |    CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        |      AS tie_term
        |  FROM (SELECT dow, x, CAST(count(*) AS BIGINT) AS t
        |        FROM d3 GROUP BY 1, 2)
        |  GROUP BY 1),
        |per AS (
        |  SELECT dow, n_dow, s_dow,
        |    n_dow * (n_dow - 1) * (2 * n_dow + 5) - tie_term AS var_numer_dow
        |  FROM sper JOIN tper USING (dow)),
        |tot AS (
        |  SELECT CAST(sum(s_dow) AS BIGINT) AS s_total,
        |    CAST(sum(var_numer_dow) AS BIGINT) AS var_numer_total
        |  FROM per)
        |SELECT dow, n_dow, s_dow, var_numer_dow, s_total, var_numer_total,
        |  CASE WHEN s_total > 0 THEN
        |      CAST(s_total - 1 AS DOUBLE)
        |        / sqrt(CAST(var_numer_total AS DOUBLE) / 18.0)
        |    WHEN s_total < 0 THEN
        |      CAST(s_total + 1 AS DOUBLE)
        |        / sqrt(CAST(var_numer_total AS DOUBLE) / 18.0)
        |    ELSE CAST(0 AS DOUBLE) END AS z,
        |  abs(z) > CAST(1.96 AS DOUBLE) AS trend_at_95
        |FROM per CROSS JOIN tot""".stripMargin,

    // q267: Cook's-distance top-20 — q257's moment/solve CTEs extended
    // with the six adjugate entries; leverage and D are fixed per-row
    // double trees over bridged scalars; deterministic boundary via
    // (cook_d DESC, orderkey, linenumber) LIMIT in both engines
    "q267_ols_influence" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(l_quantity AS DECIMAL(19,4))) AS s1_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4))) AS s2_d,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS s11_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS s22_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS s12_d,
        |    sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS s1y_d,
        |    sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS s2y_d,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy_d
        |  FROM lineitem),
        |v AS (
        |  SELECT n_rows, CAST(n_rows AS DOUBLE) AS n,
        |    CAST(CAST(s1_d AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(s2_d AS VARCHAR) AS DOUBLE) AS s2,
        |    CAST(CAST(sy_d AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(s11_d AS VARCHAR) AS DOUBLE) AS s11,
        |    CAST(CAST(s22_d AS VARCHAR) AS DOUBLE) AS s22,
        |    CAST(CAST(s12_d AS VARCHAR) AS DOUBLE) AS s12,
        |    CAST(CAST(s1y_d AS VARCHAR) AS DOUBLE) AS s1y,
        |    CAST(CAST(s2y_d AS VARCHAR) AS DOUBLE) AS s2y,
        |    CAST(CAST(syy_d AS VARCHAR) AS DOUBLE) AS syy
        |  FROM m),
        |k AS (
        |  SELECT *,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM v),
        |a AS (
        |  SELECT n_rows,
        |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2,
        |    syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y) AS sse,
        |    s11 * s22 - s12 * s12 AS a00,
        |    -(s1 * s22 - s12 * s2) AS a01,
        |    s1 * s12 - s11 * s2 AS a02,
        |    n * s22 - s2 * s2 AS a11,
        |    -(n * s12 - s1 * s2) AS a12,
        |    n * s11 - s1 * s1 AS a22,
        |    det
        |  FROM k)
        |SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice,
        |  (a00 + a11 * l_quantity * l_quantity + a22 * l_discount * l_discount
        |    + 2.0 * a01 * l_quantity + 2.0 * a02 * l_discount
        |    + 2.0 * a12 * l_quantity * l_discount) / det AS leverage,
        |  l_extendedprice - (b0 + b1 * l_quantity + b2 * l_discount) AS resid,
        |  (l_extendedprice - (b0 + b1 * l_quantity + b2 * l_discount))
        |    * (l_extendedprice - (b0 + b1 * l_quantity + b2 * l_discount))
        |    / (3.0 * (sse / (CAST(n_rows AS DOUBLE) - 3.0)))
        |    * (((a00 + a11 * l_quantity * l_quantity + a22 * l_discount * l_discount
        |      + 2.0 * a01 * l_quantity + 2.0 * a02 * l_discount
        |      + 2.0 * a12 * l_quantity * l_discount) / det)
        |    / ((1.0 - ((a00 + a11 * l_quantity * l_quantity + a22 * l_discount * l_discount
        |      + 2.0 * a01 * l_quantity + 2.0 * a02 * l_discount
        |      + 2.0 * a12 * l_quantity * l_discount) / det))
        |      * (1.0 - ((a00 + a11 * l_quantity * l_quantity + a22 * l_discount * l_discount
        |      + 2.0 * a01 * l_quantity + 2.0 * a02 * l_discount
        |      + 2.0 * a12 * l_quantity * l_discount) / det)))) AS cook_d
        |FROM lineitem CROSS JOIN a
        |ORDER BY cook_d DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    // q269: simplified silhouette — the q77 chain + top-2 cosines; s is a
    // fixed tree over the two exact-integer-dot cosines, means fold
    // 12-decimal-quantized
    "q269_silhouette" ->
      s"""WITH $oneStepTop2Ctes,
        |sil AS (
        |  SELECT cell,
        |    CASE WHEN greatest(1.0 - cos1, 1.0 - cos2) > 0
        |      THEN ((1.0 - cos2) - (1.0 - cos1))
        |        / greatest(1.0 - cos1, 1.0 - cos2)
        |      ELSE CAST(0.0 AS DOUBLE) END AS s
        |  FROM t2),
        |pc AS (
        |  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
        |    CAST(sum(CAST(CAST(s AS VARCHAR) AS DECIMAL(28,12)))
        |      AS DECIMAL(38,12)) AS ssum,
        |    min(s) AS min_sil, max(s) AS max_sil
        |  FROM sil GROUP BY 1),
        |ov AS (
        |  SELECT CAST(sum(ssum) AS DECIMAL(38,12)) AS tsum,
        |    CAST(sum(n_vecs) AS BIGINT) AS tn
        |  FROM pc)
        |SELECT cell, n_vecs,
        |  CAST(CAST(ssum AS VARCHAR) AS DOUBLE) / CAST(n_vecs AS DOUBLE)
        |    AS mean_sil,
        |  min_sil, max_sil,
        |  CAST(CAST(tsum AS VARCHAR) AS DOUBLE) / CAST(tn AS DOUBLE)
        |    AS overall_mean_sil
        |FROM pc CROSS JOIN ov""".stripMargin,

    // q270: Davies–Bouldin — same chain; scatters are quantized-fold means
    // of (1 − cos1), separations are centroid-pair cosines on the k²-row
    // frame, the worst ratio per cluster breaks ties by partner id
    "q270_davies_bouldin" ->
      s"""WITH $oneStepTop2Ctes,
        |sc AS (
        |  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
        |    CAST(CAST(CAST(sum(CAST(CAST(1.0 - cos1 AS VARCHAR)
        |      AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS s_i
        |  FROM t2 GROUP BY 1),
        |m AS (
        |  SELECT i.cent_id AS cell, j.cent_id AS partner,
        |    1.0 - ${cosine("i.cvec", "j.cvec", "i.cnorm2", "j.cnorm2")} AS m_ij
        |  FROM c1n i CROSS JOIN c1n j
        |  WHERE i.cent_id <> j.cent_id),
        |ratios AS (
        |  SELECT m.cell, m.partner,
        |    CASE WHEN m.m_ij > 0
        |      THEN (a.s_i + b.s_i) / m.m_ij END AS ratio
        |  FROM m JOIN sc a ON m.cell = a.cell
        |         JOIN sc b ON m.partner = b.cell),
        |worst AS (
        |  SELECT cell, partner AS worst_partner, ratio
        |  FROM (SELECT *, row_number() OVER (PARTITION BY cell
        |          ORDER BY ratio DESC NULLS LAST, partner ASC) AS rn
        |        FROM ratios)
        |  WHERE rn = 1),
        |db AS (
        |  SELECT CAST(CAST(CAST(sum(CAST(CAST(ratio AS VARCHAR)
        |    AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS db_index
        |  FROM worst)
        |SELECT w2.cell, sc.n_vecs, sc.s_i, w2.worst_partner, w2.ratio,
        |  db.db_index
        |FROM worst w2 JOIN sc ON w2.cell = sc.cell CROSS JOIN db""".stripMargin,

    // q271: Jarque–Bera on q251's residual — dollar-scaled raw power sums
    // fold 6-decimal-quantized (lossless at these magnitudes, and x⁴ sums
    // stay inside DECIMAL(38,6)); one-pass central-moment expansion
    "q271_jarque_bera" ->
      s"""WITH $seasonalDecompCtes,
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(CAST(residual / 100.0 AS VARCHAR) AS DECIMAL(38,6))) AS s1,
        |    sum(CAST(CAST((residual / 100.0) * (residual / 100.0) AS VARCHAR)
        |      AS DECIMAL(38,6))) AS s2,
        |    sum(CAST(CAST((residual / 100.0) * (residual / 100.0)
        |      * (residual / 100.0) AS VARCHAR) AS DECIMAL(38,6))) AS s3,
        |    sum(CAST(CAST((residual / 100.0) * (residual / 100.0)
        |      * (residual / 100.0) * (residual / 100.0) AS VARCHAR)
        |      AS DECIMAL(38,6))) AS s4
        |  FROM res),
        |v2 AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS q1m,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS q2m,
        |    CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS q3m,
        |    CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS q4m
        |  FROM sums),
        |cm2 AS (
        |  SELECT n, nd,
        |    q2m - q1m * q1m AS m2,
        |    q3m - 3.0 * q1m * q2m + 2.0 * q1m * q1m * q1m AS m3,
        |    q4m - 4.0 * q1m * q3m + 6.0 * q1m * q1m * q2m
        |      - 3.0 * q1m * q1m * q1m * q1m AS m4
        |  FROM v2),
        |k2 AS (
        |  SELECT n, nd, m2,
        |    m3 / sqrt(m2 * m2 * m2) AS skew,
        |    m4 / (m2 * m2) AS kurt
        |  FROM cm2)
        |SELECT n AS n_days, m2, skew AS skewness, kurt AS kurtosis,
        |  nd / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        |    AS jb_stat,
        |  nd / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        |    > CAST(5.991 AS DOUBLE) AS reject_normal_05
        |FROM k2""".stripMargin,

    // q272: Welch's t — exact cents moments per sample in ONE aggregate,
    // variance/t/df fixed trees, the same two samples as q203/q204
    "q272_welch_t" ->
      """WITH g AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is1
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |mraw AS (
        |  SELECT CAST(sum(is1) AS BIGINT) AS n1,
        |    CAST(sum(1 - is1) AS BIGINT) AS n2,
        |    CAST(sum(is1 * x) AS BIGINT) AS sx1,
        |    CAST(sum((1 - is1) * x) AS BIGINT) AS sx2,
        |    sum(CAST(is1 AS HUGEINT) * x * x) AS ss1,
        |    sum(CAST(1 - is1 AS HUGEINT) * x * x) AS ss2
        |  FROM g),
        |v AS (
        |  SELECT n1, n2,
        |    CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    (CAST(CAST(ss1 AS VARCHAR) AS DOUBLE)
        |      - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |    (CAST(CAST(ss2 AS VARCHAR) AS DOUBLE)
        |      - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM mraw),
        |k AS (
        |  SELECT n1, n2, m1, m2, v1, v2,
        |    v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM v)
        |SELECT n1, n2, m1 AS mean1_cents, m2 AS mean2_cents,
        |  (m1 - m2) / sqrt(se2) AS t_stat,
        |  se2 * se2 / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) - 1.0)
        |    + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) - 1.0)) AS df_welch,
        |  abs((m1 - m2) / sqrt(se2)) > CAST(1.96 AS DOUBLE)
        |    AS reject_05_normal_approx
        |FROM k""".stripMargin,

    // q273: Heaps' law — prefix buckets by exact integer DIV over the
    // broadcast max id; cumulative tokens/vocab over the 32-row frame;
    // the q187 log-log OLS recipe (ln bridged at 12, folds at (28,14))
    "q273_heaps_fit" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |mx AS (SELECT max(doc_id) AS mx FROM docs),
        |b AS (
        |  SELECT doc_id, toks, doc_id * 32 // (mx + 1) AS bucket
        |  FROM docs CROSS JOIN mx),
        |tc AS (
        |  SELECT bucket, CAST(sum(len(toks)) AS BIGINT) AS btok
        |  FROM b GROUP BY 1),
        |tf AS (
        |  SELECT term, CAST(min(bucket) AS BIGINT) AS fb
        |  FROM (SELECT bucket, unnest(toks) AS term FROM b) GROUP BY 1),
        |vc AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS nnew
        |       FROM tf GROUP BY 1),
        |joined AS (
        |  SELECT tc.bucket, tc.btok, coalesce(vc.nnew, 0) AS nnew
        |  FROM tc LEFT JOIN vc ON tc.bucket = vc.bucket),
        |cums AS (
        |  SELECT bucket,
        |    CAST(sum(btok) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens,
        |    CAST(sum(nnew) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_vocab
        |  FROM joined),
        |pts AS (
        |  SELECT bucket, cum_tokens, cum_vocab,
        |    CAST(CAST(CAST(CAST(ln(CAST(cum_tokens AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS x,
        |    CAST(CAST(CAST(CAST(ln(CAST(cum_vocab AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS y
        |  FROM cums
        |  WHERE cum_tokens > 0 AND cum_vocab > 0),
        |fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM pts),
        |f2 AS (
        |  SELECT n_points,
        |    (CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx) AS beta,
        |    (sy - (CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx) * sx)
        |      / CAST(n_points AS DOUBLE) AS ln_k
        |  FROM fit)
        |SELECT bucket, cum_tokens, cum_vocab, n_points, beta, ln_k
        |FROM pts CROSS JOIN f2""".stripMargin,

    // q274: McNemar — discordant counts between the two English detectors,
    // continuity-corrected χ² one fixed tree over exact BIGINTs, NULL when
    // no discordant pairs exist
    "q274_mcnemar" ->
      s"""WITH p AS ($langIdSql),
        |$qualityScoreCtes,
        |j AS (
        |  SELECT d.doc_id,
        |    CASE WHEN p.guessed_lang = 'en' THEN 1 ELSE 0 END AS pred_a,
        |    CASE WHEN s.score >= 0.5 THEN 1 ELSE 0 END AS pred_b,
        |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents d
        |  JOIN p ON d.doc_id = p.doc_id
        |  JOIN qscore s ON d.doc_id = s.doc_id),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN pred_a = y AND pred_b = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both_correct,
        |    CAST(sum(CASE WHEN pred_a = y AND pred_b <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_only_a,
        |    CAST(sum(CASE WHEN pred_a <> y AND pred_b = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_only_b,
        |    CAST(sum(CASE WHEN pred_a <> y AND pred_b <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both_wrong
        |  FROM j)
        |SELECT n_docs, n_both_correct, n_only_a, n_only_b, n_both_wrong,
        |  CASE WHEN n_only_a + n_only_b > 0 THEN
        |    CAST((abs(n_only_a - n_only_b) - 1) * (abs(n_only_a - n_only_b) - 1)
        |      AS DOUBLE) / CAST(n_only_a + n_only_b AS DOUBLE)
        |  END AS mcnemar_chi2,
        |  CASE WHEN n_only_a + n_only_b > 0
        |    THEN mcnemar_chi2 > CAST(3.841 AS DOUBLE)
        |    ELSE false END AS reject_05
        |FROM c""".stripMargin,

    // q275: decile lift — per-score counts cumulated over the NEGATED
    // score, each tie block dealt to its first row's floor-distribution
    // decile, cumulative lift ONE division of exact products
    "q275_decile_lift" ->
      s"""WITH $qualityLabeledCtes,
        |counts AS (
        |  SELECT -score AS x, CAST(sum(y) AS BIGINT) AS c1,
        |    CAST(sum(1 - y) AS BIGINT) AS c2
        |  FROM qlab GROUP BY 1),
        |cum AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER w AS BIGINT) AS cum2
        |  FROM counts
        |  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(max(cum1) AS BIGINT) AS pos_total,
        |    CAST(max(cum1 + cum2) AS BIGINT) AS n_total
        |  FROM cum),
        |bd AS (
        |  SELECT (cum1 + cum2 - c1 - c2) * 10 // n_total AS decile,
        |    CAST(sum(c1 + c2) AS BIGINT) AS n_rows,
        |    CAST(sum(c1) AS BIGINT) AS n_pos,
        |    CAST(max(pos_total) AS BIGINT) AS pos_total,
        |    CAST(max(n_total) AS BIGINT) AS n_total
        |  FROM cum CROSS JOIN tot GROUP BY 1),
        |k AS (
        |  SELECT decile, n_rows, n_pos,
        |    CAST(sum(n_rows) OVER w2 AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER w2 AS BIGINT) AS cum_pos,
        |    pos_total, n_total
        |  FROM bd
        |  WINDOW w2 AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_rows, n_pos, cum_n, cum_pos,
        |  CAST(cum_pos * n_total AS DOUBLE)
        |    / CAST(cum_n * pos_total AS DOUBLE) AS cum_lift
        |FROM k""".stripMargin,

    // q276: classifier KS — q203's exact-integer maximization over the
    // per-score cumulative counts; threshold = min score among argmax ties
    "q276_classifier_ks" ->
      s"""WITH $qualityLabeledCtes,
        |counts AS (
        |  SELECT score AS x, CAST(sum(y) AS BIGINT) AS c1,
        |    CAST(sum(1 - y) AS BIGINT) AS c2
        |  FROM qlab GROUP BY 1),
        |cum AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER w AS BIGINT) AS cum2
        |  FROM counts
        |  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(max(cum1) AS BIGINT) AS n1,
        |    CAST(max(cum2) AS BIGINT) AS n2
        |  FROM cum),
        |dd AS (
        |  SELECT x, n1, n2,
        |    CAST(abs(cum1 * n2 - cum2 * n1) AS BIGINT) AS dn
        |  FROM cum CROSS JOIN tot),
        |mx AS (SELECT n1, n2, CAST(max(dn) AS BIGINT) AS d_num
        |       FROM dd GROUP BY 1, 2),
        |arg AS (
        |  SELECT dd.n1, dd.n2, mx.d_num, min(dd.x) AS threshold
        |  FROM dd JOIN mx ON dd.n1 = mx.n1 AND dd.n2 = mx.n2 AND dd.dn = mx.d_num
        |  GROUP BY 1, 2, 3)
        |SELECT n1 AS n_pos, n2 AS n_neg, d_num,
        |  CAST(d_num AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat,
        |  threshold
        |FROM arg""".stripMargin,

    // q277: per-node clustering coefficient — q166's edge/degree CTEs, the
    // naive a<b<c triple (orientation-invariant corners), LEFT join keeps
    // triangle-free nodes, mean folds 12-decimal-quantized
    "q277_clustering_coef" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |d AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
        |corners AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |tc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
        |       FROM corners GROUP BY 1),
        |nodes AS (
        |  SELECT d.id, d.deg, CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri
        |  FROM d LEFT JOIN tc ON d.id = tc.id
        |  WHERE d.deg >= 2),
        |cc AS (
        |  SELECT id, deg, n_tri,
        |    CAST(2 * n_tri AS DOUBLE)
        |      / CAST(deg * (deg - 1) AS DOUBLE) AS local_cc
        |  FROM nodes),
        |av AS (
        |  SELECT CAST(CAST(CAST(sum(CAST(CAST(local_cc AS VARCHAR)
        |    AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_cc
        |  FROM cc)
        |SELECT id, deg, n_tri, local_cc, avg_cc
        |FROM cc CROSS JOIN av""".stripMargin,

    // q278: cross-source contamination — q232's verified-pair CTEs grouped
    // by unordered SOURCE pair, rate = pairs / exact capacity (within:
    // n(n−1) DIV 2; cross: n_a·n_b)
    "q278_contamination" ->
      s"""WITH $minhashSigs,
        |$bandsCandCtes,
        |docs3 AS (
        |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS grams FROM documents),
        |pairs AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN docs3 x ON c.doc_a = x.doc_id
        |  JOIN docs3 y ON c.doc_b = y.doc_id
        |  WHERE x.lang = y.lang AND abs(x.n_chars - y.n_chars) <= 20
        |    AND CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
        |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) >= 0.5),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |        FROM documents GROUP BY 1),
        |g AS (
        |  SELECT least(da.source, db.source) AS source_lo,
        |    greatest(da.source, db.source) AS source_hi,
        |    CAST(count(*) AS BIGINT) AS n_dup_pairs
        |  FROM pairs p
        |  JOIN documents da ON p.doc_a = da.doc_id
        |  JOIN documents db ON p.doc_b = db.doc_id
        |  GROUP BY 1, 2)
        |SELECT g.source_lo, g.source_hi, g.n_dup_pairs,
        |  a.n AS n_docs_lo, b.n AS n_docs_hi,
        |  CAST(g.n_dup_pairs AS DOUBLE) / CAST(
        |    CASE WHEN g.source_lo = g.source_hi
        |      THEN a.n * (a.n - 1) // 2
        |      ELSE a.n * b.n END AS DOUBLE) AS dup_rate,
        |  g.source_lo <> g.source_hi AS is_cross_source
        |FROM g JOIN cnt a ON g.source_lo = a.source
        |       JOIN cnt b ON g.source_hi = b.source""".stripMargin,

    // q279: dup-cluster size histogram — q55's recursive components,
    // one exact share division per size row
    "q279_cluster_sizes" ->
      s"""WITH RECURSIVE $dupCcCtes,
        |labels AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
        |sizes AS (
        |  SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM labels GROUP BY 1),
        |hist AS (
        |  SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |    cluster_size * CAST(count(*) AS BIGINT) AS n_docs
        |  FROM sizes GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM hist)
        |SELECT cluster_size, n_clusters, n_docs,
        |  CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS doc_share
        |FROM hist CROSS JOIN tot""".stripMargin,

    // q280: PACF 1–3 — Durbin–Levinson unrolled as fixed trees over q210's
    // bridged ACF values; three UNION ALL rows mirror the Spark explode
    "q280_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
        |i AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(n * x - s AS HUGEINT) AS dev
        |  FROM daily, t),
        |den AS (SELECT sum(dev * dev) AS den FROM i),
        |l AS (SELECT CAST(u AS BIGINT) AS lag FROM (SELECT unnest(generate_series(1, 7)) AS u)),
        |p AS (
        |  SELECT lag, sum(a.dev * b.dev) AS num
        |  FROM l CROSS JOIN i a JOIN i b ON b.i = a.i + l.lag
        |  GROUP BY 1),
        |acfres AS (
        |  SELECT lag,
        |    CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS acf
        |  FROM p, den),
        |rv AS (
        |  SELECT min(CASE WHEN lag = 1 THEN acf END) AS r1,
        |    min(CASE WHEN lag = 2 THEN acf END) AS r2,
        |    min(CASE WHEN lag = 3 THEN acf END) AS r3
        |  FROM acfres),
        |ph AS (
        |  SELECT r1, r2, r3,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
        |  FROM rv),
        |ph2 AS (SELECT *, r1 - p2 * r1 AS phi21 FROM ph),
        |ph3 AS (
        |  SELECT *,
        |    (r3 - phi21 * r2 - p2 * r1)
        |      / (1.0 - phi21 * r1 - p2 * r2) AS p3
        |  FROM ph2)
        |SELECT CAST(1 AS BIGINT) AS "lag", r1 AS acf, r1 AS pacf FROM ph3
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), r2, p2 FROM ph3
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), r3, p3 FROM ph3""".stripMargin,

    // q281: Church–Gale overdispersion — VMR = (N·S − T²)/(N·T), exact
    // BIGINT numerator/denominator, ONE double division; top-50 with a
    // term tiebreak in both engines
    "q281_term_burstiness" ->
      """WITH tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |pt AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(tf) AS BIGINT) AS t_total,
        |    CAST(sum(tf * tf) AS BIGINT) AS s2
        |  FROM tf GROUP BY 1)
        |SELECT term, df, t_total, n_docs,
        |  CAST(n_docs * s2 - t_total * t_total AS DOUBLE)
        |    / CAST(n_docs * t_total AS DOUBLE) AS vmr
        |FROM pt CROSS JOIN n
        |WHERE df >= 5
        |ORDER BY vmr DESC, term
        |LIMIT 50""".stripMargin,

    // q282: information gain — every probability a ratio of exact counts,
    // every ln through the 12-decimal bridge, cell terms quantized before
    // the exact fold; H(y) repeated on both feature rows
    "q282_info_gain" ->
      """WITH base AS (
        |  SELECT CASE WHEN n_chars < 200 THEN 'short'
        |    WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS band,
        |    source,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |u AS (
        |  SELECT 'length_band' AS feature, band AS v, y FROM base
        |  UNION ALL SELECT 'source', source, y FROM base),
        |cells AS (
        |  SELECT feature, v, y, CAST(count(*) AS BIGINT) AS c_vy
        |  FROM u GROUP BY 1, 2, 3),
        |vt AS (SELECT feature, v, CAST(sum(c_vy) AS BIGINT) AS c_v
        |       FROM cells GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |hy AS (
        |  SELECT -CAST(CAST(sum(CAST(CAST(
        |      (CAST(c_y AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST(CAST(CAST(CAST(ln(CAST(c_y AS DOUBLE) / CAST(n AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS h_y
        |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS c_y FROM base GROUP BY 1)
        |  CROSS JOIN nn),
        |cond AS (
        |  SELECT feature,
        |    -CAST(CAST(sum(CAST(CAST(
        |      (CAST(c_vy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST(CAST(CAST(CAST(ln(CAST(c_vy AS DOUBLE) / CAST(c_v AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS h_y_given
        |  FROM cells JOIN vt USING (feature, v) CROSS JOIN nn
        |  GROUP BY 1)
        |SELECT feature, h_y, h_y_given, h_y - h_y_given AS info_gain
        |FROM cond CROSS JOIN hy""".stripMargin,

    // q283: forecaster head-to-head — q223's EWMA error chain joined on
    // the same days with an AR(1) arm (φ = q210's bridged r₁); monthly
    // MAEs from quantized folds, the winner compared on the EXACT decimal
    // sums, never the divided doubles
    "q283_forecast_compare" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |o AS (SELECT CAST(u AS BIGINT) AS j FROM (SELECT unnest(generate_series(0, 39)) AS u)),
        |c AS (
        |  SELECT i.i + o.j AS i,
        |    CAST(CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12)) AS termq,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS wq
        |  FROM i CROSS JOIN o),
        |s AS (
        |  SELECT i, CAST(CAST(sum(termq) AS VARCHAR) AS DOUBLE) AS ewma_cents,
        |    CAST(CAST(sum(wq) AS VARCHAR) AS DOUBLE) AS w_mass
        |  FROM c GROUP BY 1),
        |e0 AS (
        |  SELECT day, x AS total_cents, ewma_cents / w_mass AS ewma_norm
        |  FROM i JOIN s USING (i)),
        |f AS (
        |  SELECT day, total_cents, lag(ewma_norm) OVER (ORDER BY day) AS forecast
        |  FROM e0),
        |sc AS (
        |  SELECT day, CAST(total_cents AS DOUBLE) - forecast AS e
        |  FROM f WHERE forecast IS NOT NULL),
        |t2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM daily),
        |i2 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(n * x - sx AS HUGEINT) AS dev
        |  FROM daily, t2),
        |den2 AS (SELECT sum(dev * dev) AS den FROM i2),
        |num2 AS (SELECT sum(a.dev * b.dev) AS num FROM i2 a JOIN i2 b ON b.i = a.i + 1),
        |ph AS (
        |  SELECT CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS phi
        |  FROM num2, den2),
        |arr AS (SELECT day, x, lag(x) OVER (ORDER BY day) AS x_prev FROM daily),
        |ar AS (
        |  SELECT day,
        |    abs(CAST(x AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      + phi * (CAST(x_prev AS DOUBLE)
        |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) AS ae_ar
        |  FROM arr CROSS JOIN ph CROSS JOIN t2
        |  WHERE x_prev IS NOT NULL),
        |j AS (
        |  SELECT sc.day, abs(sc.e) AS ae_ewma, ar.ae_ar
        |  FROM sc JOIN ar USING (day)),
        |mth AS (
        |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(CAST(ae_ewma AS VARCHAR) AS DECIMAL(28,12))) AS se,
        |    sum(CAST(CAST(ae_ar AS VARCHAR) AS DECIMAL(28,12))) AS sa
        |  FROM j GROUP BY 1)
        |SELECT month, n_days,
        |  CAST(CAST(se AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE) AS mae_ewma_cents,
        |  CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE) AS mae_ar1_cents,
        |  sa < se AS ar1_wins
        |FROM mth""".stripMargin,

    // q284: Spearman ρ — ties carried as the INTEGER doubled average rank
    // r2 = 2m + t + 1, so all five moments are exact BIGINTs and ρ is one
    // fixed double tree identical in both engines
    "q284_spearman" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |gx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1),
        |rx AS (
        |  SELECT v, CAST(2 * COALESCE(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    + t + 1 AS BIGINT) AS u
        |  FROM gx),
        |gc AS (SELECT c AS v, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1),
        |rc AS (
        |  SELECT v, CAST(2 * COALESCE(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    + t + 1 AS BIGINT) AS w
        |  FROM gc),
        |j AS (
        |  SELECT u, w FROM daily
        |  JOIN rx ON daily.x = rx.v
        |  JOIN rc ON daily.c = rc.v),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(w) AS BIGINT) AS sv,
        |    CAST(sum(u * u) AS BIGINT) AS suu, CAST(sum(w * w) AS BIGINT) AS svv,
        |    CAST(sum(u * w) AS BIGINT) AS suv
        |  FROM j)
        |SELECT n AS n_days, suv,
        |  CAST(n * suv - su * sv AS DOUBLE)
        |    / (sqrt(CAST(n * suu - su * su AS DOUBLE))
        |       * sqrt(CAST(n * svv - sv * sv AS DOUBLE))) AS rho
        |FROM s""".stripMargin,

    // q285: Theil's U₂ — both q283 arms vs persistence; every bridged
    // square is a relative error in [0,~1] (magnitude-safe at any SF)
    "q285_theil_u" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |o AS (SELECT CAST(u AS BIGINT) AS j FROM (SELECT unnest(generate_series(0, 39)) AS u)),
        |c AS (
        |  SELECT i.i + o.j AS i,
        |    CAST(CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12)) AS termq,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS wq
        |  FROM i CROSS JOIN o),
        |s AS (
        |  SELECT i, CAST(CAST(sum(termq) AS VARCHAR) AS DOUBLE) AS ewma_cents,
        |    CAST(CAST(sum(wq) AS VARCHAR) AS DOUBLE) AS w_mass
        |  FROM c GROUP BY 1),
        |e0 AS (
        |  SELECT day, x, ewma_cents / w_mass AS ewma_norm
        |  FROM i JOIN s USING (i)),
        |f AS (
        |  SELECT day, lag(ewma_norm) OVER (ORDER BY day) AS f_ewma
        |  FROM e0),
        |t2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM daily),
        |i2 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(n * x - sx AS HUGEINT) AS dev
        |  FROM daily, t2),
        |den2 AS (SELECT sum(dev * dev) AS den FROM i2),
        |num2 AS (SELECT sum(a.dev * b.dev) AS num FROM i2 a JOIN i2 b ON b.i = a.i + 1),
        |ph AS (
        |  SELECT CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS phi
        |  FROM num2, den2),
        |arr AS (SELECT day, x, lag(x) OVER (ORDER BY day) AS x_prev FROM daily),
        |b AS (
        |  SELECT arr.day, arr.x, arr.x_prev,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      + phi * (CAST(x_prev AS DOUBLE)
        |        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS f_ar,
        |    f.f_ewma
        |  FROM arr CROSS JOIN ph CROSS JOIN t2
        |  JOIN f ON f.day = arr.day
        |  WHERE arr.x_prev IS NOT NULL AND f.f_ewma IS NOT NULL),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(CAST(
        |      ((f_ewma - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      * ((f_ewma - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12))) AS sm_e,
        |    sum(CAST(CAST(
        |      ((f_ar - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      * ((f_ar - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12))) AS sm_a,
        |    sum(CAST(CAST(
        |      ((CAST(x_prev AS DOUBLE) - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      * ((CAST(x_prev AS DOUBLE) - CAST(x AS DOUBLE)) / CAST(x_prev AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12))) AS sm_n
        |  FROM b)
        |SELECT n_days,
        |  sqrt(CAST(CAST(sm_e AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sm_n AS VARCHAR) AS DOUBLE)) AS u2_ewma,
        |  sqrt(CAST(CAST(sm_a AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sm_n AS VARCHAR) AS DOUBLE)) AS u2_ar1
        |FROM agg""".stripMargin,

    // q286: path predictability — q142's transition cells through the q282
    // entropy bridges; H(next), H(next|cur) and their mutual-information gap
    "q286_path_entropy" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |cells AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c_ft
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(sum(c_ft) AS BIGINT) AS c_f
        |       FROM cells GROUP BY 1),
        |tt AS (SELECT to_type, CAST(sum(c_ft) AS BIGINT) AS c_t
        |       FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(c_ft) AS BIGINT) AS n FROM cells),
        |hc AS (
        |  SELECT -CAST(CAST(sum(CAST(CAST(
        |      (CAST(c_ft AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST(CAST(CAST(CAST(ln(CAST(c_ft AS DOUBLE) / CAST(c_f AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS h_next_given_cur
        |  FROM cells JOIN ft USING (from_type) CROSS JOIN nn),
        |hm AS (
        |  SELECT max(n) AS n_transitions,
        |    -CAST(CAST(sum(CAST(CAST(
        |      (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST(CAST(CAST(CAST(ln(CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS h_next
        |  FROM tt CROSS JOIN nn)
        |SELECT n_transitions, h_next, h_next_given_cur,
        |  h_next - h_next_given_cur AS mutual_info
        |FROM hm CROSS JOIN hc""".stripMargin,

    // q287: point-biserial r — five exact moments, products in HUGEINT /
    // DECIMAL(38,0), one VARCHAR-bridged division
    "q287_point_biserial" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q
        |  FROM documents)
        |SELECT n, n1, n - n1 AS n0,
        |  CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_en_chars,
        |  CAST(sx - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE) AS mean_other_chars,
        |  CAST(CAST(CAST(n AS HUGEINT) * s1 - CAST(n1 AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
        |    / (sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE))
        |       * sqrt(CAST(CAST(CAST(n AS HUGEINT) * q - CAST(sx AS HUGEINT) * sx
        |           AS VARCHAR) AS DOUBLE))) AS r_pb
        |FROM s""".stripMargin,

    // q288: Cliff's delta — GT/TIE/LT exact BIGINTs off q204's cumulative
    // frame; delta is ONE double division
    "q288_cliffs_delta" ->
      """WITH v AS (
        |  SELECT o_totalprice AS x,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |c AS (
        |  SELECT x, CAST(sum(g) AS BIGINT) AS c1,
        |    CAST(sum(1 - g) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |cc AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM c),
        |s AS (
        |  SELECT max(cum1) AS n1, max(cum2) AS n2,
        |    CAST(sum(c1 * (cum2 - c2)) AS BIGINT) AS gt,
        |    CAST(sum(c1 * c2) AS BIGINT) AS ties
        |  FROM cc)
        |SELECT n1, n2, gt, ties, n1 * n2 - gt - ties AS lt,
        |  CAST(gt - (n1 * n2 - gt - ties) AS DOUBLE)
        |    / CAST(n1 * n2 AS DOUBLE) AS delta
        |FROM s""".stripMargin,

    // q289: Hosmer–Lemeshow — q236's bins, E1 from the quantized score
    // fold; per-bin terms quantized before the ≤10-term exact fold;
    // zero-expectation bins excluded with the used count reported
    "q289_hosmer_lemeshow" ->
      s"""WITH $qualityLabeledCtes,
         |b AS (
         |  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin, score, y
         |  FROM qlab),
         |bins AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS o1,
         |    CAST(CAST(sum(CAST(CAST(score AS VARCHAR) AS DECIMAL(28,12)))
         |      AS VARCHAR) AS DOUBLE) AS e1
         |  FROM b GROUP BY 1),
         |t AS (
         |  SELECT bin, n, o1, e1,
         |    CAST(n AS DOUBLE) - e1 AS e0,
         |    CAST(n - o1 AS DOUBLE) AS o0
         |  FROM bins)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(CASE WHEN e1 > 0 AND e0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bins_used,
         |  CAST(CAST(sum(CASE WHEN e1 > 0 AND e0 > 0 THEN
         |      CAST(CAST(
         |        (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / e1
         |        + (o0 - e0) * (o0 - e0) / e0
         |      AS VARCHAR) AS DECIMAL(28,12))
         |    ELSE NULL END) AS VARCHAR) AS DOUBLE) AS hl_stat,
         |  CAST(sum(CASE WHEN e1 > 0 AND e0 > 0 THEN 1 ELSE 0 END) - 2 AS BIGINT) AS df
         |FROM t""".stripMargin,

    // q290: 1-D Wasserstein — W₁·n₁n₂ folds as exact |cum1·n₂ − cum2·n₁|
    // ·gap segment integers in HUGEINT/DECIMAL(38,0); ONE bridged division
    "q290_wasserstein" ->
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x,
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS g
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (
        |  SELECT x, CAST(sum(g) AS BIGINT) AS c1,
        |    CAST(sum(1 - g) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |cc AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM c),
        |t AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM cc),
        |sg AS (
        |  SELECT cum1, cum2, lead(x) OVER (ORDER BY x) - x AS gap
        |  FROM cc),
        |s AS (
        |  SELECT n1, n2,
        |    CAST(sum(CAST(abs(cum1 * n2 - cum2 * n1) AS HUGEINT) * gap)
        |      AS HUGEINT) AS num
        |  FROM sg CROSS JOIN t WHERE gap IS NOT NULL GROUP BY 1, 2)
        |SELECT n1, n2, CAST(CAST(num AS VARCHAR) AS DOUBLE) AS moved_mass,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS w1_chars
        |FROM s""".stripMargin,

    // q291: Cochran's Q across the three English detectors — every moment
    // an exact BIGINT from ONE aggregate; Q one guarded double division
    "q291_cochrans_q" ->
      s"""WITH $qualityLabeledCtes,
         |lid AS ($langIdSql),
         |m AS (
         |  SELECT CASE WHEN lid.guessed_lang = 'en' THEN 1 ELSE 0 END AS a,
         |    CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END AS b,
         |    CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS c
         |  FROM lid
         |  JOIN qlab q ON lid.doc_id = q.doc_id
         |  JOIN documents d ON lid.doc_id = d.doc_id),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(a) AS BIGINT) AS ga, CAST(sum(b) AS BIGINT) AS gb,
         |    CAST(sum(c) AS BIGINT) AS gc,
         |    CAST(sum(a + b + c) AS BIGINT) AS sl,
         |    CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sll
         |  FROM m)
         |SELECT n, ga AS g_langid, gb AS g_clf, gc AS g_len,
         |  CASE WHEN 3 * sl - sll > 0 THEN
         |    CAST(2 * (3 * (ga * ga + gb * gb + gc * gc)
         |        - (ga + gb + gc) * (ga + gb + gc)) AS DOUBLE)
         |      / CAST(3 * sl - sll AS DOUBLE)
         |  END AS q_stat,
         |  CAST(2 AS BIGINT) AS df
         |FROM s""".stripMargin,

    // q292: runs test — doubled-median comparisons stay in BIGINT (ties
    // drop); R, n₊, n₋ exact; μ, σ, z one fixed double tree
    "q292_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM daily),
        |rk AS (
        |  SELECT day, x,
        |    CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS r
        |  FROM daily),
        |m AS (
        |  SELECT CAST(sum(CASE WHEN r = (n_all + 1) // 2 THEN x ELSE 0 END)
        |    + sum(CASE WHEN r = (n_all + 2) // 2 THEN x ELSE 0 END)
        |    AS BIGINT) AS m2
        |  FROM rk CROSS JOIN nn),
        |sg AS (
        |  SELECT day,
        |    CASE WHEN x * 2 > m2 THEN 1 WHEN x * 2 < m2 THEN -1 END AS s
        |  FROM daily CROSS JOIN m),
        |f AS (
        |  SELECT day, s, lag(s) OVER (ORDER BY day) AS prev
        |  FROM sg WHERE s IS NOT NULL),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END) AS BIGINT) AS runs,
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |  FROM f)
        |SELECT n_above, n_below, runs,
        |  2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |    / CAST(n_above + n_below AS DOUBLE) + 1.0 AS mu,
        |  (CAST(runs AS DOUBLE)
        |    - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |       / CAST(n_above + n_below AS DOUBLE) + 1.0))
        |  / sqrt((2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |      * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |         - CAST(n_above + n_below AS DOUBLE)))
        |    / (CAST(n_above + n_below AS DOUBLE) * CAST(n_above + n_below AS DOUBLE)
        |       * (CAST(n_above + n_below AS DOUBLE) - 1.0))) AS z
        |FROM agg""".stripMargin,

    // q293: Clauset–Shalizi–Newman continuous MLE over the co-purchase
    // degree tail — exact degree counts, bridged ln terms, one division
    "q293_degree_powerlaw" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |t AS (SELECT deg FROM deg WHERE deg >= 5),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_tail,
        |    CAST(max(deg) AS BIGINT) AS max_deg,
        |    CAST(CAST(sum(CAST(CAST(
        |      CAST(CAST(CAST(CAST(ln(CAST(deg AS DOUBLE) / CAST(5.0 AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sum_ln
        |  FROM t)
        |SELECT CAST(5 AS BIGINT) AS x_min, n_tail, max_deg,
        |  CASE WHEN sum_ln > 0 THEN
        |    CAST(1.0 AS DOUBLE) + CAST(n_tail AS DOUBLE) / sum_ln
        |  END AS alpha
        |FROM s""".stripMargin,

    // q294: stationary distribution of the q142 chain — 8 unrolled
    // sum-normalized power rounds, PageRank's decimal-fold discipline
    "q294_markov_stationary" -> markovOracle(iters = 8),

    // q295: per-source unigram KL from the corpus — subset support needs
    // no smoothing; three-division ln arguments stay magnitude-safe
    "q295_source_divergence" ->
      """WITH st AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
        |  FROM (SELECT source,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |tt AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |srct AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |nn AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM srct)
        |SELECT source, max(n_s) AS n_tokens,
        |  CAST(CAST(sum(CAST(CAST(
        |    (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        |    * CAST(CAST(CAST(CAST(ln(
        |        (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        |        / (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)))
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS kl_from_corpus
        |FROM st JOIN tt USING (term) JOIN srct USING (source) CROSS JOIN nn
        |GROUP BY 1""".stripMargin,

    // q296: recall@3 of the q26 LSH index against the q25 exact top-k —
    // both arms' oracle chains ridden verbatim; recall ONE exact division
    "q296_ann_recall" ->
      s"""WITH $scaledVecs,
         |q AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2
         |      FROM w WHERE vec_id < 20),
         |ce AS (SELECT query_id, vec_id,
         |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |      FROM q, w WHERE query_id <> vec_id),
         |ex AS (SELECT query_id, vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id ASC) AS rk
         |  FROM ce QUALIFY rk <= 3),
         |vb AS (SELECT vec_id, svec, norm2, ${signBucket("svec")} AS bucket FROM w),
         |qb AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2,
         |         bucket AS qbucket
         |       FROM vb WHERE vec_id < 20),
         |ca AS (SELECT query_id, vec_id,
         |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |      FROM qb JOIN vb ON qbucket = bucket AND query_id <> vec_id),
         |ap AS (SELECT query_id, vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, vec_id ASC) AS rk
         |  FROM ca QUALIFY rk <= 3),
         |h AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
         |      FROM ex e JOIN ap a ON e.query_id = a.query_id
         |        AND e.neighbor_id = a.neighbor_id
         |      GROUP BY 1)
         |SELECT qq.query_id, CAST(3 AS BIGINT) AS k,
         |  COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
         |  CAST(COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS DOUBLE)
         |    / CAST(3.0 AS DOUBLE) AS recall
         |FROM (SELECT DISTINCT query_id FROM ex) qq
         |LEFT JOIN h ON qq.query_id = h.query_id""".stripMargin,

    // q297: Wilson 95% CIs on q96's two conversion steps — exact counts,
    // one fixed double tree per bound, z = 1.96 a shared literal
    "q297_funnel_wilson" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)),
        |steps AS (
        |  SELECT 'view_to_click' AS step, n1 AS n, n2 AS k FROM s
        |  UNION ALL
        |  SELECT 'click_to_purchase', n2, n3 FROM s),
        |w AS (
        |  SELECT step, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate
        |  FROM steps)
        |SELECT step, n, k, rate,
        |  ((rate + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        |   - 1.96 * sqrt(rate * (1.0 - rate) / CAST(n AS DOUBLE)
        |       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |  / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_lo,
        |  ((rate + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        |   + 1.96 * sqrt(rate * (1.0 - rate) / CAST(n AS DOUBLE)
        |       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |  / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_hi
        |FROM w""".stripMargin,

    // q298: per-source unigram entropy + perplexity — q282's ln bridges;
    // e^H crosses a 9-decimal quantization (the q195 exp discipline)
    "q298_source_perplexity" ->
      """WITH st AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
        |  FROM (SELECT source,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |srct AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |h AS (
        |  SELECT source, max(n_s) AS n_tokens, CAST(count(*) AS BIGINT) AS vocab,
        |    -CAST(CAST(sum(CAST(CAST(
        |      (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        |      * CAST(CAST(CAST(CAST(ln(CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS h_unigram
        |  FROM st JOIN srct USING (source)
        |  GROUP BY 1)
        |SELECT source, n_tokens, vocab, h_unigram,
        |  CAST(CAST(CAST(CAST(exp(h_unigram) AS VARCHAR) AS DECIMAL(18,9))
        |    AS VARCHAR) AS DOUBLE) AS perplexity
        |FROM h""".stripMargin,

    // q299: cluster-level split — q55's labels hashed by CLUSTER id; the
    // cross-split verified-pair count is zero BY CONSTRUCTION and the
    // oracle hash-checks that zero on every row
    "q299_cluster_split" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sp AS (
         |  SELECT doc_id, cluster_id,
         |    CASE WHEN CAST('0x' || substr(md5(cluster_id || ':cluster_split_v1'), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(cluster_id || ':cluster_split_v1'), 1, 8) AS BIGINT) % 1000 < 950 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM lab),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total FROM sp),
         |leaks AS (
         |  SELECT CAST(COALESCE(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS cross_split_dup_pairs
         |  FROM verified v
         |  JOIN sp sa ON v.doc_a = sa.doc_id
         |  JOIN sp sb ON v.doc_b = sb.doc_id),
         |ps AS (
         |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
         |  FROM sp GROUP BY 1)
         |SELECT split, n_docs, n_clusters,
         |  CAST(n_docs AS DOUBLE) / CAST(n_docs_total AS DOUBLE) AS doc_share,
         |  cross_split_dup_pairs
         |FROM ps CROSS JOIN nn CROSS JOIN leaks""".stripMargin,

    // q300: per-(split × source) census of the q299 split — cluster-unit
    // hashing no longer guarantees source balance, so it must be CHECKED
    "q300_split_profile" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN CAST('0x' || substr(md5(cluster_id || ':cluster_split_v1'), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(cluster_id || ':cluster_split_v1'), 1, 8) AS BIGINT) % 1000 < 950 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM lab),
         |d AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_toks
         |  FROM documents),
         |cells AS (
         |  SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
         |  FROM d JOIN sp USING (doc_id) GROUP BY 1, 2),
         |st AS (SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_split
         |       FROM cells GROUP BY 1)
         |SELECT split, source, n_docs, n_tokens,
         |  CAST(n_docs AS DOUBLE) / CAST(n_split AS DOUBLE) AS share_in_split
         |FROM cells JOIN st USING (split)""".stripMargin,

    // q301: Good–Turing coverage — spectrum counts exact BIGINTs off the
    // (source, term) aggregate; coverage = 1 − n₁/N, one division
    "q301_good_turing" ->
      """WITH st AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
        |  FROM (SELECT source,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c_st = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |    CAST(sum(CASE WHEN c_st = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
        |  FROM st GROUP BY 1)
        |SELECT source, n_tokens, vocab, n_hapax, n_dis,
        |  1.0 - CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
        |FROM g""".stripMargin,

    // q302: frequency-of-frequencies — exact spectrum with an 11+ tail
    // bucket; per-bucket vocabulary share one division
    "q302_freq_spectrum" ->
      """WITH tc AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS c_t
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)
        |  GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM tc)
        |SELECT least(c_t, 11) AS k, CAST(count(*) AS BIGINT) AS n_terms, vocab,
        |  CAST(count(*) AS DOUBLE) / CAST(vocab AS DOUBLE) AS vocab_share
        |FROM tc CROSS JOIN v
        |GROUP BY 1, vocab""".stripMargin,

    // q303: inter-order gaps per segment — exact integer day gaps; σ, CV
    // and Goh–Barabási B one fixed tree off n·Σg² − (Σg)² (HUGEINT bridge)
    "q303_order_gaps" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    datediff('day',
        |      lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |        ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |      CAST(o_orderdate AS DATE)) AS gap
        |  FROM orders),
        |s AS (
        |  SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sgg
        |  FROM g JOIN customer c ON g.o_custkey = c.c_custkey
        |  WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT segment, n_gaps,
        |  CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_days,
        |  sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg
        |      AS VARCHAR) AS DOUBLE)) / CAST(n_gaps AS DOUBLE) AS sd_gap_days,
        |  (sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg
        |      AS VARCHAR) AS DOUBLE)) / CAST(n_gaps AS DOUBLE))
        |    / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS cv,
        |  ((sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg
        |      AS VARCHAR) AS DOUBLE)) / CAST(n_gaps AS DOUBLE))
        |   - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |  / ((sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg
        |      AS VARCHAR) AS DOUBLE)) / CAST(n_gaps AS DOUBLE))
        |     + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS burstiness
        |FROM s""".stripMargin,

    // q304: monthly priority-mix PSI vs the corpus mix — q155's Laplace
    // smoothing and ln bridge, dense-filled buckets, one fold per month
    "q304_monthly_psi" ->
      """WITH cells AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n_mp
        |  FROM orders GROUP BY 1, 2),
        |pris AS (SELECT pri, CAST(sum(n_mp) AS BIGINT) AS n_p FROM cells GROUP BY 1),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |         CAST(sum(n_p) AS BIGINT) AS n_total FROM pris),
        |dense AS (
        |  SELECT m.month, p.pri, p.n_p, COALESCE(c.n_mp, CAST(0 AS BIGINT)) AS n_mp
        |  FROM (SELECT DISTINCT month FROM cells) m
        |  CROSS JOIN pris p
        |  LEFT JOIN cells c ON c.month = m.month AND c.pri = p.pri),
        |mt AS (SELECT month, CAST(sum(n_mp) AS BIGINT) AS n_m FROM dense GROUP BY 1),
        |j AS (
        |  SELECT d.month, mt.n_m,
        |    CAST(d.n_mp + 1 AS DOUBLE) / (mt.n_m + nb.n_buckets) AS p_cur,
        |    CAST(d.n_p + 1 AS DOUBLE) / (nb.n_total + nb.n_buckets) AS p_ref
        |  FROM dense d JOIN mt ON d.month = mt.month CROSS JOIN nb)
        |SELECT month, max(n_m) AS n_orders,
        |  CAST(CAST(sum(CAST(CAST(
        |    (p_cur - p_ref) * CAST(CAST(CAST(CAST(ln(p_cur / p_ref)
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |  AS VARCHAR) AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS psi
        |FROM j GROUP BY 1""".stripMargin,

    // q305: brand-revenue HHI per region — exact integer cents in
    // HUGEINT/DECIMAL(38,0), VARCHAR-bridged share divisions, quantized
    // square fold per region
    "q305_brand_hhi" ->
      """WITH cells AS (
        |  SELECT r.r_name AS region, p.p_brand AS brand,
        |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS HUGEINT) AS rev
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT region, CAST(sum(rev) AS HUGEINT) AS tot
        |        FROM cells GROUP BY 1)
        |SELECT region, CAST(count(*) AS BIGINT) AS n_brands,
        |  CAST(CAST(sum(CAST(CAST(
        |    (CAST(CAST(rev AS VARCHAR) AS DOUBLE) / CAST(CAST(tot AS VARCHAR) AS DOUBLE))
        |    * (CAST(CAST(rev AS VARCHAR) AS DOUBLE) / CAST(CAST(tot AS VARCHAR) AS DOUBLE))
        |  AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS hhi
        |FROM cells JOIN tot USING (region)
        |GROUP BY 1""".stripMargin,

    // q306: multiplicative seasonal index by calendar month — exact sums,
    // a fixed four-division tree
    "q306_seasonal_index" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(x) AS BIGINT) AS sx_all,
        |        CAST(count(*) AS BIGINT) AS n_all FROM daily)
        |SELECT CAST(month(day) AS BIGINT) AS month_of_year,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_daily_cents,
        |  (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / (CAST(sx_all AS DOUBLE) / CAST(n_all AS DOUBLE)) AS seasonal_index
        |FROM daily CROSS JOIN t
        |GROUP BY 1, sx_all, n_all""".stripMargin,

    // q307: source-vocabulary Jaccard — exact set sizes and intersections,
    // one division per pair
    "q307_vocab_jaccard" ->
      """WITH st AS (
        |  SELECT DISTINCT source, term
        |  FROM (SELECT source,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |        FROM documents)),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM st GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.v AS v_a, sb.v AS v_b, n_common,
        |  CAST(n_common AS DOUBLE)
        |    / CAST(sa.v + sb.v - n_common AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sz sa ON inter.src_a = sa.source
        |JOIN sz sb ON inter.src_b = sb.source""".stripMargin,

    // q308: order-size VMR — q281's exact-integer identity at order grain;
    // zero-line orders contribute zero to both sums
    "q308_order_size_vmr" ->
      """WITH per AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_with_lines,
        |    CAST(sum(k) AS BIGINT) AS t, CAST(sum(k * k) AS BIGINT) AS s2
        |  FROM per)
        |SELECT n_orders, n_with_lines, t AS n_lines,
        |  CAST(t AS DOUBLE) / CAST(n_orders AS DOUBLE) AS mean_lines,
        |  CAST(n_orders * s2 - t * t AS DOUBLE)
        |    / CAST(n_orders * t AS DOUBLE) AS vmr
        |FROM s CROSS JOIN n""".stripMargin,

    // q309: ship-lag drift — exact integer day lags off the orderkey join;
    // μ/σ one fixed tree per month off the HUGEINT-bridged n·Σl² − (Σl)²
    "q309_ship_lag_drift" ->
      """WITH lags AS (
        |  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
        |    datediff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS lag
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |s AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(lag) AS BIGINT) AS sl,
        |    CAST(sum(CAST(lag AS HUGEINT) * lag) AS HUGEINT) AS sll
        |  FROM lags GROUP BY 1)
        |SELECT month, n_lines,
        |  CAST(sl AS DOUBLE) / CAST(n_lines AS DOUBLE) AS mean_lag_days,
        |  sqrt(CAST(CAST(CAST(n_lines AS HUGEINT) * sll - CAST(sl AS HUGEINT) * sl
        |      AS VARCHAR) AS DOUBLE)) / CAST(n_lines AS DOUBLE) AS sd_lag_days
        |FROM s""".stripMargin,

    // q310: cluster-level K folds — q299's construction at fold grain; the
    // cross-fold verified-pair count is zero BY CONSTRUCTION, hash-checked
    "q310_cluster_folds" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sp AS (
         |  SELECT doc_id, cluster_id,
         |    CAST('0x' || substr(md5(cluster_id || ':fold_v1'), 1, 8) AS BIGINT)
         |      % 1000 % 5 AS fold
         |  FROM lab),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total FROM sp),
         |leaks AS (
         |  SELECT CAST(COALESCE(sum(CASE WHEN sa.fold <> sb.fold THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS cross_fold_dup_pairs
         |  FROM verified v
         |  JOIN sp sa ON v.doc_a = sa.doc_id
         |  JOIN sp sb ON v.doc_b = sb.doc_id),
         |pf AS (
         |  SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
         |  FROM sp GROUP BY 1)
         |SELECT fold, n_docs, n_clusters,
         |  CAST(n_docs AS DOUBLE) / CAST(n_docs_total AS DOUBLE) AS doc_share,
         |  cross_fold_dup_pairs
         |FROM pf CROSS JOIN nn CROSS JOIN leaks""".stripMargin,

    // q311: deterministic negative sampling — content-addressed draws
    // (md5 mod |parts|), positives anti-joined away; collisions drop
    "q311_negative_samples" ->
      """WITH pos AS (
        |  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part),
        |draws AS (
        |  SELECT c.c_custkey AS user_id, CAST(d.i AS BIGINT) AS draw,
        |    CAST('0x' || substr(md5(c.c_custkey || ':' || d.i || ':neg_v1'), 1, 8)
        |      AS BIGINT) % n_parts AS item
        |  FROM customer c
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) d
        |  CROSS JOIN np)
        |SELECT user_id, draw, item
        |FROM draws
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pos
        |  WHERE pos.user_id = draws.user_id AND pos.item = draws.item)""".stripMargin,

    // q312: inverse-frequency class weights — exact counts, one fixed tree
    "q312_class_weights" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |        CAST(count(*) AS BIGINT) AS k_classes FROM c)
        |SELECT lang, n_docs, n_total, k_classes,
        |  CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
        |  CAST(n_total AS DOUBLE) / CAST(k_classes * n_docs AS DOUBLE) AS weight
        |FROM c CROSS JOIN t""".stripMargin,

    // q313: dedup token savings — representative flags off q55's labels,
    // exact token counts, one division
    // shared with q351's release card (one arm of the composition)
    "q313_dedup_savings" -> dedupSavingsOracle,

    // q315: LSH band-layout recall — exact ground truth (all qualifying
    // pairs, stratum + lang + ±20-char gates, 3-gram Jaccard ≥ 0.5), the
    // 16-entry signature agreement vector, and each band layout's catch
    // unrolled to literal boolean trees (no lambda-capture dependence)
    "q315_lsh_recall" -> {
      val aList = graft.ops.Dedup.hashA.mkString("[", ", ", "]")
      val bList = graft.ops.Dedup.hashB.mkString("[", ", ", "]")
      def caught(nb: Int, r: Int): String =
        (0 until nb).map { bi =>
          (0 until r).map(j => s"eq[${bi * r + j + 1}]").mkString("(", " AND ", ")")
        }.mkString("(", " OR ", ")")
      val arms = Seq(16 -> 1, 8 -> 2, 4 -> 4, 2 -> 8, 1 -> 16).map { case (nb, r) =>
        s"""SELECT CAST($nb AS BIGINT) AS n_bands, CAST($r AS BIGINT) AS rows_per_band,
           |  CAST(count(*) AS BIGINT) AS n_true_pairs,
           |  CAST(sum(CASE WHEN ${caught(nb, r)} THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
           |  CAST(sum(CASE WHEN ${caught(nb, r)} THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS recall
           |FROM tp""".stripMargin
      }
      s"""WITH s AS (
         |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS g3,
         |    list_transform(range(0, 16), i -> list_min(list_transform(
         |      list_transform(${shingles(4)},
         |        t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)),
         |      v -> ($aList[CAST(i AS INT) + 1] * v
         |        + $bList[CAST(i AS INT) + 1]) % ${graft.ops.Dedup.HashP}))) AS sig,
         |    n_chars // 20 AS bkt
         |  FROM documents
         |  WHERE CAST('0x' || substr(md5(doc_id || ':recall_v1'), 1, 8) AS BIGINT)
         |    % 1000 < 100),
         |pr AS (SELECT *, unnest([bkt - 1, bkt, bkt + 1]) AS k FROM s),
         |tp AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    list_transform(range(0, 16),
         |      i -> coalesce(x.sig[CAST(i AS INT) + 1] = y.sig[CAST(i AS INT) + 1],
         |        false)) AS eq
         |  FROM pr x JOIN s y ON x.lang = y.lang AND x.k = y.bkt
         |  WHERE x.doc_id < y.doc_id AND abs(x.n_chars - y.n_chars) <= 20
         |    AND CAST(len(list_intersect(x.g3, y.g3)) AS DOUBLE)
         |      / (len(x.g3) + len(y.g3) - len(list_intersect(x.g3, y.g3))) >= 0.5)
         |${arms.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // q317: per-fold train/validate statistics over the q310 fold
    // assignment — exact tokens, DECIMAL(18,12)-quantized quality folded
    // exactly (the q215 convention), train side = totals − fold
    "q317_fold_eval" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sp AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(cluster_id || ':fold_v1'), 1, 8) AS BIGINT)
         |      % 1000 % 5 AS fold
         |  FROM lab),
         |dq AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_toks,
         |    CAST(CAST(($qualityScoreSql) AS VARCHAR) AS DECIMAL(18,12)) AS q
         |  FROM documents),
         |cells AS (
         |  SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS n_tokens, sum(q) AS q_sum
         |  FROM dq JOIN sp USING (doc_id) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n_docs) AS BIGINT) AS nd_tot,
         |    CAST(sum(n_tokens) AS BIGINT) AS nt_tot, sum(q_sum) AS q_tot
         |  FROM cells)
         |SELECT fold, n_docs AS n_valid_docs, nd_tot - n_docs AS n_train_docs,
         |  n_tokens AS valid_tokens, nt_tot - n_tokens AS train_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(nt_tot AS DOUBLE) AS valid_token_share,
         |  CAST(CAST(q_sum AS VARCHAR) AS DOUBLE) / CAST(n_docs AS DOUBLE)
         |    AS avg_quality_valid,
         |  CAST(CAST(CAST(q_tot AS DECIMAL(32,12)) - CAST(q_sum AS DECIMAL(32,12))
         |    AS VARCHAR) AS DOUBLE)
         |    / CAST(nd_tot - n_docs AS DOUBLE) AS avg_quality_train
         |FROM cells CROSS JOIN tot""".stripMargin,

    // q318: robust daily anomalies — q247's exact cents dailies, trailing
    // 7-day sorted buffer, median = buf[4], MAD = sorted |v−med|[4], alarm
    // the exact integer |x−med| > 5·MAD (nulls → false, q194's warmup rows).
    // q321 is the STREAMING producer of the identical readout and shares
    // this SQL verbatim — the sixth batch/stream parity instance
    "q318_robust_anomaly" -> robustAnomalyOracle,
    "q321_stream_robust" -> robustAnomalyOracle,

    // q320: LSH candidate-cost curve — bucket census per band layout on the
    // q315 stratum; generated pairs by the n·(n−1)/2 identity, distinct
    // candidates by the layout's own band self-join (arms unrolled, no
    // lambda-capture dependence)
    "q320_lsh_cost" -> {
      val aList = graft.ops.Dedup.hashA.mkString("[", ", ", "]")
      val bList = graft.ops.Dedup.hashB.mkString("[", ", ", "]")
      val layouts = Seq(16 -> 1, 8 -> 2, 4 -> 4, 2 -> 8, 1 -> 16)
      val ctes = layouts.map { case (nb, r) =>
        val key = (0 until r).map(j =>
          s"CAST(sig[CAST(b.i * $r + $j + 1 AS INT)] AS VARCHAR)")
          .mkString(" || '|' || ")
        s"""bands_$nb AS (
           |  SELECT doc_id, b.i AS band_idx, $key AS key
           |  FROM s CROSS JOIN (SELECT unnest(range(0, $nb)) AS i) b),
           |bk_$nb AS (
           |  SELECT band_idx, key, CAST(count(*) AS BIGINT) AS n
           |  FROM bands_$nb GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
      }.mkString(",\n")
      val arms = layouts.map { case (nb, r) =>
        s"""SELECT CAST($nb AS BIGINT) AS n_bands, CAST($r AS BIGINT) AS rows_per_band,
           |  (SELECT CAST(count(*) AS BIGINT) FROM bk_$nb) AS n_buckets,
           |  (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) FROM bk_$nb)
           |    AS generated_pairs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM (
           |     SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           |     FROM bands_$nb a JOIN bands_$nb b
           |       ON a.band_idx = b.band_idx AND a.key = b.key
           |      AND a.doc_id < b.doc_id) t) AS distinct_candidates""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s0 AS (
         |  SELECT doc_id, list_transform(range(0, 16), i -> list_min(list_transform(
         |    list_transform(${shingles(4)},
         |      t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)),
         |    v -> ($aList[CAST(i AS INT) + 1] * v
         |      + $bList[CAST(i AS INT) + 1]) % ${graft.ops.Dedup.HashP}))) AS sig
         |  FROM documents
         |  WHERE CAST('0x' || substr(md5(doc_id || ':recall_v1'), 1, 8) AS BIGINT)
         |    % 1000 < 100),
         |s AS (SELECT * FROM s0 WHERE sig[1] IS NOT NULL),
         |$ctes
         |$arms""".stripMargin
    },

    // q319: vocabulary-growth series — one (source, term, batch) aggregate,
    // first-seen = min(batch), cumulative vocab over the |sources|·|batches|
    // frame; batch is the content-addressed crawl stand-in (md5 % 1000 % 8).
    // q330 is the STREAMING producer of the identical series and shares the
    // oracle VERBATIM (the q268 batch/stream parity convention, 7th instance)
    "q319_vocab_growth" -> vocabGrowthOracle,
    "q330_vocab_stream" -> vocabGrowthOracle,

    // q242: threshold sweep — P/R/F1 at the nine deciles, every metric ONE
    // division of exact BIGINTs (F1 as 2TP/(2TP+FP+FN), never the compound
    // 2PR/(P+R) tree); empty predicted-positive sets yield NULL precision
    "q242_threshold_metrics" -> thresholdSweepSql,

    // q255: the STREAMING sweep is gated against q242's oracle SHARED
    // VERBATIM — the q241/q246 batch/stream parity contract: same scoring
    // expression tree, same per-score-count state, same sweep arithmetic
    "q255_sweep_stream" -> thresholdSweepSql,

    // q253: per-source calibration drift — q236's bin algebra WITHIN each
    // source, rolled to ECE = Σ (n_bin/n_src)·|avg_score − pos_rate| with
    // the ≤10-term sum 12-decimal-quantized and folded exactly (q233
    // recipe); max over doubles is order-free
    "q253_calibration_drift" ->
      s"""WITH $qualityLabeledCtes,
         |qsl AS (
         |  SELECT q.score, q.y, d.source
         |  FROM qlab q JOIN documents d ON q.doc_id = d.doc_id),
         |bins AS (
         |  SELECT source, least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(CAST(sum(CAST(CAST(score AS VARCHAR) AS DECIMAL(28,12)))
         |      AS VARCHAR) AS DOUBLE) AS sum_score
         |  FROM qsl GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_src FROM bins GROUP BY 1),
         |g AS (
         |  SELECT b.source, b.n, t.n_src,
         |    abs(b.sum_score / CAST(b.n AS DOUBLE)
         |      - CAST(b.n_pos AS DOUBLE) / CAST(b.n AS DOUBLE)) AS gap
         |  FROM bins b JOIN tot t ON b.source = t.source)
         |SELECT source, CAST(max(n_src) AS BIGINT) AS n_docs,
         |  CAST(CAST(sum(CAST(CAST(CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE) * gap
         |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS ece,
         |  max(gap) AS max_gap
         |FROM g GROUP BY 1""".stripMargin,

    // q243: chi-square independence (lang × length band) — exact observed
    // ints over the FULL grid (zero cells generated), E and each cell
    // (O−E)²/E as fixed correctly-rounded double trees (rt·ct as DOUBLE —
    // int64 overflows at extreme n), only the cell SUM through the
    // 9-decimal fold
    "q243_chi_square" ->
      s"""WITH $chiSquareCtes
        |SELECT lang, band, o, rt, ct, expected, cell_chi2, chi2, dof
        |FROM cc CROSS JOIN total""".stripMargin,

    // q250: Cramér's V — the bounded effect size off the SAME chi-square
    // CTEs; sqrt is IEEE-correctly-rounded in both engines, one fixed tree
    "q250_cramers_v" ->
      s"""WITH $chiSquareCtes
        |SELECT total.chi2, total.dof, s.n,
        |  total.chi2 / CAST(s.n AS DOUBLE) AS phi2,
        |  sqrt(total.chi2 / (CAST(s.n AS DOUBLE)
        |    * CAST(least(s.nl - 1, s.nb - 1) AS DOUBLE))) AS cramers_v
        |FROM total CROSS JOIN (
        |  SELECT CAST(sum(o) AS BIGINT) AS n, max(nl) AS nl, max(nb) AS nb
        |  FROM cc) s""".stripMargin,

    // q249: revenue concentration deciles (the Lorenz table) — rank tiles
    // by floor distribution ((rk−1)·10 DIV n), exact cents everywhere, one
    // share division per tile
    "q249_concentration" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS total FROM cust),
        |r AS (
        |  SELECT cents, n, total,
        |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rk
        |  FROM cust CROSS JOIN t),
        |tiles AS (
        |  SELECT ((rk - 1) * 10) // n + 1 AS tile, n, total,
        |    CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS tile_cents
        |  FROM r GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT tile, n_customers, tile_cents, total,
        |    CAST(sum(tile_cents) OVER (ORDER BY tile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM tiles)
        |SELECT tile, n_customers, tile_cents, cum_cents,
        |  CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
        |  CAST(tile_cents AS DOUBLE) / CAST(total AS DOUBLE) AS tile_share
        |FROM c""".stripMargin,

    // q236: calibration table — fixed-width score bins; exact 12-decimal
    // folds for mean score and per-bin Brier (the q233 quantize-then-fold
    // recipe); bin 9 absorbs the score = 1.0 edge (9-decimal exp underflow)
    "q236_calibration" ->
      s"""WITH $qualityLabeledCtes,
         |b AS (
         |  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin, score, y,
         |    score - CAST(y AS DOUBLE) AS err
         |  FROM qlab)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST(CAST(sum(CAST(CAST(score AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_score,
         |  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate,
         |  CAST(CAST(sum(CAST(CAST(err * err AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS brier
         |FROM b GROUP BY 1""".stripMargin,

    // q237: equi-depth binning on GK-SKETCH boundaries — the oracle pins the
    // CONTRACT (per-bin population inside the tie-adjusted ±εn rank bracket,
    // all bounds integer DIV arithmetic), not the engine-specific boundary
    // values; within_bound must come back TRUE for every bin
    "q237_gk_equidepth" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
        |mm AS (SELECT CAST(max(c) AS BIGINT) AS m FROM (
        |  SELECT count(*) AS c FROM orders GROUP BY o_totalprice)),
        |b AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS bin),
        |k AS (SELECT bin, n, m,
        |  CASE WHEN bin = 10 THEN n ELSE (n * (bin * 10000 - 10)) // 100000 END AS ub_l,
        |  CASE WHEN bin = 10 THEN n ELSE (n * (bin * 10000 + 10) + 99999) // 100000 END AS ub_h,
        |  CASE WHEN bin = 1 THEN CAST(0 AS BIGINT)
        |       ELSE (n * ((bin - 1) * 10000 - 10)) // 100000 END AS lb_l,
        |  CASE WHEN bin = 1 THEN CAST(0 AS BIGINT)
        |       ELSE (n * ((bin - 1) * 10000 + 10) + 99999) // 100000 END AS lb_h
        |  FROM b, nn, mm)
        |SELECT bin, ub_l - lb_h - (m - 1) AS lo_bound,
        |  ub_h - lb_l + (m - 1) AS hi_bound, TRUE AS within_bound
        |FROM k""".stripMargin,

    // q238: winsorize at GK-SKETCH boundaries — same contract family as
    // q237: the oracle pins the tie-adjusted ±εn CLIP-COUNT brackets
    // (reduced integer fractions: p±ε at p=1/20, 19/20, ε=1/10⁴), not the
    // engine-specific boundary values; within_bound must come back TRUE
    "q238_gk_winsorize" ->
      """WITH nn AS (SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |mm AS (SELECT flag, CAST(max(c) AS BIGINT) AS m FROM (
        |  SELECT l_returnflag AS flag, count(*) AS c FROM lineitem
        |  GROUP BY 1, l_extendedprice) GROUP BY 1),
        |k AS (SELECT nn.flag, n_rows, m,
        |  (n_rows * 499) // 10000 AS lo_l,
        |  (n_rows * 501 + 9999) // 10000 AS lo_h,
        |  (n_rows * 9499) // 10000 AS hi_l,
        |  (n_rows * 9501 + 9999) // 10000 AS hi_h
        |  FROM nn JOIN mm USING (flag))
        |SELECT flag, n_rows, m,
        |  greatest(lo_l - m, 0) AS clip_lo_min,
        |  lo_h - 1 AS clip_lo_max,
        |  greatest(n_rows - hi_h - (m - 1), 0) AS clip_hi_min,
        |  n_rows - hi_l AS clip_hi_max,
        |  TRUE AS within_bound
        |FROM k""".stripMargin,

    // q218: PCA top component — 8 unrolled power rounds over the exact-int
    // centered Gram (helper builds the quantization-ladder CTEs)
    "q218_pca_power" -> pcaOracle(rounds = 8),

    // q219: JL distortion — deterministic md5-parity sign matrix, exact
    // int64 original distances, HUGEINT projected distances, one ratio tree
    "q219_jl_distortion" ->
      s"""WITH $scaledVecs,
         |sgn AS (SELECT k.k, d.pos,
         |    CASE WHEN CAST('0x' || substr(md5(k.k || ':' || d.pos), 1, 2) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sign
         |  FROM (SELECT unnest(range(0, 16)) AS k) k
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) d),
         |pe AS (SELECT w.vec_id, d.pos, svec[CAST(d.pos + 1 AS INT)] AS v
         |  FROM w CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) d),
         |pr AS (SELECT pe.vec_id, s.k, CAST(sum(s.sign * pe.v) AS BIGINT) AS p
         |  FROM pe JOIN sgn s ON pe.pos = s.pos GROUP BY 1, 2),
         |pv AS (SELECT vec_id, array_agg(p ORDER BY k) AS pvec FROM pr GROUP BY 1),
         |f AS (SELECT w.vec_id, w.svec, pv.pvec FROM w JOIN pv USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, svec AS qvec, pvec AS qp FROM f WHERE vec_id < 20),
         |c AS (SELECT query_id, f.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 65), i -> (qvec[i] - svec[i]) * (qvec[i] - svec[i]))),
         |      (a, b) -> a + b) AS d2_orig,
         |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |      list_transform(range(1, 17), i -> CAST(qp[i] - pvec[i] AS HUGEINT) * (qp[i] - pvec[i]))),
         |      (a, b) -> a + b) AS d2p
         |  FROM q JOIN f ON query_id < f.vec_id)
         |SELECT query_id, vec_id, d2_orig,
         |  CAST(CAST(d2p AS VARCHAR) AS DOUBLE) AS d2_proj,
         |  (CAST(CAST(d2p AS VARCHAR) AS DOUBLE) / CAST(16.0 AS DOUBLE))
         |    / CAST(d2_orig AS DOUBLE) AS jl_ratio
         |FROM c""".stripMargin,

    // q216: hard-negative mining — q36's IVF cell CTEs + per-(vector, same?)
    // argmax windows; NULLs where a cell holds no same/other-label peer
    "q216_hard_negatives" ->
      s"""WITH $scaledVecs,
         |c AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
         |ac AS (SELECT w.vec_id, w.svec, w.norm2, c.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, c.cent_id ASC) AS rn
         |       FROM w CROSS JOIN c),
         |asg AS (SELECT vec_id, svec, norm2, cent_id AS cell FROM ac WHERE rn = 1),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb, la.label AS lla, lb.label AS llb,
         |        ${cosine("a.svec", "b.svec", "a.norm2", "b.norm2")} AS cos
         |      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
         |      JOIN lab la ON a.vec_id = la.vec_id
         |      JOIN lab lb ON b.vec_id = lb.vec_id),
         |r AS (SELECT va, vb, cos, lla = llb AS same,
         |        row_number() OVER (PARTITION BY va, lla = llb
         |          ORDER BY cos DESC, vb ASC) AS rn
         |      FROM p),
         |pos AS (SELECT va, vb AS pos_id, cos AS pos_cos FROM r WHERE same AND rn = 1),
         |neg AS (SELECT va, vb AS neg_id, cos AS neg_cos FROM r WHERE NOT same AND rn = 1)
         |SELECT l.vec_id, l.label, pos_id, pos_cos, neg_id, neg_cos,
         |  pos_cos - neg_cos AS margin, neg_cos > pos_cos AS violated
         |FROM lab l
         |LEFT JOIN pos ON l.vec_id = pos.va
         |LEFT JOIN neg ON l.vec_id = neg.va""".stripMargin,

    // q217: class separation — q77's floored-mean centroid CTEs keyed by
    // label; per-label means fold 12-decimal-quantized cosines exactly
    "q217_class_separation" ->
      s"""WITH $scaledVecs,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ex AS (SELECT l.label AS clabel, d.i, svec[CAST(d.i AS INT)] AS val
         |       FROM w JOIN lab l ON w.vec_id = l.vec_id
         |       CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
         |cm AS (SELECT clabel, i, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
         |       FROM ex GROUP BY 1, 2),
         |cv AS (SELECT clabel, array_agg(comp ORDER BY i) AS cvec FROM cm GROUP BY 1),
         |cn AS (SELECT clabel, cvec, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(cvec, x -> x * x)), (a, b) -> a + b) AS cnorm2 FROM cv),
         |sc AS (SELECT w.vec_id, l.label, cn.clabel,
         |         ${cosine("w.svec", "cn.cvec", "w.norm2", "cn.cnorm2")} AS cos
         |       FROM w JOIN lab l ON w.vec_id = l.vec_id CROSS JOIN cn),
         |own AS (SELECT vec_id, label, cos AS own_cos FROM sc WHERE label = clabel),
         |oth AS (SELECT vec_id, other_cos FROM (
         |         SELECT vec_id, cos AS other_cos,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel ASC) AS rn
         |         FROM sc WHERE label <> clabel) WHERE rn = 1)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(CAST(sum(CAST(CAST(own_cos AS VARCHAR) AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_own_cos,
         |  CAST(CAST(sum(CAST(CAST(other_cos AS VARCHAR) AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_other_cos,
         |  CAST(CAST(sum(CAST(CAST(own_cos - other_cos AS VARCHAR) AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_margin,
         |  CAST(sum(CASE WHEN other_cos > own_cos THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned
         |FROM own JOIN oth USING (vec_id)
         |GROUP BY 1""".stripMargin,

    // q214: one NOT EXISTS block per FK edge, mirroring the anti-joins
    "q214_ri_audit" -> Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
      ("lineitem.l_partkey->supplier (misdeclared)",
        "lineitem", "l_partkey", "supplier", "s_suppkey"))
      .map { case (name, child, fk, parent, pk) =>
        s"""SELECT '$name' AS relationship,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
           |  CAST(count(*) AS BIGINT) AS n_orphans,
           |  CAST(count(DISTINCT $fk) AS BIGINT) AS n_orphan_keys,
           |  count(*) = 0 AS passed
           |FROM $child c WHERE NOT EXISTS
           |  (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // q215: per-source gram novelty — q75's gram CTEs, df=1 census, per-doc
    // ratio quantized to 12 decimals and folded exactly into the mean
    "q215_gram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)), ' '))))
        |    ELSE [] END AS grams
        |  FROM d),
        |g AS (SELECT doc_id, source, unnest(grams) AS gram FROM g0),
        |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
        |p AS (
        |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM g JOIN f USING (gram) GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(CAST(sum(CAST(CAST(CAST(n_unique AS DOUBLE) / CAST(n_grams AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_novelty,
        |  CAST(sum(CASE WHEN n_unique = n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_fully_novel
        |FROM p GROUP BY 1""".stripMargin,

    // q224: two-proportion A/B test — md5-parity arms, exact-int counts,
    // one fixed tree per statistic with the 1.96 critical value pinned.
    // q226 is the STREAMING producer of the identical readout and shares
    // this SQL verbatim — batch/stream parity gated by the same oracle.
    "q224_ab_test" -> abTestSql,
    "q226_stream_ab" -> abTestSql,


    // q233: price elasticity — q143 moments over 12-decimal-bridged lns of
    // exact-decimal monthly aggregates, quantized folds per brand
    "q233_price_elasticity" ->
      """WITH m AS (
        |  SELECT p_brand AS brand,
        |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mth,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |xy AS (
        |  SELECT brand,
        |    CAST(CAST(CAST(CAST(ln(CAST(CAST(sp AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(sq AS VARCHAR) AS DOUBLE)) AS VARCHAR) AS DECIMAL(18,12))
        |      AS VARCHAR) AS DOUBLE) AS x,
        |    CAST(CAST(CAST(CAST(ln(CAST(CAST(sq AS VARCHAR) AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS y
        |  FROM m),
        |mo AS (
        |  SELECT brand, CAST(count(*) AS BIGINT) AS n_months,
        |    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(CAST(y * y AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM xy GROUP BY 1)
        |SELECT brand, n_months,
        |  (CAST(n_months AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n_months AS DOUBLE) * sxx - sx * sx) AS elasticity,
        |  (CAST(n_months AS DOUBLE) * sxy - sx * sy)
        |    / (sqrt(CAST(n_months AS DOUBLE) * sxx - sx * sx)
        |       * sqrt(CAST(n_months AS DOUBLE) * syy - sy * sy)) AS corr
        |FROM mo""".stripMargin,

    // q234: T5 span corruption — md5(doc:span) mask draws, per-span
    // sentinels, ordered folds; COALESCE matches array_join's empty string
    "q234_span_corruption" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
        |sp AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS s
        |  FROM d),
        |pieces AS (
        |  SELECT doc_id, CAST(s AS BIGINT) AS s,
        |    array_to_string(list_slice(toks, CAST(s * 3 + 1 AS INT), CAST(s * 3 + 3 AS INT)), ' ') AS piece,
        |    CAST(len(list_slice(toks, CAST(s * 3 + 1 AS INT), CAST(s * 3 + 3 AS INT))) AS BIGINT) AS plen,
        |    CAST('0x' || substr(md5(doc_id || ':' || s), 1, 8) AS BIGINT) % 5 = 0 AS masked
        |  FROM sp)
        |SELECT doc_id,
        |  CAST(sum(plen) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN masked THEN plen ELSE 0 END) AS BIGINT) AS n_masked,
        |  string_agg(CASE WHEN masked THEN '<X_' || s || '>' ELSE piece END, ' ' ORDER BY s) AS corrupted,
        |  COALESCE(string_agg(CASE WHEN masked THEN '<X_' || s || '> ' || piece END, ' ' ORDER BY s), '') AS targets
        |FROM pieces GROUP BY 1""".stripMargin,

    // q232: split-leakage audit — q17's verified dup pairs straddling the
    // q50 hash split; canonicalized unordered split pairs
    "q232_split_leakage" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes,
         |docs3 AS (
         |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS grams FROM documents),
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
         |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS jaccard
         |  FROM cand c
         |  JOIN docs3 x ON c.doc_a = x.doc_id
         |  JOIN docs3 y ON c.doc_b = y.doc_id
         |  WHERE x.lang = y.lang AND abs(x.n_chars - y.n_chars) <= 20),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 950 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |j AS (
         |  SELECT least(sa.split, sb.split) AS split_lo,
         |    greatest(sa.split, sb.split) AS split_hi
         |  FROM pairs p
         |  JOIN sp sa ON p.doc_a = sa.doc_id
         |  JOIN sp sb ON p.doc_b = sb.doc_id
         |  WHERE p.jaccard >= 0.5)
         |SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_dup_pairs,
         |  split_lo <> split_hi AS is_leakage
         |FROM j GROUP BY 1, 2""".stripMargin,

    // q230: asymmetric containment over the q17/q19 LSH candidates — exact
    // intersection counts, identical-double ratios both directions
    "q230_containment" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes,
         |docs3 AS (SELECT doc_id, ${shingles(3)} AS grams FROM documents),
         |p AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(x.grams) AS BIGINT) AS n_a, CAST(len(y.grams) AS BIGINT) AS n_b,
         |    CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_common
         |  FROM cand c
         |  JOIN docs3 x ON c.doc_a = x.doc_id
         |  JOIN docs3 y ON c.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, n_a, n_b, n_common,
         |  CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) AS cont_a_in_b,
         |  CAST(n_common AS DOUBLE) / CAST(n_b AS DOUBLE) AS cont_b_in_a,
         |  greatest(CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE),
         |    CAST(n_common AS DOUBLE) / CAST(n_b AS DOUBLE)) AS max_containment
         |FROM p
         |WHERE greatest(CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE),
         |  CAST(n_common AS DOUBLE) / CAST(n_b AS DOUBLE)) >= CAST(0.5 AS DOUBLE)""".stripMargin,

    // q231: cohort LTV — integer month arithmetic, exact-cents folds, one
    // cohort-partitioned cumulative window over the aggregated frame
    "q231_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |ch AS (SELECT cust, CAST(min(m) AS BIGINT) AS m0 FROM o GROUP BY 1),
        |sz AS (SELECT m0 AS cohort_m, CAST(count(*) AS BIGINT) AS n_cohort FROM ch GROUP BY 1),
        |cells AS (
        |  SELECT ch.m0 AS cohort_m, o.m - ch.m0 AS month_offset,
        |    CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM o JOIN ch USING (cust)
        |  WHERE o.m - ch.m0 <= 12
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_m, month_offset, revenue_cents,
        |    CAST(sum(revenue_cents) OVER (PARTITION BY cohort_m ORDER BY month_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_revenue_cents
        |  FROM cells)
        |SELECT cohort_m, month_offset, n_cohort, revenue_cents, cum_revenue_cents,
        |  CAST(cum_revenue_cents AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS ltv_cents
        |FROM cum JOIN sz USING (cohort_m)""".stripMargin,

    // q228: Poisson bootstrap — md5-uniforms through the pinned inverse
    // CDF, exact-int replica means, rank-selected percentile bounds
    "q228_bootstrap_ci" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |reps AS (SELECT CAST(u AS BIGINT) AS b FROM (SELECT unnest(range(0, 200)) AS u)),
        |c AS (
        |  SELECT b, x,
        |    CAST(CAST('0x' || substr(md5(CAST(day AS VARCHAR) || ':' || b), 1, 8) AS BIGINT)
        |      AS DOUBLE) / CAST(4294967296.0 AS DOUBLE) AS unif
        |  FROM daily CROSS JOIN reps),
        |w AS (
        |  SELECT b, x,
        |    CASE WHEN unif < CAST('0.36787944117144233' AS DOUBLE) THEN 0
        |         WHEN unif < CAST('0.7357588823428847' AS DOUBLE) THEN 1
        |         WHEN unif < CAST('0.9196986029286058' AS DOUBLE) THEN 2
        |         WHEN unif < CAST('0.9810118431238463' AS DOUBLE) THEN 3
        |         WHEN unif < CAST('0.9963401531726563' AS DOUBLE) THEN 4
        |         WHEN unif < CAST('0.9994058151824183' AS DOUBLE) THEN 5
        |         ELSE 6 END AS w
        |  FROM c),
        |m AS (SELECT b, CAST(sum(w * x) AS BIGINT) AS swx, CAST(sum(w) AS BIGINT) AS sw
        |      FROM w GROUP BY 1),
        |mm AS (SELECT b, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_b FROM m),
        |r AS (SELECT mean_b, CAST(row_number() OVER (ORDER BY mean_b, b) AS BIGINT) AS rn FROM mm)
        |SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(200 AS BIGINT) AS n_reps,
        |  CAST(sum(x) AS DOUBLE) / count(*) AS mean_obs_cents,
        |  (SELECT mean_b FROM r WHERE rn = 5) AS ci_lo_cents,
        |  (SELECT mean_b FROM r WHERE rn = 195) AS ci_hi_cents
        |FROM daily""".stripMargin,

    // q227: split conformal — rank-selected q-hat over the calibration
    // residuals of the q211/q223 smoother, exact-count test coverage
    "q227_conformal" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |o AS (SELECT CAST(u AS BIGINT) AS j FROM (SELECT unnest(generate_series(0, 39)) AS u)),
        |c AS (
        |  SELECT i.i + o.j AS i,
        |    CAST(CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12)) AS termq,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS wq
        |  FROM i CROSS JOIN o),
        |s AS (
        |  SELECT i, CAST(CAST(sum(termq) AS VARCHAR) AS DOUBLE) AS ewma_cents,
        |    CAST(CAST(sum(wq) AS VARCHAR) AS DOUBLE) AS w_mass
        |  FROM c GROUP BY 1),
        |f AS (
        |  SELECT day, x AS total_cents,
        |    lag(ewma_cents / w_mass) OVER (ORDER BY day) AS forecast
        |  FROM i JOIN s USING (i)),
        |sc AS (
        |  SELECT day, abs(CAST(total_cents AS DOUBLE) - forecast) AS ae
        |  FROM f WHERE forecast IS NOT NULL),
        |cal AS (SELECT day, ae FROM sc WHERE day < DATE '1999-01-01'),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |q AS (
        |  SELECT n_cal, ae AS qhat_cents FROM
        |    (SELECT ae, CAST(row_number() OVER (ORDER BY ae, day) AS BIGINT) AS rn FROM cal), nc
        |  WHERE rn = least(CAST(ceil(CAST(n_cal + 1 AS DOUBLE) * CAST(0.9 AS DOUBLE)) AS BIGINT), n_cal))
        |SELECT q.n_cal, CAST(count(*) AS BIGINT) AS n_test, q.qhat_cents,
        |  CAST(sum(CASE WHEN ae <= qhat_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(sum(CASE WHEN ae <= qhat_cents THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS coverage,
        |  CAST(0.9 AS DOUBLE) AS target
        |FROM sc, q WHERE day >= DATE '1999-01-01'
        |GROUP BY 1, 3""".stripMargin,

    // q225: CUPED — exact-cents moments, n-scaled theta, quantized folds
    // for the per-arm means/variances
    "q225_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |ua AS (
        |  SELECT *, CASE WHEN CAST('0x' || substr(md5(user_id || ':exp1'), 1, 8) AS BIGINT) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm
        |  FROM u),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM ua),
        |st AS (
        |  SELECT n, sx,
        |    CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM mom),
        |adj AS (
        |  SELECT ua.arm, CAST(ua.y AS DOUBLE) AS yd,
        |    CAST(ua.y AS DOUBLE) - st.theta * (CAST(ua.x AS DOUBLE) - st.xbar) AS yadj,
        |    st.theta
        |  FROM ua, st),
        |aa AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS nu,
        |    CAST(CAST(sum(CAST(CAST(yd AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(yd * yd AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(CAST(yadj AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sa,
        |    CAST(CAST(sum(CAST(CAST(yadj * yadj AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS saa,
        |    min(theta) AS theta
        |  FROM adj GROUP BY 1)
        |SELECT arm, nu AS n_users,
        |  sy / CAST(nu AS DOUBLE) AS mean_y,
        |  sa / CAST(nu AS DOUBLE) AS mean_y_adj,
        |  theta,
        |  syy / CAST(nu AS DOUBLE) - sy / CAST(nu AS DOUBLE) * (sy / CAST(nu AS DOUBLE)) AS var_y,
        |  saa / CAST(nu AS DOUBLE) - sa / CAST(nu AS DOUBLE) * (sa / CAST(nu AS DOUBLE)) AS var_y_adj,
        |  (saa / CAST(nu AS DOUBLE) - sa / CAST(nu AS DOUBLE) * (sa / CAST(nu AS DOUBLE)))
        |    / (syy / CAST(nu AS DOUBLE) - sy / CAST(nu AS DOUBLE) * (sy / CAST(nu AS DOUBLE))) AS var_ratio
        |FROM aa""".stripMargin,

    // q221: Theil-Sen — median pairwise slope by declarative rank (the
    // Spark side selects it two-phase); lower medians, //2 integer halving
    "q221_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |d AS (SELECT CAST(date_diff('day', DATE '1990-01-01', day) AS BIGINT) AS dn, x FROM daily),
        |p AS (
        |  SELECT a.dn * 100000 + b.dn AS pid,
        |    CAST(b.x - a.x AS DOUBLE) / CAST(b.dn - a.dn AS DOUBLE) AS slope
        |  FROM d a JOIN d b ON b.dn > a.dn),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p),
        |med AS (
        |  SELECT slope, n_pairs FROM
        |    (SELECT slope, row_number() OVER (ORDER BY slope, pid) AS rk FROM p), n
        |  WHERE rk = (n_pairs + 1) // 2),
        |r AS (
        |  SELECT d.dn, med.slope, med.n_pairs,
        |    CAST(d.x AS DOUBLE) - med.slope * CAST(d.dn AS DOUBLE) AS r
        |  FROM d, med),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS ndays FROM d)
        |SELECT n_pairs, slope AS slope_cents_per_day, r AS intercept_cents
        |FROM (SELECT *, row_number() OVER (ORDER BY r, dn) AS rr FROM r), nd
        |WHERE rr = (ndays + 1) // 2""".stripMargin,

    // q222: Kaplan-Meier — suffix-sum risk sets, product-limit as
    // exp(Sigma bridged ln), exact-0 pin when an event empties the risk set
    "q222_kaplan_meier" ->
      s"""WITH $survivalRiskCtes,
        |terms AS (
        |  SELECT t, d, c, n_risk,
        |    CASE WHEN d > 0 AND d < n_risk THEN
        |      CAST(CAST(CAST(CAST(ln(CAST(1.0 AS DOUBLE)
        |        - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS VARCHAR)
        |        AS DECIMAL(18,12)) AS VARCHAR) AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END AS lnq,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead
        |  FROM risk),
        |cum AS (
        |  SELECT t, d, c, n_risk,
        |    CAST(CAST(sum(lnq) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS lsum,
        |    max(dead) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
        |  FROM terms)
        |SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored,
        |  CASE WHEN z = 1 THEN CAST(0.0 AS DOUBLE)
        |       ELSE CAST(CAST(CAST(CAST(exp(lsum) AS VARCHAR) AS DECIMAL(18,12))
        |         AS VARCHAR) AS DOUBLE) END AS survival
        |FROM cum""".stripMargin,

    // q251: additive seasonal decomposition — trend one exact-long division
    // (centered 7-observed-day window), detrended a fixed tree, per-dow
    // means through the SIX-decimal fold (~1e8-cent magnitudes, §8.4 rule)
    "q251_seasonal_decomp" ->
      s"""WITH $seasonalDecompCtes
        |SELECT day, x, n_window, trend, dow, seasonal, residual
        |FROM res""".stripMargin,

    // q254: CUSUM on the seasonally adjusted residual — q251's CTEs shared
    // VERBATIM, then q196's running-sum/running-min algebra in the exact
    // decimal domain (residual enters quantized to 12 decimals; operand
    // precisions pinned — (6,0)·(24,12), S at (30,12) — so neither engine's
    // decimal promotion rounds anything); the alarm anchor is Σ|r|, the
    // residual series' own total absolute deviation
    "q254_seasonal_cusum" ->
      s"""WITH $seasonalDecompCtes,
        |tot AS (
        |  SELECT CAST(count(*) AS DECIMAL(6,0)) AS n,
        |    sum(CAST(CAST(residual AS VARCHAR) AS DECIMAL(24,12))) AS rt,
        |    CAST(sum(CAST(CAST(abs(residual) AS VARCHAR) AS DECIMAL(24,12)))
        |      AS DECIMAL(30,12)) AS ra
        |  FROM res),
        |dv AS (
        |  SELECT day, residual, n, ra,
        |    CAST(n * CAST(CAST(residual AS VARCHAR) AS DECIMAL(24,12)) - rt
        |      AS DECIMAL(38,12)) AS dev
        |  FROM res CROSS JOIN tot),
        |w1 AS (
        |  SELECT *, sum(dev) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS prefix
        |  FROM dv),
        |w2 AS (
        |  SELECT *, min(prefix) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS runmin
        |  FROM w1),
        |sfr AS (
        |  SELECT *, CAST(prefix - (CASE WHEN runmin < 0 THEN runmin
        |    ELSE CAST(0 AS DECIMAL(38,12)) END) AS DECIMAL(30,12)) AS s2
        |  FROM w2)
        |SELECT day, residual,
        |  CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_excess,
        |  s2 * CAST(10 AS DECIMAL(2,0)) > n * ra AS alarm
        |FROM sfr""".stripMargin,

    // q252: exact-substring dedup — both engines fingerprint every stride-1
    // 40-char window of the SAME normalized text with the SAME md5 prefix,
    // so the buckets are byte-identical by construction; all counts exact
    // ints. generate_series(1, n) is empty for n < 1 in DuckDB (ascending,
    // inclusive), so the len(t) >= 40 guard is belt-and-braces there but
    // load-bearing on the Spark side (sequence REVERSES below the start).
    "q252_substring_dedup" ->
      s"""WITH norm AS (SELECT doc_id, $normText AS t FROM documents),
        |wins AS (
        |  SELECT DISTINCT doc_id,
        |    substr(md5(substr(t, CAST(i AS INT), 40)), 1, 16) AS fp
        |  FROM norm,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 39)) AS i) AS u
        |  WHERE len(t) >= 40),
        |eligible AS (
        |  SELECT fp FROM wins GROUP BY fp HAVING count(*) BETWEEN 2 AND 100),
        |cand AS (SELECT doc_id, fp FROM wins JOIN eligible USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_windows
        |FROM cand a JOIN cand b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    // q322: per-source exact length percentiles — order statistic at rank
    // ceil(pct·n/100) under (n_chars, doc_id), all integers
    "q322_length_pcts" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        |  FROM d),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1),
        |t AS (
        |  SELECT source, n_docs, CAST(p.pct AS BIGINT) AS pct,
        |    (CAST(p.pct AS BIGINT) * n_docs + 99) // 100 AS rk
        |  FROM n CROSS JOIN (SELECT unnest([10, 25, 50, 75, 90]) AS pct) p)
        |SELECT t.source, t.pct, t.n_docs, r.n_chars AS value
        |FROM t JOIN r ON r.source = t.source AND r.rk = t.rk""".stripMargin,

    // q323: tokenizer fertility by language — q21's segmentations rolled up,
    // two divisions of exact longs
    "q323_fertility" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS b
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(w) AS BIGINT) AS word_tokens,
        |  CAST(sum(b) AS BIGINT) AS bpe_ish_tokens,
        |  CAST(sum(b) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(b) AS DOUBLE) AS chars_per_token
        |FROM d GROUP BY 1""".stripMargin,

    // q324: verified-pair similarity histogram — q17's pairs bucketed by
    // floor(jaccard·20) on the identical int/int division
    "q324_sim_histogram" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes,
         |docs3 AS (
         |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS grams FROM documents),
         |p AS (
         |  SELECT CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
         |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams)))
         |      AS jaccard
         |  FROM cand c
         |  JOIN docs3 x ON c.doc_a = x.doc_id
         |  JOIN docs3 y ON c.doc_b = y.doc_id
         |  WHERE x.lang = y.lang AND abs(x.n_chars - y.n_chars) <= 20
         |    AND CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
         |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) >= 0.5),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_total FROM p),
         |h AS (SELECT CAST(floor(jaccard * 20) AS BIGINT) AS bucket,
         |        CAST(count(*) AS BIGINT) AS n_pairs
         |      FROM p GROUP BY 1)
         |SELECT CAST(bucket AS DOUBLE) / 20 AS jaccard_lo, n_pairs, n_pairs_total,
         |  CAST(n_pairs AS DOUBLE) / CAST(n_pairs_total AS DOUBLE) AS share
         |FROM h CROSS JOIN tot""".stripMargin,

    // q325: quality->token budget curve — global (quality DESC, doc_id)
    // rank, floor-distribution deciles, exact token sums, one share division
    "q325_budget_curve" ->
      s"""WITH d AS (
         |  SELECT doc_id, ($qualityScoreSql) AS q,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_toks
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(n_toks) AS BIGINT) AS total_toks FROM d),
         |r AS (SELECT d.*, CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS rk
         |      FROM d),
         |t AS (SELECT ((rk - 1) * 10) // n + 1 AS tile, n_toks, total_toks
         |      FROM r CROSS JOIN n),
         |b AS (SELECT tile, total_toks, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n_toks) AS BIGINT) AS tile_tokens
         |      FROM t GROUP BY 1, 2)
         |SELECT CAST(tile AS BIGINT) AS tile, n_docs, tile_tokens,
         |  CAST(sum(tile_tokens) OVER (ORDER BY tile) AS BIGINT) AS cum_tokens,
         |  CAST(sum(tile_tokens) OVER (ORDER BY tile) AS DOUBLE)
         |    / CAST(total_toks AS DOUBLE) AS cum_token_share
         |FROM b""".stripMargin,

    // q326: IVF recall-vs-nprobe curve — q36's assignment chain + q25's
    // exact arm verbatim; one top-k arm per probe level, macro recall over
    // the fixed 20-query denominator
    "q326_ivf_nprobe" -> {
      val arms = Seq(1, 2, 4, 8).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe, CAST(3 AS BIGINT) AS k,
           |  CAST(20 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT)
           |   FROM (SELECT query_id, vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY query_id
           |             ORDER BY cosine DESC, vec_id ASC) AS rk
           |         FROM cand WHERE rn <= $np QUALIFY rk <= 3) t
           |   JOIN ex e ON t.query_id = e.query_id
           |     AND t.neighbor_id = e.neighbor_id) AS n_hits,
           |  CAST((SELECT count(*)
           |   FROM (SELECT query_id, vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY query_id
           |             ORDER BY cosine DESC, vec_id ASC) AS rk
           |         FROM cand WHERE rn <= $np QUALIFY rk <= 3) t
           |   JOIN ex e ON t.query_id = e.query_id
           |     AND t.neighbor_id = e.neighbor_id) AS DOUBLE)
           |    / CAST(60.0 AS DOUBLE) AS recall""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $scaledVecs,
         |c AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2
         |      FROM w WHERE vec_id < 16),
         |ac AS (SELECT w.vec_id, w.svec, w.norm2, c.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC,
         |             c.cent_id ASC) AS rn
         |       FROM w CROSS JOIN c),
         |asg AS (SELECT vec_id, svec, norm2, cent_id AS cell FROM ac WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2
         |      FROM w WHERE vec_id < 20),
         |route AS (SELECT q.query_id, q.qvec, q.qnorm2, c.cent_id,
         |            row_number() OVER (PARTITION BY q.query_id
         |              ORDER BY ${cosine("qvec", "cvec", "qnorm2", "cnorm2")} DESC,
         |                c.cent_id ASC) AS rn
         |          FROM q CROSS JOIN c),
         |ce AS (SELECT query_id, vec_id,
         |         ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |       FROM q, w WHERE query_id <> vec_id),
         |ex AS (SELECT query_id, vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, vec_id ASC) AS rk
         |       FROM ce QUALIFY rk <= 3),
         |cand AS (SELECT r.query_id, a.vec_id, r.rn,
         |           ${cosine("r.qvec", "a.svec", "r.qnorm2", "a.norm2")} AS cosine
         |         FROM route r JOIN asg a ON r.cent_id = a.cell
         |           AND r.query_id <> a.vec_id)
         |$arms""".stripMargin
    },

    // q327: multi-probe sign-LSH recall — ring 0 = own bucket, ring 1 adds
    // the four Hamming-1 buckets via xor; both rings scored against the
    // exact arm with the fixed 20-query denominator
    "q327_multiprobe" -> {
      def ringArm(ring: Int, candCte: String): String =
        s"""SELECT CAST($ring AS BIGINT) AS probe_ring, CAST(3 AS BIGINT) AS k,
           |  CAST(20 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT)
           |   FROM (SELECT query_id, vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY query_id
           |             ORDER BY cosine DESC, vec_id ASC) AS rk
           |         FROM $candCte QUALIFY rk <= 3) t
           |   JOIN ex e ON t.query_id = e.query_id
           |     AND t.neighbor_id = e.neighbor_id) AS n_hits,
           |  CAST((SELECT count(*)
           |   FROM (SELECT query_id, vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY query_id
           |             ORDER BY cosine DESC, vec_id ASC) AS rk
           |         FROM $candCte QUALIFY rk <= 3) t
           |   JOIN ex e ON t.query_id = e.query_id
           |     AND t.neighbor_id = e.neighbor_id) AS DOUBLE)
           |    / CAST(60.0 AS DOUBLE) AS recall""".stripMargin
      s"""WITH $scaledVecs,
         |vb AS (SELECT vec_id, svec, norm2, ${signBucket("svec")} AS bucket FROM w),
         |qb AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2,
         |         bucket AS qbucket
         |       FROM vb WHERE vec_id < 20),
         |ex0 AS (SELECT q.query_id, w.vec_id,
         |          ${cosine("q.qvec", "w.svec", "q.qnorm2", "w.norm2")} AS cosine
         |        FROM qb q, w WHERE q.query_id <> w.vec_id),
         |ex AS (SELECT query_id, vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, vec_id ASC) AS rk
         |       FROM ex0 QUALIFY rk <= 3),
         |c0 AS (SELECT q.query_id, v.vec_id,
         |         ${cosine("q.qvec", "v.svec", "q.qnorm2", "v.norm2")} AS cosine
         |       FROM qb q JOIN vb v ON q.qbucket = v.bucket
         |         AND q.query_id <> v.vec_id),
         |pr AS (SELECT query_id, qvec, qnorm2,
         |         unnest([qbucket, xor(qbucket, 1), xor(qbucket, 2),
         |                 xor(qbucket, 4), xor(qbucket, 8)]) AS bucket
         |       FROM qb),
         |c1 AS (SELECT p.query_id, v.vec_id,
         |         ${cosine("p.qvec", "v.svec", "p.qnorm2", "v.norm2")} AS cosine
         |       FROM pr p JOIN vb v ON p.bucket = v.bucket
         |         AND p.query_id <> v.vec_id)
         |${ringArm(0, "c0")}
         |UNION ALL
         |${ringArm(1, "c1")}""".stripMargin
    },

    // q328: eval-leak hotspots — q75's gram CTEs, inner join on the gram,
    // top-20 by (n_docs DESC, gram); per-doc grams are distinct so count(*)
    // is the distinct-doc count
    "q328_leak_hotspots" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_eval,
        |    CASE WHEN len(toks) >= 5 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
        |    ELSE [] END AS grams
        |  FROM d),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_eval),
        |t AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT is_eval)
        |SELECT t.gram, CAST(count(*) AS BIGINT) AS n_docs
        |FROM t JOIN e ON t.gram = e.gram
        |GROUP BY 1
        |ORDER BY n_docs DESC, t.gram
        |LIMIT 20""".stripMargin,

    // q329: near-dup family profile — q55's labels joined to the corpus,
    // one aggregate per multi-member cluster; rep id IS the cluster id
    "q329_family_profile" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |t AS (
         |  SELECT l.cluster_id, d.source, d.lang,
         |    CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS BIGINT) AS n_toks
         |  FROM lab l JOIN documents d ON l.doc_id = d.doc_id)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |  count(DISTINCT source) > 1 AS is_cross_source
         |FROM t GROUP BY 1
         |HAVING count(*) >= 2""".stripMargin,

    // q331: passage-grain decontamination — q75's eval gram set, q86's
    // passage unit; every gram assigned to the passage its START token
    // falls in ((i-1) div 8 on the 1-based start), distinct per
    // (doc, passage), so doc-grain flags reconcile as any(passage flags).
    // q346 is the STREAMING producer of the identical verdict table and
    // shares the oracle VERBATIM (10th parity pair)
    "q331_passage_decontam" -> passageDecontamOracle,
    "q346_passage_stream" -> passageDecontamOracle,

    // q332: domain-mix reweighting — independence-product target over the
    // observed (source, lang) cells; marginal shares are IEEE divisions of
    // exact BIGINTs, the product is 14-decimal-bridged (q193 discipline)
    // and the normalizer folds as an exact DECIMAL(28,14) sum; budget is
    // the exact integer half of the corpus token total. q337 is the
    // STREAMING producer of the identical solution and shares the oracle
    // VERBATIM (8th parity pair); q336 embeds it as the sampler's spine
    "q332_domain_mix" -> domainMixOracle,
    "q337_mix_stream" -> domainMixOracle,

    // q338: per-source contamination profile — q75's verdicts (shared CTE
    // spine) rolled to feed grain with exact token mass; the triage table
    // that decides whether a feed gets dropped upstream. q340 is the
    // STREAMING producer of the identical profile and shares the oracle
    // VERBATIM (9th parity pair)
    "q338_source_contam" -> sourceContamOracle,
    "q340_source_contam_stream" -> sourceContamOracle,

    // q336: mix sampler — q332's solution realized by content-addressed
    // permille draw; rate = min(1000, required·1000 div available) exact,
    // with the zero-available cell guarded to the keep-everything cap
    // (rate 1000) instead of a NULL no-draw (r16 ADVICE)
    "q336_mix_sample" ->
      s"""WITH mix AS ($domainMixOracle),
         |d AS (
         |  SELECT source, lang,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nt,
         |    CAST('0x' || substr(md5(doc_id || ':mix_v1'), 1, 8) AS BIGINT)
         |      % 1000 AS h
         |  FROM documents),
         |r AS (
         |  SELECT source, lang, required_tokens,
         |    CASE WHEN avail_tokens > 0
         |         THEN least(1000, (required_tokens * 1000) // avail_tokens)
         |         ELSE 1000 END AS rate_permille
         |  FROM mix),
         |sm AS (
         |  SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_sampled_docs,
         |    CAST(sum(d.nt) AS BIGINT) AS sampled_tokens
         |  FROM d JOIN r USING (source, lang)
         |  WHERE d.h < r.rate_permille GROUP BY 1, 2)
         |SELECT r.source, r.lang, CAST(r.rate_permille AS BIGINT) AS rate_permille,
         |  CAST(coalesce(sm.n_sampled_docs, 0) AS BIGINT) AS n_sampled_docs,
         |  CAST(coalesce(sm.sampled_tokens, 0) AS BIGINT) AS sampled_tokens,
         |  r.required_tokens,
         |  CASE WHEN r.required_tokens > 0
         |       THEN CAST(coalesce(sm.sampled_tokens, 0) AS DOUBLE)
         |         / CAST(r.required_tokens AS DOUBLE) END AS achieved_ratio
         |FROM r LEFT JOIN sm USING (source, lang)""".stripMargin,


    // q339: epoch-multiplicity sampler — the oversampling half of the
    // DoReMi realization: k = required div available full passes, the
    // remainder by content-addressed permille ((required mod avail)·1000
    // div avail, < 1000 by construction); zero-avail cells ride the q336
    // guard shape (epochs 0, permille 1000). All exact integers until the
    // one achieved_ratio division. q345 aggregates this oracle verbatim
    "q339_mix_epochs" -> mixEpochsOracle,

    // q344: decontaminated domain mix — the SAME solver body over the
    // clean trainable pool (q75's verdict CTE filters the census); the
    // q332-vs-q344 diff IS the contamination correction per cell
    "q344_clean_mix" -> cleanDomainMixOracle,

    // q347: trainable-pool mix — the SAME solver body over the fully
    // curated pool (q55 representatives ∩ q195 quality keeps ∩ q75 clears):
    // the census the training job's sampler actually sees
    "q347_pool_mix" -> poolMixOracle,

    // q345: data-constrained epoch accounting — one-row fresh-vs-repeat
    // ledger over q339's plan (oversampled cells touch their whole
    // availability; undersampled ones only their remainder draw)
    "q345_epoch_accounting" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(CASE WHEN epochs >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cells_oversampled,
         |  CAST(sum(required_tokens) AS BIGINT) AS total_required_tokens,
         |  CAST(sum(drawn_tokens) AS BIGINT) AS total_drawn_tokens,
         |  CAST(sum(CASE WHEN epochs >= 1 THEN avail_tokens
         |           ELSE remainder_tokens END) AS BIGINT) AS unique_tokens,
         |  CAST(sum(drawn_tokens) - sum(CASE WHEN epochs >= 1 THEN avail_tokens
         |           ELSE remainder_tokens END) AS BIGINT) AS repeated_tokens,
         |  CASE WHEN sum(drawn_tokens) > 0
         |       THEN CAST(sum(drawn_tokens) - sum(CASE WHEN epochs >= 1
         |             THEN avail_tokens ELSE remainder_tokens END) AS DOUBLE)
         |         / CAST(sum(drawn_tokens) AS DOUBLE) END AS repeat_share
         |FROM ($mixEpochsOracle) e""".stripMargin,

    // q333: near-dup family drift — q55's labels (singletons included)
    // sliced by q319's crawl batches; a family's founding batch is the min
    // over members, and each batch reports founders vs docs inflating
    // families founded earlier
    "q333_family_drift" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |t AS (
         |  SELECT doc_id, cluster_id,
         |    CAST('0x' || substr(md5(doc_id || ':crawl_v1'), 1, 8) AS BIGINT)
         |      % 1000 % 8 AS batch
         |  FROM lab),
         |f AS (SELECT cluster_id, min(batch) AS founded_batch FROM t GROUP BY 1),
         |pb AS (
         |  SELECT t.batch, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT CASE WHEN t.batch = f.founded_batch
         |      THEN t.cluster_id END) AS BIGINT) AS n_new_families,
         |    CAST(sum(CASE WHEN t.batch = f.founded_batch THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_docs_new,
         |    CAST(sum(CASE WHEN t.batch > f.founded_batch THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_docs_existing
         |  FROM t JOIN f USING (cluster_id) GROUP BY 1)
         |SELECT batch, n_docs, n_new_families, n_docs_new, n_docs_existing,
         |  CAST(n_docs_existing AS DOUBLE) / CAST(n_docs AS DOUBLE)
         |    AS existing_share,
         |  CAST(sum(n_new_families) OVER (ORDER BY batch) AS BIGINT)
         |    AS cum_families
         |FROM pb""".stripMargin,

    // q334: decontamination token-savings — q331's passage verdicts rolled
    // into the two-policy readout (drop the doc vs excise the passage);
    // flagged-passage token spans pro-rate the tail as least(8, len − 8p);
    // exact BIGINTs until the one rescued-share division. CTE spine shared
    // with q341 (per-source savings) and q342 (quality×contamination);
    // the whole oracle is one arm of q351's release card
    "q334_decontam_savings" -> decontamSavingsOracle,

    // q341: per-source decontamination savings — q334's two-policy
    // arithmetic at feed grain on the SAME verdict spine; sources with no
    // flagged docs keep zero removals via the left spine
    "q341_savings_by_source" ->
      s"""WITH $passageVerdictCtes,
        |df AS (SELECT doc_id, bool_or(is_flagged) AS doc_flagged
        |       FROM hits GROUP BY 1),
        |t AS (SELECT tr.doc_id, tr.source, tr.n_toks,
        |        coalesce(df.doc_flagged, false) AS doc_flagged
        |      FROM tr LEFT JOIN df USING (doc_id)),
        |a1 AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |    CAST(sum(CASE WHEN doc_flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
        |    CAST(sum(CASE WHEN doc_flagged THEN 0 ELSE n_toks END) AS BIGINT)
        |      AS retained_doc_grain
        |  FROM t GROUP BY 1),
        |a2 AS (
        |  SELECT tr.source,
        |    CAST(sum(least(8, tr.n_toks - h.passage * 8)) AS BIGINT) AS removed_passage
        |  FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged GROUP BY 1)
        |SELECT a1.source, n_docs, total_tokens, n_docs_flagged, retained_doc_grain,
        |  total_tokens - coalesce(removed_passage, 0) AS retained_passage_grain,
        |  CAST(total_tokens - coalesce(removed_passage, 0) - retained_doc_grain AS DOUBLE)
        |    / CAST(total_tokens AS DOUBLE) AS tokens_rescued_share
        |FROM a1 LEFT JOIN a2 ON a1.source = a2.source""".stripMargin,

    // q342: quality × contamination joint readout — q325's exact
    // floor-distribution deciles over the NON-EVAL corpus joined to q331's
    // passage verdicts; token masses exact BIGINTs, two divisions per tile
    "q342_contam_by_quality" ->
      s"""WITH $passageVerdictCtes,
        |q AS (
        |  SELECT doc_id, ($qualityScoreSql) AS q
        |  FROM documents
        |  WHERE CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT)
        |    % 1000 >= 200),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |r AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS rk
        |      FROM q),
        |ti AS (SELECT doc_id, ((rk - 1) * 10) // n + 1 AS tile FROM r CROSS JOIN nn),
        |df AS (SELECT doc_id, bool_or(is_flagged) AS doc_flagged
        |       FROM hits GROUP BY 1),
        |rm AS (SELECT h.doc_id,
        |         CAST(sum(least(8, tr.n_toks - h.passage * 8)) AS BIGINT) AS removed
        |       FROM hits h JOIN tr USING (doc_id) WHERE h.is_flagged GROUP BY 1),
        |pd2 AS (SELECT tr.doc_id, tr.n_toks, ti.tile,
        |          coalesce(df.doc_flagged, false) AS fl,
        |          coalesce(rm.removed, 0) AS removed
        |        FROM tr JOIN ti USING (doc_id)
        |        LEFT JOIN df USING (doc_id) LEFT JOIN rm USING (doc_id))
        |SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
        |  CAST(sum(CASE WHEN fl THEN n_toks ELSE 0 END) AS BIGINT) AS flagged_tokens,
        |  CAST(sum(CASE WHEN fl THEN n_toks ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(n_toks) AS DOUBLE) AS flagged_token_share,
        |  CAST(sum(removed) AS BIGINT) AS removed_passage_tokens,
        |  CAST(sum(CASE WHEN fl THEN n_toks ELSE 0 END) - sum(removed) AS DOUBLE)
        |    / CAST(sum(n_toks) AS DOUBLE) AS tokens_rescued_share
        |FROM pd2 GROUP BY 1""".stripMargin,

    // q348: eval-suite saturation — the reverse of q75: how much of the
    // BENCHMARK's distinct gram set appears in training (leaked share +
    // total leak instances); the rotate-the-suite vs scrub-the-corpus
    // call, and one arm of q351's release card
    "q348_eval_saturation" -> evalSaturationOracle,

    // q349: burned benchmark items — per EVAL document, the share of its
    // grams found anywhere in training; fully-leaked items (is_burned)
    // measure memorization, not ability, and get retired from the suite.
    // q350 is the STREAMING producer of the identical table and shares the
    // oracle VERBATIM (11th parity pair)
    "q349_burned_items" -> burnedItemsOracle,
    "q350_burn_stream" -> burnedItemsOracle,

    // q351: release-readiness card — one row composing seven already-gated
    // audits (volume, dedup savings, contamination + rescue, benchmark
    // saturation, burned items, trainable-pool mix, and r17's semantic
    // channel); each arm is the corresponding oracle val verbatim as a
    // derived table
    "q351_release_card" ->
      s"""SELECT c.n_docs, c.raw_tokens, d.n_reps,
         |  d.token_savings AS dedup_token_savings,
         |  s.n_docs AS n_train_docs, s.n_docs_flagged,
         |  CAST(s.n_docs_flagged AS DOUBLE) / CAST(s.n_docs AS DOUBLE)
         |    AS contamination_rate,
         |  s.tokens_rescued_share, g.leaked_gram_share,
         |  b.n_burned_items, p.pool_tokens, p.mix_infeasible_cells,
         |  m.n_semantic_matches, m.n_paraphrase_leaks,
         |  gp.n_wholesale_docs, gp.graduated_retained_tokens,
         |  g4.graduated_pool_tokens, a4.n_post_surgery_leaks
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
         |      AS raw_tokens
         |  FROM documents) c
         |CROSS JOIN (SELECT n_reps, token_savings
         |            FROM ($dedupSavingsOracle) x) d
         |CROSS JOIN (SELECT n_docs, n_docs_flagged, tokens_rescued_share
         |            FROM ($decontamSavingsOracle) y) s
         |CROSS JOIN (SELECT leaked_gram_share FROM ($evalSaturationOracle) z) g
         |CROSS JOIN (SELECT CAST(sum(CASE WHEN is_burned THEN 1 ELSE 0 END) AS BIGINT)
         |              AS n_burned_items
         |            FROM ($burnedItemsOracle) w) b
         |CROSS JOIN (SELECT CAST(sum(avail_tokens) AS BIGINT) AS pool_tokens,
         |              CAST(sum(CASE WHEN NOT feasible THEN 1 ELSE 0 END) AS BIGINT)
         |                AS mix_infeasible_cells
         |            FROM ($poolMixOracle) v) p
         |CROSS JOIN (SELECT
         |              CAST(sum(CASE WHEN is_semantic_match THEN 1 ELSE 0 END) AS BIGINT)
         |                AS n_semantic_matches,
         |              CAST(sum(CASE WHEN paraphrase_leak THEN 1 ELSE 0 END) AS BIGINT)
         |                AS n_paraphrase_leaks
         |            FROM ($semanticDecontamOracle) u) m
         |CROSS JOIN (SELECT n_wholesale AS n_wholesale_docs,
         |              retained_graduated AS graduated_retained_tokens
         |            FROM ($graduatedPolicyOracle) w2) gp
         |CROSS JOIN (SELECT CAST(sum(avail_tokens) AS BIGINT)
         |              AS graduated_pool_tokens
         |            FROM ($graduatedPoolMixOracle) v4) g4
         |CROSS JOIN (SELECT CAST(sum(n_hits_post) AS BIGINT)
         |              AS n_post_surgery_leaks
         |            FROM ($excisionAuditOracle) u4) a4""".stripMargin,

    // q352: benchmark burn drift — when each eval item died, by crawl
    // batch: a gram arrives at its min train batch, an item burns at the
    // max arrival over its grams (only if every gram leaks); static 0..7
    // spine so zero-burn batches surface (q315 shape)
    "q352_burn_drift" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
        |    CAST('0x' || substr(md5(doc_id || ':crawl_v1'), 1, 8) AS BIGINT) % 1000 % 8 AS batch,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tgr AS (
        |  SELECT batch, unnest(CASE WHEN len(toks) >= 5 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
        |    ELSE [] END) AS gram
        |  FROM d WHERE NOT is_eval),
        |ga AS (SELECT gram, min(batch) AS arrived FROM tgr GROUP BY 1),
        |eg AS (
        |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
        |    ELSE [] END) AS gram
        |  FROM d WHERE is_eval),
        |pi AS (
        |  SELECT eg.doc_id, count(*) AS n_grams, count(ga.arrived) AS n_leaked,
        |    max(ga.arrived) AS burn_batch
        |  FROM eg LEFT JOIN ga USING (gram) GROUP BY 1),
        |burned AS (SELECT burn_batch AS batch, CAST(count(*) AS BIGINT) AS n_burned
        |           FROM pi WHERE n_grams = n_leaked GROUP BY 1),
        |ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM d WHERE is_eval),
        |sp AS (SELECT unnest(range(0, 8)) AS batch)
        |SELECT CAST(sp.batch AS BIGINT) AS batch,
        |  CAST(coalesce(b.n_burned, 0) AS BIGINT) AS n_burned,
        |  CAST(sum(coalesce(b.n_burned, 0)) OVER (ORDER BY sp.batch) AS BIGINT)
        |    AS cum_burned,
        |  ni.n_items,
        |  CAST(sum(coalesce(b.n_burned, 0)) OVER (ORDER BY sp.batch) AS DOUBLE)
        |    / CAST(ni.n_items AS DOUBLE) AS cum_burned_share
        |FROM sp LEFT JOIN burned b USING (batch) CROSS JOIN ni""".stripMargin,

    // q353: pool-gate ablation — each curation gate's marginal token price
    // (the pool with that one gate removed, vs the full pool); removing
    // the decontam gate re-admits contaminated TRAINING docs, never eval;
    // ONE flag pass + a single 8-value aggregate in both engines
    "q353_pool_ablation" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |v AS ($decontaminateOracle),
         |$qualityScoreCtes,
         |f AS (
         |  SELECT CAST(len(regexp_split_to_array(trim(doc.text), '\\s+')) AS BIGINT) AS nt,
         |    (lab.doc_id = lab.cluster_id) AS is_rep,
         |    coalesce(NOT v.is_contaminated, false) AS is_clean,
         |    (q.zq >= 0) AS keep,
         |    CAST('0x' || substr(md5(doc.doc_id || ':eval_v1'), 1, 8) AS BIGINT)
         |      % 1000 >= 200 AS is_train
         |  FROM documents doc
         |  JOIN lab ON doc.doc_id = lab.doc_id
         |  LEFT JOIN v ON doc.doc_id = v.doc_id
         |  JOIN qscore q ON doc.doc_id = q.doc_id),
         |m AS (SELECT
         |  CAST(sum(CASE WHEN is_rep AND is_clean AND keep THEN 1 ELSE 0 END) AS BIGINT) AS full_docs,
         |  CAST(sum(CASE WHEN is_rep AND is_clean AND keep THEN nt ELSE 0 END) AS BIGINT) AS full_toks,
         |  CAST(sum(CASE WHEN is_clean AND keep THEN 1 ELSE 0 END) AS BIGINT) AS nodedup_docs,
         |  CAST(sum(CASE WHEN is_clean AND keep THEN nt ELSE 0 END) AS BIGINT) AS nodedup_toks,
         |  CAST(sum(CASE WHEN is_rep AND is_clean THEN 1 ELSE 0 END) AS BIGINT) AS noquality_docs,
         |  CAST(sum(CASE WHEN is_rep AND is_clean THEN nt ELSE 0 END) AS BIGINT) AS noquality_toks,
         |  CAST(sum(CASE WHEN is_rep AND is_train AND keep THEN 1 ELSE 0 END) AS BIGINT) AS nodecontam_docs,
         |  CAST(sum(CASE WHEN is_rep AND is_train AND keep THEN nt ELSE 0 END) AS BIGINT) AS nodecontam_toks
         | FROM f)
         |SELECT 'none' AS gate_removed, full_docs AS n_docs, full_toks AS pool_tokens,
         |  CAST(0 AS BIGINT) AS extra_tokens,
         |  CASE WHEN full_toks > 0 THEN CAST(0 AS DOUBLE) END AS extra_share
         |FROM m
         |UNION ALL SELECT 'dedup', nodedup_docs, nodedup_toks,
         |  nodedup_toks - full_toks,
         |  CASE WHEN full_toks > 0 THEN CAST(nodedup_toks - full_toks AS DOUBLE)
         |    / CAST(full_toks AS DOUBLE) END FROM m
         |UNION ALL SELECT 'quality', noquality_docs, noquality_toks,
         |  noquality_toks - full_toks,
         |  CASE WHEN full_toks > 0 THEN CAST(noquality_toks - full_toks AS DOUBLE)
         |    / CAST(full_toks AS DOUBLE) END FROM m
         |UNION ALL SELECT 'decontam', nodecontam_docs, nodecontam_toks,
         |  nodecontam_toks - full_toks,
         |  CASE WHEN full_toks > 0 THEN CAST(nodecontam_toks - full_toks AS DOUBLE)
         |    / CAST(full_toks AS DOUBLE) END FROM m""".stripMargin,

    // q354: semantic decontamination — the third leak channel: each eval
    // item's nearest TRAINING doc by exact cosine (q25's integer-scaled
    // contract, ties to lowest id), the τ=0.4 semantic-match flag
    // (calibrated to the synthetic 64-dim geometry — documented), and
    // the paraphrase-leak verdict (match whose neighbor the gram filter
    // cleared — what n-gram decontamination structurally cannot see)
    "q354_semantic_decontam" -> semanticDecontamOracle,

    // q355: streaming semantic-decontamination monitor — q354's audit live
    // over an arriving training corpus; state = one running top-1 per eval
    // item; oracle SHARED VERBATIM with q354 (12th batch/stream parity pair)
    "q355_semantic_stream" -> semanticDecontamOracle,

    // q356: semantic decontamination on the IVF index (nprobe=1) beside the
    // exact arm — per eval item: both NNs, whether the index recalled the
    // true neighbor, and whether the cheap verdict agrees; the exact arm is
    // embedded VERBATIM so the comparison can never drift from q354
    "q356_semantic_ivf" ->
      s"""WITH $scaledVecs,
         |c AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
         |ac AS (SELECT w.vec_id, w.svec, w.norm2, c.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, c.cent_id ASC) AS rn
         |       FROM w CROSS JOIN c),
         |asg AS (SELECT vec_id, svec, norm2, cent_id AS cell FROM ac WHERE rn = 1),
         |q AS (SELECT vec_id AS eval_id, svec AS qvec, norm2 AS qnorm2, cell AS qcell
         |      FROM asg
         |      WHERE CAST('0x' || substr(md5(vec_id || ':eval_v1'), 1, 8) AS BIGINT)
         |        % 1000 < 200),
         |t AS (SELECT vec_id, svec, norm2, cell FROM asg
         |      WHERE CAST('0x' || substr(md5(vec_id || ':eval_v1'), 1, 8) AS BIGINT)
         |        % 1000 >= 200),
         |cand AS (SELECT eval_id, vec_id,
         |           ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |         FROM q JOIN t ON qcell = cell),
         |inn AS (SELECT eval_id, vec_id AS ivf_nn_id, cosine AS ivf_cosine,
         |          row_number() OVER (PARTITION BY eval_id
         |            ORDER BY cosine DESC, vec_id ASC) AS rk
         |        FROM cand QUALIFY rk = 1),
         |ex AS ($semanticDecontamOracle)
         |SELECT ex.doc_id, ex.nn_train_id AS exact_nn_id,
         |  ex.cosine AS exact_cosine, ex.is_semantic_match AS exact_match,
         |  inn.ivf_nn_id, inn.ivf_cosine,
         |  coalesce(inn.ivf_nn_id = ex.nn_train_id, false) AS nn_recalled,
         |  coalesce(inn.ivf_cosine >= 0.4, false) = ex.is_semantic_match AS verdict_agrees
         |FROM ex LEFT JOIN inn ON ex.doc_id = inn.eval_id""".stripMargin,

    // q357: semantic leak by source — q354's verdicts rolled to the feed
    // that supplied each eval item's NN (q338's drop-the-feed triage for
    // the paraphrase channel); static source spine so zero-hit feeds
    // surface; exact arm embedded VERBATIM
    "q357_semantic_by_source" ->
      s"""WITH ex AS ($semanticDecontamOracle),
         |a AS (SELECT d.source,
         |        CAST(count(DISTINCT ex.nn_train_id) AS BIGINT) AS n_nn_docs,
         |        CAST(count(*) AS BIGINT) AS n_eval_hits,
         |        CAST(sum(CASE WHEN ex.is_semantic_match THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_semantic_matches,
         |        CAST(sum(CASE WHEN ex.paraphrase_leak THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_paraphrase_leaks
         |      FROM ex JOIN documents d ON ex.nn_train_id = d.doc_id
         |      GROUP BY 1)
         |SELECT s.source,
         |  CAST(coalesce(a.n_nn_docs, 0) AS BIGINT) AS n_nn_docs,
         |  CAST(coalesce(a.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
         |  CAST(coalesce(a.n_semantic_matches, 0) AS BIGINT) AS n_semantic_matches,
         |  CAST(coalesce(a.n_paraphrase_leaks, 0) AS BIGINT) AS n_paraphrase_leaks,
         |  CASE WHEN coalesce(a.n_eval_hits, 0) > 0
         |    THEN CAST(a.n_paraphrase_leaks AS DOUBLE) / CAST(a.n_eval_hits AS DOUBLE)
         |  END AS paraphrase_share
         |FROM (SELECT DISTINCT source FROM documents) s
         |LEFT JOIN a USING (source)""".stripMargin,

    // q358: leak-span severity — q75's verdicts plus the longest run of
    // CONSECUTIVE leaked gram starts (gaps-and-islands on hit positions),
    // in grams and tokens (run + n−1); totals ride the q75 oracle verbatim
    "q358_leak_spans" -> leakSpansOracle,

    // q359: leak-severity policy profile — q358 bucketed into the four
    // policy classes (clean/quote/passage/wholesale) with exact token mass
    // and corpus share; static 4-row spine; q358's oracle embedded VERBATIM;
    // SHARED VERBATIM with q367, the streaming severity monitor (the 13th
    // batch/stream parity pair)
    "q359_leak_severity" -> leakSeverityOracle,
    "q367_severity_stream" -> leakSeverityOracle,

    // q364: graduated trainable pool — poolMix's gates with the severity-
    // graduated decontamination remedy composed in (quote-class docs enter
    // whole, passage-class enter post-excision, wholesale drops); the SAME
    // solver body, alpha-token census
    "q364_graduated_pool" -> graduatedPoolMixOracle,

    // q365: semantic decontamination against an external eval relation —
    // the embedding channel's decontaminateAgainst, gated through the
    // suite_v2 hash-slice instantiation (the q83 convention)
    "q365_semantic_external" -> semanticExternalOracle,

    // q366: widened-cut excision arm — q334's residual-gram caveat turned
    // into a checked guarantee (every matching gram's full span excised;
    // exact interval-union arithmetic)
    "q366_widened_savings" -> widenedSavingsOracle,

    // q368: per-source graduated savings — q360's three policy arms at the
    // feed grain, off the SAME graduated-verdict spine (rows sum to q360)
    "q368_graduated_by_source" -> graduatedBySourceOracle,

    // q369: release-card diff across corpus versions — V1 (raw) vs q101's
    // refreshed V2 through relation-parameterized card arms, plus the
    // exact delta row a release review reads
    "q369_release_diff" -> releaseDiffOracle,

    // q370: graduated-mix epoch sampler — q339's executor over q364's
    // graduated pool, drawing from the SAME per-doc frame the solver
    // priced; the epoch tail SHARED VERBATIM with q339's oracle
    "q370_graduated_sample" -> graduatedMixSampleOracle,

    // q371: streaming widened-cut savings — q366's three-policy row live
    // (the 14th batch/stream parity pair, stateless like q367); oracle
    // SHARED VERBATIM with q366
    "q371_widened_stream" -> widenedSavingsOracle,

    // q373: the excised corpus MATERIALIZED — per training doc, the token
    // stream with every widened-cut span removed, as ' | '-joined segments,
    // plus the exact kept/removed ledger; islands chain SHARED VERBATIM
    // with q366/q371
    "q373_excised_corpus" -> excisedCorpusOracle,

    // q375: the graduated corpus materialized — q360's keep/excise/drop
    // policy applied per doc; the card's ledger and the shipped corpus
    // reconcile exactly
    "q375_graduated_corpus" -> graduatedCorpusOracle,

    // q374: the excision audit — q75's detector re-run over q373's output;
    // the zero-leak guarantee as an oracle-gated corpus-wide fact
    "q374_excision_audit" -> excisionAuditOracle,

    // q372: graduated epoch accounting — q345's fresh-vs-repeat ledger over
    // q370's plan (the epoch cost of curation); q345's fold verbatim
    "q372_graduated_epochs" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(CASE WHEN epochs >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cells_oversampled,
         |  CAST(sum(required_tokens) AS BIGINT) AS total_required_tokens,
         |  CAST(sum(drawn_tokens) AS BIGINT) AS total_drawn_tokens,
         |  CAST(sum(CASE WHEN epochs >= 1 THEN avail_tokens
         |           ELSE remainder_tokens END) AS BIGINT) AS unique_tokens,
         |  CAST(sum(drawn_tokens) - sum(CASE WHEN epochs >= 1 THEN avail_tokens
         |           ELSE remainder_tokens END) AS BIGINT) AS repeated_tokens,
         |  CASE WHEN sum(drawn_tokens) > 0
         |       THEN CAST(sum(drawn_tokens) - sum(CASE WHEN epochs >= 1
         |             THEN avail_tokens ELSE remainder_tokens END) AS DOUBLE)
         |         / CAST(sum(drawn_tokens) AS DOUBLE) END AS repeat_share
         |FROM ($graduatedMixSampleOracle) e""".stripMargin,

    // q360: graduated decontamination policy — keep quotes, excise flagged
    // passages of passage-class docs, drop wholesale docs; laid beside
    // q334's two blunt arms on the same verdicts (q358 + passage oracles
    // embedded VERBATIM, q334's min(w, len−w·p) span arithmetic)
    "q360_graduated_policy" -> graduatedPolicyOracle,

    // q361: leak severity by source — q359's classes at the feed grain
    // (the q338/q357 triage pattern): which feeds quote benchmarks vs
    // republish them; q358's oracle embedded VERBATIM
    "q361_severity_by_source" ->
      s"""WITH ls AS ($leakSpansOracle),
         |d AS (SELECT doc_id, source,
         |        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |          AS n_toks
         |      FROM documents),
         |j AS (SELECT d.source, d.n_toks,
         |        ${severityCase("ls.longest_run_grams")} AS sev
         |      FROM ls JOIN d USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN sev = 'quote' THEN 1 ELSE 0 END) AS BIGINT) AS n_quote,
         |  CAST(sum(CASE WHEN sev = 'passage' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_passage_class,
         |  CAST(sum(CASE WHEN sev = 'wholesale' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_wholesale,
         |  CAST(sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END)
         |    AS BIGINT) AS wholesale_tokens
         |FROM j
         |GROUP BY 1""".stripMargin,

    // q363: rare-gram decontamination — q75's verdict with the boilerplate
    // exemption (strict = hits whose training df ≤ 1 only), both verdicts
    // side by side; q75's oracle embedded VERBATIM
    "q363_rare_gram_decontam" ->
      s"""WITH v AS ($decontaminateOracle),
         |d AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(doc_id || ':eval_v1'), 1, 8) AS BIGINT) % 1000 < 200 AS is_eval,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents),
         |e AS (
         |  SELECT DISTINCT unnest(CASE WHEN len(toks) >= 5 THEN
         |      list_distinct(list_transform(range(1, len(toks) - 3),
         |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
         |    ELSE [] END) AS gram
         |  FROM d WHERE is_eval),
         |tg AS (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
         |      list_distinct(list_transform(range(1, len(toks) - 3),
         |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
         |    ELSE [] END) AS gram
         |  FROM d WHERE NOT is_eval),
         |df AS (SELECT gram, count(*) AS df FROM tg GROUP BY 1),
         |rare AS (SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_rare_hits
         |         FROM tg JOIN e USING (gram) JOIN df USING (gram)
         |         WHERE df.df <= 1 GROUP BY 1)
         |SELECT v.doc_id, v.n_grams, v.n_hits,
         |  CAST(coalesce(rare.n_rare_hits, 0) AS BIGINT) AS n_rare_hits,
         |  v.is_contaminated,
         |  coalesce(rare.n_rare_hits, 0) > 0 AS is_contaminated_strict
         |FROM v LEFT JOIN rare USING (doc_id)""".stripMargin,

    // q362: severity arrival drift — q352's crawl-batch axis applied to
    // q359's classes: which batches delivered the wholesale copies, with a
    // cumulative count; static 0..7 spine; q358's oracle embedded VERBATIM
    "q362_severity_drift" ->
      s"""WITH ls AS ($leakSpansOracle),
         |d AS (SELECT doc_id,
         |        CAST('0x' || substr(md5(doc_id || ':crawl_v1'), 1, 8) AS BIGINT)
         |          % 1000 % 8 AS batch,
         |        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |          AS n_toks
         |      FROM documents),
         |j AS (SELECT d.batch, d.n_toks,
         |        ${severityCase("ls.longest_run_grams")} AS sev
         |      FROM ls JOIN d USING (doc_id)),
         |a AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(CASE WHEN sev = 'quote' THEN 1 ELSE 0 END) AS BIGINT) AS n_quote,
         |        CAST(sum(CASE WHEN sev = 'passage' THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_passage_class,
         |        CAST(sum(CASE WHEN sev = 'wholesale' THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_wholesale,
         |        CAST(sum(CASE WHEN sev = 'wholesale' THEN n_toks ELSE 0 END) AS BIGINT)
         |          AS wholesale_tokens
         |      FROM j GROUP BY 1),
         |f AS (SELECT s.batch,
         |        CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
         |        CAST(coalesce(a.n_quote, 0) AS BIGINT) AS n_quote,
         |        CAST(coalesce(a.n_passage_class, 0) AS BIGINT) AS n_passage_class,
         |        CAST(coalesce(a.n_wholesale, 0) AS BIGINT) AS n_wholesale,
         |        CAST(coalesce(a.wholesale_tokens, 0) AS BIGINT) AS wholesale_tokens
         |      FROM (SELECT unnest(range(0, 8)) AS batch) s
         |      LEFT JOIN a USING (batch))
         |SELECT batch, n_docs, n_quote, n_passage_class, n_wholesale,
         |  wholesale_tokens,
         |  CAST(sum(n_wholesale) OVER (ORDER BY batch
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_wholesale
         |FROM f""".stripMargin,

    // q343: contamination escape via near-dup families — unflagged training
    // docs sharing a q55 family with an eval doc (near-dup of the benchmark
    // itself) or a direct-flagged member have escaped the gram filter;
    // per-source direct vs family-closure rates
    "q343_contam_escape" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |v AS ($decontaminateOracle),
         |l2 AS (
         |  SELECT lab.doc_id, lab.cluster_id,
         |    CAST('0x' || substr(md5(lab.doc_id || ':eval_v1'), 1, 8) AS BIGINT)
         |      % 1000 < 200 AS is_eval
         |  FROM lab),
         |ff AS (
         |  SELECT cluster_id, bool_or(is_eval) AS fam_has_eval,
         |    bool_or(coalesce(v.is_contaminated, false)) AS fam_has_flagged
         |  FROM l2 LEFT JOIN v USING (doc_id) GROUP BY 1),
         |t AS (
         |  SELECT l2.doc_id, l2.cluster_id, v.is_contaminated, doc.source
         |  FROM l2 JOIN v USING (doc_id) JOIN documents doc USING (doc_id)
         |  WHERE NOT l2.is_eval)
         |SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN t.is_contaminated THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged_direct,
         |  CAST(sum(CASE WHEN NOT t.is_contaminated
         |    AND (ff.fam_has_eval OR ff.fam_has_flagged) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_escaped,
         |  CAST(sum(CASE WHEN t.is_contaminated THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS direct_rate,
         |  CAST(sum(CASE WHEN t.is_contaminated THEN 1 ELSE 0 END)
         |    + sum(CASE WHEN NOT t.is_contaminated
         |        AND (ff.fam_has_eval OR ff.fam_has_flagged) THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS family_rate
         |FROM t JOIN ff USING (cluster_id)
         |GROUP BY 1""".stripMargin,

    // q247: rolling 7-day median of daily revenue — ENTIRELY integer
    // (lower median of a sorted ≤7-element cents buffer), zero FP anywhere
    "q247_rolling_median" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT day, x, list_sort(array_agg(x) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS buf
        |  FROM daily)
        |SELECT day, x, CAST(len(buf) AS BIGINT) AS n_window,
        |  buf[CAST((len(buf) + 1) // 2 AS INT)] AS rolling_median_cents
        |FROM b""".stripMargin,

    // q248: Nelson–Aalen cumulative hazard — q222's risk sets verbatim,
    // each d/n one exact-int division, H the exact-decimal cumulative of
    // 12-decimal-quantized terms, exp(−H) bridged at NINE decimals
    // (DECIMAL(18,9)) — the documented exp-midpoint lesson: exp output can
    // land on a 12-decimal rounding midpoint where Spark and DuckDB split
    "q248_nelson_aalen" ->
      s"""WITH $survivalRiskCtes,
        |terms AS (
        |  SELECT t, d, c, n_risk,
        |    CAST(CAST(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(28,12)) AS hq
        |  FROM risk),
        |cum AS (
        |  SELECT t, d, c, n_risk,
        |    CAST(CAST(sum(hq) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |      AS cum_hazard
        |  FROM terms)
        |SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored, cum_hazard,
        |  CAST(CAST(CAST(CAST(exp(-cum_hazard) AS VARCHAR) AS DECIMAL(18,9))
        |    AS VARCHAR) AS DOUBLE) AS surv_na
        |FROM cum""".stripMargin,

    // q223: walk-forward backtest of the q211 smoother — relative errors
    // keep every bridged square in the magnitude-safe range
    "q223_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |o AS (SELECT CAST(u AS BIGINT) AS j FROM (SELECT unnest(generate_series(0, 39)) AS u)),
        |c AS (
        |  SELECT i.i + o.j AS i,
        |    CAST(CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12)) AS termq,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS wq
        |  FROM i CROSS JOIN o),
        |s AS (
        |  SELECT i, CAST(CAST(sum(termq) AS VARCHAR) AS DOUBLE) AS ewma_cents,
        |    CAST(CAST(sum(wq) AS VARCHAR) AS DOUBLE) AS w_mass
        |  FROM c GROUP BY 1),
        |e0 AS (
        |  SELECT day, x AS total_cents, ewma_cents / w_mass AS ewma_norm
        |  FROM i JOIN s USING (i)),
        |f AS (
        |  SELECT day, total_cents, lag(ewma_norm) OVER (ORDER BY day) AS forecast
        |  FROM e0),
        |sc AS (
        |  SELECT day, total_cents, CAST(total_cents AS DOUBLE) - forecast AS e,
        |    (CAST(total_cents AS DOUBLE) - forecast) / CAST(total_cents AS DOUBLE) AS rel
        |  FROM f WHERE forecast IS NOT NULL),
        |m AS (
        |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(CAST(sum(CAST(CAST(abs(e) AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sae,
        |    CAST(CAST(sum(CAST(CAST(rel * rel AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS ssr,
        |    CAST(CAST(sum(CAST(CAST(abs(rel) AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS sar
        |  FROM sc GROUP BY 1)
        |SELECT month, n_days,
        |  sae / CAST(n_days AS DOUBLE) AS mae_cents,
        |  sqrt(ssr / CAST(n_days AS DOUBLE)) AS rmse_rel,
        |  sar / CAST(n_days AS DOUBLE) AS mape
        |FROM m""".stripMargin,

    // q210: sample ACF — mean-centering scaled by n into exact integers
    // (HUGEINT oracle-side, DECIMAL(38,0) Spark-side), bridged division
    "q210_acf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM daily),
        |i AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(n * x - s AS HUGEINT) AS dev
        |  FROM daily, t),
        |den AS (SELECT sum(dev * dev) AS den FROM i),
        |l AS (SELECT CAST(u AS BIGINT) AS lag FROM (SELECT unnest(generate_series(1, 7)) AS u)),
        |p AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs, sum(a.dev * b.dev) AS num
        |  FROM l CROSS JOIN i a JOIN i b ON b.i = a.i + l.lag
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS acf
        |FROM p, den""".stripMargin,

    // q211: EWMA as a truncated convolution — weights from integer shifts
    // (exact power-of-2 doubles), terms/weights quantized to DECIMAL(28,12)
    // and folded exactly
    "q211_ewma" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
        |o AS (SELECT CAST(u AS BIGINT) AS j FROM (SELECT unnest(generate_series(0, 39)) AS u)),
        |c AS (
        |  SELECT i.i + o.j AS i,
        |    CAST(CAST(CAST(x AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE))
        |      AS VARCHAR) AS DECIMAL(28,12)) AS termq,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(1 AS BIGINT) << CAST(o.j + 1 AS INTEGER) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS wq
        |  FROM i CROSS JOIN o),
        |s AS (
        |  SELECT i, CAST(count(*) AS BIGINT) AS n_terms,
        |    CAST(CAST(sum(termq) AS VARCHAR) AS DOUBLE) AS ewma_cents,
        |    CAST(CAST(sum(wq) AS VARCHAR) AS DOUBLE) AS w_mass
        |  FROM c GROUP BY 1)
        |SELECT day, x AS total_cents, n_terms, ewma_cents,
        |  ewma_cents / w_mass AS ewma_norm_cents
        |FROM i JOIN s USING (i)""".stripMargin,

    // q212: burstiness — exact microsecond gaps, n-scaled integer variance,
    // one bridged tree for sigma/mu/CV/B
    "q212_burstiness" ->
      """WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS t_us FROM events),
        |g AS (
        |  SELECT user_id,
        |    t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM e),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    sum(CAST(gap AS HUGEINT) * gap) AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2),
        |x AS (
        |  SELECT user_id, n_gaps,
        |    CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
        |    sqrt(CAST(CAST(n_gaps * sgg - CAST(sg AS HUGEINT) * sg AS VARCHAR) AS DOUBLE))
        |      / CAST(n_gaps AS DOUBLE) AS sd_gap_us
        |  FROM s)
        |SELECT user_id, n_gaps, mean_gap_us, sd_gap_us,
        |  sd_gap_us / mean_gap_us AS cv,
        |  (sd_gap_us - mean_gap_us) / (sd_gap_us + mean_gap_us) AS burstiness
        |FROM x""".stripMargin,

    // q213: day-of-week seasonality — weekday by pure date arithmetic
    // (days since a fixed Monday mod 7), exact-int doubles in one tree
    "q213_dow_seasonality" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT day, x,
        |    CAST(date_diff('day', DATE '1990-01-01', day) % 7 AS BIGINT) AS dow
        |  FROM daily),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days_all, CAST(sum(x) AS BIGINT) AS s_all FROM d),
        |p AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS total_cents
        |  FROM d GROUP BY 1)
        |SELECT dow, n_days, total_cents,
        |  CAST(total_cents AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_daily_cents,
        |  (CAST(total_cents AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(s_all AS DOUBLE) / CAST(n_days_all AS DOUBLE)) AS seasonal_index
        |FROM p, t""".stripMargin,

    // q207: item-item CF — score is one fixed tree over exact longs; ties
    // rank by neighbor id so the top-k list is hash-stable
    "q207_item_cf" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM li GROUP BY 1),
        |pc AS (
        |  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_both
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |sym AS (
        |  SELECT pa AS item, pb AS neighbor, n_both FROM pc
        |  UNION ALL SELECT pb AS item, pa AS neighbor, n_both FROM pc),
        |sc AS (
        |  SELECT item, neighbor, n_both, ia.n_item AS n_i, ib.n_item AS n_j,
        |    CAST(n_both AS DOUBLE)
        |      / sqrt(CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS score
        |  FROM sym JOIN ic ia ON sym.item = ia.pk JOIN ic ib ON sym.neighbor = ib.pk),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY item
        |    ORDER BY score DESC, neighbor) AS BIGINT) AS rnk FROM sc)
        |SELECT item, neighbor, n_both, n_i, n_j, score, rnk
        |FROM r WHERE rnk <= 3""".stripMargin,

    // q208: Adamic-Adar — ln through the 12-decimal bridge, per-pair sum
    // folds DECIMAL(28,12)-quantized terms exactly
    "q208_adamic_adar" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |w AS (
        |  SELECT ok,
        |    CAST(CAST(CAST(1.0 AS DOUBLE)
        |      / CAST(CAST(CAST(CAST(ln(CAST(count(*) AS DOUBLE)) AS VARCHAR)
        |          AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(28,12)) AS invq
        |  FROM li GROUP BY 1 HAVING count(*) >= 2),
        |p AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, a.ok
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_shared,
        |  CAST(CAST(sum(invq) AS VARCHAR) AS DOUBLE) AS aa
        |FROM p JOIN w USING (ok)
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // q209: label propagation — the 2 synchronous rounds unrolled as CTEs,
    // argmax by (count DESC, label) exactly as the operator's window
    "q209_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        |lbl0 AS (SELECT DISTINCT u AS id, u AS lbl FROM sym),
        |c1 AS (
        |  SELECT s.u, l.lbl, row_number() OVER (PARTITION BY s.u
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN lbl0 l ON s.v = l.id GROUP BY s.u, l.lbl),
        |lbl1 AS (SELECT u AS id, lbl FROM c1 WHERE rn = 1),
        |c2 AS (
        |  SELECT s.u, l.lbl, row_number() OVER (PARTITION BY s.u
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN lbl1 l ON s.v = l.id GROUP BY s.u, l.lbl),
        |lbl2 AS (SELECT u AS id, lbl FROM c2 WHERE rn = 1)
        |SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_members
        |FROM lbl2 GROUP BY 1""".stripMargin,

    // q203/q204: both tests share the per-value cumulative-count CTEs; the
    // Spark side computes the cumulative two-phase (bucketed), the oracle
    // declaratively — hash equality proves the phase algebra. All integer
    // until the final fixed correctly-rounded double trees.
    "q203_ks_test" ->
      """WITH v AS (
        |  SELECT o_totalprice AS x,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |c AS (
        |  SELECT x, CAST(sum(g) AS BIGINT) AS c1,
        |    CAST(sum(1 - g) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |cc AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM c),
        |t AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM cc),
        |d AS (
        |  SELECT n1, n2, max(abs(cum1 * n2 - cum2 * n1)) AS d_num
        |  FROM cc, t GROUP BY 1, 2)
        |SELECT n1, n2, d_num,
        |  CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat,
        |  CAST(1.3581 AS DOUBLE) * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS crit_05,
        |  CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |    > CAST(1.3581 AS DOUBLE) * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS reject_05
        |FROM d""".stripMargin,

    "q204_rank_sum" ->
      """WITH v AS (
        |  SELECT o_totalprice AS x,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |c AS (
        |  SELECT x, CAST(sum(g) AS BIGINT) AS c1,
        |    CAST(sum(1 - g) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |cc AS (
        |  SELECT x, c1, c2,
        |    CAST(sum(c1) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM c),
        |s AS (
        |  SELECT max(cum1) AS n1, max(cum2) AS n2,
        |    CAST(sum(c1 * (2 * cum2 - c2)) AS BIGINT) AS u2x,
        |    CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT) AS ties
        |  FROM cc)
        |SELECT n1, n2,
        |  CAST(u2x AS DOUBLE) / CAST(2.0 AS DOUBLE) AS u1,
        |  CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS mu,
        |  sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(12.0 AS DOUBLE)
        |    * (CAST(n1 + n2 + 1 AS DOUBLE)
        |       - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) AS sigma,
        |  (CAST(u2x AS DOUBLE) / CAST(2.0 AS DOUBLE)
        |    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(2.0 AS DOUBLE))
        |  / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(12.0 AS DOUBLE)
        |    * (CAST(n1 + n2 + 1 AS DOUBLE)
        |       - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) AS z
        |FROM s""".stripMargin,

    // q205: Gini in integer cents — products/sums stay in DECIMAL(·,0)
    // where the two engines' width rules agree; one bridged division
    "q205_gini" ->
      """WITH spend AS (
        |  SELECT c_mktsegment AS segment, c_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |cents AS (
        |  SELECT segment, c_custkey, spend,
        |    CAST(spend * 100 AS DECIMAL(20,0)) AS cents
        |  FROM spend),
        |r AS (
        |  SELECT segment, cents,
        |    CAST(row_number() OVER (PARTITION BY segment
        |      ORDER BY cents, c_custkey) AS BIGINT) AS i
        |  FROM cents),
        |g AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(cents) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(CAST(i * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS six
        |  FROM r GROUP BY 1)
        |SELECT segment, n_cust,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total_spend,
        |  CAST(CAST(CAST(2 * six - (n_cust + 1) * sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n_cust * sx AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS gini
        |FROM g""".stripMargin,

    // q206: first digit from the DECIMAL STRING form (no log10 libm);
    // expected probs are pinned 12-decimal literals; χ² terms quantize to
    // DECIMAL(28,12) and fold exactly
    "q206_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
        |    AS INTEGER) AS digit
        |  FROM orders),
        |b AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
        |e(digit, exp_p) AS (VALUES
        |  (1, CAST('0.301029995664' AS DOUBLE)), (2, CAST('0.176091259056' AS DOUBLE)),
        |  (3, CAST('0.124938736608' AS DOUBLE)), (4, CAST('0.096910013008' AS DOUBLE)),
        |  (5, CAST('0.079181246048' AS DOUBLE)), (6, CAST('0.066946789631' AS DOUBLE)),
        |  (7, CAST('0.057991946978' AS DOUBLE)), (8, CAST('0.051152522447' AS DOUBLE)),
        |  (9, CAST('0.045757490561' AS DOUBLE))),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM b),
        |x AS (
        |  SELECT b.digit, n_obs, n_total, e.exp_p,
        |    CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_p,
        |    (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * e.exp_p)
        |      * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * e.exp_p)
        |      / (CAST(n_total AS DOUBLE) * e.exp_p) AS chi2_term
        |  FROM b JOIN e USING (digit), t)
        |SELECT digit, n_obs, n_total, obs_p, exp_p, chi2_term,
        |  CAST(CAST(sum(CAST(CAST(chi2_term AS VARCHAR) AS DECIMAL(28,12))) OVER ()
        |    AS VARCHAR) AS DOUBLE) AS chi2_total
        |FROM x""".stripMargin,

    // q201: k-core membership after 8 unrolled induced-degree peels —
    // k=80 converges in 6 rounds at both gate scales and peels a real
    // ~7% tail (k ≤ 60 peels nothing on this graph; k ≥ 90 unravels it)
    "q201_kcore" -> kCoreOracle(k = 80, rounds = 8),

    // q202: degree assortativity — exact integer sums, one fixed
    // correctly-rounded arithmetic tree, no bridging
    "q202_assortativity" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |d AS (
        |  SELECT id, count(*) AS deg FROM (
        |    SELECT u AS id FROM e0 UNION ALL SELECT v AS id FROM e0)
        |  GROUP BY 1),
        |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        |p AS (
        |  SELECT du.deg AS du, dv.deg AS dv
        |  FROM sym JOIN d du ON sym.u = du.id JOIN d dv ON sym.v = dv.id),
        |s AS (
        |  SELECT count(*) AS n, sum(du) AS sx, sum(dv) AS sy,
        |    sum(du * du) AS sxx, sum(dv * dv) AS syy, sum(du * dv) AS sxy
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n_edge_ends,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS assortativity
        |FROM s""".stripMargin,

    // q199: per-language percentile normalization — pure rank arithmetic
    // over a totalized order, no bridging needed
    "q199_pct_normalize" ->
      """SELECT doc_id, lang, n_chars,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pct
        |FROM documents""".stripMargin,

    // q200: min-max scaler APPLY — per-dim (min,max) from the q179 fit,
    // scaled elements folded in bridged decimal; constant dims scale to NULL
    "q200_scaled_profile" ->
      """WITH d AS (
        |  SELECT CAST(s.i - 1 AS BIGINT) AS dim, CAST(embedding[s.i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i)),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY 1),
        |sc AS (
        |  SELECT d.dim,
        |    CASE WHEN st.mx > st.mn THEN (d.x - st.mn) / (st.mx - st.mn) END AS s
        |  FROM d JOIN st USING (dim))
        |SELECT dim, CAST(count(s) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(CAST(s AS VARCHAR) AS DECIMAL(28,14)))
        |    AS VARCHAR) AS DOUBLE) AS sum_scaled,
        |  min(s) AS min_scaled, max(s) AS max_scaled,
        |  CAST(CAST(sum(CAST(CAST(s AS VARCHAR) AS DECIMAL(28,14)))
        |    AS VARCHAR) AS DOUBLE) / count(s) AS mean_scaled
        |FROM sc GROUP BY dim""".stripMargin,

    // q198: retention half-life — the q143 regression recipe over the q99
    // cohort curves; ln 2 interpolated from the operator's Scala double
    "q198_retention_decay" ->
      s"""WITH s AS (
         |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
         |  FROM events WHERE event_type = 'signup' GROUP BY 1),
         |r AS (
         |  SELECT s.cohort_date,
         |    CAST(floor(date_diff('day', s.cohort_date, CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset,
         |    count(DISTINCT e.user_id) AS n_active
         |  FROM events e JOIN s ON e.user_id = s.user_id
         |  WHERE date_diff('day', s.cohort_date, CAST(e.ts AS DATE)) >= 0
         |  GROUP BY 1, 2),
         |b AS (SELECT cohort_date, n_active AS n0 FROM r WHERE week_offset = 0),
         |pts AS (
         |  SELECT r.cohort_date, r.week_offset AS x,
         |    CAST(CAST(CAST(CAST(ln(CAST(r.n_active AS DOUBLE) / b.n0) AS VARCHAR)
         |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS y
         |  FROM r JOIN b USING (cohort_date) WHERE r.week_offset >= 1),
         |agg AS (
         |  SELECT cohort_date, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         |    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(28,14)))
         |      AS VARCHAR) AS DOUBLE) AS sy,
         |    CAST(CAST(sum(CAST(CAST(CAST(x AS DOUBLE) * y AS VARCHAR)
         |      AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS sxy
         |  FROM pts GROUP BY 1),
         |m AS (
         |  SELECT cohort_date, n,
         |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den
         |  FROM agg)
         |SELECT cohort_date, CAST(n AS BIGINT) AS n_weeks, slope AS decay_slope,
         |  CASE WHEN slope < 0 THEN ${ln2ForOracle} / -slope END AS half_life_weeks
         |FROM m WHERE n >= 2 AND den > 0""".stripMargin,

    // q197: U-shaped 40/20/40 attribution — position fractions are pure
    // double arithmetic (every branch CAST to DOUBLE: bare decimals would
    // put DuckDB's CASE in the decimal domain), folded in bridged decimal
    "q197_position_attrib" ->
      """WITH t AS (
        |  SELECT user_id, event_id AS tid, ts AS tts, event_type AS channel
        |  FROM events WHERE event_type <> 'purchase'),
        |p AS (
        |  SELECT user_id, event_id AS pid, ts AS pts, value
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.pid, p.value, t.channel, t.tts, t.tid
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 30 MINUTE),
        |r AS (
        |  SELECT pid, value, channel,
        |    count(*) OVER (PARTITION BY pid) AS n,
        |    row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rn
        |  FROM j),
        |c AS (
        |  SELECT channel, value * (CASE
        |      WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
        |      WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
        |      WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
        |      ELSE CAST(0.2 AS DOUBLE) / (n - 2) END) AS credit
        |  FROM r
        |  UNION ALL
        |  SELECT 'organic', p.value FROM p
        |  WHERE p.pid NOT IN (SELECT pid FROM j))
        |SELECT channel, count(*) AS n_credits,
        |  CAST(CAST(sum(CAST(CAST(credit AS VARCHAR) AS DECIMAL(28,14)))
        |    AS VARCHAR) AS DOUBLE) AS credit_total
        |FROM c GROUP BY 1""".stripMargin,

    // q196: CUSUM level-shift alarm via the running-sum/running-min closed
    // form, n-scaled so every step including the alarm comparison is exact
    // decimal (no mean division); only the reported excess divides at the end
    "q196_cusum" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |  FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS n, sum(tot) AS tt FROM d),
        |p AS (
        |  SELECT day, tot, n, tt, CAST(n * tot - tt AS DECIMAL(38,2)) AS dev
        |  FROM d CROSS JOIN t),
        |w1 AS (
        |  SELECT *, sum(dev) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS prefix
        |  FROM p),
        |w2 AS (
        |  SELECT *, min(prefix) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS runmin
        |  FROM w1),
        |s AS (
        |  SELECT *, prefix - (CASE WHEN runmin < 0 THEN runmin
        |    ELSE CAST(0 AS DECIMAL(38,2)) END) AS s
        |  FROM w2)
        |SELECT day,
        |  CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS total,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS cusum_excess,
        |  s * 20 > n * tt AS alarm
        |FROM s""".stripMargin,

    // q194: trailing 7-day z-score anomalies — exact decimal window sums,
    // variance spelled (Σx² − Σx·mean)/(n−1) in the identical op order
    "q194_daily_anomaly" -> dailyAnomalySql,

    // q268: the STREAMING daily-anomaly twin — per-day state only, the
    // q194 tail shared verbatim batch-side, hence the IDENTICAL oracle
    "q268_anomaly_stream" -> dailyAnomalySql,

    // q193: temperature-scaled source weights — n^α as exp(α·ln n) with
    // both transcendental outputs bridged to 12 decimals (pow is not
    // correctly rounded and cross-engine unsafe); α and the budget are
    // interpolated from the operator's Scala defaults
    "q193_temperature_mix" ->
      s"""WITH s AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY 1),
         |p AS (
         |  SELECT source, n_docs, n_tokens,
         |    CAST(CAST(CAST(CAST(exp(${0.3} *
         |      CAST(CAST(CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS VARCHAR)
         |        AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE))
         |      AS VARCHAR) AS DECIMAL(30,12)) AS VARCHAR) AS DOUBLE) AS p_raw
         |  FROM s),
         |t AS (
         |  SELECT CAST(CAST(sum(CAST(CAST(p_raw AS VARCHAR) AS DECIMAL(38,14)))
         |    AS VARCHAR) AS DOUBLE) AS t FROM p)
         |SELECT source, n_docs, n_tokens,
         |  p_raw / t.t AS weight,
         |  CAST(floor((p_raw / t.t) * ${1000000L}) AS BIGINT) AS tokens_alloc
         |FROM p CROSS JOIN t""".stripMargin,

    // q335: temperature-feasibility curve — q193's bridged weight chain per
    // α, each arm's B* = min ⌊avail/weight⌋ with the binding source (ties
    // to the lexicographically first); alphas interpolated from the
    // operator's Scala defaults so both engines parse the same literal
    "q335_temp_feasibility" -> {
      val arms = Seq(0.2, 0.3, 0.5, 0.7, 1.0).zipWithIndex.map { case (a, i) =>
        (s"""p$i AS (
            |  SELECT source, n_tokens,
            |    CAST(CAST(CAST(CAST(exp($a *
            |      CAST(CAST(CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS VARCHAR)
            |        AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE))
            |      AS VARCHAR) AS DECIMAL(30,12)) AS VARCHAR) AS DOUBLE) AS p_raw
            |  FROM s),
            |t$i AS (
            |  SELECT CAST(CAST(sum(CAST(CAST(p_raw AS VARCHAR) AS DECIMAL(38,14)))
            |    AS VARCHAR) AS DOUBLE) AS t FROM p$i),
            |c$i AS (
            |  SELECT source,
            |    CAST(floor(CAST(n_tokens AS DOUBLE) / (p_raw / t$i.t)) AS BIGINT) AS cap
            |  FROM p$i CROSS JOIN t$i),
            |a$i AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_sources,
            |    min(cap) AS budget_max,
            |    min(CASE WHEN cap = (SELECT min(cap) FROM c$i) THEN source END)
            |      AS binding_source
            |  FROM c$i)""".stripMargin,
          s"""SELECT CAST($a AS DOUBLE) AS alpha, n_sources, budget_max,
             |  binding_source,
             |  CAST(budget_max AS DOUBLE) / (SELECT CAST(tok_t AS DOUBLE) FROM tt)
             |    AS feasible_share
             |FROM a$i""".stripMargin)
      }
      s"""WITH s AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_t FROM s),
         |${arms.map(_._1).mkString(",\n")}
         |${arms.map(_._2).mkString("\nUNION ALL\n")}""".stripMargin
    },

    // q191: two-level k-anonymity / l-diversity audit over (nation|region,
    // segment) QI groups with the acctbal band as the sensitive attribute
    "q191_k_anonymity" ->
      """WITH d AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    c.c_mktsegment AS segment,
        |    CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey),
        |nl AS (
        |  SELECT nation, segment, count(*) AS n,
        |    count(DISTINCT band) AS n_sensitive
        |  FROM d GROUP BY 1, 2),
        |rl AS (
        |  SELECT region, segment, count(*) AS n,
        |    count(DISTINCT band) AS n_sensitive
        |  FROM d GROUP BY 1, 2)
        |SELECT 'nation_segment' AS level, nation || '|' || segment AS qi_group,
        |  n, n_sensitive, n < 5 AS violates_k, n_sensitive < 2 AS violates_l
        |FROM nl
        |UNION ALL
        |SELECT 'region_segment', region || '|' || segment,
        |  n, n_sensitive, n < 5, n_sensitive < 2
        |FROM rl""".stripMargin,

    // q189: the skew-robust (quantile-boundary) policy must reproduce the
    // SAME declarative window as q184 — rank is boundary-invariant
    "q189_quantile_rank" ->
      """SELECT o_orderkey AS id, o_totalprice AS price,
        |  CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
        |    AS global_rank
        |FROM orders""".stripMargin,

    // q185: the HLL error budget, oracle-gated (the q165 pattern for
    // approx_count_distinct) — exact counts + within_bound = TRUE pinned
    "q185_hll_bound" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1""".stripMargin,

    // q186: smoothed log-odds characteristic terms — both ln's through the
    // 12-decimal bridge; delta is one IEEE subtraction of bridged doubles
    "q186_log_odds" ->
      """WITH tok AS (
        |  SELECT source, doc_id, t.term FROM documents,
        |    LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)),
        |df AS (
        |  SELECT term FROM (SELECT DISTINCT doc_id, term FROM tok)
        |  GROUP BY term HAVING count(*) >= 50),
        |bs AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_s
        |  FROM tok JOIN df USING (term) GROUP BY 1, 2),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tok GROUP BY 1),
        |g AS (SELECT term, CAST(sum(c_s) AS BIGINT) AS c_g FROM bs GROUP BY 1),
        |a AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_g FROM st),
        |scored AS (
        |  SELECT bs.source, bs.term, bs.c_s,
        |    CAST(CAST(CAST(CAST(ln(CAST(bs.c_s + 1 AS DOUBLE) / (st.n_s - bs.c_s + 1))
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    - CAST(CAST(CAST(CAST(ln(CAST(g.c_g - bs.c_s + 1 AS DOUBLE)
        |        / (a.n_g - st.n_s - (g.c_g - bs.c_s) + 1))
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS delta
        |  FROM bs JOIN st USING (source) JOIN g USING (term) CROSS JOIN a)
        |SELECT source, term, c_s, delta,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY delta DESC, term)
        |    AS BIGINT) AS rnk
        |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // q187: Zipf slope — the q143 regression recipe over 12-decimal-bridged
    // ln(rank)/ln(freq); every decimal cast VARCHAR-bridged (FP trap #2)
    "q187_zipf" ->
      """WITH freq AS (
        |  SELECT lang, term, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT lang, t.term FROM documents,
        |    LATERAL unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term))
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rank
        |  FROM freq QUALIFY rank <= 100),
        |xy AS (
        |  SELECT lang,
        |    CAST(CAST(CAST(CAST(ln(CAST(rank AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS x,
        |    CAST(CAST(CAST(CAST(ln(CAST(n AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE) AS y
        |  FROM ranked),
        |agg AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(28,14)))
        |      AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT lang, n_points,
        |  (CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n_points AS DOUBLE) * sxx - sx * sx) AS zipf_slope
        |FROM agg""".stripMargin,
    // incremental JOIN-view maintenance: the oracle recomputes the view
    // from scratch over the full join, so the delta-join identity
    // (O∪ΔO)⋈(C∪ΔC) = O⋈C ∪ ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC plus the partial-agg
    // merge must be bit-identical to prove merge ≡ recompute
    "q134_join_view_maint" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,

    // q133: changes v1→v3 = the purge's deletes + the v3 batch's inserts;
    // rows the CoW rewrite merely carried over must NOT appear
    "q133_change_feed" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'insert' AS "_change_type"
        |FROM orders WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'delete' AS "_change_type"
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O') AND o_totalprice < 50000""".stripMargin,

    // q135: manifest data skipping must be INVISIBLE in the result — the
    // oracle is a plain filter over the full table; the spec separately pins
    // that the range read actually opened fewer file groups
    "q135_data_skipping" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_totalprice >= 100000.0 AND o_totalprice <= 150000.0""".stripMargin,
    // q136: versioned MERGE final state = carried (keys not in source)
    // ∪ updated (matched, price ≥ 50000: price+1.0, priority MERGED)
    // ∪ inserted (source keys not in target, i.e. status-P keys, price+1.0);
    // matched rows with price < 50000 are DELETEd. Source keys are every 5th
    // orderkey; +1.0 on a double is exact IEEE in both engines.
    "q136_versioned_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderstatus IN ('F', 'O'))
        |SELECT * FROM t WHERE o_orderkey % 5 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0 AS o_totalprice, o_orderdate,
        |  'MERGED' AS o_orderpriority
        |FROM t WHERE o_orderkey % 5 = 0 AND o_totalprice >= 50000.0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderstatus = 'P'""".stripMargin,

    // q137: after slice appends + CoW delete + OPTIMIZE + checkpoint +
    // VACUUM, the snapshot must equal a plain filter of the source — the
    // whole maintenance chain is row-lossless or the hash breaks
    "q137_optimize_vacuum" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  l_shipdate
        |FROM lineitem WHERE NOT (l_discount > 0.08)""".stripMargin,

    // q138: additive schema evolution — rows appended before n_chars existed
    // read it as a typed NULL; later rows carry their value
    "q138_schema_evolution" ->
      """SELECT doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,

    // q139: bucketing is pure physical layout — the oracle is the plain
    // join; LayoutSpec separately pins that the bucketed plan has no
    // exchange under the join
    "q139_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // q140: dynamic partition pruning is invisible in the result — the
    // oracle joins the same runtime-derived hot set without any layout;
    // the hot-type predicate uses exact decimal sums so both engines pick
    // the identical set (a double-sum avg could flap at the threshold)
    "q140_dpp_scan" ->
      """WITH hot AS (
        |  SELECT event_type FROM events GROUP BY 1
        |  HAVING sum(CAST(value AS DECIMAL(25,10)))
        |       > CAST(count(*) AS DECIMAL(25,10)) * 50)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(22,4))) AS DOUBLE) AS sum_value
        |FROM events e JOIN hot USING (event_type)
        |GROUP BY 1""".stripMargin,

    // q141: trailing window over OBSERVED hours (rows, not wall-clock);
    // all-integer spike predicate through one double division
    "q141_hourly_spikes" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *, sum(n) OVER w AS trailing_n,
        |    count(*) OVER w AS trailing_hours
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n,
        |  CAST(trailing_n AS DOUBLE) / trailing_hours AS trailing_avg
        |FROM t
        |WHERE trailing_hours >= 12
        |  AND CAST(n AS DOUBLE) > 2.0 * trailing_n / trailing_hours""".stripMargin,

    // q142: first-order Markov transitions; probability is a ratio of
    // exact counts (one IEEE division per output row)
    "q142_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE)
        |    / sum(n_transitions) OVER (PARTITION BY from_type) AS p_transition
        |FROM c""".stripMargin,

    // q143: OLS + Pearson from exact decimal moments; the closed-form
    // algebra is one double expression per group, identical in both engines
    "q143_regression" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sq,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sp,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
        |           * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sqq,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
        |           * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS spp,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
        |           * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n_rows,
        |  (CAST(n_rows AS DOUBLE)*sqp - sq*sp)
        |    / (CAST(n_rows AS DOUBLE)*sqq - sq*sq) AS slope,
        |  (sp - ((CAST(n_rows AS DOUBLE)*sqp - sq*sp)
        |    / (CAST(n_rows AS DOUBLE)*sqq - sq*sq)) * sq)
        |    / CAST(n_rows AS DOUBLE) AS intercept,
        |  (CAST(n_rows AS DOUBLE)*sqp - sq*sp)
        |    / (sqrt(CAST(n_rows AS DOUBLE)*sqq - sq*sq)
        |     * sqrt(CAST(n_rows AS DOUBLE)*spp - sp*sp)) AS corr_qp
        |FROM s""".stripMargin,

    // q144: equi-width histogram + cumulative share; the window runs over
    // bucket rows, not data rows
    "q144_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY 1)
        |SELECT bucket, n, sum_price,
        |  CAST(sum(n) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  CAST(sum(n) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(sum(n) OVER () AS DOUBLE) AS cum_share
        |FROM b""".stripMargin,

    // q145: PageRank, 3 unrolled iterations over the co-purchase graph;
    // q146: k-means, 2 unrolled Lloyd rounds from deterministic seeds —
    // both with decimal-rounded contributions so the iteration is
    // bit-stable across engines AND cluster topologies
    "q145_pagerank" -> pageRankOracle(iters = 3, damping = 0.85),
    "q146_kmeans" -> kmeansOracle(k = 8, iters = 2),

    // q156: exact per-group quantile table at rank ceil(p·n); the rank
    // product is the SAME double in both engines (see q150)
    "q156_quantile_table" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT flag, CAST(p AS DOUBLE) AS p, price AS value
        |FROM r CROSS JOIN (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) v(p)
        |WHERE rn = ceil(CAST(p AS DOUBLE) * n)""".stripMargin,

    // q157: null-safe equality join semantics — NULL keys route to the
    // dim's NULL row instead of silently dropping
    "q157_nullsafe_join" ->
      """WITH keyed AS (SELECT nullif(o_orderstatus, 'P') AS k FROM orders),
        |dim AS (
        |  SELECT k AS dk, COALESCE(k, 'UNKNOWN') AS label
        |  FROM (SELECT DISTINCT k FROM keyed))
        |SELECT label, CAST(count(*) AS BIGINT) AS n_orders
        |FROM keyed JOIN dim ON k IS NOT DISTINCT FROM dk
        |GROUP BY 1""".stripMargin,

    // q154: the higher-order array-function surface, all inside the row;
    // array outputs stringified so the compare is scalar-only
    "q154_array_hof" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> len(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(CASE WHEN len(toks) = 0 THEN 0 ELSE
        |    list_reduce(list_transform(toks, t -> len(t)), (a, b) -> a + b)
        |    END AS BIGINT) AS total_chars,
        |  list_sort(list_distinct(list_transform(toks, t -> upper(t))))[1]
        |    AS first_upper,
        |  list_contains(toks, 'spark') AS mentions_spark,
        |  array_to_string(toks[1:3], ' ') AS head3
        |FROM d""".stripMargin,

    // q155: PSI drift between shipment cohorts; Laplace-smoothed bucket
    // shares, ln guarded at 12 decimals, terms decimal-folded exactly
    "q155_psi_drift" ->
      """WITH counts AS (
        |  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |    sum(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01' THEN 1 ELSE 0 END) AS n_ref,
        |    sum(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01' THEN 0 ELSE 1 END) AS n_cur
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT *, sum(n_ref) OVER () AS t_ref, sum(n_cur) OVER () AS t_cur,
        |    count(*) OVER () AS n_buckets
        |  FROM counts),
        |terms AS (
        |  SELECT
        |    CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_buckets) AS p_ref,
        |    CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_buckets) AS p_cur,
        |    t_ref, t_cur, n_buckets
        |  FROM m)
        |SELECT
        |  CAST(CAST(sum(CAST(CAST(
        |    (p_cur - p_ref) * CAST(CAST(CAST(CAST(ln(p_cur / p_ref)
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS psi,
        |  CAST(max(n_buckets) AS BIGINT) AS n_buckets,
        |  CAST(max(t_ref) AS BIGINT) AS n_ref_rows,
        |  CAST(max(t_cur) AS BIGINT) AS n_cur_rows
        |FROM terms""".stripMargin,

    // q150: winsorization at exact ORDER STATISTICS (value at rank
    // ceil(p·n)) — the rank comes from the SAME double product in both
    // engines (a DuckDB decimal 0.05·n is exact where the double is not,
    // which flips ceil at exact-integer boundaries)
    "q150_winsorize" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |cuts AS (
        |  SELECT flag,
        |    min(CASE WHEN rn = ceil(CAST(0.05 AS DOUBLE) * n) THEN price END) AS p_lo,
        |    min(CASE WHEN rn = ceil(CAST(0.95 AS DOUBLE) * n) THEN price END) AS p_hi
        |  FROM r
        |  WHERE rn = ceil(CAST(0.05 AS DOUBLE) * n)
        |     OR rn = ceil(CAST(0.95 AS DOUBLE) * n)
        |  GROUP BY 1)
        |SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  CAST(sum(CAST(least(greatest(l_extendedprice, p_lo), p_hi) AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum,
        |  min(p_lo) AS p_lo, min(p_hi) AS p_hi
        |FROM lineitem JOIN cuts ON l_returnflag = flag
        |GROUP BY 1""".stripMargin,

    // q151: chi-square of independence; each cell's (o−e)²/e VARCHAR-bridges
    // into decimal before the exact fold
    "q151_chisq" ->
      """WITH obs AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS o
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT *, sum(o) OVER (PARTITION BY l_returnflag) AS row_t,
        |    sum(o) OVER (PARTITION BY l_linestatus) AS col_t,
        |    sum(o) OVER () AS n
        |  FROM obs)
        |SELECT
        |  CAST(CAST(sum(CAST(CAST(
        |    (CAST(o AS DOUBLE) - CAST(row_t * col_t AS DOUBLE) / n)
        |    * (CAST(o AS DOUBLE) - CAST(row_t * col_t AS DOUBLE) / n)
        |    / (CAST(row_t * col_t AS DOUBLE) / n)
        |    AS VARCHAR) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS chi2,
        |  CAST((count(DISTINCT l_returnflag) - 1)
        |     * (count(DISTINCT l_linestatus) - 1) AS BIGINT) AS dof,
        |  CAST(max(n) AS BIGINT) AS n_rows
        |FROM m""".stripMargin,

    // q152: BM25 with Lucene idf; per-term scores VARCHAR-bridge into
    // decimal before the per-document sum; ln() verified bit-equal across
    // engines on this data by the gate itself
    "q152_bm25" -> bm25OracleSql,

    // q159: schema-evolving MERGE — carried rows read a typed NULL channel,
    // updated (every 3rd F-key, price+1.0) and inserted (every 3rd O-key)
    // rows carry 'WEB'; +1.0 on a double is exact IEEE in both engines
    "q159_evolving_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, CAST(NULL AS VARCHAR) AS o_channel
        |FROM t WHERE o_orderkey % 3 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |  'WEB' AS o_channel
        |FROM t WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |  'WEB' AS o_channel
        |FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'O'""".stripMargin,

    // q160: salted two-phase aggregation must equal the PLAIN group-by —
    // the decomposition is invisible because the partials are associative
    "q160_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin,

    // q163: the streaming drift monitor must equal the batch PSI of the
    // same cohorts — counts are complete-mode (batch-boundary-independent)
    // and the scoring is the shared q155 formula
    "q163_stream_psi" ->
      """WITH counts AS (
        |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n_ref,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS n_cur
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT *, sum(n_ref) OVER () AS t_ref, sum(n_cur) OVER () AS t_cur,
        |    count(*) OVER () AS n_buckets
        |  FROM counts),
        |terms AS (
        |  SELECT
        |    CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_buckets) AS p_ref,
        |    CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_buckets) AS p_cur,
        |    t_ref, t_cur, n_buckets
        |  FROM m)
        |SELECT
        |  CAST(CAST(sum(CAST(CAST(
        |    (p_cur - p_ref) * CAST(CAST(CAST(CAST(ln(p_cur / p_ref)
        |      AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)
        |    AS VARCHAR) AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS psi,
        |  CAST(max(n_buckets) AS BIGINT) AS n_buckets,
        |  CAST(max(t_ref) AS BIGINT) AS n_ref_rows,
        |  CAST(max(t_cur) AS BIGINT) AS n_cur_rows
        |FROM terms""".stripMargin,

    // q161: FILTER-clause conditional aggregation, decimal-exact inside
    // each slice
    "q161_filtered_aggs" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_high_disc,
        |  CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS high_disc_price,
        |  CAST(sum(CAST(l_tax AS DECIMAL(18,4)))
        |    FILTER (WHERE l_quantity >= 25) AS DOUBLE)
        |    / count(*) FILTER (WHERE l_quantity >= 25) AS bulk_avg_tax
        |FROM lineitem GROUP BY 1""".stripMargin,

    // q162: correlated EXISTS + exact-decimal scalar-subquery threshold
    "q162_subqueries" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders o
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > TIMESTAMP '2000-06-01 00:00:00')
        |  AND o_totalprice > (
        |    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*)
        |    FROM orders)""".stripMargin,

    // q158: reciprocal-rank fusion of the BM25 arm and the exact-cosine
    // arm; both score columns are bit-exact cross-engine, so the fused
    // ranking (rank arithmetic only) is deterministic end to end
    "q158_hybrid_search" ->
      s"""WITH lexbase AS ($bm25OracleSql),
         |lex AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex
         |  FROM lexbase),
         |$scaledVecs,
         |qv AS (SELECT svec AS qvec, norm2 AS qnorm2 FROM w WHERE vec_id = 0),
         |sem0 AS (SELECT vec_id AS doc_id,
         |    ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |  FROM qv, w WHERE vec_id <> 0),
         |sem AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r_sem
         |  FROM sem0)
         |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, r_lex, r_sem,
         |  COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r_lex), CAST(0 AS DOUBLE))
         |  + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r_sem), CAST(0 AS DOUBLE)) AS rrf
         |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id""".stripMargin,

    // q153: Shannon entropy per source; p·ln p terms VARCHAR-bridge into
    // decimal before the exact per-source fold
    "q153_entropy" ->
      """WITH counts AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT source,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |        FROM documents)
        |  GROUP BY 1, 2),
        |m AS (SELECT *, sum(cnt) OVER (PARTITION BY source) AS total FROM counts)
        |SELECT source, CAST(max(total) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(CAST(sum(CAST(CAST(
        |    -(CAST(cnt AS DOUBLE) / total * CAST(CAST(CAST(CAST(
        |        ln(CAST(cnt AS DOUBLE) / total)
        |        AS VARCHAR) AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE))
        |    AS VARCHAR) AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) AS entropy
        |FROM m GROUP BY 1""".stripMargin,

    // q148: bloom-sidecar point lookup must be invisible in the result —
    // the oracle is the plain IN-filter; the spec pins the group skipping
    "q148_bloom_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey IN (1, 7, 32, 128, 515, 2048, 9999)""".stripMargin,

    // q149: dense (type × hour) spine; missing hours n=0 with a
    // forward-filled last observed hourly sum (leading gaps stay NULL)
    "q149_gap_fill" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM h),
        |types AS (SELECT DISTINCT event_type FROM h),
        |spine AS (SELECT t.event_type,
        |    unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS hour
        |  FROM types t, b)
        |SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n,
        |  last_value(h.value_sum IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value_sum
        |FROM spine s
        |LEFT JOIN h ON s.event_type = h.event_type AND s.hour = h.hour""".stripMargin,

    // q147: the analytic-window surface; ratios/offsets of exact ranks over
    // a totalized ORDER BY (ties broken by the unique custkey)
    "q147_window_showcase" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  c_acctbal - lag(c_acctbal, 1) OVER w AS gap_prev,
        |  first_value(c_acctbal) OVER w AS segment_min
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,

    // the TRAINED BPE tokenizer, oracle-gated end to end: ⌈k/B⌉ unrolled
    // BATCHED merge rounds in pure string SQL replay Bpe.train exactly;
    // global merge_rank orders by (round, within-round candidate rank)
    "q117_bpe_merges" ->
      s"""WITH ${bpeCtes(BpeK, graft.ops.Bpe.BatchB)}
         |SELECT CAST(row_number() OVER (ORDER BY round, rk) AS BIGINT) AS merge_rank,
         |  a AS left_sym, b AS right_sym FROM (
         |${(0 until BpeRounds).map(r =>
          s"  SELECT $r AS round, rk, a, b FROM sel$r")
          .mkString("\n  UNION ALL\n")}
         |)""".stripMargin,

    "q118_bpe_tokens" ->
      s"""WITH ${bpeCtes(BpeK, graft.ops.Bpe.BatchB)},
         |counts AS (
         |  SELECT word, len(string_split(trim(seg), ' ')) AS n_sub FROM s$BpeRounds),
         |dw AS (SELECT doc_id, unnest(toks) AS word FROM d),
         |j AS (
         |  SELECT dw.doc_id, count(*) AS n_words, sum(c.n_sub) AS n_subword_tokens
         |  FROM dw JOIN counts c USING (word) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(j.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(j.n_subword_tokens, 0) AS BIGINT) AS n_subword_tokens
         |FROM d LEFT JOIN j USING (doc_id)""".stripMargin,

    // q188: tokenizer fertility per language — same trained merges as
    // q117/q118 (the unrolled-training CTEs), folded per lang; both ratios
    // are single divisions of exact counts
    "q188_bpe_fertility" ->
      s"""WITH ${bpeCtes(BpeK, graft.ops.Bpe.BatchB)},
         |counts AS (
         |  SELECT word, len(string_split(trim(seg), ' ')) AS n_sub FROM s$BpeRounds),
         |dw AS (SELECT doc_id, unnest(toks) AS word FROM d),
         |jl AS (
         |  SELECT doc.lang, dw.word, c.n_sub
         |  FROM dw
         |  JOIN counts c USING (word)
         |  JOIN documents doc ON doc.doc_id = dw.doc_id)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_subword_tokens,
         |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(n_sub) AS DOUBLE) / count(*) AS fertility,
         |  CAST(sum(len(word)) AS DOUBLE) / sum(n_sub) AS chars_per_subword
         |FROM jl GROUP BY 1""".stripMargin,

    // left-outer stream-stream join, restricted to the watermark-finalized
    // slice where match-or-null status is deterministic
    "q116_stream_ljoin" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id AS cu, ts AS cts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, c.click_id
        |FROM p CROSS JOIN m
        |LEFT JOIN c ON c.cu = p.user_id
        |  AND c.cts >= p.pts - INTERVAL 10 MINUTE AND c.cts <= p.pts
        |WHERE p.pts <= m.mx - INTERVAL 2 HOUR""".stripMargin,

    // small-file compaction is lossless: fragment -> coalesce-rewrite -> read
    // back must reproduce the source table bit for bit
    "q115_compaction" ->
      "SELECT * FROM lineitem",

    // streaming -> foreachBatch -> JDBC warehouse round trip: the oracle is
    // the batch rollup restricted to watermark-finalized windows (the same
    // horizon contract the trendingToParquet spec pins)
    "q114_stream_jdbc" ->
      """WITH r AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT max(ts) AS mx FROM events)
        |SELECT hour, event_type, n_events, total_value
        |FROM r CROSS JOIN m
        |WHERE hour + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR""".stripMargin,

    // hopping windows: every event belongs to window/slide = 4 hops; Spark's
    // epoch-aligned window() boundaries == 15-minute time_buckets
    "q113_hopping_window" ->
      """WITH h AS (SELECT unnest(range(0, 4)) AS k),
        |e AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - to_minutes(CAST(k * 15 AS BIGINT)) AS window_start,
        |         event_type, user_id, value
        |  FROM events CROSS JOIN h)
        |SELECT window_start,
        |  window_start + INTERVAL '1 hour' AS window_end,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    // the built-in session_window spelling — fourth implementation of the
    // same semantics, same shared oracle as q15/q34/q82/q84 (the corpus has
    // no exact-30:00 gap, so the boundary conventions agree; see Scaladoc)
    "q105_session_window" ->
      sessionizeOracle,

    "q16_dedup_exact" ->
      s"""SELECT md5($normText) AS fingerprint,
         |  min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,

    "q17_ngram_jaccard" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes,
         |docs3 AS (
         |  SELECT doc_id, lang, n_chars, ${shingles(3)} AS grams FROM documents),
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS n_common,
         |    CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
         |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS jaccard
         |  FROM cand c
         |  JOIN docs3 x ON c.doc_a = x.doc_id
         |  JOIN docs3 y ON c.doc_b = y.doc_id
         |  WHERE x.lang = y.lang AND abs(x.n_chars - y.n_chars) <= 20)
         |SELECT * FROM pairs WHERE jaccard >= 0.5""".stripMargin,

    "q18_minhash_sig" ->
      s"""WITH $minhashSigs
         |SELECT doc_id, CAST(h_idx AS INTEGER) AS h_idx, minhash FROM sigs""".stripMargin,

    "q19_lsh_pairs" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes
         |SELECT doc_a, doc_b FROM cand""".stripMargin,

    "q20_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sh""".stripMargin,

    "q35_simhash_pairs" ->
      s"""WITH $simhashCte,
         |bands AS (
         |  SELECT doc_id, simhash, b.i AS band_idx,
         |    (simhash >> CAST(b.i * 12 AS INT)) & 4095 AS band_val
         |  FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) b),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sim_a, b.simhash AS sim_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3""".stripMargin,

    "q36_ivf_topk" ->
      s"""WITH $scaledVecs,
         |c AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
         |ac AS (SELECT w.vec_id, w.svec, w.norm2, c.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, c.cent_id ASC) AS rn
         |       FROM w CROSS JOIN c),
         |asg AS (SELECT vec_id, svec, norm2, cent_id AS cell FROM ac WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2, cell AS qcell
         |      FROM asg WHERE vec_id < 20),
         |cand AS (SELECT query_id, vec_id,
         |           ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |         FROM q JOIN asg ON qcell = cell AND query_id <> vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM cand QUALIFY rk <= 3""".stripMargin,

    "q21_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS word_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS distinct_words,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) AS chars_per_token
        |FROM documents""".stripMargin,

    "q22_text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  stop_ratio AS stopword_ratio,
        |  punct_per_char,
        |  mean_word_len,
        |  stop_ratio * 0.5 + punct_per_char * 0.2 + mean_word_len * 0.05 AS quality_score
        |FROM (
        |  SELECT doc_id, n_chars,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|it|that|for)\b')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS stop_ratio,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / n_chars AS punct_per_char,
        |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len
        |  FROM documents)""".stripMargin,

    "q23_lang_id" -> langIdSql,

    // q220: confusion matrix over the q23 classifier — shares langIdSql
    // verbatim so the two can never silently diverge
    "q220_langid_confusion" ->
      s"""WITH p AS ($langIdSql),
         |t AS (SELECT labeled_lang, CAST(count(*) AS BIGINT) AS n_true FROM p GROUP BY 1),
         |c AS (
         |  SELECT labeled_lang, guessed_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT c.labeled_lang, c.guessed_lang, c.n, t.n_true,
         |  CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS share_of_true,
         |  c.labeled_lang = c.guessed_lang AS is_correct
         |FROM c JOIN t USING (labeled_lang)""".stripMargin,

    "q24_fingerprint" ->
      s"""SELECT doc_id, md5($normText) AS fingerprint,
         |  CAST(length($normText) AS BIGINT) AS norm_len
         |FROM documents""".stripMargin,

    "q25_cosine_topk" ->
      s"""WITH $scaledVecs,
         |q AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2 FROM w WHERE vec_id < 20),
         |c AS (SELECT query_id, vec_id,
         |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |      FROM q, w WHERE query_id <> vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM c QUALIFY rk <= 5""".stripMargin,

    "q26_ann_topk" ->
      s"""WITH $scaledVecs,
         |vb AS (SELECT vec_id, svec, norm2, ${signBucket("svec")} AS bucket FROM w),
         |q AS (SELECT vec_id AS query_id, svec AS qvec, norm2 AS qnorm2, bucket AS qbucket
         |      FROM vb WHERE vec_id < 20),
         |c AS (SELECT query_id, vec_id,
         |        ${cosine("qvec", "svec", "qnorm2", "norm2")} AS cosine
         |      FROM q JOIN vb ON qbucket = bucket AND query_id <> vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM c QUALIFY rk <= 3""".stripMargin,

    "q27_embed_neardup" ->
      s"""WITH $scaledVecs,
         |vb AS (SELECT vec_id, svec, norm2, ${signBucket("svec", 6)} AS bucket FROM w),
         |pr AS (
         |  SELECT vec_id, svec, norm2,
         |    CASE WHEN h.i = 6 THEN bucket
         |         ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(h.i AS INT)) END AS probe
         |  FROM vb CROSS JOIN (SELECT unnest(range(0, 7)) AS i) h),
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosine("a.svec", "b.svec", "a.norm2", "b.norm2")} AS cosine
         |  FROM vb a JOIN pr b ON a.bucket = b.probe AND a.vec_id < b.vec_id)
         |SELECT * FROM pairs WHERE cosine >= 0.3""".stripMargin,

    // the composed IVF-PQ index: q36's cell routing bounds the candidates,
    // q107's ADC scoring bounds per-candidate cost, exact rerank of the
    // 20-deep shortlist restores precision — hash-gated end to end
    "q109_ivfpq_search" ->
      s"""WITH $pqCtes,
         |ivc AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
         |iac AS (SELECT w.vec_id, w.svec, w.norm2, ivc.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, ivc.cent_id ASC) AS rn
         |       FROM w CROSS JOIN ivc),
         |iasg AS (SELECT vec_id, cent_id AS cell FROM iac WHERE rn = 1),
         |icand AS (SELECT a.vec_id AS query_id, b.vec_id
         |  FROM iasg a JOIN iasg b ON a.cell = b.cell AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 20),
         |ql AS (SELECT sub.vec_id AS query_id, sub.m, c.cent_id AS code,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
         |      i -> sub.sub[CAST(i AS INT)] * c.cvec[CAST(i AS INT)])), (x, y) -> x + y) AS pdot,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
         |      i -> c.cvec[CAST(i AS INT)] * c.cvec[CAST(i AS INT)])), (x, y) -> x + y) AS cnorm2
         |  FROM sub JOIN c2 c ON sub.m = c.m WHERE sub.vec_id < 20),
         |qn AS (SELECT vec_id AS query_id, norm2 AS qnorm2 FROM w WHERE vec_id < 20),
         |sc AS (SELECT ca.query_id, ca.vec_id, SUM(q2.pdot) AS adot, SUM(q2.cnorm2) AS anorm2
         |  FROM icand ca
         |  JOIN af a ON ca.vec_id = a.vec_id
         |  JOIN ql q2 ON q2.query_id = ca.query_id AND q2.m = a.m AND q2.code = a.cent_id
         |  GROUP BY 1, 2),
         |r AS (SELECT sc.query_id, sc.vec_id, CAST(sc.adot AS DOUBLE) /
         |    (sqrt(CAST(qn.qnorm2 AS DOUBLE)) * sqrt(CAST(sc.anorm2 AS DOUBLE))) AS approx_cosine
         |  FROM sc JOIN qn ON sc.query_id = qn.query_id),
         |short AS (SELECT query_id, vec_id FROM r
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY approx_cosine DESC, vec_id ASC) <= 20),
         |re AS (SELECT s.query_id, s.vec_id,
         |    ${cosine("qw.svec", "vw.svec", "qw.norm2", "vw.norm2")} AS cosine
         |  FROM short s
         |  JOIN w qw ON s.query_id = qw.vec_id
         |  JOIN w vw ON s.vec_id = vw.vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM re QUALIFY rk <= 3""".stripMargin,

    // q27's verified pairs as edges, closed to duplicate families by the
    // same recursive min-label closure as the document chain (q55)
    "q108_embed_clusters" ->
      s"""WITH RECURSIVE $scaledVecs,
         |vb AS (SELECT vec_id, svec, norm2, ${signBucket("svec", 6)} AS bucket FROM w),
         |pr AS (
         |  SELECT vec_id, svec, norm2,
         |    CASE WHEN h.i = 6 THEN bucket
         |         ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(h.i AS INT)) END AS probe
         |  FROM vb CROSS JOIN (SELECT unnest(range(0, 7)) AS i) h),
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosine("a.svec", "b.svec", "a.norm2", "b.norm2")} AS cosine
         |  FROM vb a JOIN pr b ON a.bucket = b.probe AND a.vec_id < b.vec_id),
         |vp AS (SELECT vec_a, vec_b FROM pairs WHERE cosine >= 0.3),
         |edges AS MATERIALIZED (
         |  SELECT vec_a AS src, vec_b AS dst FROM vp
         |  UNION ALL SELECT vec_b, vec_a FROM vp),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
         |  WHERE r.lbl < e.dst)
         |SELECT id AS vec_id, min(lbl) AS cluster_id,
         |  (id = min(lbl)) AS is_representative
         |FROM reach GROUP BY id""".stripMargin,

    // add-one-smoothed bigram LM in exact ppm fixed point (log-free, like
    // q57's rational TF-IDF): Spark `div` ≡ DuckDB `//` on non-negative longs
    "q110_bigram_lm" ->
      s"""WITH $bigramLmCtes,
        |ca AS (SELECT CAST(sum(ppm_sum) AS DOUBLE) / sum(n_bigrams) AS corpus_avg
        |       FROM per_doc)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(p.ppm_sum, 0) AS BIGINT) AS ppm_sum,
        |  CASE WHEN coalesce(p.n_bigrams, 0) > 0
        |       THEN CAST(p.ppm_sum AS DOUBLE) / p.n_bigrams END AS avg_ppm,
        |  coalesce(CAST(p.ppm_sum AS DOUBLE) / p.n_bigrams < ca.corpus_avg, false)
        |    AS below_corpus_avg
        |FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        |CROSS JOIN ca""".stripMargin,

    // q314: per-doc LM perplexity filter — q110's model chain verbatim
    // (shared CTE fragment), global (avg_ppm, doc_id) rank, keep line the
    // exact integer rk > (n·200)//1000; unscoreable docs kept=false
    "q314_perplexity_filter" ->
      s"""WITH $bigramLmCtes,
        |sc AS (
        |  SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |    CAST(ppm_sum AS DOUBLE) / n_bigrams AS avg_ppm
        |  FROM per_doc),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_scored FROM sc),
        |r AS (
        |  SELECT doc_id, n_bigrams, avg_ppm,
        |    CAST(row_number() OVER (ORDER BY avg_ppm, doc_id) AS BIGINT) AS rk
        |  FROM sc)
        |SELECT doc_id, n_bigrams, avg_ppm, rk,
        |  rk > (n_scored * 200) // 1000 AS kept
        |FROM r CROSS JOIN nn
        |UNION ALL
        |SELECT d.doc_id, CAST(0 AS BIGINT) AS n_bigrams,
        |  CAST(NULL AS DOUBLE) AS avg_ppm, CAST(NULL AS BIGINT) AS rk,
        |  false AS kept
        |FROM d LEFT JOIN per_doc p USING (doc_id)
        |WHERE p.doc_id IS NULL""".stripMargin,

    // q244: PMI collocations per language — bigram-position marginals (one
    // consistent sample space, exact ints), four bridged lns in ONE fixed
    // tree, top-10 per lang with the bigram text as tiebreak
    "q244_pmi_collocations" -> {
      def lnB(x: String): String =
        s"CAST(CAST(CAST(CAST(ln(CAST($x AS DOUBLE)) AS VARCHAR) " +
          s"AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)"
      s"""WITH d AS (
        |  SELECT COALESCE(lang, chr(0)) AS lang,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT lang,
        |    unnest(CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |        i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])
        |    ELSE [] END) AS bigram
        |  FROM d),
        |cab AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM b GROUP BY 1, 2),
        |w AS (SELECT lang, bigram, c_ab,
        |  split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2
        |  FROM cab),
        |ca AS (SELECT lang, w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM w GROUP BY 1, 2),
        |cb AS (SELECT lang, w2, CAST(sum(c_ab) AS BIGINT) AS c_b FROM w GROUP BY 1, 2),
        |nb AS (SELECT lang, CAST(sum(c_ab) AS BIGINT) AS n_bi FROM w GROUP BY 1),
        |sc AS (
        |  SELECT w.lang, w.bigram, w.c_ab, ca.c_a, cb.c_b, nb.n_bi,
        |    (${lnB("w.c_ab")} + ${lnB("nb.n_bi")})
        |      - ${lnB("ca.c_a")} - ${lnB("cb.c_b")} AS pmi
        |  FROM w
        |  JOIN ca ON ca.lang = w.lang AND ca.w1 = w.w1
        |  JOIN cb ON cb.lang = w.lang AND cb.w2 = w.w2
        |  JOIN nb ON nb.lang = w.lang
        |  WHERE w.c_ab >= 5),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY pmi DESC, bigram) AS rn FROM sc)
        |SELECT lang, bigram, c_ab, c_a, c_b, n_bi, pmi FROM r
        |WHERE rn <= 10""".stripMargin
    },

    // DSIR-shaped importance weights: hashed-bigram bucket probabilities per
    // slice in exact ppm fixed point, evidence = occurrence-weighted tp - rp
    "q111_dsir_weights" ->
      """WITH d AS (
        |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |    unnest(CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |        i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])
        |    ELSE [] END) AS bigram
        |  FROM d),
        |f AS (
        |  SELECT doc_id, is_target,
        |    CAST('0x' || substr(md5(bigram), 1, 8) AS BIGINT) % 4096 AS bucket,
        |    count(*) AS n
        |  FROM b GROUP BY 1, 2, 3),
        |tb AS (SELECT bucket, sum(n) AS t_b FROM f WHERE is_target GROUP BY 1),
        |rb AS (SELECT bucket, sum(n) AS r_b FROM f WHERE NOT is_target GROUP BY 1),
        |tot AS (
        |  SELECT sum(CASE WHEN is_target THEN n ELSE 0 END) AS t_total,
        |         sum(CASE WHEN NOT is_target THEN n ELSE 0 END) AS r_total
        |  FROM f),
        |s AS (
        |  SELECT f.doc_id, f.n,
        |    ((coalesce(tb.t_b, 0) + 1) * 1000000) // (tot.t_total + 4096) AS tp,
        |    ((coalesce(rb.r_b, 0) + 1) * 1000000) // (tot.r_total + 4096) AS rp
        |  FROM f
        |  LEFT JOIN tb USING (bucket)
        |  LEFT JOIN rb USING (bucket)
        |  CROSS JOIN tot),
        |pd AS (
        |  SELECT doc_id, sum(n) AS n_features, sum(n * (tp - rp)) AS weight_ppm
        |  FROM s GROUP BY 1)
        |SELECT d.doc_id, d.source,
        |  CAST(coalesce(pd.n_features, 0) AS BIGINT) AS n_features,
        |  CAST(coalesce(pd.weight_ppm, 0) AS BIGINT) AS weight_ppm,
        |  coalesce(pd.weight_ppm, 0) > 0 AS target_like
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,

    // blocked fuzzy entity resolution: distinct names -> levenshtein edges
    // within a first-token block -> recursive min-label closure (the q55/q108
    // CC oracle shape, over string labels)
    "q112_part_entities" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        |nb AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n),
        |e AS (
        |  SELECT a.p_name AS src, b.p_name AS dst
        |  FROM nb a JOIN nb b
        |  ON a.blk = b.blk AND a.p_name < b.p_name
        |    AND levenshtein(a.p_name, b.p_name) <= 3),
        |edges AS MATERIALIZED (
        |  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |reach(id, lbl) AS (
        |  SELECT p_name, p_name FROM n
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
        |  WHERE r.lbl < e.dst),
        |lab AS (SELECT id AS p_name, min(lbl) AS entity_name FROM reach GROUP BY 1)
        |SELECT p.p_partkey, p.p_name, l.entity_name,
        |  p.p_name = l.entity_name AS is_canonical
        |FROM part p JOIN lab l USING (p_name)""".stripMargin,

    "q28_binary_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(from_hex(md5(text))) AS BIGINT) AS n_bytes,
        |  to_base64(from_hex(md5(text))) AS payload_b64,
        |  md5(to_base64(from_hex(md5(text)))) AS checksum_hex
        |FROM documents""".stripMargin,

    "q29_media_decode" ->
      s"""SELECT doc_id, 'image/fake' AS media_type,
         |  CAST(octet_length(from_hex(h)) AS INTEGER) AS n_bytes,
         |  md5(to_base64(from_hex(h))) AS checksum_hex,
         |  CAST(1 + ${hexByte("h", 1)} % 128 AS INTEGER) AS fake_width,
         |  CAST(1 + ${hexByte("h", 31)} % 128 AS INTEGER) AS fake_height
         |FROM (SELECT doc_id, md5(text) AS h FROM documents)""".stripMargin,

    "q37_media_resize" ->
      s"""WITH dims AS (
         |  SELECT doc_id, 'image/fake' AS media_type,
         |    CAST(1 + ${hexByte("h", 1)} % 128 AS INTEGER) AS orig_width,
         |    CAST(1 + ${hexByte("h", 31)} % 128 AS INTEGER) AS orig_height
         |  FROM (SELECT doc_id, md5(text) AS h FROM documents)),
         |s AS (
         |  SELECT *, least(CAST(1.0 AS DOUBLE),
         |    CAST(32.0 AS DOUBLE) / orig_width,
         |    CAST(32.0 AS DOUBLE) / orig_height) AS scale
         |  FROM dims)
         |SELECT doc_id, media_type, orig_width, orig_height,
         |  CAST(greatest(1, floor(orig_width * scale)) AS INTEGER) AS width,
         |  CAST(greatest(1, floor(orig_height * scale)) AS INTEGER) AS height,
         |  scale
         |FROM s""".stripMargin,

    "q38_frame_sample" ->
      """SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
        |  CAST(f.i * 1000 AS BIGINT) AS frame_ms,
        |  md5(concat(to_base64(from_hex(md5(text))), ':', f.i)) AS frame_checksum
        |FROM documents CROSS JOIN (SELECT unnest(range(0, 3)) AS i) f""".stripMargin,

    "q30_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q31_jdbc_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",

    // identical to q15: one AvailableNow batch through the stateful
    // sessionizer must reproduce the batch sessionization
    "q34_stream_sessionize" ->
      sessionizeOracle,

    // identical to q11: the partitioned write + partition-discovery read must
    // be lossless down to the partition-key values
    "q32_sink_roundtrip" ->
      s"""SELECT n_nationkey AS store_id, n_name AS store_name,
         |  s_suppkey AS sales_person_id, s_name AS sales_person_name,
         |  o_orderkey AS order_id,
         |  strftime(o_orderdate, '%Y-%m-%d') AS sales_date,
         |  $totalCost AS total_cost,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month
         |$enrichJoin""".stripMargin,

    "q42_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q43_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin,

    "q46_anti_join" ->
      """SELECT o_orderkey, o_orderstatus
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey
        |                    AND l.l_shipdate >= TIMESTAMP '1998-01-01')""".stripMargin,

    "q44_outer_join" ->
      """SELECT c_custkey, coalesce(n.cnt, 0) AS n_orders
        |FROM customer c
        |LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) n
        |  ON c.c_custkey = n.o_custkey""".stripMargin,

    "q45_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q47_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, ts, event_id, event_type, 1 AS is_l, CAST(NULL AS BIGINT) AS click_id
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, ts, NULL, NULL, 0, click_id FROM clicks),
        |f AS (
        |  SELECT *, last_value(click_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, is_l DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id
        |  FROM u)
        |SELECT event_id, ts, user_id, event_type, asof_click_id
        |FROM f WHERE is_l = 1""".stripMargin,

    "q48_range_join" ->
      """SELECT p_partkey, p_retailprice, band_id, lo, hi
        |FROM part
        |JOIN (VALUES
        |  (0, CAST(900.0 AS DOUBLE), CAST(905.0 AS DOUBLE)),
        |  (1, CAST(905.0 AS DOUBLE), CAST(910.0 AS DOUBLE)),
        |  (2, CAST(910.0 AS DOUBLE), CAST(915.0 AS DOUBLE)),
        |  (3, CAST(915.0 AS DOUBLE), CAST(920.0 AS DOUBLE))) b(band_id, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi""".stripMargin,

    "q49_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY 1""".stripMargin,

    // identical to q12: the reference-shaped window+distinct formulation must
    // produce the same rows as the idiomatic groupBy (SURVEY §2.4 equivalence)
    "q41_monthly_bitcompat" ->
      s"""SELECT c_custkey AS customer_id, c_name AS full_name,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month,
         |  CAST(SUM(CAST($totalCost AS DECIMAL(22,4))) AS DOUBLE) AS total_sales
         |$enrichJoin
         |GROUP BY 1, 2, 3""".stripMargin,

    // identical to q01: one AvailableNow drain of the CSV drop through a
    // checkpointed parquet sink must reproduce the source table exactly
    "q39_stream_ingest" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem""".stripMargin,

    "q40_corpus_filter" -> trainingFilterSql,

    // content-addressed 0..999 bucket shared by q50/q51/q54 — the Spark twin
    // is Corpus.hashBucket
    "q50_hash_split" ->
      """SELECT doc_id, lang,
        |  CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
        |       WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 950 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // q245: train/valid JS + KL divergence — Laplace-smoothed unigram dists
    // over the joint vocab; p/q single divisions of exact ints, each
    // p·ln(·) term a fixed tree over the 12-decimal ln bridge, sums through
    // the quantized fold; split is the q50 hash, inlined (no join)
    "q245_split_divergence" -> {
      def lnB(x: String): String =
        s"CAST(CAST(CAST(CAST(ln($x) AS VARCHAR) " +
          s"AS DECIMAL(18,12)) AS VARCHAR) AS DOUBLE)"
      def q12(x: String): String =
        s"CAST(CAST($x AS VARCHAR) AS DECIMAL(28,12))"
      s"""WITH d AS (
        |  SELECT CASE
        |      WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
        |      WHEN CAST('0x' || substr(md5(doc_id || ':split_v1'), 1, 8) AS BIGINT) % 1000 < 950 THEN 'valid'
        |      ELSE 'test' END AS split,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tc AS (
        |  SELECT term,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS cv
        |  FROM d WHERE split IN ('train', 'valid') GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cv) AS BIGINT) AS nv,
        |  CAST(count(*) AS BIGINT) AS v FROM tc),
        |terms AS (
        |  SELECT nt, nv, v,
        |    CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE) AS p,
        |    CAST(cv + 1 AS DOUBLE) / CAST(nv + v AS DOUBLE) AS q
        |  FROM tc CROSS JOIN tot),
        |contrib AS (
        |  SELECT nt, nv, v,
        |    p * ${lnB("CAST(2 AS DOUBLE) * p / (p + q)")} AS jt,
        |    q * ${lnB("CAST(2 AS DOUBLE) * q / (p + q)")} AS jv,
        |    p * ${lnB("p / q")} AS kt,
        |    q * ${lnB("q / p")} AS kv
        |  FROM terms),
        |folded AS (
        |  SELECT nt, nv, v,
        |    CAST(CAST(sum(${q12("jt")}) AS VARCHAR) AS DOUBLE) AS fjt,
        |    CAST(CAST(sum(${q12("jv")}) AS VARCHAR) AS DOUBLE) AS fjv,
        |    CAST(CAST(sum(${q12("kt")}) AS VARCHAR) AS DOUBLE) AS kl_train_valid,
        |    CAST(CAST(sum(${q12("kv")}) AS VARCHAR) AS DOUBLE) AS kl_valid_train
        |  FROM contrib GROUP BY 1, 2, 3)
        |SELECT v AS n_vocab, nt AS n_train_tokens, nv AS n_valid_tokens,
        |  CAST(0.5 AS DOUBLE) * (fjt + fjv) AS js_div,
        |  kl_train_valid, kl_valid_train
        |FROM folded""".stripMargin
    },

    "q51_shuffle_shards" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id || ':shuffle_v1'), 1, 8) AS BIGINT) % 1000 % 8 AS shard,
        |    md5(doc_id || '#shuffle_v1') AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shard, shuffle_key,
        |  row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos_in_shard
        |FROM s""".stripMargin,

    "q52_doc_chunks" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, greatest(length(text), 1), 224)) AS i
        |  FROM documents)
        |SELECT doc_id,
        |  (i - 1) // 224 AS chunk_idx,
        |  i AS start,
        |  CAST(length(substr(text, CAST(i AS INT), 256)) AS BIGINT) AS chunk_len,
        |  md5(substr(text, CAST(i AS INT), 256)) AS chunk_md5
        |FROM g""".stripMargin,

    "q53_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.Corpus.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.Corpus.UrlRe}')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.Corpus.LongNumRe}')) AS BIGINT) AS n_longnums,
         |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${graft.ops.Corpus.EmailRe}', '<EMAIL>', 'g'),
         |    '${graft.ops.Corpus.UrlRe}', '<URL>', 'g'),
         |    '${graft.ops.Corpus.LongNumRe}', '<NUM>', 'g')) AS BIGINT) AS redacted_len,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${graft.ops.Corpus.EmailRe}', '<EMAIL>', 'g'),
         |    '${graft.ops.Corpus.UrlRe}', '<URL>', 'g'),
         |    '${graft.ops.Corpus.LongNumRe}', '<NUM>', 'g')) AS redacted_md5
         |FROM documents""".stripMargin,

    "q54_stratified_sample" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(doc_id || ':sample_v1'), 1, 8) AS BIGINT) % 1000 AS bucket,
        |    CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 300 ELSE 100 END AS keep_permille
        |  FROM documents)
        |SELECT * FROM s WHERE bucket < keep_permille""".stripMargin,

    // connected components of the q19 LSH candidate graph: min reachable id
    // per document via a recursive transitive closure (components are small,
    // so the closure is cheap for the oracle; the engine side is iterative
    // min-label propagation)
    // Connected components over the VERIFIED near-dup pairs (q17's output,
    // jaccard >= 0.5); shared CTE chain in `dupCcCtes` above.
    "q55_dup_clusters" ->
      s"""WITH RECURSIVE $dupCcCtes
         |SELECT id AS doc_id, min(lbl) AS cluster_id,
         |  (id = min(lbl)) AS is_representative
         |FROM reach GROUP BY id""".stripMargin,

    // the full dedup loop closed: training filter ∩ near-dup representatives
    "q67_deduped_corpus" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |labels AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         |reps AS (SELECT id FROM labels WHERE id = comp),
         |filtered AS ($trainingFilterSql)
         |SELECT f.doc_id, f.lang, f.n_chars, f.n_tokens, f.quality_score
         |FROM filtered f JOIN reps ON f.doc_id = reps.id""".stripMargin,

    "q66_sequence_pack" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id || ':shuffle_v1'), 1, 8) AS BIGINT) % 1000 % 8 AS shard,
        |    md5(doc_id || '#shuffle_v1') AS shuffle_key,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY shuffle_key, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
        |  CAST(COALESCE(SUM(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY shuffle_key, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 4096 AS pack_id
        |FROM s""".stripMargin,

    "q56_term_topk" ->
      """WITH t AS (
        |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |c AS (SELECT lang, term, count(*) AS n_occurrences FROM t GROUP BY 1, 2)
        |SELECT lang, term, n_occurrences, rnk FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang ORDER BY n_occurrences DESC, term) AS rnk
        |  FROM c)
        |WHERE rnk <= 20""".stripMargin,

    "q57_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, score, rnk FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3""".stripMargin,

    "q58_revenue_deltas" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, CAST(day AS VARCHAR) AS day,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(lag(rev_dec) OVER w AS DOUBLE) AS prev_revenue,
        |  CAST(rev_dec - lag(rev_dec) OVER w AS DOUBLE) AS delta
        |FROM d WINDOW w AS (PARTITION BY priority ORDER BY day)""".stripMargin,

    "q63_moving_avg" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT *, day - DATE '1970-01-01' AS epoch_day FROM d)
        |SELECT priority, CAST(day AS VARCHAR) AS day,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS moving_avg7,
        |  COUNT(*) OVER w AS win_days
        |FROM e WINDOW w AS (
        |  PARTITION BY priority ORDER BY epoch_day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q64_deciles" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,

    // NULLIF: a props row without "k" extracts '' (Spark's from_json yields
    // NULL); SUM over BIGINT widens to HUGEINT in DuckDB, so cast it back
    "q65_json_props" ->
      """SELECT event_type,
        |  count(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (
        |  SELECT event_type,
        |    CAST(NULLIF(regexp_extract(props, '"k": (-?\d+)', 1), '') AS BIGINT) AS k
        |  FROM events)
        |GROUP BY 1""".stripMargin,

    "q72_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "q73_set_ops" ->
      """WITH early AS (
        |  SELECT l_orderkey FROM lineitem
        |  WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'),
        |late AS (
        |  SELECT l_orderkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
        |SELECT l_orderkey, 'both' AS set_op
        |FROM (SELECT l_orderkey FROM early INTERSECT SELECT l_orderkey FROM late)
        |UNION ALL
        |SELECT l_orderkey, 'early_only' AS set_op
        |FROM (SELECT l_orderkey FROM early EXCEPT SELECT l_orderkey FROM late)""".stripMargin,

    "q74_string_funcs" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, translate(c_name, 'aeiou', 'AEIOU')) AS BIGINT) AS edit_dist,
        |  reverse(c_name) AS rev_name,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |  repeat(substr(c_mktsegment, 1, 2), 3) AS seg_echo,
        |  split_part(c_name, '#', 2) AS name_part,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels
        |FROM customer""".stripMargin,

    // the redelivered-and-deduplicated stream must reproduce the source table
    "q69_stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events""".stripMargin,

    // the salt is an execution detail: result == the plain inner join
    "q70_salted_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // the native two-phase top-k operator must agree with the window spelling
    "q68_native_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q59_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // batch twin of the stream-stream attribution join: purchases × same-user
    // clicks within the 10 minutes before the purchase. ts is cast to
    // microsecond TIMESTAMP to mirror the engine's ns→µs truncation — the
    // 10-minute boundary must compare at the same precision on both sides.
    "q60_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)""".stripMargin,

    // MinHash estimate vs exact Jaccard on the LSH candidates; est = matching
    // signature entries / 16, exact = q17's 3-gram Jaccard
    "q62_minhash_est" ->
      s"""WITH $minhashSigs,
         |$bandsCandCtes,
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / 16
         |      AS est_jaccard
         |  FROM cand c
         |  JOIN sigs sa ON sa.doc_id = c.doc_a
         |  JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.h_idx = sa.h_idx
         |  GROUP BY 1, 2),
         |docs3 AS (
         |  SELECT doc_id, ${shingles(3)} AS grams FROM documents),
         |ex AS (
         |  SELECT e.doc_a, e.doc_b, e.est_jaccard,
         |    CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
         |      / (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS jaccard
         |  FROM est e
         |  JOIN docs3 x ON e.doc_a = x.doc_id
         |  JOIN docs3 y ON e.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, est_jaccard, jaccard, abs(est_jaccard - jaccard) AS abs_err
         |FROM ex""".stripMargin,

    // eval/train decontamination by 5-word-gram overlap; the eval slice is the
    // 200‰ hash split under salt eval_v1 (Corpus.hashBucket twin)
    // shared VERBATIM by q316 (the streaming contamination monitor) — the
    // q268 batch/stream parity convention: one SQL string, two engines' tiers
    "q75_decontaminate" -> decontaminateOracle,
    "q316_stream_decontam" -> decontaminateOracle,

    // Gopher-style repetition signals: repeated-token fraction + share of the
    // most frequent bigram. [NULL] keeps zero-bigram docs in the output with
    // counts of 0 (count(bigram) skips the null).
    "q76_repetition" ->
      """WITH b AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(toks) > 0
        |         THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |         ELSE CAST(0 AS DOUBLE) END AS dup_token_frac,
        |    unnest(CASE WHEN len(toks) >= 2 THEN
        |        list_transform(range(1, len(toks)),
        |          i -> array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 1 AS INT)), ' '))
        |      ELSE [NULL] END) AS bigram
        |  FROM b),
        |c AS (SELECT doc_id, n_tokens, dup_token_frac, bigram, count(bigram) AS n
        |      FROM s GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, n_tokens, dup_token_frac,
        |  CAST(SUM(n) AS BIGINT) AS n_bigrams,
        |  CAST(MAX(n) AS BIGINT) AS top_bigram_n,
        |  CASE WHEN SUM(n) > 0 THEN CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |       ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    // one Lloyd iteration: assign to seed centroids (vec_id < 16), recompute
    // centroids as floor(mean) over the exact int64-scaled components, reassign
    "q77_kmeans_step" ->
      s"""WITH $scaledVecs,
         |c0 AS (SELECT vec_id AS cent_id, svec AS cvec, norm2 AS cnorm2 FROM w WHERE vec_id < 16),
         |a0r AS (SELECT w.vec_id, w.svec, w.norm2, c0.cent_id,
         |         row_number() OVER (PARTITION BY w.vec_id
         |           ORDER BY ${cosine("w.svec", "cvec", "w.norm2", "cnorm2")} DESC, c0.cent_id ASC) AS rn
         |       FROM w CROSS JOIN c0),
         |a0 AS (SELECT vec_id, svec, norm2, cent_id AS cell0 FROM a0r WHERE rn = 1),
         |ex AS (SELECT cell0, d.i, svec[CAST(d.i AS INT)] AS val
         |       FROM a0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
         |cm AS (SELECT cell0, i, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
         |       FROM ex GROUP BY 1, 2),
         |c1 AS (SELECT cell0 AS cent_id, array_agg(comp ORDER BY i) AS cvec FROM cm GROUP BY 1),
         |c1n AS (SELECT cent_id, cvec,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(cvec, x -> x * x)), (a, b) -> a + b) AS cnorm2
         |        FROM c1),
         |a1r AS (SELECT a0.vec_id, a0.cell0, c1n.cent_id,
         |         row_number() OVER (PARTITION BY a0.vec_id
         |           ORDER BY ${cosine("a0.svec", "c1n.cvec", "a0.norm2", "c1n.cnorm2")} DESC, c1n.cent_id ASC) AS rn
         |       FROM a0 CROSS JOIN c1n)
         |SELECT vec_id, cell0, cent_id AS cell1 FROM a1r WHERE rn = 1""".stripMargin,

    // q15's session assignment, then the in-session type path in (ts, event_id)
    // order — string_agg's ORDER BY is the array_sort twin
    "q78_session_paths" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        |  count(*) AS n_events
        |FROM sess GROUP BY 1, 2""".stripMargin,

    // batch twin of the stream-static enrichment rollup
    "q79_stream_segment" ->
      """SELECT c_mktsegment, event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    "q80_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // quality-aware representative per near-dup family: argmax quality_score
    // (ties → lowest id) over the q55 component labels
    "q81_quality_reps" ->
      s"""WITH RECURSIVE $dupCcCtes,
         |labels AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |q AS (SELECT doc_id, $qualityScoreSql AS quality_score FROM documents),
         |j AS (SELECT l.id AS doc_id, l.cluster_id, q.quality_score,
         |        row_number() OVER (PARTITION BY l.cluster_id
         |          ORDER BY q.quality_score DESC, l.id ASC) AS rn,
         |        count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |      FROM labels l JOIN q ON l.id = q.doc_id)
         |SELECT cluster_id, doc_id, quality_score, n_members FROM j WHERE rn = 1""".stripMargin,

    // identical to q15/q34: the RocksDB state store provider is an execution
    // detail — one AvailableNow pass through the stateful sessionizer with
    // off-heap state must still reproduce the batch sessionization
    "q82_sessionize_rocksdb" ->
      sessionizeOracle,

    // identical to q15/q34/q82: the transformWithState (arbitrary-state v2)
    // sessionizer runs the same advance core against a named ValueState slot
    "q84_sessionize_tws" ->
      sessionizeOracle,

    // external-suite decontamination: the "benchmark suite" is the 50‰ hash
    // slice under salt suite_v2; training docs are everything else
    "q83_decontam_external" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id || ':suite_v2'), 1, 8) AS BIGINT) % 1000 < 50 AS in_suite,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, in_suite,
        |    CASE WHEN len(toks) >= 5 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' '))))
        |    ELSE [] END AS grams
        |  FROM d),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE in_suite),
        |t AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT in_suite),
        |hits AS (
        |  SELECT t.doc_id, count(*) AS n_grams, count(e.gram) AS n_hits
        |  FROM t LEFT JOIN e ON t.gram = e.gram GROUP BY t.doc_id)
        |SELECT g.doc_id,
        |  CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  COALESCE(h.n_hits, 0) > 0 AS is_contaminated
        |FROM g LEFT JOIN hits h USING (doc_id)
        |WHERE NOT g.in_suite""".stripMargin,

    // SCD1 latest-wins upsert: every 7th customer re-arrives at version 2
    // with a doubled (exact IEEE) balance; highest version per key survives
    "q85_upsert_latest" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |    CAST(1 AS BIGINT) AS version
        |  FROM customer),
        |chg AS (
        |  SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal, c_mktsegment,
        |    CAST(2 AS BIGINT) AS version
        |  FROM customer WHERE c_custkey % 7 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY c_custkey ORDER BY version DESC) AS rn FROM u)
        |SELECT c_custkey, c_name, c_acctbal, c_mktsegment, version
        |FROM r WHERE rn = 1""".stripMargin,

    // passage-level exact dedup: fixed 8-token chunks, a chunk in ≥2 distinct
    // docs is boilerplate; docs are rewritten with surviving chunks in order
    "q86_passage_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST((len(toks) + 7) // 8 AS BIGINT)),
        |      i -> array_to_string(list_slice(toks, CAST(i*8+1 AS INT), CAST(i*8+8 AS INT)), ' ')) AS chunks
        |  FROM d WHERE len(toks) > 0),
        |s AS (
        |  SELECT doc_id, unnest(range(0, len(chunks))) AS pos, unnest(chunks) AS chunk
        |  FROM c),
        |f AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1),
        |j AS (SELECT s.doc_id, s.pos, s.chunk, f.n_docs
        |      FROM s JOIN f ON md5(s.chunk) = f.h)
        |SELECT doc_id,
        |  count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  COALESCE(string_agg(CASE WHEN n_docs < 2 THEN chunk END, ' ' ORDER BY pos), '') AS cleaned_text
        |FROM j GROUP BY doc_id""".stripMargin,

    // native Misra-Gries heavy hitters with k=64 ≥ vocabulary: the summary
    // never evicts, so the sketch is bit-identical to the exact GROUP BY —
    // the gate proves update/serialize/merge/eval end to end; the eviction
    // path is pinned by HeavyHittersAggSpec
    "q87_heavy_hitters" ->
      """SELECT lang, term, count(*) AS est_count
        |FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |      FROM documents)
        |GROUP BY lang, term""".stripMargin,

    // bloom semi-join reduction: the Bloom prefilter has no false negatives
    // and the real join eliminates false positives, so the result is exactly
    // the plain join's — the reduction is an execution detail
    "q88_bloom_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
        |       o.o_orderpriority, o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin,

    // per-dimension int8 scalar quantization in the exact-int domain:
    // (x−mn)·255 div span, div spelled as floor-div — bit-equal cross-engine
    "q89_quantize_vecs" ->
      s"""WITH $scaledVecs,
         |e AS (SELECT vec_id, unnest(range(0, len(svec))) AS d, unnest(svec) AS x FROM v),
         |st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d)
         |SELECT e.vec_id, e.d,
         |  CASE WHEN st.mx > st.mn
         |    THEN ((e.x - st.mn) * 255) // (st.mx - st.mn)
         |    ELSE CAST(0 AS BIGINT) END AS qv
         |FROM e JOIN st USING (d)""".stripMargin,

    // ANN over dequantized int8 codes (mn + q·span div 255 — exact ints), the
    // same cosine/rank/tie contract as q25; recall vs exact is spec-pinned
    "q90_quantized_ann" ->
      s"""WITH $scaledVecs,
         |e AS (SELECT vec_id, unnest(range(0, len(svec))) AS d, unnest(svec) AS x FROM v),
         |st AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d),
         |qz AS (SELECT e.vec_id, e.d, st.mn, st.mx - st.mn AS span,
         |        CASE WHEN st.mx > st.mn
         |          THEN ((e.x - st.mn) * 255) // (st.mx - st.mn)
         |          ELSE CAST(0 AS BIGINT) END AS qv
         |      FROM e JOIN st USING (d)),
         |r AS (SELECT vec_id, list(mn + (qv * span) // 255 ORDER BY d) AS rvec
         |      FROM qz GROUP BY vec_id),
         |qq AS (SELECT vec_id AS query_id, rvec AS qv FROM r WHERE vec_id < 20),
         |c AS (SELECT query_id, vec_id,
         |        ${cosine("qv", "rvec", idot("qv", "qv"), idot("rvec", "rvec"))} AS cosine
         |      FROM qq, r WHERE query_id <> vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM c QUALIFY rk <= 5""".stripMargin,

    // quality-proportional sampling: keep iff bucket < floor(quality·3000),
    // i.e. p = min(1, 3·quality), content-addressed so reproducible
    "q91_quality_sample" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang,
         |    $qualityScoreSql AS quality_score,
         |    CAST('0x' || substr(md5(doc_id || ':qsample_v1'), 1, 8) AS BIGINT) % 1000 AS bucket
         |  FROM documents)
         |SELECT doc_id, lang, quality_score, bucket
         |FROM q
         |WHERE bucket < least(1000, CAST(floor(quality_score * 3000.0) AS BIGINT))""".stripMargin,

    // source-mix allocation: per-(source, shard) running token sum in
    // content-addressed shuffle order, admitted while the shard's share of
    // the 24000-token budget lasts
    "q92_source_mix" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(doc_id || ':mix_v1'), 1, 8) AS BIGINT) % 1000 % 8 AS shard,
        |    md5(doc_id || '#mix_v1') AS mix_key
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens, shard, mix_key,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source, shard
        |      ORDER BY mix_key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM s)
        |SELECT doc_id, source, n_tokens, shard, mix_key, cum_tokens
        |FROM c WHERE cum_tokens <= 3000""".stripMargin,

    // z-order (Morton) locality key: bit-interleave of two 16-bit codes,
    // spelled in SQL as the 32-term bit-extraction sum
    "q93_zorder" -> {
      val terms = (0 until 16).map { i =>
        s"((px // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((py // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT p_partkey,
         |    p_partkey % 65536 AS px,
         |    CAST(floor(p_retailprice) AS BIGINT) % 65536 AS py
         |  FROM part)
         |SELECT p_partkey, px, py, CAST($terms AS BIGINT) AS zval FROM b""".stripMargin
    },

    // streaming Misra-Gries trending values: capacity 128 ≥ the 100-value
    // vocabulary, so the drained stream must equal the exact batch GROUP BY
    // (and the sketch's state-store round-trip is proved by the hash match)
    "q94_stream_trending" ->
      """SELECT event_type,
        |  CAST(CAST(NULLIF(regexp_extract(props, '"k": (-?\d+)', 1), '') AS BIGINT) AS VARCHAR) AS term,
        |  count(*) AS est_count
        |FROM events
        |WHERE NULLIF(regexp_extract(props, '"k": (-?\d+)', 1), '') IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // content-addressed corpus diff: both "versions" derived deterministically
    // from the one corpus so all four statuses occur
    "q95_corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 7 <> 0),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS new_md5
        |  FROM documents WHERE doc_id % 11 <> 3)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_md5 IS DISTINCT FROM n.new_md5 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // strict-sequencing conversion funnel: first view, first click AFTER it,
    // first purchase AFTER that click; stage = furthest step reached
    "q96_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |  CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |            WHEN c.click_ts IS NOT NULL THEN 2
        |            ELSE 1 END AS BIGINT) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    // q241: sessionized funnel — q96's strict sequence within each q15
    // session, each transition bounded by its conversion window; latencies
    // in exact microseconds (epoch_us). SHARED VERBATIM with the streaming
    // q246 (the q224/q226 batch-stream parity pattern).
    "q241_session_funnel" -> sessionFunnelOracle,
    "q246_funnel_stream" -> sessionFunnelOracle,

    // join-key skew report: per-key counts + multiple of the mean key load,
    // top-20 deterministic (count desc, key asc)
    "q97_key_skew" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
        |m AS (SELECT count(*) AS n_keys, CAST(sum(n_rows) AS BIGINT) AS n_total FROM c)
        |SELECT l_suppkey, n_rows, n_keys, n_total,
        |  CAST(n_rows AS DOUBLE) * n_keys / n_total AS skew_x
        |FROM c, m
        |ORDER BY n_rows DESC, l_suppkey ASC
        |LIMIT 20""".stripMargin,

    // PQ codebook + encoding: the oracle replays the identical fixed-round
    // Lloyd training (unrolled CTEs, exact ints) — hash-gated, not rows-only
    "q106_pq_codes" ->
      s"""WITH $pqCtes
         |SELECT vec_id, m, cent_id AS code FROM af""".stripMargin,

    // PQ search, production shape: ADC shortlist (50, ranked by approximate
    // cosine from PqM table lookups) → EXACT cosine rerank of the shortlist
    "q107_pq_search" ->
      s"""WITH $pqCtes,
         |qlut AS (SELECT sub.vec_id AS query_id, sub.m, c.cent_id AS code,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
         |      i -> sub.sub[CAST(i AS INT)] * c.cvec[CAST(i AS INT)])), (x, y) -> x + y) AS pdot,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
         |      i -> c.cvec[CAST(i AS INT)] * c.cvec[CAST(i AS INT)])), (x, y) -> x + y) AS cnorm2
         |  FROM sub JOIN c2 c ON sub.m = c.m WHERE sub.vec_id < 20),
         |qn AS (SELECT vec_id AS query_id, norm2 AS qnorm2 FROM w WHERE vec_id < 20),
         |sc AS (SELECT q.query_id, a.vec_id, SUM(q.pdot) AS adot, SUM(q.cnorm2) AS anorm2
         |  FROM af a JOIN qlut q ON a.m = q.m AND a.cent_id = q.code
         |  WHERE q.query_id <> a.vec_id GROUP BY 1, 2),
         |r AS (SELECT sc.query_id, sc.vec_id, CAST(sc.adot AS DOUBLE) /
         |    (sqrt(CAST(qn.qnorm2 AS DOUBLE)) * sqrt(CAST(sc.anorm2 AS DOUBLE))) AS approx_cosine
         |  FROM sc JOIN qn ON sc.query_id = qn.query_id),
         |short AS (SELECT query_id, vec_id FROM r
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY approx_cosine DESC, vec_id ASC) <= 50),
         |re AS (SELECT s.query_id, s.vec_id,
         |    ${cosine("qw.svec", "vw.svec", "qw.norm2", "vw.norm2")} AS cosine
         |  FROM short s
         |  JOIN w qw ON s.query_id = qw.vec_id
         |  JOIN w vw ON s.vec_id = vw.vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk,
         |  cosine
         |FROM re QUALIFY rk <= 5""".stripMargin,

    // measure → choose → execute: the strategy CASE mirrors
    // Skew.chooseStrategy over the same per-key counts (broadcast limit
    // 10000, skew threshold 3.0, AQE on in the session), so the DECISION is
    // oracle-checked along with the strategy-invariant join rollup
    "q102_adaptive_join" ->
      """WITH pk AS (SELECT l_orderkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
        |st AS (SELECT count(*) AS n_keys, CAST(sum(n_rows) AS BIGINT) AS n_total,
        |         max(n_rows) AS max_rows FROM pk),
        |d AS (SELECT CASE
        |    WHEN (SELECT count(*) FROM orders) <= 10000 THEN 'broadcast'
        |    WHEN CAST(max_rows AS DOUBLE) * n_keys / n_total < 3.0 THEN 'plain'
        |    ELSE 'aqe_skew' END AS strategy FROM st)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  strategy
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey CROSS JOIN d
        |GROUP BY 1, 4""".stripMargin,

    // three-clause MERGE: delete every 10th, add +100.00/'MERGED' to every
    // 4th-not-10th, insert shifted-key NEW customers for every 6th — the
    // oracle rebuilds the same final state with CASE + anti-filter + union
    "q103_merge_into" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 4 = 0 AND c_custkey % 10 <> 0
        |       THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 4 = 0 AND c_custkey % 10 <> 0
        |       THEN 'MERGED' ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 0
        |UNION ALL
        |SELECT c_custkey + 10000000, 'NEW-' || c_name, 500.0, 'NEWSEG'
        |FROM customer WHERE c_custkey % 6 = 0""".stripMargin,

    // variant schema-on-read over the two derived payload shapes: typed
    // extraction (missing field → NULL, not error) + key-signature census;
    // DuckDB's JSON operators are the portable twin of the variant path
    "q104_props_evolution" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 2 = 1 THEN
        |      CAST(json_object('k', CAST(props->>'$.k' AS BIGINT),
        |        'src', 'web', 'retry', event_id % 3) AS VARCHAR)
        |    ELSE props END AS p
        |  FROM events),
        |x AS (
        |  SELECT event_type,
        |    array_to_string(list_sort(json_keys(p)), ',') AS schema_sig,
        |    CAST(p->>'$.k' AS BIGINT) AS k,
        |    CAST(p->>'$.retry' AS BIGINT) AS retry
        |  FROM ev)
        |SELECT event_type, schema_sig, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k, count(retry) AS n_retry,
        |  CAST(sum(retry) AS BIGINT) AS sum_retry
        |FROM x GROUP BY 1, 2""".stripMargin,

    // snapshot + delta partial aggregates merged by re-aggregation must be
    // bit-identical to the from-scratch aggregate (exact decimal domain)
    "q98_incremental_agg" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // weekly retention cohorts: whole 7-day offsets from each user's first
    // signup date (day arithmetic — calendar-week conventions differ)
    "q99_retention" ->
      """WITH s AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events WHERE event_type = 'signup' GROUP BY 1)
        |SELECT s.cohort_date,
        |  CAST(floor(date_diff('day', s.cohort_date, CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN s ON e.user_id = s.user_id
        |WHERE date_diff('day', s.cohort_date, CAST(e.ts AS DATE)) >= 0
        |GROUP BY 1, 2""".stripMargin,

    // the full curation pipeline composed: q67's filter ∧ dedup-representative
    // set, further intersected with q75's decontamination survivors
    "q100_curated_corpus" -> curatedCorpusOracle,

    // refresh ≡ rebuild: the oracle is the FROM-SCRATCH q100 pipeline over
    // the derived V2 corpus; the Spark side (Refresh.refreshedCorpus) builds
    // the same manifest incrementally from V1 artifacts + the corpus diff,
    // so a hash match proves the incremental merge loses nothing
    "q101_corpus_refresh" -> refreshedCorpusOracle,

    // identical to q12: the full CSV-drop → validate → enrich → aggregate →
    // JDBC-write → JDBC-read pipeline must reproduce the source-of-truth metric
    "q33_pipeline_e2e" ->
      s"""SELECT c_custkey AS customer_id, c_name AS full_name,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month,
         |  CAST(SUM(CAST($totalCost AS DECIMAL(22,4))) AS DOUBLE) AS total_sales
         |$enrichJoin
         |GROUP BY 1, 2, 3""".stripMargin)
}
