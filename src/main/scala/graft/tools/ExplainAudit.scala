package graft.tools

/** Ad-hoc plan audit main: prints executed plans (or summary flags) for the
  * queries whose physical shape matters most at scale. Not part of the driver
  * contract; used interactively alongside PlanSpec.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.core.SessionFactory.local(8, "graft-explain")
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $name: ${graft.plans.PlanAudit.flags(df)}")
      if (sys.env.contains("GRAFT_EXPLAIN_FULL"))
        println(df.queryExecution.executedPlan.toString)
    }
    // audit the UN-CACHED compute: ngramJaccard returns an eager localCheckpoint
    // whose executedPlan is a bare Scan ExistingRDD — auditing that would make
    // every flag vacuously zero (and silently pay the full dedup chain).
    audit("q17_ngram_jaccard", graft.ops.Dedup.ngramJaccardCompute(spark, sf))
    audit("q19_lsh_pairs", graft.ops.Dedup.lshCandidatePairs(spark, sf))
    audit("q35_simhash_pairs", graft.ops.Dedup.simhashPairs(spark, sf))
    audit("q27_embed_neardup", graft.ops.Similarity.nearDupPairs(spark, sf))
    audit("q36_ivf_topk", graft.ops.Similarity.ivfTopK(spark, sf))
    audit("q12_customer_monthly", graft.etl.Metrics.customerMonthly(spark, sf))
    audit("q86_passage_dedup", graft.ops.Curation.passageDedup(spark, sf))
    audit("q87_heavy_hitters", graft.ops.TermStats.heavyTermsPerLang(spark, sf))
    audit("q88_bloom_join", graft.ops.Joins.urgentLineitems(spark, sf))
    audit("q90_quantized_ann", graft.ops.Similarity.quantizedTopK(spark, sf))
    audit("q102_adaptive_join", graft.ops.Skew.adaptiveJoinDemo(spark, sf))
    audit("q103_merge_into", graft.ops.Merge.customerMerge(spark, sf))
    audit("q104_props_evolution", graft.ops.Events.propsEvolution(spark, sf))
    audit("q105_session_window", graft.ops.Events.sessionizeNative(spark, sf))
    audit("q107_pq_search", graft.ops.Similarity.pqRerankTopK(spark, sf))
    audit("q109_ivfpq_search", graft.ops.Similarity.ivfPqTopK(spark, sf))
    audit("q110_bigram_lm", graft.ops.LanguageModel.bigramLmScores(spark, sf))
    audit("q111_dsir_weights", graft.ops.LanguageModel.importanceWeights(spark, sf))
    audit("q112_part_entities", graft.ops.Entity.partEntities(spark, sf))
    audit("q113_hopping_window", graft.ops.Events.hoppingRollup(spark, sf))
    audit("q118_bpe_tokens", graft.ops.Bpe.bpeTokenCounts(spark, sf))
    audit("q119_table_stats", graft.ops.Stats.tableStats(spark, sf))
    audit("q122_decayed_pop", graft.ops.Events.decayedPopularity(spark, sf))
    audit("q166_triangles", {
      import org.apache.spark.sql.functions._
      val li = graft.core.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val und = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      graft.ops.Graph.triangleCensus(und, deg)
    })
    audit("q169_basket_pairs", graft.ops.Market.basketPairs(spark, sf))
    audit("q170_feature_bins", graft.ops.Statistics.equiDepthBins(spark, sf))
    audit("q172_mad_outliers", graft.ops.Statistics.madOutliers(spark, sf))
    audit("q181_attribution", graft.ops.Events.lastTouchAttribution(spark, sf))
    audit("q182_rolling_distinct", graft.ops.Events.rollingDistinctUsers(spark, sf))
    audit("q158_hybrid_search", graft.ops.TermStats.hybridSearch(spark, sf))
    audit("q190_linear_attrib", graft.ops.Events.linearAttribution(spark, sf))
    audit("q191_k_anonymity", graft.ops.Privacy.kAnonymityAudit(spark, sf))
    audit("q193_temperature_mix", graft.ops.TrainingMix.temperatureMix(spark, sf))
    audit("q194_daily_anomaly", graft.ops.Statistics.dailyAnomalies(spark, sf))
    audit("q195_quality_clf", graft.ops.Curation.qualityClassifier(spark, sf))
    audit("q178_skyline", graft.ops.Relational.orderSkyline(spark, sf))
    audit("q184_global_rank", graft.ops.Relational.globalPriceRank(spark, sf))
    audit("q189_quantile_rank", graft.ops.Relational.globalPriceRankQuantile(spark, sf))
    audit("q203_ks_test", graft.ops.Statistics.ksTest(spark, sf))
    audit("q204_rank_sum", graft.ops.Statistics.rankSum(spark, sf))
    audit("q205_gini", graft.ops.Statistics.giniBySegment(spark, sf))
    audit("q207_item_cf", graft.ops.Recommend.itemItemCf(spark, sf))
    audit("q208_adamic_adar", graft.ops.Recommend.adamicAdar(spark, sf))
    audit("q216_hard_negatives", graft.ops.Similarity.hardNegatives(spark, sf))
    audit("q219_jl_distortion", graft.ops.Similarity.jlDistortion(spark, sf))
    audit("q210_acf", graft.ops.TimeSeries.revenueAcf(spark, sf))
    audit("q211_ewma", graft.ops.TimeSeries.ewmaRevenue(spark, sf))
    audit("q212_burstiness", graft.ops.TimeSeries.userBurstiness(spark, sf))
    audit("q221_theil_sen", graft.ops.TimeSeries.theilSen(spark, sf))
    audit("q222_kaplan_meier", graft.ops.TimeSeries.kaplanMeier(spark, sf))
    audit("q224_ab_test", graft.ops.Experiment.abTest(spark, sf))
    audit("q225_cuped", graft.ops.Experiment.cuped(spark, sf))
    audit("q228_bootstrap_ci", graft.ops.Statistics.bootstrapCi(spark, sf))
    // q230 audits the UN-PERSISTED scoring frame (same caveat as q17): the
    // broadcast path, then the 100 TB fallback — corpus "too big to
    // broadcast" → both text attaches must come out as salted shuffle
    // joins, no BroadcastExchange feeding the pair scoring
    audit("q230_containment", graft.ops.Dedup.containmentScoredCompute(spark, sf))
    audit("q230_containment_salted",
      graft.ops.Dedup.containmentScoredCompute(spark, sf, broadcastTextBytesLimit = 0L))
    audit("q231_cohort_ltv", graft.ops.Events.cohortLtv(spark, sf))
    audit("q192_hits", graft.ops.Graph.hits(spark, sf))
    audit("q218_pca_power", graft.ops.Similarity.pcaPower(spark, sf))
    audit("q235_roc_auc", graft.ops.Evaluation.rocAuc(spark, sf))
    audit("q199_pct_normalize", graft.ops.Corpus.percentileNormalize(spark, sf))
    audit("q237_gk_equidepth", graft.ops.Statistics.equiDepthBinsSketch(spark, sf))
    audit("q238_gk_winsorize", graft.ops.Statistics.winsorizedPricingSketch(spark, sf))
    audit("q239_auc_by_segment", graft.ops.Evaluation.rocAucBySegment(spark, sf))
    audit("q240_stratified_es", graft.ops.Corpus.stratifiedWeightedSample(spark, sf))
    audit("q241_session_funnel", graft.ops.Events.sessionFunnel(spark, sf))
    audit("q242_threshold_metrics", graft.ops.Evaluation.thresholdMetrics(spark, sf))
    audit("q243_chi_square", graft.ops.Statistics.chiSquareLangLength(spark, sf))
    audit("q244_pmi_collocations", graft.ops.TermStats.pmiCollocations(spark, sf))
    audit("q245_split_divergence", graft.ops.TermStats.splitDivergence(spark, sf))
    audit("q247_rolling_median", graft.ops.TimeSeries.rollingMedianRevenue(spark, sf))
    audit("q248_nelson_aalen", graft.ops.TimeSeries.nelsonAalen(spark, sf))
    audit("q249_concentration", graft.ops.Statistics.revenueConcentration(spark, sf))
    audit("q250_cramers_v", graft.ops.Statistics.cramersV(spark, sf))
    audit("q251_seasonal_decomp", graft.ops.TimeSeries.seasonalDecompose(spark, sf))
    spark.stop()
  }
}
