package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry maps a SURVEY §2 operator (or a north-star
  * pipeline operator) to a query over the TESTDATA tables; `oracleSql`
  * holds the DuckDB-equivalent SQL for hash comparison. Column names and
  * types are aligned on both sides (the driver sorts columns by name
  * before hashing). Graph/sketch queries without an ANSI-SQL equivalent
  * omit the oracle (rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    C.joinAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 projections / filters / scalar functions
    "q01_project_filter" -> (C.projectFilter _),
    "q11_cast_unsigned" -> (C.castUnsigned _),
    // §2.4 aggregations
    "q02_agg_group" -> (C.aggGroup _),
    "q06_group_concat_ordered" -> (C.groupConcatOrdered _),
    "q07_group_concat_sorted" -> (C.groupConcatSorted _),
    "q12_distinct" -> (C.distinctSegments _),
    "q18_rollup" -> (C.rollupAgg _),
    // §2.3 joins
    "q03_join_agg" -> (C.joinAgg _),
    "q04_left_join" -> (C.leftJoinAgg _),
    "q05_parent_join" -> (C.parentJoin _),
    "q09_anti_join" -> (C.antiJoin _),
    "q10_semi_join" -> (C.semiJoin _),
    // §2.5 sorts / limits / windows
    "q13_topn" -> (C.topN _),
    "q14_window_rownum" -> (C.windowRownum _),
    // §2.7 pivot / reshape
    "q08_pivot" -> (C.pivotEvents _),
    // set operators
    "q15_union_all" -> (C.unionAll _),
    "q16_intersect" -> (C.intersectKeys _),
    "q17_except" -> (C.exceptKeys _),
    // time-bucketed agg (streaming twin)
    "q19_window_agg" -> (C.windowAgg _),
    // §2.6 graph stage
    "q20_topo_depth" -> (C.topoDepth _),
    "q21_bfs_closure" -> (C.bfsClosure _),
    "q22_cycle_scan" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      C.cycleNodes(s, d).agg(count(lit(1)).as("n_cycle_nodes"))
    }),
    // §2.2/§2.3/§2.4/§2.7/§2.8 operator shapes added round 2
    "q36_like_filter" -> (C.likeFilter _),
    "q37_concat_pairs" -> (C.concatPairs _),
    "q38_split_first" -> (C.splitFirst _),
    "q39_null_column" -> (C.nullColumn _),
    "q40_mapping_pivot" -> (C.mappingPivot _),
    "q41_join_chain" -> (C.joinChainConcat _),
    "q42_empty_probe" -> (C.emptyProbe _),
    "q43_stop_scan" -> (C.stopCharScan _),
    "q44_set_derive" -> (C.setDerive _),
    "q46_window_running" -> (C.windowRunning _),
    "q47_date_functions" -> (C.dateFunctions _),
    "q48_json_agg" -> (C.jsonAgg _),
    "q49_dup_groups" -> (P.dupGroups _),
    "q50_quantiles" -> (C.quantileStats _),
    // north-star pipeline: dedup / text / similarity
    "q23_dedup_exact" -> (P.dedupExact _),
    "q24_token_stats" -> (P.tokenStats _),
    "q25_quality" -> (P.quality _),
    "q26_langid" -> (P.langId _),
    "q27_fingerprint" -> (P.fingerprints _),
    "q28_cosine_topk" -> (P.cosineTopK _),
    "q29_minhash_sig" -> (P.minhashSig _),
    "q30_minhash_pairs" -> (P.minhashPairs _),
    "q31_simhash" -> (P.simhash _),
    "q32_ngram_jaccard" -> (P.ngramJaccard _),
    "q33_ann_topk" -> (P.annTopK _),
    "q34_cosine_neardup" -> (P.cosineNearDup _),
    "q51_cosine_neardup_lsh" -> (P.cosineNearDupLsh _),
    "q52_quantiles_approx" -> (C.quantileStatsApprox _),
    "q53_ivf_topk" -> (P.ivfTopK _),
    "q54_sessionize" -> (C.sessionize _),
    "q55_clean_corpus" -> (P.cleanCorpus _),
    "q56_tfidf_top" -> (P.tfidfTop _),
    "q57_bm25" -> (P.bm25 _),
    "q58_quantiles_dist" -> (C.quantileStatsDist _),
    "q59_hash_split" -> (P.hashSplit _),
    "q60_domain_cap" -> (P.domainCap _),
    "q61_decontaminate" -> (P.decontaminate _),
    "q62_vocab_top" -> (P.vocabTop _),
    "q63_asof_join" -> (C.asofClickView _),
    "q64_fuzzy_match" -> (P.fuzzyParts _),
    "q65_window_funcs" -> (C.windowFuncs _),
    "q66_range_join" -> (C.rangeClickView _),
    "q67_stats_moments" -> (C.statsMoments _),
    "q68_cube" -> (C.cubeAgg _),
    "q69_stratified_sample" -> (P.stratifiedByLang _),
    "q70_seq_pack" -> (P.seqPack _),
    "q71_moving_window" -> (C.movingWindow _),
    "q72_histogram" -> (C.charHistogram _),
    "q73_pagerank" -> (C.pageRankQuery _),
    "q74_seq_pack_spans" -> (P.seqPackSpans _),
    "q75_semantic_dedup" -> (P.semanticDedup _),
    "q76_repetition" -> (P.repetition _),
    "q77_fluency" -> (P.fluency _),
    "q78_resample_ffill" -> (C.resampleEvents _),
    "q79_unpivot" -> (C.unpivotParts _),
    "q80_grouping_sets" -> (C.groupingSetsAgg _),
    "q81_weighted_sample" -> (P.weightedSampleDocs _),
    "q82_semantic_decon" -> (P.semanticDecon _),
    "q83_mixture_rates" -> (P.mixturePlan _),
    "q85_substring_dups" -> (P.substringDups _),
    "q86_upsert" -> (C.upsertOrders _),
    "q88_salted_join" -> (C.saltedJoinQuery _),
    "q89_windowed_distinct" -> (C.windowedDistinct _),
    "q90_zscore" -> (C.zscoreNorm _),
    "q91_snapshot_diff" -> (C.snapshotDiffOrders _),
    "q92_triangles" -> (C.triangleQuery _),
    "q93_label_prop" -> (C.lpaQuery _),
    "q94_concurrency" -> (C.sessionConcurrency _),
    "q95_fk_orphans" -> (C.fkOrphans _),
    "q96_funnel" -> (C.funnelViewClick _),
    "q97_canonical_keep" -> (P.canonicalKeep _),
    "q87_change_intervals" -> (C.eventIntervals _),
    "q84_percentile_trim" -> (C.percentileTrim _),
    "q35_rolling_fingerprint" -> (P.rollingFingerprint _),
    "q45_media_meta" -> (P.mediaMeta _),
    "q98_bigram_pmi" -> (P.bigramPmiTop _),
    "q99_chunk_plan" -> (P.chunkPlanDocs _),
    "q100_incr_dedup" -> (P.incrementalDedup _),
    "q101_fluency_buckets" -> (P.fluencyBuckets _),
    "q102_substring_keep" -> (P.substringKeep _),
    "q103_incr_neardup" -> (P.incrementalNearDup _),
    "q104_incr_neardup_stages" -> (P.incrementalNearDupStages _),
    "q105_wav_decode" -> (P.wavDecode _),
    "q106_ann_recall" -> (P.annRecall _),
    "q107_pii_redact" -> (P.piiRedact _),
    "q108_oov_rate" -> (P.oovRate _),
    "q109_quantize_int8" -> (P.quantizeEmb _),
    "q110_ann_recall_planted" -> (P.annRecallPlanted _),
    "q111_incr_dedup_fps" -> (P.incrementalDedupFps _),
    "q112_quantized_topk" -> (P.quantizedTopK _),
    "q113_wav_chunked" -> (P.wavDecodeChunked _),
    "q114_bloom_decon" -> (P.bloomDecontaminate _),
    "q115_curation_funnel" -> (P.curationFunnel _),
    "q116_pq_topk" -> (P.pqTopKQuery _),
    "q117_ivfpq_topk" -> (P.ivfPqTopKQuery _),
    "q118_bigram_lm" -> (P.bigramLm _),
    "q119_cluster_cap" -> (P.clusterCap _),
    "q120_jl_distortion" -> (P.jlDistortion _),
    "q121_time_decay" -> (C.timeDecayed _),
    "q122_event_transitions" -> (C.eventTransitions _),
    "q123_zorder_audit" -> (C.zorderAudit _),
    "q124_kcore" -> (C.kCoreQuery _),
    "q125_rrf_fusion" -> (P.rrfFusion _),
    "q126_cms_heavy_hitters" -> (P.cmsHeavyHitters _),
    "q127_split_leakage" -> (P.splitLeakage _),
    "q128_k_anonymity" -> (C.kAnonymity _),
    "q129_quantile_norm" -> (C.quantileNorm _),
    "q130_ppm_decode" -> (P.ppmDecode _),
    "q131_benford" -> (C.benford _),
    "q132_fd_audit" -> (C.fdChecks _),
    "q133_dist_shift" -> (P.distributionShift _),
    "q134_wav_signal" -> (P.wavSignal _),
    "q135_avi_meta" -> (P.aviDecode _),
    "q136_profile" -> (C.profileOrders _),
    "q137_ivf_topk_persist" -> (P.ivfTopKPersist _),
    "q138_pq_topk_persist" -> (P.pqTopKPersist _),
    "q139_ivfpq_topk_persist" -> (P.ivfPqTopKPersist _),
    "q140_avi_frames" -> (P.aviFrames _),
    "q141_mg_heavy_hitters" -> (P.mgHeavyHitters _),
    "q142_profile_approx" -> (C.profileOrdersApprox _),
    "q143_sorted_neighborhood" -> (P.sortedNeighborhood _),
    "q144_skew_audit" -> (C.skewAudit _),
    "q145_png_decode" -> (P.pngDecode _),
    "q146_index_staleness" -> (P.indexStaleness _),
    "q147_containment_pairs" -> (P.containmentFragments _),
    "q148_epoch_shards" -> (P.epochShards _),
    "q149_novelty_score" -> (P.noveltyScore _),
    "q150_avi_interleaved" -> (P.aviInterleaved _),
    "q151_bigram_lm_persist" -> (P.bigramLmPersist _),
    "q152_vocab_growth" -> (P.vocabGrowth _),
    "q153_kmv_overlap" -> (P.kmvOverlap _),
    "q154_matryoshka_recall" -> (P.matryoshkaRecall _),
    "q155_kmv_windows" -> (C.kmvWindows _),
    "q156_weighted_reservoir" -> (P.weightedReservoir _),
    "q157_tar_shards" -> (P.tarShards _),
    "q158_targz_shards" -> (P.tarGzShards _),
    "q159_cdc_chunks" -> (P.cdcChunkDedup _),
    "q160_bpe_merges" -> (P.bpeMerges _),
    "q161_dp_release" -> (C.dpRelease _),
    "q162_pca_power" -> (P.pcaTop _),
    "q163_html_extract" -> (P.htmlExtract _),
    "q164_bpe_encode" -> (P.bpeEncode _),
    "q165_phrase_search" -> (P.phraseSearch _),
    "q166_zipf_fit" -> (P.zipfFit _),
    "q167_hll_distinct" -> (P.hllBigrams _),
    "q168_blocklist_scan" -> (P.blocklistScan _),
    "q169_char_entropy" -> (P.charEntropy _),
    "q170_ndcg_eval" -> (P.ndcgEval _),
    "q171_prefix_filter_join" -> (P.prefixFilterPairs _),
    "q172_gopher_rules" -> (P.gopherRules _),
    "q173_hll_windows" -> (C.hllWindows _),
    "q174_hll_shard_union" -> (P.hllShardUnion _),
    "q176_bpe_roundtrip" -> (P.bpeRoundtrip _),
    "q177_retention_cohorts" -> (C.retentionCohorts _),
    "q178_source_gini" -> (P.sourceGini _),
    "q179_lsh_collision_audit" -> (P.lshCollisionAudit _),
    "q180_grouped_topk" -> (C.groupedTopK _),
    "q181_bloom_join" -> (C.bloomJoin _),
    "q182_gif_decode" -> (P.gifDecode _),
    "q183_asof_native" -> (C.asofClickViewNative _),
    "q184_waterfill_caps" -> (P.waterfillCaps _),
    "q185_groupkfold" -> (P.groupKFold _),
    "q186_lsh_design" -> (P.lshDesign _),
    "q187_asof_forward" -> (C.asofClickNextView _),
    "q188_hll_pair_overlap" -> (P.hllPairOverlap _),
    "q189_dedup_attrition" -> (P.dedupAttrition _),
    "q190_gif_resize" -> (P.gifResize _),
    "q191_wav_decimate" -> (P.wavDecimate _),
    "q192_filtered_ann" -> (P.filteredAnnRecall _),
    "q193_bucketed_join" -> (C.bucketedJoin _),
    "q194_bootstrap_ci" -> (P.bootstrapCI _),
    "q195_burst_detect" -> (C.burstDetect _),
    "q196_jsonl_roundtrip" -> (P.jsonlRoundtrip _),
    "q197_orc_roundtrip" -> (P.orcRoundtrip _),
    "q198_nfc_audit" -> (P.nfcAudit _),
    "q199_qdigest_quantiles" -> (P.qdigestQuantiles _),
    "q200_goertzel_tones" -> (P.goertzelTones _),
    "q201_kcenter_coreset" -> (P.kcenterGate _),
    "q202_multi_match" -> (P.multiMatchScan _),
    "q203_mojibake_audit" -> (P.mojibakeAudit _),
    "q204_xml_roundtrip" -> (P.xmlRoundtrip _),
    "q205_cdc_apply" -> (C.cdcApplyEvents _),
    "q206_mutual_knn" -> (P.mutualKnn _),
    "q207_feature_hashing" -> (P.featureHashing _),
    "q208_rbo_eval" -> (P.rboEval _),
    "q209_boilerplate_strip" -> (P.boilerplateStrip _),
    "q210_rendezvous_shards" -> (P.rendezvousShards _),
    "q211_partition_prune" -> (P.partitionPrune _),
    "q212_parquet_codec" -> (P.parquetCodec _),
    "q213_copurchase_pairs" -> (C.copurchasePairs _),
    "q214_seasonal_mase" -> (C.seasonalMase _),
    "q215_hard_negatives" -> (P.hardNegatives _),
    "q216_schema_merge" -> (P.schemaMerge _),
    "q217_moment_shards" -> (P.momentShards _),
    "q218_url_canonical" -> (P.urlCanonical _),
    "q219_mad_outliers" -> (C.madOutliers _),
    "q220_temporal_split" -> (C.temporalSplit _),
    "q221_calibration_bins" -> (P.calibrationBins _),
    "q222_ks_stat" -> (P.ksStat _),
    "q223_golden_record" -> (C.goldenRecordCustomers _),
    "q224_item_cf" -> (C.itemCf _),
    "q225_ab_cuped" -> (C.abCuped _),
    "q226_woe_iv" -> (P.woeIv _),
    "q227_data_contract" -> (C.dataContract _),
    "q228_rollup_merge" -> (P.rollupMerge _),
    "q229_matched_att" -> (C.matchedAtt _),
    "q230_bloom_design" -> (P.bloomDesign _),
    "q231_watermark_design" -> (P.watermarkDesign _),
    "q232_neyman_alloc" -> (P.neymanAlloc _),
    "q233_psi_drift" -> (P.psiDrift _),
    "q234_salt_planner" -> (C.saltPlanner _),
    "q235_attribution_credit" -> (C.attributionCredit _),
    "q236_auc_separation" -> (P.aucSeparation _),
    "q237_chi2_independence" -> (P.chi2Independence _),
    "q238_clustering_coeff" -> (C.clusteringCoeff _),
    "q239_acf_daily" -> (C.acfDaily _),
    "q240_range_sort_audit" -> (C.rangeSortAudit _),
    "q241_seasonal_decompose" -> (C.seasonalDecompose _),
    "q242_mean_impute" -> (C.meanImpute _),
    "q243_gap_design" -> (C.gapDesign _),
    "q244_stl_anomaly" -> (C.stlAnomaly _),
    "q245_fanout_audit" -> (C.fanoutAudit _),
    "q246_mutual_info" -> (C.mutualInfo _),
    "q247_mean_shift" -> (C.meanShift _),
    "q248_theil_sen" -> (C.theilSen _),
    "q249_compressibility" -> (P.compressibility _),
    "q250_record_linkage" -> (P.recordLinkage _),
    "q251_spearman" -> (C.spearman _),
    "q252_kendall_tau" -> (C.kendallTau _),
    "q253_welch_ttest" -> (C.welchTtest _),
    "q254_anova_f" -> (C.anovaF _),
    "q255_ccf_daily" -> (C.ccfDaily _),
    "q256_diversity" -> (C.diversity _),
    "q257_jackknife_mean" -> (C.jackknifeMean _),
    "q258_image_dhash" -> (P.imageDhash _),
    "q259_image_neardup" -> (P.imageNeardup _),
    "q260_hyperanf" -> (C.hyperAnf _),
    "q261_wl_refinement" -> (C.wlRefinement _),
    "q262_audio_fingerprint" -> (P.audioFingerprint _),
    "q263_embed_silhouette" -> (P.embeddingSilhouette _),
    "q264_image_scale_hash" -> (P.imageScaleInvariance _),
    "q265_twonn_dim" -> (P.twoNnDimension _),
    "q266_label_noise" -> (P.labelNoiseAudit _),
    "q267_ols_diagnostics" -> (C.olsDiagnostics _),
    "q268_esd_outliers" -> (C.esdOutliers _),
    "q269_bpe_fertility" -> (P.bpeFertility _),
    "q270_survival_hazard" -> (C.survivalHazard _),
    "q271_retrieval_mrr" -> (P.retrievalMrr _),
    "q272_dataset_card" -> (P.datasetCard _),
    "q273_fdr_bh" -> (C.fdrBh(_, _)),
    "q274_geo_near" -> (C.geoNearJoin _),
    "q275_dsir_weights" -> (P.dsirWeights _),
    "q276_kn_bigram" -> (P.knBigram _),
    "q277_curriculum" -> (P.curriculumInterleave _),
    "q278_l_diversity" -> (C.lDiversity _),
    "q279_permutation_test" -> (C.permutationTest _),
    "q280_group_sequential" -> (C.groupSequential _),
    "q281_qte_deciles" -> (C.qteDeciles _),
    "q282_class_weights" -> (P.classWeights _),
    "q283_pad_waste" -> (P.padWaste _),
    "q284_ctfidf_keywords" -> (P.ctfidfKeywords _),
    "q285_term_burstiness" -> (P.termBurstiness _),
    "q286_diag_frechet" -> (P.diagFrechet _),
    "q287_simpson_audit" -> (C.simpsonAudit _),
    "q288_avi_rle8" -> (P.aviRle8Frames _),
    "q289_mann_whitney" -> (C.mannWhitney _),
    "q290_cvm_test" -> (C.cvmTest _),
    "q291_kruskal_wallis" -> (C.kruskalWallis _),
    "q292_cusum_changepoint" -> (C.cusumChangepoint _),
    "q293_vocab_coverage" -> (P.vocabCoverage _),
    "q294_ngram_novelty" -> (P.ngramNovelty _),
    "q295_template_spam" -> (P.templateSpam _),
    "q296_label_drift" -> (P.labelCentroidDrift _),
    "q297_block_dedup" -> (P.blockDedup _),
    "q298_t_closeness" -> (C.tCloseness _),
    "q299_wilcoxon_signed" -> (C.wilcoxonSigned _),
    "q300_levene_bf" -> (C.leveneBF _),
    "q301_ewma_chart" -> (C.ewmaChart _),
    "q302_shot_boundary" -> (P.shotBoundary _),
    "q303_audio_onset" -> (P.audioOnset _),
    "q304_mmr_select" -> (P.mmrSelect _),
    "q305_modularity" -> (C.modularityQuery _),
    "q306_cochran_armitage" -> (C.cochranArmitage _),
    "q307_hubness" -> (P.hubnessAudit _),
    "q308_ivm_agg" -> (C.ivmAggOrders _),
    "q309_compaction_plan" -> (C.compactionPlan _),
    "q310_rfm_segments" -> (C.rfmSegments _),
    "q311_assortativity" -> (C.assortativity _),
    "q312_table_digest" -> (C.tableDigest _),
    "q313_card_diff" -> (P.cardDiff _),
    "q314_join_estimate" -> (C.joinEstimate _),
    "q315_disorder_profile" -> (C.disorderProfile _),
    "q316_intradoc_dedup" -> (P.intradocDedup _),
    "q317_langid_confusion" -> (P.langidConfusion _),
    "q318_srt_roundtrip" -> (P.srtRoundtrip _),
    "q319_license_propagation" -> (P.licensePropagation _),
    "q320_temperature_mix" -> (P.temperatureMix _),
    "q321_digest_diff" -> (C.digestDiff _),
    "q322_cohens_kappa" -> (P.cohensKappa _),
    "q323_range_native" -> (C.rangeClickViewNative _),
    "q324_adamic_adar" -> (C.adamicAdar _),
    "q325_scd2_build" -> (C.scd2Build _),
    "q326_scd2_pit" -> (C.scd2PointInTime _),
    "q327_chao1_richness" -> (P.chao1Richness _),
    "q328_skipgram_pmi" -> (P.skipgramPmi _),
    "q329_stump_split" -> (P.stumpSplit _),
    "q330_weighted_median" -> (C.weightedMedian _),
    "q331_gumbel_maxima" -> (C.gumbelMaxima _),
    "q332_jarque_bera" -> (C.jarqueBera _),
    "q333_lang_overlap" -> (P.langVocabOverlap _),
    "q334_wasserstein" -> (P.wassersteinLengths _),
    "q335_markov_surprise" -> (C.markovSurprise _),
    "q336_burrows_delta" -> (P.burrowsDelta _),
    "q337_entropy_rate" -> (C.entropyRate _),
    "q338_strat_ate" -> (C.stratifiedAte _),
    "q339_hill_tail" -> (C.hillTail _),
    "q340_rouge2_pairs" -> (P.rouge2Pairs _),
    "q341_top_paths" -> (C.topPaths _),
    "q342_assoc_rules" -> (C.assocRules _),
    "q343_rolling_slope" -> (C.rollingSlope _),
    "q344_wilson_ci" -> (C.wilsonCi _),
    "q345_gk_gamma" -> (C.gkGamma _),
    "q346_fd_bins" -> (C.fdBins _),
    "q347_subsample_probs" -> (P.subsampleProbs _),
    "q348_kripp_alpha" -> (P.krippAlpha _),
    "q349_fightin_words" -> (P.fightinWords _),
    "q350_mcnemar" -> (P.mcnemarTest _),
    "q351_perm_entropy" -> (C.permEntropy _),
    "q352_ljung_box" -> (C.ljungBox _),
    "q353_runs_test" -> (C.runsTest _),
    "q354_hurst_rs" -> (C.hurstRs _),
    "q355_periodogram" -> (C.periodogram _),
    "q356_mann_kendall" -> (C.mannKendall _),
    "q357_effect_sizes" -> (C.effectSizes _),
    "q358_ams_f2" -> (C.amsF2 _),
    "q359_centroid_eval" -> (P.centroidEval _),
    "q360_flesch_panel" -> (P.fleschPanel _),
    "q361_yule_k" -> (P.yuleK _),
    "q362_nb_langid" -> (P.nbLangid _),
    "q363_haar_energy" -> (C.haarEnergy _),
    "q364_harmonic2" -> (C.harmonic2 _),
    "q365_anisotropy" -> (P.embedAnisotropy _),
    "q366_interarrival" -> (C.interArrival _),
    "q367_abc_classes" -> (C.abcClasses _),
    "q368_sign_fidelity" -> (P.signEmbedFidelity _),
    "q369_neardup_transitivity" -> (P.neardupTransitivity _),
    "q370_brier_decomp" -> (P.brierDecomposition _),
    "q371_capture_recapture" -> (C.captureRecapture _),
    "q372_pacf" -> (C.pacfDaily _),
    "q373_sample_size" -> (C.sampleSizeDesign _),
    "q374_eb_stopping" -> (C.ebStopping _),
    "q375_fk_panel" -> (C.fkPanel _),
    "q376_ivm_join" -> (C.ivmJoin _),
    "q377_langid_stability" -> (P.langidStability _),
    "q378_skyline" -> (P.skylineDocs _),
    "q379_selectivity" -> (C.selectivityAudit _),
    "q380_zipf_loglog" -> (P.zipfVsLoglogistic _),
    "q381_bitemporal" -> (C.bitemporalAsof _),
    "q382_interval_union" -> (C.intervalUnion _),
    "q383_contribution" -> (C.contributionShares _),
    "q384_dsv2_tar" -> (P.dsv2TarManifest _),
    "q385_hash_ring" -> (C.consistentHashRing _),
    "q386_deletion_cascade" -> (C.deletionCascade _),
    "q387_bandit_replay" -> (C.banditReplay _),
    "q388_adjusted_rand" -> (P.adjustedRand _),
    "q389_temp_scaling" -> (P.temperatureScaling _),
    "q390_theil" -> (C.theilDecomposition _),
    "q391_conformal" -> (C.conformalAudit _),
    "q392_fairness" -> (C.fairnessAudit _),
    "q393_shapley" -> (C.shapleyChannels _),
    "q394_gains_table" -> (C.gainsTable _),
    "q395_pattern_match" -> (C.sessionPatternMatch _),
    "q396_energy_dist" -> (C.energyDistance _),
    "q397_jdbc_join_agg" -> (C.jdbcJoinAgg _),
    "q398_isotonic_calibration" -> (C.isotonicCalibration _),
    "q399_cusum_changepoint" -> (C.cusumExact _),
    "q400_avg_precision" -> (P.avgPrecision _),
    "q401_bootstrap_ci" -> (C.bootstrapCi _),
    "q402_quota_apportion" -> (C.quotaApportion _),
    "q403_minhash_est_audit" -> (P.minhashEstimatorAudit _),
    "q404_textrank_keywords" -> (P.textrankKeywords _),
    "q405_viterbi_decode" -> (C.viterbiDecode _),
    "q406_dbscan_daily" -> (C.dbscanDaily _),
    "q407_skyline" -> (C.skylineCustomers _),
    "q408_holt_linear" -> (C.holtLinear _),
    "q409_optimal_segments" -> (C.optimalSegments _),
    "q410_hits" -> (C.hitsPartsSuppliers _),
    "q411_borda_fusion" -> (P.bordaFusion _),
    "q412_sprt_audit" -> (C.sprtAudit _),
    "q413_huffman_lengths" -> (P.huffmanLengths _),
    "q414_zip_shards" -> (P.zipShards _),
    "q415_markov_eval" -> (C.markovEval _),
    "q416_simpsons_flip" -> (C.simpsonsFlip _),
    "q417_ktruss" -> (C.ktrussQuery _),
    "q418_ppr" -> (C.pprQuery _),
    "q419_chow_break" -> (C.chowBreak _),
    "q420_g2_collocations" -> (P.bigramG2Top _),
    "q421_f1_sweep" -> (P.f1Sweep _),
    "q422_sliding_p95" -> (C.slidingP95 _),
    "q423_did" -> (C.didEstimate _),
    "q424_rbp" -> (P.rbpIvf _),
    "q425_qini" -> (C.qiniCurve _),
    "q427_dispersion" -> (C.dispersionIndex _),
    "q428_dsv2_zip" -> (P.dsv2ZipManifest _),
    "q429_mixture_hhi" -> (P.mixtureHhi _),
    "q430_wds_pairs" -> (P.wdsPairs _),
    "q431_bradley_terry" -> (C.bradleyTerry _),
    "q432_cc_star" -> (P.ccStarChains _),
    "q433_dpo_pairs" -> (P.dpoPairs _),
    "q434_span_corruption" -> (P.spanCorruption _),
    "q435_batch_leakage" -> (P.batchLeakage _),
    "q436_cc_incremental" -> (P.ccIncremental _),
    "q437_heaps_fit" -> (P.heapsFit _),
    "q438_seasonal_decomp" -> (C.seasonalDecomp _),
    "q439_join_synopsis" -> (C.joinSizeSynopsis _),
    "q440_band_rewrite" -> (C.rangeClickViewRewrite _),
    "q441_dedup_survivorship" -> (P.dedupSurvivorship _),
    "q442_dup_quality_bias" -> (P.dupQualityBias _),
    "q443_shipped_mixture" -> (P.shippedMixture _),
    "q444_band_left_outer" -> (C.rangeClickViewLeftOuter _),
    "q445_kneser_ney_lm" -> (P.knLm _),
    "q446_lr_filter_scores" -> (P.lrFilterScores _),
    "q447_lr_filter_weights" -> (P.lrFilterWeights _),
    "q448_perplexity_filter" -> (P.perplexityFilter _),
    "q449_soft_dedup" -> (P.softDedup _),
    "q450_good_turing" -> (P.goodTuring _),
    "q451_lz_complexity" -> (P.lzComplexity _),
    "q452_adaboost_stumps" -> (P.adaStumps _),
    "q453_adaboost_scores" -> (P.adaScores _),
    "q454_ipw_ate" -> (C.ipwAte _),
    "q455_rq_distortion" -> (P.rqDistortion _),
    "q456_signal_agreement" -> (P.signalAgreement _),
    "q457_jaccard_sweep" -> (P.jaccardSweep _),
    "q458_warc_shards" -> (P.warcShards _),
    "q459_dsv2_warc" -> (P.dsv2WarcManifest _),
    "q460_gmm_em" -> (C.gmmEm _),
    "q461_knn_eval" -> (P.knnEval _),
    "q462_lr_cv" -> (P.lrCrossVal _),
    "q463_gmm_anomaly" -> (C.gmmAnomaly _),
    "q464_domain_lm_fit" -> (P.domainLmDelta _),
    "q465_decon_verdict" -> (P.deconVerdict _),
    "q466_label_centroids" -> (P.labelCentroids _),
    "q467_mutual_knn_ivf" -> (P.mutualKnnIvf _),
    "q468_knn_eval_ivf" -> (P.knnEvalIvf _),
    "q469_semantic_dedup_scaled" -> (P.semanticDedupScaled _),
    // rows-only by design: DuckDB cannot read Derby; the byte-identity
    // and pushdown asserts run INSIDE the query (see ScaledOmrs.gate),
    // and the export's row semantics are oracled piecewise by q01-q44
    "q470_concepts_export_jdbc" -> (graft.exports.ScaledOmrs.gate _),
  )

  /** q28's exact brute-force cosine top-5 — also the ground-truth leg
    * of the q106 recall gate. */
  private val exactTopKOracle: String =
    """SELECT query_id, neighbor_id, rnk FROM (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY q.vec_id
      |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
      |             c.vec_id) AS INTEGER) AS rnk
      | FROM embeddings q, embeddings c
      | WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** q160's BPE merge rounds unrolled as a CTE chain: each round
    * re-derives adjacent-pair counts from the previous round's corpus,
    * elects the (count DESC, pair ASC) max, and rewrites with
    * `replace` — whose left-to-right non-overlapping semantics DuckDB
    * and Spark share, so repeated runs ("aaaa" → two symbols) agree.
    * Merge symbols are chr(0xE000+r); binary string order over them
    * matches Spark's UTF8String comparison. */
  private def bpeCtes(rounds: Int): String = {
    val ctes = Seq(
      "t0 AS MATERIALIZED (SELECT doc_id, text AS t FROM documents)") ++
      (0 until rounds).flatMap { r =>
        Seq(
          s"""p$r AS MATERIALIZED (SELECT substr(t, CAST(i AS INTEGER), 2)
             |  AS pair, CAST(count(*) AS BIGINT) AS cnt
             | FROM (SELECT t, unnest(generate_series(1, length(t) - 1)) AS i
             |   FROM t$r WHERE length(t) >= 2) x
             | GROUP BY pair)""".stripMargin,

          s"""b$r AS MATERIALIZED (SELECT pair, cnt FROM p$r
             | ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin,
          s"""t${r + 1} AS MATERIALIZED (SELECT doc_id,
             | replace(t, (SELECT pair FROM b$r),
             |  chr(${0xE000 + r})) AS t FROM t$r)""".stripMargin)
      }
    "WITH " + ctes.mkString(",\n")
  }

  private def bpeOracle(rounds: Int): String = {
    val legs = (0 until rounds).map { r =>
      s"""SELECT $r AS round, ascii(substr(pair, 1, 1)) AS c1,
         | ascii(substr(pair, 2, 1)) AS c2, cnt,
         | (SELECT CAST(sum(length(t)) AS BIGINT) FROM t${r + 1})
         |   AS corpus_chars_after FROM b$r""".stripMargin
    }
    bpeCtes(rounds) +
      "\nSELECT * FROM (" + legs.mkString(" UNION ALL ") +
      ") z ORDER BY round"
  }

  /** q186's oracle: the same 7 banding legs with powers as repeated-
    * squaring multiplication text (value-identical to the engine's
    * fold of Column squarings). */
  private def lshDesignOracle(totalHashes: Int, tauGrid: Int): String = {
    def sq(x: String, k: Int): String =
      (0 until k).foldLeft(x)((s, _) => s"($s * $s)")
    def log2(x: Int): Int = Integer.numberOfTrailingZeros(x)
    val legs = (0 to log2(totalHashes)).map { i =>
      val r = 1 << i
      val b = totalHashes / r
      val p = s"(1.0 - ${sq(s"(1.0 - ${sq("j", log2(r))})", log2(b))})"
      s"""SELECT CAST($b AS INTEGER) AS bands,
         | CAST($r AS INTEGER) AS rows_per_band,
         | CAST(sum(CASE WHEN g < $tauGrid
         |   THEN CAST(floor($p * 1000000.0 + 0.5) AS BIGINT)
         |   ELSE 0 END) AS BIGINT) AS fp_fp,
         | CAST(sum(CASE WHEN g >= $tauGrid
         |   THEN CAST(floor((1.0 - $p) * 1000000.0 + 0.5) AS BIGINT)
         |   ELSE 0 END) AS BIGINT) AS fn_fp
         |FROM jj""".stripMargin
    }
    s"""WITH gr AS (SELECT unnest(generate_series(1, 99)) AS g),
       |jj AS (SELECT g, CAST(g AS DOUBLE) / 100.0 AS j FROM gr),
       |t AS (${legs.mkString("\nUNION ALL\n")}),
       |t2 AS (SELECT bands, rows_per_band, fp_fp, fn_fp,
       |  fp_fp + fn_fp AS total_fp FROM t)
       |SELECT bands, rows_per_band, fp_fp, fn_fp, total_fp,
       | (total_fp = (SELECT min(total_fp) FROM t2)) AS is_best
       |FROM t2 ORDER BY bands""".stripMargin
  }

  /** q176's round-trip tail: expand merge symbols in REVERSE round
    * order (chr(0xE000+r) → its elected pair, r = rounds−1 … 0), then
    * compare against the original text per document. */
  private def bpeRoundtripOracle(rounds: Int): String = {
    val decodes = (rounds - 1 to 0 by -1).map { r =>
      val prev = if (r == rounds - 1) s"t$rounds" else s"dec${r + 1}"
      s"""dec$r AS MATERIALIZED (SELECT doc_id,
         | replace(t, chr(${0xE000 + r}), (SELECT pair FROM b$r)) AS t
         | FROM $prev)""".stripMargin
    }
    bpeCtes(rounds) + ",\n" + decodes.mkString(",\n") +
      s"""
         |SELECT o.doc_id,
         | CAST(length(o.t) AS BIGINT) AS n_chars,
         | CAST(length(e.t) AS BIGINT) AS n_tokens,
         | (d.t = o.t) AS ok
         |FROM t0 o JOIN t$rounds e USING (doc_id)
         |JOIN dec0 d USING (doc_id) ORDER BY o.doc_id""".stripMargin
  }

  /** q164's encode tail over the same fit chain: per-doc symbol counts
    * on the fully-merged text (length() = characters — the PUA merge
    * symbols are 3 UTF-8 bytes, so strlen would be wrong). */
  private def bpeEncodeOracle(rounds: Int): String =
    bpeCtes(rounds) +
      s"""
         |SELECT a.doc_id,
         | CAST(length(a.t) AS BIGINT) AS n_chars,
         | CAST(len(string_split_regex(trim(a.t), '\\s+')) AS BIGINT)
         |  AS n_words,
         | CAST(length(b.t) AS BIGINT) AS n_tokens,
         | round(CAST(length(a.t) AS DOUBLE) / CAST(length(b.t) AS DOUBLE), 6)
         |  AS compression,
         | round(CAST(length(b.t) AS DOUBLE)
         |   / CAST(len(string_split_regex(trim(a.t), '\\s+')) AS DOUBLE), 6)
         |  AS fertility
         |FROM t0 a JOIN t$rounds b USING (doc_id)
         |ORDER BY a.doc_id""".stripMargin

  /** q162's integer power iteration unrolled: every intermediate is an
    * exact BIGINT (fixed-point coordinates, exact covariance
    * numerator, L∞ renormalization by an integer divisor), so the CTE
    * chain reproduces the engine bit-for-bit — the floordivs go
    * through double division of exact integers on BOTH sides, which
    * is correctly rounded and therefore identical. */
  private def pcaOracle(dims: Int, iters: Int, kq: Long): String = {
    val k2 = kq * kq
    val head =
      s"""q AS MATERIALIZED (SELECT list_transform(CAST(embedding AS DOUBLE[]),
         |  x -> CAST(floor(x * $kq + 0.5) AS BIGINT)) AS qa FROM embeddings),
         |d AS (SELECT unnest(generate_series(0, ${dims - 1})) AS i),
         |cnt AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         |sij AS (SELECT di.i AS i, dj.i AS j,
         |  CAST(sum(qa[di.i + 1] * qa[dj.i + 1]) AS BIGINT) AS sp
         | FROM q CROSS JOIN d di CROSS JOIN d dj GROUP BY di.i, dj.i),
         |si AS (SELECT d.i AS i, CAST(sum(qa[d.i + 1]) AS BIGINT) AS s
         | FROM q CROSS JOIN d GROUP BY d.i),
         |c AS MATERIALIZED (SELECT sij.i, sij.j,
         |  CAST(floor(CAST((SELECT n FROM cnt) * sij.sp - a.s * b.s
         |    AS DOUBLE) / (SELECT n FROM cnt)) AS BIGINT) AS c
         | FROM sij JOIN si a ON a.i = sij.i JOIN si b ON b.i = sij.j),
         |v0 AS MATERIALIZED (SELECT i, CAST($kq AS BIGINT) AS q FROM d)""".stripMargin
    val steps = (0 until iters).map { r =>
      s"""s$r AS MATERIALIZED (SELECT c.i AS i, CAST(sum(c.c * v.q) AS BIGINT)
         |  AS s FROM c JOIN v$r v ON v.i = c.j GROUP BY c.i),
         |d$r AS (SELECT CAST(floor(CAST(max(abs(s)) AS DOUBLE) / $kq)
         |   AS BIGINT) + 1 AS dd FROM s$r),
         |v${r + 1} AS MATERIALIZED (SELECT i, CAST(floor(CAST(s AS DOUBLE)
         |  / (SELECT dd FROM d$r)) AS BIGINT) AS q FROM s$r)""".stripMargin
    }
    val tail =
      s"""sf AS (SELECT c.i AS i, CAST(sum(c.c * v.q) AS BIGINT) AS s
         | FROM c JOIN v$iters v ON v.i = c.j GROUP BY c.i),
         |istar AS (SELECT i FROM v$iters ORDER BY abs(q) DESC, i LIMIT 1),
         |lam AS (SELECT CAST(sf.s AS DOUBLE) / CAST(v.q AS DOUBLE)
         |   / (SELECT n FROM cnt) / $k2.0 AS eig
         | FROM sf JOIN v$iters v USING (i)
         | WHERE sf.i = (SELECT i FROM istar)),
         |tr AS (SELECT CAST(sum(CASE WHEN i = j THEN c END) AS DOUBLE)
         |   / (SELECT n FROM cnt) / $k2.0 AS trace FROM c),
         |mq AS (SELECT CAST(max(abs(q)) AS BIGINT) AS m FROM v$iters)
         |SELECT CAST(v.i AS INTEGER) AS dim,
         | round(CAST(v.q AS DOUBLE) / CAST((SELECT m FROM mq) AS DOUBLE), 6)
         |  AS loading,
         | round((SELECT eig FROM lam), 10) AS eigval,
         | round((SELECT eig FROM lam) / (SELECT trace FROM tr), 6)
         |  AS explained
         |FROM v$iters v ORDER BY dim""".stripMargin
    "WITH " + (Seq(head) ++ steps).mkString(",\n") + ",\n" + tail
  }

  /** q154's truncated leg: exact top-5 by PREFIX cosine over the first
    * `d` dims — cosine is scale-invariant, so ranking list slices IS
    * ranking the re-normalized Matryoshka truncations. */
  private def truncTopKOracle(d: Int): String =
    s"""SELECT query_id, neighbor_id, rnk FROM (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY list_cosine_similarity(q.embedding[1:$d],
       |               c.embedding[1:$d]) DESC,
       |             c.vec_id) AS INTEGER) AS rnk
       | FROM embeddings q, embeddings c
       | WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id) t
       |WHERE rnk <= 5""".stripMargin

  /** q33's ANN pipeline reproduced end-to-end: md5-derived hyperplane
    * weights -> sign buckets -> multi-probe (hamming<=1) candidates ->
    * exact cosine rank. Possible only because the planes are hash-
    * derived (a seeded-RNG plane set would not be SQL-expressible).
    * Also the approximate leg of the q106 recall gate. */
  private val signLshTopKOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |w AS (SELECT pp.p AS p, dd.d AS d,
      |  CAST(('0x' || substr(md5('42:' || pp.p || ':' || dd.d), 1, 8)) AS BIGINT)
      |    / 4294967296.0 - 0.5 AS wt
      | FROM generate_series(0, 5) AS pp(p), generate_series(0, 63) AS dd(d)),
      |dots AS (SELECT e.vec_id, w.p, SUM(e.v[w.d + 1] * w.wt) AS s
      | FROM e, w GROUP BY e.vec_id, w.p),
      |buck AS (SELECT vec_id,
      |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
      |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
      | FROM dots GROUP BY vec_id),
      |qp AS (SELECT b.vec_id AS query_id,
      |  xor(b.bucket, CASE WHEN g.i = 0 THEN CAST(0 AS BIGINT)
      |    ELSE (CAST(1 AS BIGINT) << CAST(g.i - 1 AS INTEGER)) END) AS bucket
      | FROM buck b, generate_series(0, 6) AS g(i) WHERE b.vec_id < 8),
      |cand AS (SELECT DISTINCT qp.query_id, cb.vec_id AS neighbor_id
      | FROM qp JOIN buck cb ON cb.bucket = qp.bucket
      | WHERE cb.vec_id <> qp.query_id),
      |ranked AS (SELECT c.query_id, c.neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY c.query_id
      |    ORDER BY list_cosine_similarity(qe.embedding, ne.embedding) DESC,
      |             c.neighbor_id) AS INTEGER) AS rnk
      | FROM cand c
      | JOIN embeddings qe ON qe.vec_id = c.query_id
      | JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      |SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** Shared q100/q111 oracle: incremental exact dedup — q111 differs
    * only in consuming a persisted reference fingerprint table. */
  private val incrDedupOracle: String =
    """WITH d AS (
      | SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |  CAST(('0x' || substr(md5('inc:' || doc_id), 1, 8)) AS BIGINT) % 4 = 0
      |   AS is_inc
      | FROM documents),
      |ref AS (SELECT DISTINCT fp FROM d WHERE NOT is_inc),
      |inc AS (SELECT doc_id, fp FROM d WHERE is_inc),
      |k AS (SELECT fp, min(doc_id) AS keep FROM inc GROUP BY 1)
      |SELECT i.doc_id, i.fp,
      | CASE WHEN r.fp IS NOT NULL THEN 'dup_of_ref'
      |      WHEN i.doc_id <> k.keep THEN 'dup_in_batch'
      |      ELSE 'new' END AS status
      |FROM inc i LEFT JOIN ref r USING (fp) JOIN k USING (fp)
      |ORDER BY doc_id""".stripMargin

  /** Per-subspace PQ codebook build as chained CTEs over a caller-
    * provided normalized-corpus CTE `e(vec_id, v)` — the
    * [[ivfBuildCtes]] construction generalized to m codebooks:
    * `es(vec_id, s, sv)` slices every vector per subspace, `pinit`/
    * `pc0` slice the SAME ksub md5-ranked init vectors, one
    * pd/pa/pm/pc quadruple per Lloyd round (means 6-dp-rounded, lost
    * cells carried forward), `paf` the final per-subspace code
    * assignment. All CTE names are p-prefixed so the coarse
    * [[ivfBuildCtes]] (init/c0../af) can live in the same WITH —
    * q117 chains both. Callers append their own tail after a comma. */
  private def pqBuildCtes(m: Int, ksub: Int, dsub: Int, iters: Int,
      seed: Int): String = {
    def sl(v: String, s: String) =
      s"list_slice($v, $s*$dsub + 1, ($s+1)*$dsub)"
    val sqd =
      s"list_sum(list_transform(range(1, ${dsub + 1}), i -> (es.sv[i]-c.ctr[i])*(es.sv[i]-c.ctr[i])))"
    val iterCtes = (1 to iters).map { kk =>
      val j = kk - 1
      s"""pd$kk AS (
         | SELECT es.vec_id, es.s, c.cell,
         |  row_number() OVER (PARTITION BY es.vec_id, es.s ORDER BY
         |   $sqd, c.cell) AS r
         | FROM es JOIN pc$j c ON c.s = es.s),
         |pa$kk AS (SELECT vec_id, s, cell FROM pd$kk WHERE r = 1),
         |pm$kk AS (
         | SELECT a.s, a.cell, d.i AS di, round(avg(es.sv[d.i]), 6) AS w
         | FROM pa$kk a JOIN es ON es.vec_id = a.vec_id AND es.s = a.s,
         |  generate_series(1, $dsub) AS d(i)
         | GROUP BY a.s, a.cell, d.i),
         |pc$kk AS (
         | SELECT pc$j.s, pc$j.cell, coalesce(mm.ctr, pc$j.ctr) AS ctr
         | FROM pc$j LEFT JOIN (SELECT s, cell, list(w ORDER BY di) AS ctr
         |   FROM pm$kk GROUP BY s, cell) mm
         |  ON mm.s = pc$j.s AND mm.cell = pc$j.cell)""".stripMargin
    }.mkString(",\n")
    s"""es AS (
       | SELECT vec_id, ss.s AS s, ${sl("v", "ss.s")} AS sv
       | FROM e, generate_series(0, ${m - 1}) AS ss(s)),
       |pinit AS (
       | SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS cell, v
       | FROM (SELECT vec_id, v,
       |        CAST(('0x' || substr(md5('$seed:' || vec_id), 1, 8)) AS BIGINT) AS h
       |       FROM e)
       | ORDER BY h, vec_id LIMIT $ksub),
       |pc0 AS (
       | SELECT ss.s AS s, pinit.cell, ${sl("pinit.v", "ss.s")} AS ctr
       | FROM pinit, generate_series(0, ${m - 1}) AS ss(s)),
       |$iterCtes,
       |paf AS (
       | SELECT vec_id, s, cell FROM (
       |  SELECT es.vec_id, es.s, c.cell,
       |   row_number() OVER (PARTITION BY es.vec_id, es.s ORDER BY
       |    $sqd, c.cell) AS r
       |  FROM es JOIN pc$iters c ON c.s = es.s) t WHERE r = 1)""".stripMargin
  }

  /** Shared ADC + exact-re-rank oracle tail over a candidate CTE
    * `cpairs(query_id, neighbor_id)`: per-(query, neighbor, s)
    * centroid-dot terms summed in subspace order via
    * `list(t ORDER BY s)` — the exact fold order of the engine's left
    * reduce — then the k·refine cut and the exact float re-rank. */
  private def adcTailSql(m: Int, ksub: Int, dsub: Int, iters: Int,
      k: Int, refine: Int): String = {
    val dim = m * dsub
    s"""terms AS (
       | SELECT cp.query_id, cp.neighbor_id, a.s,
       |  list_sum(list_transform(range(1, ${dsub + 1}),
       |   i -> list_slice(qe.v, a.s*$dsub + 1, (a.s+1)*$dsub)[i] * c.ctr[i])) AS t
       | FROM cpairs cp JOIN e qe ON qe.vec_id = cp.query_id
       |  JOIN paf a ON a.vec_id = cp.neighbor_id
       |  JOIN pc$iters c ON c.s = a.s AND c.cell = a.cell),
       |adc AS (
       | SELECT query_id, neighbor_id, list_sum(list(t ORDER BY s)) AS asim
       | FROM terms GROUP BY query_id, neighbor_id),
       |cand AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY query_id ORDER BY asim DESC, neighbor_id) AS ar
       |  FROM adc) t WHERE ar <= ${k * refine})
       |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk FROM (
       | SELECT c2.query_id, c2.neighbor_id,
       |  row_number() OVER (PARTITION BY c2.query_id ORDER BY
       |   list_sum(list_transform(range(1, ${dim + 1}), i -> qe.v[i] * ne.v[i])) DESC,
       |   c2.neighbor_id) AS rnk
       | FROM cand c2 JOIN e qe ON qe.vec_id = c2.query_id
       |  JOIN e ne ON ne.vec_id = c2.neighbor_id) t
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** q116's oracle: Similarity.pqTopK unrolled — [[pqBuildCtes]] +
    * the all-candidates ADC scan + [[adcTailSql]]. All float folds
    * index/subspace-ordered like the engine's, so ranks match
    * hash-for-hash (the q53 ivfOracle construction, generalized to m
    * codebooks). */
  private def pqOracle(m: Int, ksub: Int, dsub: Int, iters: Int,
      seed: Int, k: Int, refine: Int, queryMax: Int): String =
    s"""WITH e AS (
       | SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]),
       |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                         y -> y*y)))) AS v
       | FROM embeddings),
       |${pqBuildCtes(m, ksub, dsub, iters, seed)},
       |cpairs AS (
       | SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
       | FROM (SELECT vec_id FROM e WHERE vec_id < $queryMax) q, e n
       | WHERE n.vec_id <> q.vec_id),
       |${adcTailSql(m, ksub, dsub, iters, k, refine)}""".stripMargin

  /** q117's oracle: Similarity.ivfPqTopK unrolled — BOTH Lloyd builds
    * ([[ivfBuildCtes]] coarse cells + [[pqBuildCtes]] codebooks) in
    * one WITH, the q53-style nprobe probe restricting candidates to
    * the probed posting lists, then the same ADC + re-rank tail as
    * q116. */
  private def ivfPqOracle(nlist: Int, nprobe: Int, m: Int, ksub: Int,
      dsub: Int, iters: Int, coarseSeed: Int, pqSeed: Int, k: Int,
      refine: Int, queryMax: Int): String = {
    val dim = m * dsub
    s"""WITH e AS (
       | SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]),
       |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                         y -> y*y)))) AS v
       | FROM embeddings),
       |${ivfBuildCtes(nlist, iters, dim, coarseSeed)},
       |${pqBuildCtes(m, ksub, dsub, iters, pqSeed)},
       |probes AS (
       | SELECT query_id, cell FROM (
       |  SELECT e.vec_id AS query_id, c.cell,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${sqdExpr("e.v", "c", dim)}, c.cell) AS r
       |  FROM e, c$iters c WHERE e.vec_id < $queryMax) t WHERE r <= $nprobe),
       |cpairs AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id
       | FROM probes p JOIN af a USING (cell)
       | WHERE a.vec_id <> p.query_id),
       |${adcTailSql(m, ksub, dsub, iters, k, refine)}""".stripMargin
  }

  /** Shared q61/q114 oracle: both queries compute the same distinct-
    * 3-gram overlap counts — q114 differs only in HOW non-overlapping
    * docs are skipped (Bloom prefilter + verify join vs full explode +
    * broadcast join), which is invisible to the result (no false
    * negatives; false positives die in the verify join). */
  private val deconOracle: String =
    """WITH toks AS (
      | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      | FROM documents),
      |sh AS (
      | SELECT doc_id, CASE WHEN len(t) >= 3
      |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |  ELSE [array_to_string(t, ' ')] END AS s
      | FROM toks),
      |bench AS (SELECT DISTINCT unnest(s) AS sh1 FROM sh WHERE doc_id < 20),
      |corp AS (SELECT doc_id, unnest(s) AS sh1 FROM sh WHERE doc_id >= 20)
      |SELECT c.doc_id, count(*) AS n_overlap
      |FROM corp c JOIN bench b USING (sh1)
      |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  /** Shared q103/q104 oracle: both queries compute the same verified
    * cross-side J >= 0.7 pair set — q104 differs only in WHERE the
    * reference stages come from (persisted parquet vs recompute), which
    * is invisible to the result. */
  private val incrNearDupOracle: String =
    """WITH toks AS (
      | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      | FROM documents),
      |sh AS (
      | SELECT doc_id, CASE WHEN len(t) >= 3
      |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |  ELSE [array_to_string(t, ' ')] END AS s
      | FROM toks),
      |sp AS (
      | SELECT doc_id,
      |  CAST(('0x' || substr(md5('inc:' || doc_id), 1, 8)) AS BIGINT) % 4 = 0
      |   AS is_inc
      | FROM documents),
      |ex AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
      |cand AS (
      | SELECT a.doc_id AS ia, b.doc_id AS ib FROM ex a
      | JOIN ex b ON a.sh1 = b.sh1
      | JOIN sp pa ON pa.doc_id = a.doc_id AND pa.is_inc
      | JOIN sp pb ON pb.doc_id = b.doc_id AND NOT pb.is_inc
      | GROUP BY 1, 2)
      |SELECT inc_id, ref_id, jaccard FROM (
      | SELECT ia AS inc_id, ib AS ref_id,
      |  round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |   / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE),
      |   4) AS jaccard
      | FROM cand JOIN sh x ON x.doc_id = ia JOIN sh y ON y.doc_id = ib) t
      |WHERE jaccard >= 0.7 ORDER BY inc_id, ref_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
        | round(l_extendedprice * (1 - l_discount), 2) AS net_price,
        | replace(replace(l_returnflag, chr(13), ''), chr(10), '') AS flag
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_group" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(avg(l_discount), 4) AS avg_disc, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q04_left_join" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q05_parent_join" ->
      """SELECT n_nationkey, n_name, r_name AS parent_name
        |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q06_group_concat_ordered" ->
      """SELECT o_orderkey, string_agg(n, ';' ORDER BY w, n) AS flags
        |FROM (SELECT l_orderkey AS o_orderkey, l_returnflag AS n,
        |        min(l_linenumber) AS w
        |      FROM lineitem GROUP BY 1, 2) t
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q07_group_concat_sorted" ->
      """SELECT c_nationkey, string_agg(seg, ',' ORDER BY seg) AS segments
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer) t
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q08_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'error') AS error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q11_cast_unsigned" ->
      """SELECT o_orderkey,
        | coalesce(try_cast(regexp_extract(o_orderpriority, '^\s*([0-9]+)', 1) AS BIGINT), 0) AS prio_num,
        | coalesce(try_cast(regexp_extract(o_orderstatus, '^\s*([0-9]+)', 1) AS BIGINT), 0) AS status_num
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q12_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q13_topn" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,
    "q14_window_rownum" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q15_union_all" ->
      """SELECT o_orderkey AS k, 'o' AS src FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT l_orderkey AS k, 'l' AS src FROM lineitem WHERE l_quantity > 49
        |ORDER BY src, k""".stripMargin,
    "q16_intersect" ->
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
        |INTERSECT
        |SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 45
        |ORDER BY k""".stripMargin,
    "q17_except" ->
      """SELECT o_orderkey AS k FROM orders
        |EXCEPT
        |SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 10
        |ORDER BY k""".stripMargin,
    "q18_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q19_window_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket,
        | event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q20_topo_depth" ->
      """SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS node, 0 AS depth FROM region
        |UNION ALL
        |SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS node, 1 AS depth FROM nation
        |UNION ALL
        |SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node, 2 AS depth FROM customer
        |ORDER BY node""".stripMargin,
    "q21_bfs_closure" ->
      """SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS node
        |FROM region WHERE r_name = 'ASIA'
        |UNION ALL
        |SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS node
        |FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
        |UNION ALL
        |SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
        |ORDER BY node""".stripMargin,
    "q22_cycle_scan" ->
      """SELECT count(*) AS n_cycle_nodes FROM nation WHERE n_nationkey < 0""",
    "q23_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q24_token_stats" ->
      """SELECT doc_id,
        | CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INTEGER) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
        | CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_quality" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS ltoks
        | FROM documents)
        |SELECT doc_id,
        | round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS uniq_ratio,
        | round(CAST(coalesce(list_sum(list_transform(toks, s -> length(s))), 0) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS mean_tok_len,
        | round(CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
        |   / CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
        | round(CAST(len(list_filter(ltoks, s -> s IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'))) AS DOUBLE)
        |   / CAST(greatest(len(ltoks), 1) AS DOUBLE), 4) AS stopword_ratio,
        | round((CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
        |  + (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "q26_langid" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        | FROM documents),
        |s AS (SELECT doc_id,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t)
        |SELECT doc_id, CASE
        | WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        | WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        | WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        | WHEN s_fr >= s_pt THEN 'fr'
        | ELSE 'pt' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "q27_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        | sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_like_filter" ->
      """SELECT p_partkey, p_brand, p_type FROM part
        |WHERE p_type LIKE '%ECO%' AND p_brand LIKE '%1%'
        |ORDER BY p_partkey""".stripMargin,
    "q37_concat_pairs" ->
      """SELECT n_nationkey, n_name || ':' || r_name AS pair
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q38_split_first" ->
      """SELECT o_orderkey, split_part(flags, ';', 1) AS first_flag FROM (
        | SELECT o_orderkey, string_agg(n, ';' ORDER BY w, n) AS flags
        | FROM (SELECT l_orderkey AS o_orderkey, l_returnflag AS n,
        |         min(l_linenumber) AS w
        |       FROM lineitem GROUP BY 1, 2) t
        | GROUP BY o_orderkey) s
        |ORDER BY o_orderkey""".stripMargin,
    "q39_null_column" ->
      """SELECT c_custkey, CAST(NULL AS VARCHAR) AS void_retire
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q40_mapping_pivot" ->
      """WITH codes AS (
        | SELECT o_orderkey, 'prio' AS kind, o_orderpriority AS code FROM orders
        | UNION ALL
        | SELECT o_orderkey, 'status' AS kind, o_orderstatus AS code FROM orders),
        |tagged AS (
        | SELECT o_orderkey, kind, code,
        |  CASE WHEN coalesce(try_cast(regexp_extract(code, '^\s*([0-9]+)', 1) AS BIGINT), 0) <> 0
        |   THEN 'Number' ELSE 'Name' END AS spec
        | FROM codes)
        |SELECT o_orderkey,
        | coalesce(string_agg(DISTINCT code, ';' ORDER BY code)
        |   FILTER (WHERE kind = 'prio' AND spec = 'Name'), '') AS "prio|Name",
        | coalesce(string_agg(DISTINCT code, ';' ORDER BY code)
        |   FILTER (WHERE kind = 'prio' AND spec = 'Number'), '') AS "prio|Number",
        | coalesce(string_agg(DISTINCT code, ';' ORDER BY code)
        |   FILTER (WHERE kind = 'status' AND spec = 'Name'), '') AS "status|Name",
        | coalesce(string_agg(DISTINCT code, ';' ORDER BY code)
        |   FILTER (WHERE kind = 'status' AND spec = 'Number'), '') AS "status|Number"
        |FROM tagged GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q41_join_chain" ->
      """SELECT o_orderkey, coalesce(string_agg(n, ';' ORDER BY w, n), '') AS members
        |FROM (SELECT o.o_orderkey, p.p_name AS n, min(l.l_linenumber) AS w
        |      FROM orders o
        |      LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |      LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size > 25) p
        |        ON l.l_partkey = p.p_partkey
        |      WHERE o.o_totalprice > 400000
        |      GROUP BY 1, 2) t
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q42_empty_probe" ->
      """SELECT CAST(max(CASE WHEN c_name IS NOT NULL AND length(c_name) > 0
        |   THEN 1 ELSE 0 END) AS INTEGER) AS c_name_filled,
        | CAST(max(CASE WHEN c_mktsegment IS NOT NULL AND length(c_mktsegment) > 0
        |   THEN 1 ELSE 0 END) AS INTEGER) AS c_mktsegment_filled,
        | CAST(0 AS INTEGER) AS ghost_filled
        |FROM customer""".stripMargin,
    "q43_stop_scan" ->
      """SELECT kind, id, value FROM (
        | SELECT 'brand' AS kind, p_partkey AS id, p_brand AS value FROM part
        |  WHERE p_brand LIKE '%#25%'
        | UNION ALL
        | SELECT 'name' AS kind, c_custkey AS id, c_name AS value FROM customer
        |  WHERE c_name LIKE '%999%') t
        |ORDER BY kind, id""".stripMargin,
    "q44_set_derive" ->
      """WITH idx AS (
        | SELECT r_name, CAST(row_number() OVER (ORDER BY r_regionkey) AS INTEGER) AS rn
        | FROM region)
        |SELECT s.r_name AS concept, m.r_name AS member,
        | 'CONCEPT-SET' AS member_type, m.rn - 1 AS sort_weight
        |FROM idx m, (SELECT r_name FROM idx WHERE rn = 1) s
        |WHERE m.rn > 1 ORDER BY sort_weight""".stripMargin,
    "q46_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2)
        |  AS running_total,
        | round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q47_date_functions" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS d,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS days_left
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q48_json_agg" ->
      """SELECT event_type,
        | CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        | count(*) FILTER (WHERE CAST(props->>'$.k' AS INTEGER) > 50) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q28_cosine_topk" -> exactTopKOracle,
    // Full MinHash signature matrix, reproduced hash-for-hash: the
    // md5-prefix family is expressible in SQL.
    "q29_minhash_sig" ->
      """WITH toks AS (
        | SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks)
        |SELECT doc_id, CAST(g.i AS INTEGER) AS i,
        | list_min(list_transform(s, x ->
        |   (CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) * (2*g.i + 1)
        |    + g.i * 40503) % 2147483647)) AS mh
        |FROM sh, generate_series(0, 63) AS g(i)
        |ORDER BY doc_id, i""".stripMargin,
    // The ANN pipeline reproduced end-to-end: md5-derived hyperplane
    // weights -> sign buckets -> multi-probe (hamming<=1) candidates ->
    // exact cosine rank. Possible only because the planes are hash-
    // derived (a seeded-RNG plane set would not be SQL-expressible).
    "q33_ann_topk" -> signLshTopKOracle,
    // Exact brute-force Jaccard >= 0.7 over 3-token shingles: equals the
    // MinHash-LSH output because banded collision is ~certain at the
    // planted near-dups' J >= 0.9 (see PipelineQueries.minhashPairs).
    "q30_minhash_pairs" -> jaccardPairOracle(0.7),
    "q31_simhash" ->
      """WITH toks AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS t
        | FROM documents),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS hv
        |      FROM (SELECT doc_id, unnest(t) AS tk FROM toks)),
        |bits AS (
        | SELECT doc_id, g.i AS i,
        |  SUM(CASE WHEN (hv >> CAST(g.i AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        | FROM h, generate_series(0, 59) AS g(i) GROUP BY doc_id, g.i)
        |SELECT doc_id,
        | CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q32_ngram_jaccard" -> jaccardPairOracle(0.5),
    "q34_cosine_neardup" ->
      """SELECT id_a, id_b, cos FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) t
        |WHERE cos >= 0.45 ORDER BY id_a, id_b""".stripMargin,
    // The banded sign-LSH near-dup pipeline (the q34 semantics' 100 TB
    // plan) reproduced end-to-end IN ITS DESIGN REGIME (τ=0.85): the
    // corpus is the embeddings plus md5-derived planted near-dup copies
    // (PipelineQueries.plantedNormEmb — the testdata has no natural
    // high-cosine pairs), then 16 bands × 8 md5-derived hyperplanes
    // (seed 42+band), per-band sign buckets, OR-of-bands candidate
    // pairs, exact-cosine verification. Like q33, possible only because
    // planes AND planted noise are hash-derived. Bucket signs are
    // computed on the raw vectors — L2 normalization cannot flip
    // sign(v·plane). The Spark side's hot-bucket cap (maxBucket=1000)
    // is vacuous at gate scale by construction — no bucket can exceed
    // the 540-vector corpus — so the oracle need not model it.
    "q51_cosine_neardup_lsh" ->
      (s"""WITH ${plantedCorpusCtes(64)},
        |w AS (SELECT bb.b AS b, pp.p AS p, dd.d AS d,
        |  CAST(('0x' || substr(md5(CAST(42 + bb.b AS VARCHAR) || ':' || pp.p || ':' || dd.d), 1, 8)) AS BIGINT)
        |    / 4294967296.0 - 0.5 AS wt
        | FROM generate_series(0, 15) AS bb(b), generate_series(0, 7) AS pp(p),
        |      generate_series(0, 63) AS dd(d)),
        |dots AS (SELECT eraw.vec_id, w.b, w.p, SUM(eraw.v[w.d + 1] * w.wt) AS s
        | FROM eraw, w GROUP BY eraw.vec_id, w.b, w.p),
        |buck AS (SELECT vec_id, b,
        |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
        |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        | FROM dots GROUP BY vec_id, b),
        |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        | FROM buck x JOIN buck y ON x.b = y.b AND x.bucket = y.bucket
        | WHERE x.vec_id < y.vec_id)
        |SELECT id_a, id_b, cos FROM (
        | SELECT c.id_a, c.id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
        | FROM cand c JOIN eraw a ON a.vec_id = c.id_a
        | JOIN eraw b ON b.vec_id = c.id_b) t
        |WHERE cos >= 0.85 ORDER BY id_a, id_b""".stripMargin),
    // The IVF-ANN pipeline reproduced end-to-end, like q33/q51: md5-
    // derived init centers, three UNROLLED Lloyd assign/mean rounds
    // (the iteration count is a fixed constant, so "iterative" does not
    // mean "not SQL-expressible" — it unrolls), final cell assignment,
    // nprobe-cell probe ranking, exact top-k inside the probed posting
    // lists. Centroids are quantized to 6 decimals after every mean
    // step ON BOTH SIDES (Similarity.roundCoord6 / round(avg,6)), so
    // the only unordered float reduction in the pipeline — the per-cell
    // mean — cannot drift the engines apart; all distances and dots
    // fold in index order over identical values (list_sum/list_transform
    // here, zip_with/aggregate in Spark), keeping the comparison exact.
    "q53_ivf_topk" -> ivfOracle(nlist = 16, nprobe = 4, iters = 3,
      dim = 64, k = 5, seed = 42, queryMax = 8),
    // Retrieval-QUALITY gate: recall@5 of the two approximate paths
    // against the exact top-5. The oracle RECOMPUTES all three legs
    // (the q28/q33/q53 gate SQL, nested as CTEs — DuckDB allows a WITH
    // inside a CTE body) and derives the same counts, so the row stays
    // valid under testdata regeneration — no pinned recall literals.
    "q106_ann_recall" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ann AS (
         |$signLshTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), hits AS (
         | SELECT (SELECT count(*) FROM exact) AS n_exact,
         |  (SELECT count(*) FROM exact JOIN ann USING (query_id, neighbor_id)) AS ann_hits,
         |  (SELECT count(*) FROM exact JOIN ivf USING (query_id, neighbor_id)) AS ivf_hits)
         |SELECT CAST(5 AS INTEGER) AS k, n_exact, ann_hits, ivf_hits,
         | round(CAST(ann_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS ann_recall,
         | round(CAST(ivf_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS ivf_recall
         |FROM hits""".stripMargin,
    // RRF fusion: the three leg CTEs recomposed (q106's construction),
    // candidate union, terms added in the engine's fixed leg order
    // (exact + ann + ivf), 6-dp round BEFORE ranking, neighbor ties
    "q125_rrf_fusion" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ann AS (
         |$signLshTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), u AS (
         | SELECT query_id, neighbor_id FROM exact
         | UNION SELECT query_id, neighbor_id FROM ann
         | UNION SELECT query_id, neighbor_id FROM ivf),
         |sc AS (
         | SELECT u.query_id, u.neighbor_id,
         |  round(coalesce(CAST(1 AS DOUBLE) / (60 + e.rnk), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / (60 + a.rnk), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / (60 + i.rnk), 0), 6) AS score
         | FROM u LEFT JOIN exact e USING (query_id, neighbor_id)
         |  LEFT JOIN ann a USING (query_id, neighbor_id)
         |  LEFT JOIN ivf i USING (query_id, neighbor_id))
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INTEGER) AS rnk FROM (
         | SELECT query_id, neighbor_id, score,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, neighbor_id) AS rnk
         | FROM sc) t WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // CMS heavy hitters, the q52 sketch-facts pattern: exact top-31
    // counts + pinned-true bound booleans (over≥exact is a CMS
    // invariant; within-ε verified deterministic on the fixed data+seed)
    "q126_cms_heavy_hitters" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        |r AS (SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rnk
        | FROM c)
        |SELECT term, n, rnk, true AS est_ge_exact, true AS est_within_eps
        |FROM r WHERE rnk <= 31 ORDER BY rnk""".stripMargin,
    // Misra-Gries: q126's exact facts with WORST-CASE-certain booleans
    // (capture, two-sided estimate bound, summary size) — all theorem-
    // guaranteed true for any stream/merge order, hence oracle-able
    "q141_mg_heavy_hitters" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        |r AS (SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rnk
        | FROM c)
        |SELECT term, n, rnk, true AS captured_if_frequent,
        | true AS est_le_exact, true AS est_ge_lower, true AS summary_le_k
        |FROM r WHERE rnk <= 31 ORDER BY rnk""".stripMargin,
    // Split-leakage audit: the exact J>=0.5 pair oracle (q32's,
    // nested whole as a CTE) classified by the q59 split formula
    "q127_split_leakage" ->
      s"""WITH jp AS (
         |${jaccardPairOracle(0.5)}
         |), sp AS (
         | SELECT doc_id,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |   ELSE 'test' END AS split
         | FROM (SELECT doc_id,
         |   CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT) % 100 AS b
         |  FROM documents) t)
         |SELECT pair_class, count(*) AS n_pairs FROM (
         | SELECT CASE WHEN x.split = y.split THEN 'within_' || x.split
         |   ELSE 'cross_split' END AS pair_class
         | FROM jp JOIN sp x ON x.doc_id = jp.id_a
         |  JOIN sp y ON y.doc_id = jp.id_b) t
         |GROUP BY pair_class ORDER BY pair_class""".stripMargin,
    // Quantile normalization: the oracle says what the op MEANS (one
    // cume_dist window); the engine computes it via the two-level
    // bucketed cumulative counts — integer counts, identical result
    "q129_quantile_norm" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
        | round(cume_dist() OVER (ORDER BY l_extendedprice), 4) AS q
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // PPM decode: the oracle restates the generator's closed form —
    // dims from doc_id, pixel bytes from the md5 formula — per channel
    "q130_ppm_decode" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(2 + doc_id % 5 AS BIGINT) AS w,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS h
        | FROM documents),
        |px0 AS (
        | SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS p
        | FROM dims),
        |px AS (
        | SELECT doc_id, w, h,
        |  CAST(('0x' || substr(md5('ppm:' || doc_id || ':' || (3*p)), 1, 8))
        |    AS BIGINT) % 256 AS r,
        |  CAST(('0x' || substr(md5('ppm:' || doc_id || ':' || (3*p + 1)), 1, 8))
        |    AS BIGINT) % 256 AS g,
        |  CAST(('0x' || substr(md5('ppm:' || doc_id || ':' || (3*p + 2)), 1, 8))
        |    AS BIGINT) % 256 AS b
        | FROM px0)
        |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
        | CAST(max(h) AS INTEGER) AS height, CAST(255 AS INTEGER) AS maxval,
        | CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
        | round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
        | round(avg(b), 4) AS mean_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // PNG decode: the oracle restates the generator's md5 closed form
    // (pixel byte i of doc d = md5Int('png:d:i', 8) % 256) — the
    // Spark side actually round-trips deflate + PNG filters + CRC.
    "q145_png_decode" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 12 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 9 + 5 AS BIGINT) AS h
        | FROM documents),
        |px0 AS (
        | SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS p
        | FROM dims),
        |px AS (
        | SELECT doc_id, w, h,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p)), 1, 8))
        |    AS BIGINT) % 256 AS r,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p + 1)), 1, 8))
        |    AS BIGINT) % 256 AS g,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p + 2)), 1, 8))
        |    AS BIGINT) % 256 AS b
        | FROM px0)
        |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
        | CAST(max(h) AS INTEGER) AS height,
        | CAST(8 AS INTEGER) AS bit_depth, CAST(2 AS INTEGER) AS color_type,
        | CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
        | round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
        | round(avg(b), 4) AS mean_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // GIF decode: the oracle restates the generator's md5 index closed
    // form INCLUDING the digest of the whole index stream — the Spark
    // side actually round-trips a from-scratch LZW
    "q182_gif_decode" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 13 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 11 + 4 AS BIGINT) AS h
        | FROM documents),
        |px0 AS (
        | SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS p
        | FROM dims),
        |px AS (
        | SELECT doc_id, w, h, p,
        |  CAST(('0x' || substr(md5('gif:' || doc_id || ':' || p), 1, 8))
        |    AS BIGINT) % 4 AS v
        | FROM px0)
        |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
        | CAST(max(h) AS INTEGER) AS height,
        | CAST(4 AS INTEGER) AS gct_size,
        | CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
        | CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        | CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        | CAST(sum(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        | CAST(sum(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        | md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY p)) AS idx_md5
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // GIF resize: the NN remap is integer-exact, so the RESIZED raster
    // digest restates from the source md5 closed form directly
    "q190_gif_resize" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 13 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 11 + 4 AS BIGINT) AS h,
        |  CAST((doc_id % 13 + 4) // 2 + 1 AS BIGINT) AS w2,
        |  CAST((doc_id % 11 + 4) // 2 + 1 AS BIGINT) AS h2
        | FROM documents),
        |px0 AS (
        | SELECT doc_id, w, h, w2, h2,
        |  unnest(generate_series(0, w2*h2 - 1)) AS p
        | FROM dims),
        |px AS (
        | SELECT doc_id, w2, h2, p,
        |  CAST(('0x' || substr(md5('gif:' || doc_id || ':' ||
        |    (((p // w2) * h // h2) * w + ((p % w2) * w // w2))), 1, 8))
        |    AS BIGINT) % 4 AS v
        | FROM px0)
        |SELECT doc_id, CAST(max(w2) AS INTEGER) AS width,
        | CAST(max(h2) AS INTEGER) AS height,
        | CAST(max(w2) * max(h2) AS BIGINT) AS n_pixels,
        | CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        | CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        | CAST(sum(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        | CAST(sum(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        | md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY p)) AS idx_md5
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Index-staleness audit over the q53/q137 Lloyd fit: the oracle
    // re-runs the shared ivfBuildCtes chain, computes each vector's
    // assigned cell AND its squared distance (the min-distance row of
    // the assignment ranking), splits on the label>=5 "new arrivals"
    // slice, and recomposes the per-cell occupancy/distortion facts
    // plus the total-variation drift verdict. Empty cells survive via
    // the generate_series left join (the engine's range(nlist) fill).
    "q146_index_staleness" ->
      s"""WITH e AS (
         | SELECT vec_id,
         |  list_transform(CAST(embedding AS DOUBLE[]),
         |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
         |                                         y -> y*y)))) AS v
         | FROM embeddings),
         |${ivfBuildCtes(16, 3, 64, 42)},
         |asg AS (
         | SELECT vec_id, cell, sqd FROM (
         |  SELECT e.vec_id, c.cell, ${sqdExpr("e.v", "c", 64)} AS sqd,
         |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |    ${sqdExpr("e.v", "c", 64)}, c.cell) AS r
         |  FROM e, c3 c) t WHERE r = 1),
         |lab AS (SELECT vec_id, (label >= 5) AS isnew FROM embeddings),
         |j AS (SELECT a.cell, a.sqd, l.isnew
         |      FROM asg a JOIN lab l USING (vec_id)),
         |pc0 AS (
         | SELECT cell, count(*) AS n_fit,
         |  count(*) FILTER (WHERE isnew) AS n_new,
         |  sum(CASE WHEN isnew THEN sqd END) AS sumd
         | FROM j GROUP BY cell),
         |cells AS (SELECT CAST(g.i AS INTEGER) AS cell
         |          FROM generate_series(0, 15) AS g(i)),
         |pc AS (
         | SELECT cells.cell, CAST(coalesce(pc0.n_fit, 0) AS BIGINT) AS n_fit,
         |  CAST(coalesce(pc0.n_new, 0) AS BIGINT) AS n_new, pc0.sumd AS sumd
         | FROM cells LEFT JOIN pc0 USING (cell)),
         |tot AS (SELECT CAST(sum(n_fit) AS BIGINT) AS n_all,
         |        CAST(sum(n_new) AS BIGINT) AS n_new_tot FROM pc),
         |sh AS (SELECT cell, n_fit, n_new, sumd,
         |  CAST(n_fit AS DOUBLE) / n_all AS sf_x,
         |  CAST(n_new AS DOUBLE) / n_new_tot AS sn_x
         | FROM pc, tot),
         |g AS (SELECT round(CAST(0.5 AS DOUBLE) * sum(abs(sn_x - sf_x)), 4) AS tvd
         |      FROM sh)
         |SELECT cell, n_fit, n_new,
         | round(sf_x, 4) AS share_fit, round(sn_x, 4) AS share_new,
         | CASE WHEN n_new > 0 THEN round(sumd / n_new, 4)
         |  ELSE CAST(0 AS DOUBLE) END AS mean_sqdist_new,
         | g.tvd AS tvd, (g.tvd >= CAST(0.05 AS DOUBLE)) AS refit_needed
         |FROM sh, g ORDER BY cell""".stripMargin,
    // Containment near-dups over the planted fragment corpus: the
    // q32 shingle/candidate CTEs on documents ∪ prefix fragments, the
    // asymmetric |A∩B|/|A| scores, and the max-containment filter on
    // the ROUNDED values (the engine filters rounded columns too).
    "q147_containment_pairs" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |toksb AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM base),
        |frag AS (
        | SELECT doc_id + 200000 AS doc_id,
        |  array_to_string(t[1:(len(t)+1)//2], ' ') AS text
        | FROM toksb WHERE doc_id % 7 = 0),
        |corpus AS (SELECT doc_id, text FROM base
        |           UNION ALL SELECT doc_id, text FROM frag),
        |toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM corpus),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks),
        |ex AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
        |cand AS (
        | SELECT a.doc_id AS ia, b.doc_id AS ib FROM ex a
        | JOIN ex b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |sc AS (
        | SELECT ia AS id_a, ib AS id_b,
        |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) AS inter,
        |  CAST(len(x.s) AS DOUBLE) AS sa, CAST(len(y.s) AS DOUBLE) AS sb
        | FROM cand JOIN sh x ON x.doc_id = ia JOIN sh y ON y.doc_id = ib)
        |SELECT id_a, id_b,
        | round(inter/sa, 4) AS cont_a, round(inter/sb, 4) AS cont_b,
        | round(inter/(sa+sb-inter), 4) AS jaccard
        |FROM sc
        |WHERE greatest(round(inter/sa, 4), round(inter/sb, 4))
        |      >= CAST(0.8 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    // Novelty: the q29/q32 shingle CTEs + the q59 split, one
    // vocabulary left join — novel = absent from the train slice.
    "q149_novelty_score" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks),
        |sp AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT) % 100 AS b
        | FROM documents),
        |ex AS (
        | SELECT s.doc_id, unnest(s.s) AS sh1, (sp.b < 80) AS isref
        | FROM sh s JOIN sp USING (doc_id)),
        |ref AS (SELECT DISTINCT sh1 FROM ex WHERE isref),
        |sc AS (
        | SELECT e.doc_id, count(*) AS n_shingles,
        |  count(*) FILTER (WHERE r.sh1 IS NULL) AS n_novel
        | FROM ex e LEFT JOIN ref r ON e.sh1 = r.sh1
        | WHERE NOT e.isref GROUP BY e.doc_id)
        |SELECT doc_id, n_shingles, n_novel,
        | round(CAST(n_novel AS DOUBLE) / n_shingles, 4) AS novelty
        |FROM sc ORDER BY doc_id""".stripMargin,
    // Epoch shards: the per-epoch md5 permutation rank, sharded
    // round-robin — rank/shard/pos all restated directly in SQL.
    "q148_epoch_shards" ->
      """WITH h AS (
        | SELECT d.doc_id, e.i AS epoch,
        |  CAST(('0x' || substr(md5('epoch' || e.i || ':' || d.doc_id), 1, 8))
        |    AS BIGINT) AS hv
        | FROM documents d, generate_series(0, 1) AS e(i)),
        |r AS (
        | SELECT doc_id, epoch,
        |  row_number() OVER (PARTITION BY epoch ORDER BY hv, doc_id) - 1 AS rnk
        | FROM h)
        |SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
        | CAST(rnk % 8 AS INTEGER) AS shard, CAST(rnk // 8 AS BIGINT) AS pos
        |FROM r ORDER BY epoch, doc_id""".stripMargin,
    // Distribution shift: q59 split + token counts + smoothed KL/JS
    "q133_dist_shift" ->
      """WITH sp AS (
        | SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |   ELSE 'test' END AS split
        | FROM (SELECT doc_id,
        |   CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT) % 100 AS b
        |  FROM documents) t),
        |toks AS (
        | SELECT d.doc_id, unnest(CASE WHEN len(trim(lower(d.text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(d.text)), '\s+') END) AS term
        | FROM documents d),
        |c AS (
        | SELECT term,
        |  count(*) FILTER (sp.split = 'train') AS ct,
        |  count(*) FILTER (sp.split = 'val') AS cv
        | FROM toks JOIN sp USING (doc_id) GROUP BY term),
        |tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt,
        |        CAST(sum(cv) AS DOUBLE) AS nv,
        |        CAST(count(*) AS DOUBLE) AS vs FROM c),
        |pq AS (
        | SELECT (ct + 0.5) / (tot.nt + 0.5 * tot.vs) AS p,
        |  (cv + 0.5) / (tot.nv + 0.5 * tot.vs) AS q
        | FROM c, tot)
        |SELECT count(*) AS n_terms,
        | round(sum(p * ln(p / q)), 4) AS kl_pq,
        | round(sum(q * ln(q / p)), 4) AS kl_qp,
        | round(sum(p * ln(p / ((p + q) * 0.5))) * 0.5
        |     + sum(q * ln(q / ((p + q) * 0.5))) * 0.5, 4) AS js
        |FROM pq""".stripMargin,
    // Table profile: per-column facts, one SELECT per column unioned
    "q136_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(*) - count($c) AS n_null, count(DISTINCT $c) AS ndv,
           | CAST(min($c) AS DOUBLE) AS min_num,
           | CAST(max($c) AS DOUBLE) AS max_num,
           | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', count($c), count(*) - count($c), count(DISTINCT $c),
           | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           | min(CAST($c AS VARCHAR)), max(CAST($c AS VARCHAR))
           |FROM orders""".stripMargin
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
        num("o_totalprice"), str("o_orderdate"), str("o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // Approx-profiler twin: q136's exact facts + the HLL++ in-bound
    // boolean (the estimate itself stays engine-specific; the PROOF
    // that it sits inside ±3·rsd of exact is the gated fact)
    "q142_profile_approx" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(*) - count($c) AS n_null, count(DISTINCT $c) AS ndv,
           | true AS ndv_in_bound,
           | CAST(min($c) AS DOUBLE) AS min_num,
           | CAST(max($c) AS DOUBLE) AS max_num,
           | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', count($c), count(*) - count($c), count(DISTINCT $c),
           | true,
           | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           | min(CAST($c AS VARCHAR)), max(CAST($c AS VARCHAR))
           |FROM orders""".stripMargin
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
        num("o_totalprice"), str("o_orderdate"), str("o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // Sorted-neighborhood dedup: global rank over the normalized
    // 40-char prefix key, in-window (w=5) pairs verified by exact
    // levenshtein ≤ 4. DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all default.
    "q143_sorted_neighborhood" ->
      """WITH k AS (SELECT doc_id,
        |  substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS key
        | FROM documents),
        |r AS (SELECT doc_id, key,
        |  row_number() OVER (ORDER BY key, doc_id) AS rn FROM k)
        |SELECT least(a.doc_id, b.doc_id) AS id_a,
        | greatest(a.doc_id, b.doc_id) AS id_b,
        | CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
        |WHERE levenshtein(a.key, b.key) <= 4
        |ORDER BY id_a, id_b""".stripMargin,
    // Join-key skew audit: rank-formula Gini over per-key counts
    // (2·Σi·cᵢ − (n+1)·Σcᵢ)/(n·Σcᵢ) with ranks ascending by (count,
    // key); DuckDB sums promote to HUGEINT, so the exported integer
    // facts are CAST back to BIGINT and gini divides as DOUBLE.
    // Hot-key test is the division-free 5·c·n ≥ 6·total (≥1.2× mean).
    "q144_skew_audit" -> {
      def leg(table: String, key: String) =
        s"""SELECT '$table.$key' AS key_name, n_keys, total_rows, min_cnt,
           |  max_cnt, hot_keys, gini FROM (
           | WITH c AS (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1),
           | r AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i FROM c),
           | g AS (SELECT count(*) AS n, sum(c) AS tot,
           |        sum(CAST(i AS HUGEINT) * c) AS s FROM r)
           | SELECT n AS n_keys, CAST(tot AS BIGINT) AS total_rows,
           |  (SELECT min(c) FROM c) AS min_cnt,
           |  (SELECT max(c) FROM c) AS max_cnt,
           |  (SELECT count(*) FROM c, g WHERE 5*c.c*g.n >= 6*g.tot) AS hot_keys,
           |  round(CAST(2*s - (CAST(n AS HUGEINT) + 1)*tot AS DOUBLE)
           |        / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS gini
           | FROM g) t""".stripMargin
      leg("events", "user_id") + "\nUNION ALL\n" +
        leg("lineitem", "l_orderkey") + "\nORDER BY key_name"
    },
    // AVI main header: the generator's closed form per doc_id
    "q135_avi_meta" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CAST((doc_id % 16) * 8 + 160 AS INTEGER) AS width,
        |  CAST((doc_id % 9) * 8 + 120 AS INTEGER) AS height,
        |  CAST(doc_id % 240 + 1 AS BIGINT) AS n_frames,
        |  CAST(1 AS INTEGER) AS streams,
        |  CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000
        |   ELSE 16667 END AS us
        | FROM documents)
        |SELECT doc_id, width, height, n_frames, streams,
        | round(1000000.0 / us, 4) AS fps,
        | round(CAST(n_frames * us AS DOUBLE) / 1000.0, 4) AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin,
    // DIB video frames: the generator's closed form — frame pixel
    // byte at raster index (row·stride + col·3 + channel) is
    // md5('avi:doc:frame:index') % 256; stride is the DIB DWORD-padded
    // row width; per-frame per-channel means + strh-derived fps
    "q140_avi_frames" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CAST(2 + doc_id % 4 AS BIGINT) AS w,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS h,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS nf,
        |  CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000
        |   ELSE 16667 END AS us
        | FROM documents),
        |g AS (
        | SELECT doc_id, w, h, nf, us,
        |  w*3 + (4 - (w*3) % 4) % 4 AS stride
        | FROM p),
        |fr AS (
        | SELECT doc_id, w, h, nf, us, stride,
        |  unnest(generate_series(0, nf - 1)) AS f
        | FROM g),
        |px0 AS (
        | SELECT doc_id, w, h, nf, us, stride, f,
        |  unnest(generate_series(0, w*h - 1)) AS pix
        | FROM fr),
        |px AS (
        | SELECT doc_id, w, h, nf, us, f,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 0)), 1, 8)) AS BIGINT)
        |    % 256 AS b,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 1)), 1, 8)) AS BIGINT)
        |    % 256 AS g,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 2)), 1, 8)) AS BIGINT)
        |    % 256 AS r
        | FROM px0)
        |SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
        | CAST(max(h) AS INTEGER) AS height,
        | CAST(max(nf) AS BIGINT) AS n_frames,
        | round(1000000.0 / max(us), 4) AS fps,
        | CAST(f AS INTEGER) AS frame,
        | round(avg(b), 4) AS mean_b, round(avg(g), 4) AS mean_g,
        | round(avg(r), 4) AS mean_r
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame""".stripMargin,
    // Interleaved two-stream AVI: q140's pixel closed form + a
    // per-frame PCM closed form (q134's int16 convention keyed per
    // frame), joined per (doc, frame) — both decoded signals checked
    "q150_avi_interleaved" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CAST(2 + doc_id % 4 AS BIGINT) AS w,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS h,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS nf,
        |  CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000
        |   ELSE 16667 END AS us,
        |  CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |   WHEN 2 THEN 22050 ELSE 44100 END AS rate,
        |  CAST(2 + doc_id % 5 AS BIGINT) AS spf
        | FROM documents),
        |g AS (
        | SELECT *, w*3 + (4 - (w*3) % 4) % 4 AS stride FROM p),
        |fr AS (
        | SELECT doc_id, w, h, nf, us, rate, spf, stride,
        |  unnest(generate_series(0, nf - 1)) AS f
        | FROM g),
        |px0 AS (
        | SELECT doc_id, w, stride, f,
        |  unnest(generate_series(0, w*h - 1)) AS pix
        | FROM fr),
        |px AS (
        | SELECT doc_id, f,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 0)), 1, 8)) AS BIGINT)
        |    % 256 AS b,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 1)), 1, 8)) AS BIGINT)
        |    % 256 AS g,
        |  CAST(('0x' || substr(md5('avi:' || doc_id || ':' || f || ':' ||
        |    ((pix // w) * stride + (pix % w) * 3 + 2)), 1, 8)) AS BIGINT)
        |    % 256 AS r
        | FROM px0),
        |pxa AS (
        | SELECT doc_id, f, round(avg(b), 4) AS mean_b,
        |  round(avg(g), 4) AS mean_g, round(avg(r), 4) AS mean_r
        | FROM px GROUP BY doc_id, f),
        |sm0 AS (
        | SELECT doc_id, f, spf,
        |  unnest(generate_series(0, spf - 1)) AS j
        | FROM fr),
        |sm AS (
        | SELECT doc_id, f, spf,
        |  u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM (SELECT doc_id, f, spf,
        |   CAST(('0x' || substr(md5('avipcm:' || doc_id || ':' || f ||
        |     ':' || j), 1, 8)) AS BIGINT) % 65536 AS u
        |  FROM sm0) t),
        |sma AS (
        | SELECT doc_id, f, CAST(max(spf) AS BIGINT) AS n_samples,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  round(sqrt(CAST(sum(s*s) AS DOUBLE) / max(spf)), 4) AS rms
        | FROM sm GROUP BY doc_id, f)
        |SELECT fr.doc_id, CAST(fr.w AS INTEGER) AS width,
        | CAST(fr.h AS INTEGER) AS height,
        | CAST(fr.nf AS BIGINT) AS n_frames,
        | round(1000000.0 / fr.us, 4) AS fps,
        | CAST(fr.rate AS BIGINT) AS sample_rate,
        | CAST(fr.f AS INTEGER) AS frame,
        | pxa.mean_b, pxa.mean_g, pxa.mean_r,
        | sma.n_samples, sma.rms, sma.peak
        |FROM fr
        | JOIN pxa ON fr.doc_id = pxa.doc_id AND fr.f = pxa.f
        | JOIN sma ON fr.doc_id = sma.doc_id AND fr.f = sma.f
        |ORDER BY fr.doc_id, frame""".stripMargin,
    // PCM signal stats: the generator's closed form — int16 samples
    // from the md5 formula — peak/RMS over exact integer squares
    "q134_wav_signal" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 97 + 4 AS BIGINT) AS n FROM documents),
        |sm0 AS (
        | SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS j FROM dims),
        |sm AS (
        | SELECT doc_id, n,
        |  u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM (SELECT doc_id, n,
        |   CAST(('0x' || substr(md5('pcm:' || doc_id || ':' || j), 1, 8))
        |     AS BIGINT) % 65536 AS u
        |  FROM sm0) t)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        | CAST(max(abs(s)) AS BIGINT) AS peak,
        | round(sqrt(CAST(sum(s*s) AS DOUBLE) / max(n)), 4) AS rms
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // filtered ANN: exact pre-filter truth vs IVF oversample +
    // post-filter (q53's CTE chain at k=25, label joined, renumbered)
    "q192_filtered_ann" ->
      s"""WITH exactf AS (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |   row_number() OVER (PARTITION BY q.vec_id
         |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
         |              c.vec_id) AS rnk
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND c.label < 5) t
         | WHERE rnk <= 5),
         |ivf25 AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 25,
               seed = 42, queryMax = 8)}
         |),
         |ivff AS (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT i.query_id, i.neighbor_id,
         |   row_number() OVER (PARTITION BY i.query_id ORDER BY i.rnk)
         |     AS new_rnk
         |  FROM ivf25 i JOIN embeddings em ON em.vec_id = i.neighbor_id
         |  WHERE em.label < 5) t
         | WHERE new_rnk <= 5),
         |ne AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
         | FROM exactf GROUP BY query_id),
         |ni AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_ivf
         | FROM ivff GROUP BY query_id),
         |nh AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
         | FROM exactf e JOIN ivff i
         |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         | GROUP BY e.query_id)
         |SELECT ne.query_id, ne.n_exact, coalesce(ni.n_ivf, 0) AS n_ivf,
         | coalesce(nh.n_hits, 0) AS n_hits,
         | round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE)
         |   / CAST(ne.n_exact AS DOUBLE), 4) AS recall
         |FROM ne LEFT JOIN ni ON ni.query_id = ne.query_id
         | LEFT JOIN nh ON nh.query_id = ne.query_id
         |ORDER BY ne.query_id""".stripMargin,
    // audio decimation: the q134 closed form at stride 4
    "q191_wav_decimate" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 97 + 4 AS BIGINT) AS n FROM documents),
        |d2 AS (SELECT doc_id, n, (n + 3) // 4 AS n_out FROM dims),
        |sm0 AS (
        | SELECT doc_id, n, n_out, unnest(generate_series(0, n_out - 1)) AS k
        | FROM d2),
        |sm AS (
        | SELECT doc_id, n, n_out,
        |  u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM (SELECT doc_id, n, n_out,
        |   CAST(('0x' || substr(md5('pcm:' || doc_id || ':' || (k * 4)), 1, 8))
        |     AS BIGINT) % 65536 AS u
        |  FROM sm0) t)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_in,
        | CAST(max(n_out) AS BIGINT) AS n_out,
        | CAST(max(abs(s)) AS BIGINT) AS peak,
        | round(sqrt(CAST(sum(s*s) AS DOUBLE) / max(n_out)), 4) AS rms
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Benford: integer-cents leading digit (engine-identical string),
    // exact counts, log10 expectation rounded on both sides
    "q131_benford" ->
      """WITH d AS (
        | SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |   AS VARCHAR), 1, 1) AS INTEGER) AS digit
        | FROM lineitem WHERE l_extendedprice > 0),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c)
        |SELECT digit, n, round(n / t.t, 4) AS obs_freq,
        | round(log10(1.0 + 1.0 / digit), 4) AS benford_freq
        |FROM c, t ORDER BY digit""".stripMargin,
    // FD audit: grouped distinct-dependent counts, integer verdicts
    "q132_fd_audit" ->
      """SELECT fd, n_groups, n_violating, n_violating = 0 AS holds FROM (
        | SELECT 'nation_region' AS fd, count(*) AS n_groups,
        |  count(*) FILTER (nd > 1) AS n_violating
        | FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
        |       FROM nation GROUP BY 1) g
        | UNION ALL
        | SELECT 'cust_priority', count(*),
        |  count(*) FILTER (nd > 1)
        | FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
        |       FROM orders GROUP BY 1) g2) t
        |ORDER BY fd""".stripMargin,
    // k-anonymity/l-diversity: all-integer group facts + flags
    "q128_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        | count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l,
        | count(*) < 8 AS k_violation,
        | count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 3 AS l_violation
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // PII scrub: deterministic planted email/phone per doc (the raw
    // testdata has none), counted and redacted with the SAME
    // RE2-compatible patterns on both engines — replacement text
    // hash-compared, so span boundaries must agree exactly.
    "q107_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or +1555'
        |   || doc_id || '00 now' AS t
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |   AS n_emails,
        | CAST(len(regexp_extract_all(t, '\+[0-9]{7,15}')) AS BIGINT)
        |   AS n_phones,
        | regexp_replace(regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+[0-9]{7,15}', '<PHONE>', 'g') AS red_text
        |FROM aug ORDER BY doc_id""".stripMargin,
    // OOV rate vs the corpus top-31 vocabulary head (q62's table):
    // tokenizer-coverage per doc; NULL for empty docs.
    "q108_oov_rate" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |v AS (SELECT term FROM (
        |  SELECT term, count(*) AS n FROM toks GROUP BY term
        |  ORDER BY n DESC, term LIMIT 31)),
        |p AS (SELECT t.doc_id, count(*) AS n_toks, count(v.term) AS n_in_vocab
        |      FROM toks t LEFT JOIN v ON t.term = v.term GROUP BY t.doc_id)
        |SELECT d.doc_id, coalesce(p.n_toks, 0) AS n_toks,
        | coalesce(p.n_in_vocab, 0) AS n_in_vocab,
        | round(1.0 - CAST(p.n_in_vocab AS DOUBLE) / CAST(p.n_toks AS DOUBLE), 4)
        |   AS oov_rate
        |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // int8 quantization: codes via literal floor(+0.5) (engine-
    // portable, unlike round()'s negative-half semantics), per-vector
    // reconstruction errors folded in index order (list_sum /
    // aggregate — the q53 convention), stats rounded. The scale=0
    // CASE mirrors the engine's zero-vector guard exactly, so a
    // regenerated corpus containing an all-zero vector stays green
    // (the q85-maxDf envelope convention, pre-empted here).
    "q109_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id, v, scale,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |       ELSE list_transform(v, x -> floor(x / scale + 0.5)) END AS q
        | FROM s),
        |r AS (SELECT vec_id, scale,
        |  list_transform(range(1, len(v) + 1), i -> abs(v[i] - q[i] * scale))
        |    AS err
        | FROM c)
        |SELECT vec_id, round(scale, 6) AS scale,
        | round(list_max(err), 8) AS max_abs_err,
        | round(list_sum(list_transform(err, x -> x * x)) / len(err), 8) AS mse
        |FROM r ORDER BY vec_id""".stripMargin,
    // Design-regime recall: the q106 construction on the planted
    // corpus (queries = the 40 planted originals, true neighbors
    // headed by their cos 0.82-0.99 copies).
    "q110_ann_recall_planted" -> plantedRecallOracle,
    // Quantized-scan top-k: int8 codes (the q109 floor(+0.5) recipe on
    // the NORMALIZED vectors), stage-1 cut by the exact INTEGER dot
    // scaled by the two float scales (one multiplication each side —
    // no float fold anywhere in the cut), float re-rank of the
    // k*refine=100 survivors (the q33 ranked-tail convention).
    "q112_quantized_topk" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(CAST(embedding AS DOUBLE[]),
        |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                         y -> y*y)))) AS v
        | FROM embeddings),
        |z AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |qz AS (SELECT vec_id, v, scale,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
        |  END AS q
        | FROM z),
        |a AS (SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
        |  qq.scale * cc.scale * CAST(list_sum(list_transform(range(1, 65),
        |    i -> qq.q[i] * cc.q[i])) AS DOUBLE) AS asim
        | FROM qz qq, qz cc
        | WHERE qq.vec_id < 8 AND cc.vec_id <> qq.vec_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id ORDER BY asim DESC, neighbor_id) AS ar
        |  FROM a) t WHERE ar <= 100),
        |r AS (SELECT c.query_id, c.neighbor_id,
        |  row_number() OVER (PARTITION BY c.query_id ORDER BY
        |   list_sum(list_transform(range(1, 65), i -> qe.v[i] * ne.v[i])) DESC,
        |   c.neighbor_id) AS rnk
        | FROM cand c JOIN e qe ON qe.vec_id = c.query_id
        | JOIN e ne ON ne.vec_id = c.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // SemDeDup (cluster-then-prune semantic dedup) reproduced end-to-
    // end over the q51 planted corpus: quantizer fit, final cell
    // assignment, in-cell pair join, exact-cosine verification.
    "q75_semantic_dedup" -> semDedupOracle(nlist = 16, iters = 3,
      dim = 64, seed = 42, threshold = 0.8),
    "q82_semantic_decon" -> semDeconOracle(dim = 64, threshold = 0.8),
    // Mixture planner: keep_rate ∝ target/actual tokens, binding
    // domain pinned to 1.0; target pcts are md5-derived per domain.
    "q83_mixture_rates" ->
      """WITH tok AS (
        | SELECT source AS domain,
        |  CAST(sum(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT))
        |   AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |tt AS (
        | SELECT domain,
        |  CAST(CAST(('0x' || substr(md5('mix:' || domain), 1, 8)) AS BIGINT) % 9 + 1
        |   AS INTEGER) AS target_pct
        | FROM tok),
        |j AS (
        | SELECT tok.domain, n_tokens, target_pct,
        |  CAST(target_pct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ratio
        | FROM tok JOIN tt USING (domain)),
        |m AS (SELECT max(ratio) AS mx FROM j),
        |tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM tok)
        |SELECT domain, n_tokens,
        | round(100.0 * CAST(n_tokens AS DOUBLE) / tot.tot, 4) AS actual_pct,
        | target_pct, round(ratio / m.mx, 6) AS keep_rate
        |FROM j, m, tot ORDER BY domain""".stripMargin,
    // Winnowing exact-substring dup pairs: every 50-char window
    // hashed (md5 10-hex -> 2^40, packed with the position into one
    // BIGINT so the rolling min is the tie-broken argmin), per-10
    // sliding-window minima selected, docs joined on the selected
    // windows' TEXT (string equality — zero collision risk). The
    // Spark side's maxDf boilerplate cap is vacuous at gate scale
    // (hottest window spans 3 docs), so the oracle need not model it.
    "q85_substring_dups" ->
      s"""WITH $winnowPairCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM fp a JOIN fp b ON a.win = b.win AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // Substring-dup canonical keepers: q49-style recursive-CTE
    // components over the winnowing pair set, each component keeping
    // its LONGEST member (superstring candidate; ties by id).
    "q102_substring_keep" ->
      s"""WITH RECURSIVE $winnowPairCtes,
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b
        | FROM fp a JOIN fp b ON a.win = b.win AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, min(dst) AS group_id
        |         FROM reach GROUP BY src),
        |ranked AS (
        | SELECT c.group_id, c.doc_id,
        |  CAST(len(dd.text) AS INTEGER) AS keep_chars,
        |  row_number() OVER (PARTITION BY c.group_id
        |    ORDER BY len(dd.text) DESC, c.doc_id) AS rn
        | FROM comp c JOIN documents dd ON c.doc_id = dd.doc_id)
        |SELECT group_id, doc_id AS keep_id, keep_chars
        |FROM ranked WHERE rn = 1 ORDER BY group_id""".stripMargin,
    // Upsert checked against the DIRECT statement of the merged result
    // — not a mirror of the window formulation.
    "q86_upsert" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 37 = 0 THEN 'U' ELSE o_orderstatus END
        |  AS o_orderstatus,
        | CASE WHEN o_orderkey % 37 = 0 THEN round(o_totalprice + 10.0, 2)
        |  ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // Salted join == plain join (the salt must be invisible in the
    // output); the oracle IS the plain join.
    "q88_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Windowed distinct count: Spark composes size(collect_set) over
    // the frame; DuckDB runs its native DISTINCT window aggregate —
    // independent formulations, same exact semantics (RANGE frames
    // include peers on both engines).
    "q89_windowed_distinct" ->
      """SELECT event_id, user_id, us, event_type,
        | CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY us
        |   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS INTEGER)
        |  AS n_types_30m
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    // Z-score against 4dp-PINNED group stats (both engines normalize
    // against identical mean/sd — no unordered-sum ulp leakage).
    "q90_zscore" ->
      """WITH s AS (
        | SELECT l_returnflag, round(avg(CAST(l_quantity AS DOUBLE)), 4) AS mu,
        |  round(stddev_samp(CAST(l_quantity AS DOUBLE)), 4) AS sd
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l.l_returnflag,
        | round((CAST(l_quantity AS DOUBLE) - mu) / sd, 4) AS z_qty
        |FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // View->click funnel: first view, first click at-or-after it.
    "q96_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |tv AS (SELECT user_id, min(us) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |tc AS (SELECT e.user_id, min(us) AS t_click
        |       FROM e JOIN tv USING (user_id)
        |       WHERE event_type = 'click' AND us >= t_view
        |       GROUP BY e.user_id)
        |SELECT tv.user_id, t_view, t_click
        |FROM tv LEFT JOIN tc USING (user_id) ORDER BY user_id""".stripMargin,
    // Quality-canonical keeper per near-dup component: q49's recursive
    // components + q60's quality formula, argmax (quality, id) per
    // group.
    "q97_canonical_keep" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, min(dst) AS group_id
        |         FROM reach GROUP BY src),
        |tq AS (
        | SELECT doc_id, text,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        | FROM documents),
        |q AS (SELECT doc_id,
        | round((CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
        |  + (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.5 END) * 0.3,
        |  4) AS quality
        | FROM tq)
        |SELECT group_id, doc_id AS keep_id, quality FROM (
        | SELECT c.group_id, c.doc_id, q.quality,
        |  row_number() OVER (PARTITION BY c.group_id
        |    ORDER BY q.quality DESC, c.doc_id) AS rn
        | FROM comp c JOIN q USING (doc_id)) t
        |WHERE rn = 1 ORDER BY group_id""".stripMargin),
    // FK audit vs a halved parent: orphans are exactly the odd-key
    // child rows — stated directly, independent of the anti-join.
    "q95_fk_orphans" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 2 <> 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Snapshot diff: the oracle derives the change classes straight
    // from the key arithmetic — delete (%41), update (%37 surviving),
    // insert (shifted %43 copies) — independent of the join.
    "q91_snapshot_diff" ->
      """SELECT * FROM (
        | SELECT o_orderkey, 'delete' AS change FROM orders
        | WHERE o_orderkey % 41 = 0
        | UNION ALL
        | SELECT o_orderkey, 'update' FROM orders
        | WHERE o_orderkey % 37 = 0 AND o_orderkey % 41 <> 0
        | UNION ALL
        | SELECT o_orderkey + 10000000, 'insert' FROM orders
        | WHERE o_orderkey % 43 = 0) t
        |ORDER BY o_orderkey, change""".stripMargin,
    // Triangle counts via the ordered-triple (x<y<z) three-way
    // self-join — an independent formulation of the Spark side's
    // degree-ordered wedge algorithm; identical triangle set.
    "q92_triangles" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |      WHERE l_orderkey % 10 = 0),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |      FROM pp x JOIN pp y
        |       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, count(*) AS n_triangles FROM (
        | SELECT unnest([x, y, z]) AS node FROM tri) t
        |GROUP BY node ORDER BY node""".stripMargin,
    // Gaps-and-islands change intervals; valid_to = next run's start
    // (lead over the run counter — deterministic even at shared
    // boundary timestamps), null for the open run.
    "q87_change_intervals" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |b AS (
        | SELECT user_id, event_id, event_type, us,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |        OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (
        | SELECT user_id, event_type, us,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS grp
        | FROM b),
        |r AS (
        | SELECT user_id, grp, min(event_type) AS event_type,
        |  min(us) AS valid_from, count(*) AS n_rows
        | FROM g GROUP BY user_id, grp)
        |SELECT user_id, event_type, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
        | n_rows
        |FROM r ORDER BY user_id, valid_from""".stripMargin,
    // Exact-percentile trim: q58 proved the engine's histogram
    // interpolation hash-equals quantile_cont at 4 dp, so the rounded
    // bounds — and therefore the trim filter — are identical.
    "q84_percentile_trim" ->
      """WITH b AS (
        | SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        | FROM lineitem),
        |q AS (
        | SELECT g, round(quantile_cont(v, 0.05), 4) AS lo,
        |  round(quantile_cont(v, 0.95), 4) AS hi
        | FROM b GROUP BY g)
        |SELECT b.g AS l_returnflag, count(*) AS n_kept,
        | round(sum(v), 2) AS sum_kept, q.lo, q.hi
        |FROM b JOIN q USING (g) WHERE v >= lo AND v <= hi
        |GROUP BY b.g, q.lo, q.hi
        |ORDER BY l_returnflag""".stripMargin,
    // Gopher-style repetition signals: top-token fraction via the
    // two-level word count, duplicated-3-gram fraction over the doc's
    // 3-gram MULTISET (list_transform over index ranges — the q32
    // shingle construction without the dedup).
    "q76_repetition" ->
      """WITH toks AS (
        | SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM documents),
        |top AS (
        | SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM (
        |  SELECT doc_id, tk, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS tk FROM toks) u
        |  GROUP BY doc_id, tk) cc
        | GROUP BY doc_id),
        |g AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |   THEN list_transform(generate_series(1, len(t)-2),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |   ELSE CAST([] AS VARCHAR[]) END AS gr
        | FROM toks)
        |SELECT g.doc_id,
        | coalesce(round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 4), 0.0)
        |  AS top_token_frac,
        | CASE WHEN len(gr) = 0 THEN 0.0
        |  ELSE round(CAST(len(gr) - len(list_distinct(gr)) AS DOUBLE)
        |        / CAST(len(gr) AS DOUBLE), 4) END AS dup_3gram_frac
        |FROM g LEFT JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    // CCNet-style unigram fluency: corpus unigram model (lowercased
    // tokens), per-doc mean log10 probability, NULL for empty docs.
    "q77_fluency" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |f AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |p AS (
        | SELECT doc_id, round(avg(log10(CAST(c AS DOUBLE) / n.n)), 4) AS fluency
        | FROM toks JOIN f USING (term), n GROUP BY doc_id)
        |SELECT d.doc_id, p.fluency
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Unpivot spelled as the naive UNION-ALL-of-selects (one scan per
    // attribute); the Spark side is a single-scan Expand.
    "q79_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        | SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        | UNION ALL
        | SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part) t
        |ORDER BY p_partkey, attr""".stripMargin,
    "q80_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // Deterministic weighted sampling: md5 coin < min(1, n_tokens/100)
    // — membership is a pure function of doc_id on both engines.
    "q81_weighted_sample" ->
      """WITH t AS (
        | SELECT doc_id,
        |  least(greatest(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE)
        |     / 100.0, 0.0), 1.0) AS weight,
        |  CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        | FROM documents)
        |SELECT doc_id, weight FROM t WHERE u < weight ORDER BY doc_id""".stripMargin,
    // Forward-fill resampling onto an absolute 6h grid: per-user
    // generate_series + ASOF join (the q63-proven DuckDB twin of
    // TimeSeries.resampleForwardFill). Grid start = ceil(min/step)·step
    // via the same exact double-floor arithmetic as the Spark side.
    "q78_resample_ffill" ->
      """WITH e0 AS (
        | SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events),
        |e AS (
        | SELECT user_id, us, max(event_id) AS event_id,
        |  max_by(value, event_id) AS value
        | FROM e0 GROUP BY user_id, us),
        |b AS (SELECT user_id, min(us) AS lo, max(us) AS hi FROM e GROUP BY user_id),
        |g AS (
        | SELECT user_id, unnest(generate_series(g0, hi, 21600000000)) AS grid_t
        | FROM (SELECT user_id, hi,
        |        CAST(floor((lo + 21600000000 - 1) / 21600000000.0) AS BIGINT)
        |         * 21600000000 AS g0
        |       FROM b) t
        | WHERE g0 <= hi)
        |SELECT g.user_id, g.grid_t, e.event_id AS last_event_id,
        | e.us AS last_us, e.value AS last_value
        |FROM g ASOF JOIN e ON g.user_id = e.user_id AND e.us <= g.grid_t
        |ORDER BY g.user_id, g.grid_t""".stripMargin,
    // Batch sessionization: 30-min-gap sessions via integer-microsecond
    // window arithmetic — boundary-exact on both engines.
    "q54_sessionize" ->
      (s"""WITH $sessionCtes
        |SELECT user_id, session_id, n_events, session_value,
        | start_us, end_us
        |FROM sess ORDER BY user_id, session_id""".stripMargin),
    // Session concurrency timeline: +1 at start, -1 at end+1 (inclusive
    // endpoints), global running count. DuckDB runs the naive global
    // cumsum; Spark's two-level bucketed prefix sum must produce the
    // identical integers (the q70 equivalence). CAST: windowed
    // sum(BIGINT) is HUGEINT in DuckDB — the q70 lesson.
    "q94_concurrency" ->
      (s"""WITH $sessionCtes,
        |deltas AS (
        | SELECT start_us AS us, 1 AS d FROM sess
        | UNION ALL SELECT end_us + 1, -1 FROM sess),
        |agg AS (SELECT us, CAST(sum(d) AS BIGINT) AS delta
        |        FROM deltas GROUP BY us)
        |SELECT us, CAST(sum(delta) OVER (ORDER BY us
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_active
        |FROM agg ORDER BY us""".stripMargin),
    "q50_quantiles" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Sketch internals are engine-specific, so q52 emits deterministic
    // facts instead of raw sketch values: the exact statistics plus
    // booleans proving each sketch landed inside its published error
    // bound (GK rank error ≤ n/10000 bracketed by exact percentiles at
    // p±0.001; HLL++ rsd 0.05 within a 3σ 15 % band). The oracle
    // states the exact values and `true` directly — fully hash-gated.
    "q52_quantiles_approx" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        | true AS median_in_bound, true AS p90_in_bound,
        | true AS ndv_in_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Connected components over the exact J >= 0.7 pair set via a
    // recursive CTE: component id = min reachable doc id.
    "q49_dup_groups" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS doc_id, min(dst) AS group_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin),
    // End-to-end corpus cleaning: exact-dup canonical (min doc_id per
    // normalized fingerprint) ∧ not a near-dup-group loser (q49's
    // recursive-CTE components over the J >= 0.7 pair set) ∧ quality
    // floor — the composite of the independently-oracled q23/q25/q49.
    "q55_clean_corpus" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |losers AS (
        | SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src),
        |keepers AS (
        | SELECT min(doc_id) AS doc_id FROM documents
        | GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
        |scored AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INTEGER)
        |   AS n_tokens,
        |  round((CAST(len(list_distinct(CASE WHEN len(trim(text)) = 0
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE regexp_split_to_array(trim(text), '\\s+') END)) AS DOUBLE)
        |    / CAST(greatest(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1) AS DOUBLE)) * 0.7
        |   + (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.5 END) * 0.3,
        |   4) AS quality
        | FROM documents)
        |SELECT s.doc_id, s.n_tokens, s.quality FROM scored s
        |JOIN keepers k ON k.doc_id = s.doc_id
        |LEFT JOIN losers l ON l.doc_id = s.doc_id
        |WHERE l.doc_id IS NULL AND s.quality >= 0.5
        |ORDER BY s.doc_id""".stripMargin),
    "q35_rolling_fingerprint" ->
      """WITH toks AS (
        | SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM documents)
        |SELECT doc_id,
        | list_reduce(
        |  list_prepend(CAST(0 AS BIGINT), list_transform(t, x ->
        |    CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT))),
        |  (acc, h) -> (acc * 1000003 + h) % 2147483647) AS rhash
        |FROM toks ORDER BY doc_id""".stripMargin,
    "q45_media_meta" -> q45OracleSql,
    // smoothed TF-IDF, per-doc top-5 by (rounded score desc, term) —
    // the rounded ranking key makes last-ulp ln() differences between
    // engines unable to flip ranks
    "q56_tfidf_top" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        | SELECT doc_id, term,
        |  round(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
        | FROM tf JOIN dfreq USING (term), n),
        |ranked AS (
        | SELECT doc_id, term, tfidf,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
        | FROM scored)
        |SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 5
        |ORDER BY doc_id, rnk""".stripMargin,
    // Okapi BM25 (k1=1.2, b=0.75, non-negative idf) for the fixed query
    // {join, hash, scan, filter}; per-doc scores ranked by the ROUNDED
    // value (ties by doc_id). The k1+1 factor is written as the same
    // 1.2+1.0 addition on both engines so the constant folds to the
    // identical double.
    "q57_bm25" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE term IN ('join', 'hash', 'scan', 'filter') GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
        |sc AS (
        | SELECT tf.doc_id,
        |  round(SUM(ln((n.n - df + 0.5) / (df + 0.5) + 1.0)
        |    * tf * (1.2 + 1.0)
        |    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))), 4) AS score
        | FROM tf JOIN dfreq USING (term) JOIN dl ON dl.doc_id = tf.doc_id,
        |      n, avgdl
        | GROUP BY tf.doc_id),
        |r AS (SELECT doc_id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
        | FROM sc)
        |SELECT doc_id, score, rnk FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // Distributed exact quantile (per-(group,value) count histogram +
    // interpolation) — same semantics as q50, so the same oracle text
    // minus the distinct-count column.
    "q58_quantiles_dist" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Deterministic 80/10/10 split by md5 hash bucket — a pure function
    // of doc_id, so the oracle reproduces every assignment.
    "q59_hash_split" ->
      """SELECT doc_id, CAST(b AS INTEGER) AS bucket,
        | CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT) % 100 AS b
        | FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    // Per-source quota cap ranked by the q25 quality formula (rounded
    // before ranking — rank comparisons never see last-ulp differences).
    "q60_domain_cap" ->
      """WITH t AS (
        | SELECT doc_id, source, text,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        | FROM documents),
        |q AS (SELECT doc_id, source,
        | round((CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
        |  + (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.5 END) * 0.3,
        |  4) AS quality
        | FROM t)
        |SELECT doc_id, source, quality, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT doc_id, source, quality,
        |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
        | FROM q) t2
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    // Benchmark decontamination: distinct-3-gram overlap counts between
    // each corpus doc (id >= 20) and the eval stand-in set (id < 20).
    // Shingle arrays are distinct per doc, so count(*) = distinct overlap.
    "q61_decontaminate" -> deconOracle,
    // Bloom-prefiltered twin of q61 (build the bench filter, probe
    // in-scan, verify-join candidates only): Bloom filters have no
    // false negatives and false-positive docs contribute zero rows to
    // the inner overlap join, so the result is PROVABLY row-identical
    // to the plain scan — same oracle, the q103/q104 twin convention.
    "q114_bloom_decon" -> deconOracle,
    // Corpus vocabulary head (Zipf table): top-100 tokens by (count
    // desc, term) — count ties pinned lexicographically.
    "q62_vocab_top" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        |r AS (SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rnk
        | FROM c)
        |SELECT term, n, rnk FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    // Backward as-of join — DuckDB has the operator natively (ASOF LEFT
    // JOIN, same left.t >= right.t / equal-time-matches contract as the
    // union+window implementation), so the oracle is direct.
    "q63_asof_join" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |clicks AS (
        | SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |views AS (
        | SELECT user_id, us, max(event_id) AS view_event_id
        | FROM e WHERE event_type = 'view' GROUP BY user_id, us)
        |SELECT c.event_id, c.user_id, c.us, v.view_event_id, v.us AS view_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.us >= v.us
        |ORDER BY c.event_id""".stripMargin,
    // forward as-of: DuckDB's ASOF with the inequality flipped —
    // earliest view at-or-after each click
    "q187_asof_forward" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |clicks AS (
        | SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |views AS (
        | SELECT user_id, us, max(event_id) AS view_event_id
        | FROM e WHERE event_type = 'view' GROUP BY user_id, us)
        |SELECT c.event_id, c.user_id, c.us, v.view_event_id, v.us AS view_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.us <= v.us
        |ORDER BY c.event_id""".stripMargin,
    // the native custom-operator as-of (AsofJoinExec) must answer
    // exactly like the composition: the q63 oracle verbatim
    "q183_asof_native" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |clicks AS (
        | SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |views AS (
        | SELECT user_id, us, max(event_id) AS view_event_id
        | FROM e WHERE event_type = 'view' GROUP BY user_id, us)
        |SELECT c.event_id, c.user_id, c.us, v.view_event_id, v.us AS view_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.us >= v.us
        |ORDER BY c.event_id""".stripMargin,
    // Blocked edit-distance matching over distinct names; levenshtein
    // is integer-exact on both engines.
    "q64_fuzzy_match" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, string_split(name, ' ')[-1] AS blk FROM names)
        |SELECT a.name AS name_a, c.name AS name_b,
        | CAST(levenshtein(a.name, c.name) AS INTEGER) AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
        |WHERE levenshtein(a.name, c.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q65_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | round(percent_rank() OVER w, 4) AS pct_rank,
        | round(cume_dist() OVER w, 4) AS cume,
        | round(coalesce(lead(o_totalprice, 1) OVER w, 0.0), 2) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // Range join: the oracle states the semantics directly as the
    // inequality join the banded plan is equivalent to.
    "q66_range_join" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        | c.us - v.us AS gap_us
        |FROM (SELECT * FROM e WHERE event_type = 'click') c
        |JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND abs(c.us - v.us) <= 1800000000
        |ORDER BY click_id, view_id""".stripMargin,
    // the native band-join plan must produce exactly the q66 pairs
    "q323_range_native" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        | c.us - v.us AS gap_us
        |FROM (SELECT * FROM e WHERE event_type = 'click') c
        |JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND abs(c.us - v.us) <= 1800000000
        |ORDER BY click_id, view_id""".stripMargin,
    // Adamic-Adar over the co-purchase graph: wedge enumeration with
    // the same deg<=256 hub cap as the engine, existing edges anti-
    // joined out, top-20 on the 4-dp-pinned score with (a,b) tiebreak
    "q324_adamic_adar" ->
      """WITH pp AS (
        | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        | WHERE l_orderkey % 10 = 0),
        |co AS (
        | SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b
        | FROM pp p1 JOIN pp p2 ON p1.l_orderkey = p2.l_orderkey
        | WHERE p1.l_partkey < p2.l_partkey),
        |adj AS (
        | SELECT a AS z, b AS x FROM co
        | UNION ALL SELECT b AS z, a AS x FROM co),
        |deg AS (SELECT z, count(*) AS deg FROM adj GROUP BY z),
        |mid AS (
        | SELECT adj.z, adj.x, deg.deg FROM adj
        | JOIN deg ON adj.z = deg.z WHERE deg.deg <= 256),
        |wedges AS (
        | SELECT m1.x AS a, m2.x AS b,
        |  CAST(count(*) AS BIGINT) AS n_common,
        |  sum(1.0 / ln(CAST(m1.deg AS DOUBLE))) AS aa_raw
        | FROM mid m1 JOIN mid m2 ON m1.z = m2.z AND m1.x < m2.x
        | GROUP BY 1, 2)
        |SELECT w.a, w.b, w.n_common, round(w.aa_raw, 4) AS aa
        |FROM wedges w
        |LEFT JOIN co ON w.a = co.a AND w.b = co.b
        |WHERE co.a IS NULL
        |ORDER BY aa DESC, w.a, w.b LIMIT 20""".stripMargin,
    // SCD2 build: per-user run collapse with (us, event_id) total
    // order, then [valid_from, valid_to) versioning; NULL valid_to =
    // current row
    "q325_scd2_build" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |  event_type AS state FROM events),
        |b AS (
        | SELECT user_id, event_id, us, state,
        |  CASE WHEN lag(state) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) IS DISTINCT FROM state
        |   THEN 1 ELSE 0 END AS chg
        | FROM e),
        |r AS (
        | SELECT user_id, us, state,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        | FROM b),
        |v AS (
        | SELECT user_id, version, min(state) AS state,
        |  min(us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
        | FROM r GROUP BY 1, 2)
        |SELECT user_id, version, state, valid_from_us,
        | lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
        |  AS valid_to_us,
        | n_events,
        | CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY version) IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    // PIT join: purchases look up the SCD2 state (non-purchase stream)
    // effective at their timestamp; pre-first-state purchases → 'none';
    // revenue cent-pinned per event then integer-summed
    "q326_scd2_pit" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        | FROM events),
        |b AS (
        | SELECT user_id, event_id, us, event_type,
        |  CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) IS DISTINCT FROM event_type
        |   THEN 1 ELSE 0 END AS chg
        | FROM e WHERE event_type <> 'purchase'),
        |r AS (
        | SELECT user_id, us, event_type,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        | FROM b),
        |dim AS (
        | SELECT user_id, version, min(event_type) AS state,
        |  min(us) AS from_us
        | FROM r GROUP BY 1, 2),
        |dim2 AS (
        | SELECT user_id, version, state, from_us,
        |  lead(from_us) OVER (PARTITION BY user_id ORDER BY version)
        |   AS to_us
        | FROM dim),
        |f AS (SELECT user_id, event_id, us, value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT coalesce(d.state, 'none') AS state,
        | CAST(count(*) AS BIGINT) AS n_purchases,
        | CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
        | CAST(sum(CAST(round(f.value * 100) AS BIGINT)) AS BIGINT)
        |  AS revenue_cents
        |FROM f LEFT JOIN dim2 d
        |  ON f.user_id = d.user_id AND d.from_us <= f.us
        |  AND (d.to_us IS NULL OR f.us < d.to_us)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Chao1 richness + Good-Turing coverage per language from the
    // exact frequency-of-frequencies spectrum
    "q327_chao1_richness" ->
      """WITH t AS (
        | SELECT lang, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |tc AS (
        | SELECT lang, term, CAST(count(*) AS BIGINT) AS c
        | FROM (SELECT lang, unnest(a) AS term FROM t) GROUP BY 1, 2),
        |sp AS (
        | SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS v_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        | FROM tc GROUP BY 1)
        |SELECT lang, n_tokens, v_types, f1, f2,
        | round(v_types + CAST(f1 * (f1 - 1) AS DOUBLE)
        |   / CAST(2 * (f2 + 1) AS DOUBLE), 4) AS chao1,
        | round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
        |  AS coverage
        |FROM sp ORDER BY lang""".stripMargin,
    // skip-gram (±3 window) PMI top-20, support >= 10; the oracle
    // states the semantics as the naive positional self-join
    "q328_skipgram_pmi" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |pos AS (
        | SELECT doc_id, unnest(a) AS w, generate_subscripts(a, 1) AS p
        | FROM t),
        |uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT unnest(a) AS term FROM t) GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM uc),
        |pc AS (
        | SELECT CASE WHEN p1.w <= p2.w THEN p1.w ELSE p2.w END AS x,
        |  CASE WHEN p1.w <= p2.w THEN p2.w ELSE p1.w END AS y,
        |  CAST(count(*) AS BIGINT) AS c
        | FROM pos p1 JOIN pos p2 ON p1.doc_id = p2.doc_id
        |  AND p2.p > p1.p AND p2.p <= p1.p + 3
        | GROUP BY 1, 2),
        |pt AS (SELECT CAST(sum(c) AS BIGINT) AS pp FROM pc)
        |SELECT pc.x, pc.y, pc.c AS n_pair,
        | round(ln((CAST(pc.c AS DOUBLE) * nn * nn)
        |   / (CAST(pp AS DOUBLE) * ux.n * uy.n)), 4) AS pmi
        |FROM pc
        |JOIN uc ux ON pc.x = ux.term
        |JOIN uc uy ON pc.y = uy.term
        |CROSS JOIN tot CROSS JOIN pt
        |WHERE pc.c >= 10
        |ORDER BY pmi DESC, pc.x, pc.y LIMIT 20""".stripMargin,
    // decision stump over n_chars -> (lang = 'en'): 15 evenly spaced
    // integer thresholds, weighted Gini with exact-integer numerators
    "q329_stump_split" ->
      """WITH d AS (
        | SELECT n_chars,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        | FROM documents),
        |mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM d),
        |cands AS (
        | SELECT CAST(range AS BIGINT) AS k,
        |  CAST(mn + floor(CAST(range * (mx - mn) AS DOUBLE) / 16)
        |    AS BIGINT) AS t
        | FROM range(1, 16), mm),
        |agg AS (
        | SELECT k, t, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS pos,
        |  CAST(sum(CASE WHEN n_chars <= t THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_l,
        |  CAST(sum(CASE WHEN n_chars <= t THEN y ELSE 0 END) AS BIGINT)
        |   AS pos_l
        | FROM d CROSS JOIN cands GROUP BY 1, 2),
        |g AS (
        | SELECT k, t, n_l, pos_l, n - n_l AS n_r, pos - pos_l AS pos_r,
        |  round(CAST(n_l * n_l - pos_l * pos_l
        |     - (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
        |    / CAST(n * n_l AS DOUBLE)
        |   + CAST((n - n_l) * (n - n_l)
        |     - (pos - pos_l) * (pos - pos_l)
        |     - ((n - n_l) - (pos - pos_l)) * ((n - n_l) - (pos - pos_l))
        |      AS DOUBLE)
        |    / CAST(n * (n - n_l) AS DOUBLE), 4) AS gini
        | FROM agg WHERE n_l > 0 AND n - n_l > 0)
        |SELECT k, t AS threshold, n_l AS n_left, pos_l AS pos_left,
        | n_r AS n_right, pos_r AS pos_right, gini,
        | CAST(CASE WHEN gini = (SELECT min(gini) FROM g)
        |  THEN 1 ELSE 0 END AS INTEGER) AS is_best
        |FROM g ORDER BY k""".stripMargin,
    // weighted median: smallest price whose running quantity-weight
    // crosses half the group total (2*cum >= W, exact integers)
    "q330_weighted_median" ->
      """WITH b AS (
        | SELECT l_returnflag, l_extendedprice AS v,
        |  CAST(l_quantity AS BIGINT) AS w
        | FROM lineitem),
        |c AS (
        | SELECT l_returnflag, v,
        |  CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        | FROM b)
        |SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS total_w,
        | min(v) AS wmedian
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Gumbel method-of-moments on the daily-max series + 30-day return
    // level; mean/sd pinned to 6dp before the closed forms
    "q331_gumbel_maxima" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, max(value) AS mx
        | FROM events GROUP BY 1),
        |m AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  round(avg(mx), 6) AS mean_max,
        |  round(stddev_samp(mx), 6) AS sd_max
        | FROM daily)
        |SELECT n_days, mean_max, sd_max,
        | round(mean_max - 0.5772156649 * (sd_max * sqrt(6.0) / pi()), 4)
        |  AS loc,
        | round(sd_max * sqrt(6.0) / pi(), 4) AS scale,
        | round((mean_max - 0.5772156649 * (sd_max * sqrt(6.0) / pi()))
        |  - (sd_max * sqrt(6.0) / pi()) * ln(-ln(1.0 - 1.0 / 30)), 4)
        |  AS rl30
        |FROM m""".stripMargin,
    // Jarque-Bera from raw central-moment sums around the 6dp-pinned
    // mean; chi2(2) 5% critical value 5.991
    "q332_jarque_bera" ->
      """WITH mu AS (
        | SELECT l_returnflag, round(avg(l_quantity), 6) AS mu
        | FROM lineitem GROUP BY 1),
        |s AS (
        | SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  sum((l.l_quantity - mu.mu) * (l.l_quantity - mu.mu)) AS s2,
        |  sum((l.l_quantity - mu.mu) * (l.l_quantity - mu.mu)
        |    * (l.l_quantity - mu.mu)) AS s3,
        |  sum((l.l_quantity - mu.mu) * (l.l_quantity - mu.mu)
        |    * (l.l_quantity - mu.mu) * (l.l_quantity - mu.mu)) AS s4
        | FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        | GROUP BY 1)
        |SELECT l_returnflag, n,
        | round((s3 / n) / pow(s2 / n, 1.5), 4) AS skew,
        | round((s4 / n) / pow(s2 / n, 2.0), 4) AS kurt,
        | round(n / 6.0 * (pow((s3 / n) / pow(s2 / n, 1.5), 2.0)
        |   + pow((s4 / n) / pow(s2 / n, 2.0) - 3.0, 2.0) / 4.0), 4)
        |  AS jb,
        | CAST(CASE WHEN round(n / 6.0 *
        |    (pow((s3 / n) / pow(s2 / n, 1.5), 2.0)
        |     + pow((s4 / n) / pow(s2 / n, 2.0) - 3.0, 2.0) / 4.0), 4)
        |   > 5.991 THEN 1 ELSE 0 END AS INTEGER) AS reject_normal
        |FROM s ORDER BY 1""".stripMargin,
    // pairwise per-language vocabulary Jaccard (distinct token sets,
    // union by inclusion-exclusion)
    "q333_lang_overlap" ->
      """WITH t AS (
        | SELECT lang, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |tc AS (SELECT DISTINCT lang, unnest(a) AS term FROM t),
        |sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS sz
        |       FROM tc GROUP BY 1),
        |inter AS (
        | SELECT ta.lang AS la, tb.lang AS lb,
        |  CAST(count(*) AS BIGINT) AS n_inter
        | FROM tc ta JOIN tc tb
        |  ON ta.term = tb.term AND ta.lang < tb.lang
        | GROUP BY 1, 2)
        |SELECT la, lb, sa.sz AS sa, sb.sz AS sb, n_inter,
        | sa.sz + sb.sz - n_inter AS n_union,
        | round(CAST(n_inter AS DOUBLE)
        |   / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
        |FROM inter
        |JOIN sz sa ON inter.la = sa.lang
        |JOIN sz sb ON inter.lb = sb.lang
        |ORDER BY la, lb""".stripMargin,
    // exact pairwise 1-D Wasserstein-1 between per-language n_chars
    // distributions: integer numerator |cumA*nb - cumB*na|*gap, one
    // double division at the end
    "q334_wasserstein" ->
      """WITH counts AS (
        | SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        | FROM documents GROUP BY 1, 2),
        |grid AS (
        | SELECT l.lang, vv.v, coalesce(c.c, 0) AS c
        | FROM (SELECT DISTINCT v FROM counts) vv
        | CROSS JOIN (SELECT DISTINCT lang FROM counts) l
        | LEFT JOIN counts c ON c.lang = l.lang AND c.v = vv.v),
        |cum AS (
        | SELECT lang, v,
        |  CAST(sum(c) OVER (PARTITION BY lang ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST(coalesce(lead(v) OVER (PARTITION BY lang ORDER BY v) - v,
        |    0) AS BIGINT) AS gap
        | FROM grid),
        |tot AS (SELECT lang, CAST(max(cum) AS BIGINT) AS n
        |        FROM cum GROUP BY 1)
        |SELECT a.lang AS la, b.lang AS lb,
        | CAST(max(ta.n) AS BIGINT) AS n_a, CAST(max(tb.n) AS BIGINT) AS n_b,
        | round(CAST(sum(abs(a.cum * tb.n - b.cum * ta.n) * a.gap)
        |    AS DOUBLE) / CAST(max(ta.n) * max(tb.n) AS DOUBLE), 4)
        |  AS w1_chars
        |FROM cum a
        |JOIN cum b ON a.v = b.v AND a.lang < b.lang
        |JOIN tot ta ON ta.lang = a.lang
        |JOIN tot tb ON tb.lang = b.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // per-user Markov surprise under the global Laplace-smoothed
    // transition model; top-20 by pinned mean NLL, user_id tiebreak
    "q335_markov_surprise" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS t
        | FROM events),
        |tr AS (
        | SELECT user_id, lag(t) OVER (PARTITION BY user_id
        |   ORDER BY us, event_id) AS prev, t
        | FROM e QUALIFY prev IS NOT NULL),
        |k AS (
        | SELECT CAST(count(*) AS BIGINT) AS kk FROM (
        |  SELECT t FROM tr UNION SELECT prev FROM tr)),
        |m AS (
        | SELECT prev, t, CAST(count(*) AS BIGINT) AS c_ij
        | FROM tr GROUP BY 1, 2),
        |ci AS (SELECT prev, CAST(count(*) AS BIGINT) AS c_i
        |       FROM tr GROUP BY 1)
        |SELECT tr.user_id, CAST(count(*) AS BIGINT) AS n_trans,
        | round(sum(-ln(CAST(m.c_ij + 1 AS DOUBLE)
        |   / CAST(ci.c_i + k.kk AS DOUBLE))) / count(*), 4) AS surprise
        |FROM tr
        |JOIN m ON tr.prev = m.prev AND tr.t = m.t
        |JOIN ci ON tr.prev = ci.prev
        |CROSS JOIN k
        |GROUP BY 1
        |ORDER BY surprise DESC, user_id LIMIT 20""".stripMargin,
    // Burrows' Delta between sources over the top-30 corpus terms;
    // relative frequencies 8-dp-pinned before the z-scores, zero-
    // variance terms dropped, missing (term,source) cells = f 0
    "q336_burrows_delta" ->
      """WITH t AS (
        | SELECT source, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |counts AS (
        | SELECT source, term, CAST(count(*) AS BIGINT) AS c
        | FROM (SELECT source, unnest(a) AS term FROM t) GROUP BY 1, 2),
        |totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
        |           FROM counts GROUP BY 1),
        |top AS (
        | SELECT term FROM (
        |  SELECT term, sum(c) AS ct FROM counts GROUP BY 1
        |  ORDER BY ct DESC, term LIMIT 30)),
        |grid AS (
        | SELECT top.term, totals.source,
        |  round(CAST(coalesce(c.c, 0) AS DOUBLE)
        |    / CAST(totals.n_s AS DOUBLE), 8) AS f
        | FROM top CROSS JOIN totals
        | LEFT JOIN counts c
        |  ON c.term = top.term AND c.source = totals.source),
        |stats AS (
        | SELECT term, mu, sd FROM (
        |  SELECT term,
        |   round(s1 / n, 8) AS mu,
        |   round(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)), 8)
        |    AS sd
        |  FROM (
        |   SELECT term, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(f AS DECIMAL(20,8))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(round(f * f, 14) AS DECIMAL(30,14)))
        |      AS DOUBLE) AS s2
        |   FROM grid GROUP BY 1))
        | WHERE sd > 0),
        |z AS (
        | SELECT g.term, g.source, (g.f - st.mu) / st.sd AS z
        | FROM grid g JOIN stats st ON g.term = st.term)
        |SELECT za.source AS sa, zb.source AS sb,
        | CAST(count(*) AS BIGINT) AS n_terms,
        | round(CAST(sum(CAST(round(abs(za.z - zb.z), 8)
        |    AS DECIMAL(20,8))) AS DOUBLE) / count(*), 4) AS delta
        |FROM z za JOIN z zb
        | ON za.term = zb.term AND za.source < zb.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Markov-chain entropy rate: per-state conditional entropy rows
    // (unsmoothed observed transitions) + a '__chain' total row
    "q337_entropy_rate" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS t
        | FROM events),
        |tr AS (
        | SELECT lag(t) OVER (PARTITION BY user_id
        |   ORDER BY us, event_id) AS prev, t
        | FROM e QUALIFY prev IS NOT NULL),
        |c AS (SELECT prev, t, CAST(count(*) AS BIGINT) AS c_ij
        |      FROM tr GROUP BY 1, 2),
        |ci AS (SELECT prev, CAST(sum(c_ij) AS BIGINT) AS c_i
        |       FROM c GROUP BY 1),
        |h AS (
        | SELECT c.prev AS state, ci.c_i,
        |  sum(-(CAST(c.c_ij AS DOUBLE) / ci.c_i)
        |    * ln(CAST(c.c_ij AS DOUBLE) / ci.c_i)) AS h_raw
        | FROM c JOIN ci ON c.prev = ci.prev GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(c_i) AS BIGINT) AS nn FROM h)
        |SELECT state, c_i AS n_from,
        | round(CAST(c_i AS DOUBLE) / nn, 4) AS pi,
        | round(h_raw, 4) AS h_nats
        |FROM h CROSS JOIN tot
        |UNION ALL
        |SELECT '__chain', CAST(sum(c_i) AS BIGINT), 1.0,
        | round(sum(CAST(c_i AS DOUBLE) / nn * h_raw), 4)
        |FROM h CROSS JOIN tot
        |ORDER BY state""".stripMargin,
    // stratified ATE: per-nation arm contrasts weighted by stratum
    // share; strata missing an arm drop; nation -1 = the overall row
    "q338_strat_ate" ->
      """WITH base AS (
        | SELECT c.c_nationkey AS nation,
        |  CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |   AS treat,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |s AS (
        | SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(treat) AS BIGINT) AS n_t,
        |  CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT)
        |   AS sy_t,
        |  CAST(sum(CASE WHEN treat = 0 THEN y ELSE 0 END) AS BIGINT)
        |   AS sy_c
        | FROM base GROUP BY 1
        | HAVING sum(treat) > 0 AND sum(treat) < count(*)),
        |m AS (
        | SELECT nation, n, n_t,
        |  CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) / 100 AS mean_t,
        |  CAST(sy_c AS DOUBLE) / CAST(n - n_t AS DOUBLE) / 100 AS mean_c
        | FROM s),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM m)
        |SELECT CAST(nation AS BIGINT) AS nation, n, n_t,
        | round(mean_t, 4) AS mean_treat, round(mean_c, 4) AS mean_ctrl,
        | round(mean_t - mean_c, 4) AS effect
        |FROM m
        |UNION ALL
        |SELECT -1, CAST(sum(n) AS BIGINT), CAST(sum(n_t) AS BIGINT),
        | NULL, NULL,
        | round(sum(CAST(n AS DOUBLE) / nn * (mean_t - mean_c)), 4)
        |FROM m CROSS JOIN tot
        |ORDER BY nation""".stripMargin,
    // Hill tail index on the top-100 order values vs the 101st
    "q339_hill_tail" ->
      """WITH r AS (
        | SELECT o_totalprice,
        |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
        |   AS rn
        | FROM orders),
        |xr AS (SELECT o_totalprice AS x_k1 FROM r WHERE rn = 101)
        |SELECT CAST(count(*) AS BIGINT) AS k, max(x_k1) AS x_k1,
        | round(sum(ln(o_totalprice / x_k1)), 4) AS sum_log,
        | round(CAST(count(*) AS DOUBLE) / sum(ln(o_totalprice / x_k1)),
        |  4) AS hill_alpha
        |FROM r CROSS JOIN xr WHERE rn <= 100""".stripMargin,
    // ROUGE-2 (distinct bigrams) per verified near-dup pair; same
    // exact-Jaccard >= 0.7 pair semantics as q30, same trim/\s+
    // tokenization, F = 2*I/(|a|+|b|)
    "q340_rouge2_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks),
        |ex AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
        |cand AS (
        | SELECT a.doc_id AS ia, b.doc_id AS ib FROM ex a
        | JOIN ex b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |pairs AS (
        | SELECT ia AS id_a, ib AS id_b FROM (
        |  SELECT ia, ib,
        |   round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))
        |       AS DOUBLE), 4) AS jaccard
        |  FROM cand JOIN sh x ON x.doc_id = ia
        |  JOIN sh y ON y.doc_id = ib) t
        | WHERE jaccard >= 0.7),
        |bi AS (
        | SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]))
        |  AS b
        | FROM toks WHERE len(t) >= 2)
        |SELECT id_a, id_b,
        | CAST(len(x.b) AS BIGINT) AS n_bi_a,
        | CAST(len(y.b) AS BIGINT) AS n_bi_b,
        | CAST(len(list_intersect(x.b, y.b)) AS BIGINT) AS n_overlap,
        | round(CAST(len(list_intersect(x.b, y.b)) AS DOUBLE)
        |   / CAST(len(x.b) AS DOUBLE), 4) AS rouge2_p,
        | round(CAST(len(list_intersect(x.b, y.b)) AS DOUBLE)
        |   / CAST(len(y.b) AS DOUBLE), 4) AS rouge2_r,
        | round(2.0 * CAST(len(list_intersect(x.b, y.b)) AS DOUBLE)
        |   / CAST(len(x.b) + len(y.b) AS DOUBLE), 4) AS rouge2_f
        |FROM pairs
        |JOIN bi x ON x.doc_id = id_a
        |JOIN bi y ON y.doc_id = id_b
        |ORDER BY id_a, id_b""".stripMargin,
    // top-15 first-four-event user paths, (n DESC, path) order
    "q341_top_paths" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS t
        | FROM events),
        |r AS (
        | SELECT user_id, t,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS rn
        | FROM e QUALIFY rn <= 4),
        |p AS (
        | SELECT user_id, concat_ws('>',
        |  max(CASE WHEN rn = 1 THEN t END),
        |  max(CASE WHEN rn = 2 THEN t END),
        |  max(CASE WHEN rn = 3 THEN t END),
        |  max(CASE WHEN rn = 4 THEN t END)) AS path
        | FROM r GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 15""".stripMargin,
    // association rules over the sampled baskets: support floor
    // n_ab >= 2, top-20 by lift = n_ab*N/(n_a*n_b)
    "q342_assoc_rules" ->
      """WITH pp AS (
        | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        | WHERE l_orderkey % 10 = 0),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nn
        |       FROM pp),
        |item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_i
        |         FROM pp GROUP BY 1),
        |pairs AS (
        | SELECT p1.l_partkey AS a, p2.l_partkey AS b,
        |  CAST(count(*) AS BIGINT) AS n_ab
        | FROM pp p1 JOIN pp p2 ON p1.l_orderkey = p2.l_orderkey
        | WHERE p1.l_partkey < p2.l_partkey
        | GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT a, b, n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        | round(CAST(n_ab AS DOUBLE) / nn, 4) AS support,
        | round(CAST(n_ab AS DOUBLE) / ia.n_i, 4) AS conf_ab,
        | round(CAST(n_ab AS DOUBLE) / ib.n_i, 4) AS conf_ba,
        | round(CAST(n_ab * nn AS DOUBLE)
        |   / CAST(ia.n_i * ib.n_i AS DOUBLE), 4) AS lift
        |FROM pairs
        |JOIN item ia ON pairs.a = ia.l_partkey
        |JOIN item ib ON pairs.b = ib.l_partkey
        |CROSS JOIN nb
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,
    // rolling 7-day OLS slope of the daily count: exact-integer
    // numerator/denominator, one double division
    "q343_rolling_slope" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1),
        |d AS (
        | SELECT day, y,
        |  CAST(day - DATE '2024-01-01' AS BIGINT) AS x
        | FROM daily),
        |w AS (
        | SELECT day, y,
        |  CAST(count(*) OVER win AS BIGINT) AS n,
        |  CAST(sum(x) OVER win AS BIGINT) AS sx,
        |  CAST(sum(y) OVER win AS BIGINT) AS sy,
        |  CAST(sum(x * y) OVER win AS BIGINT) AS sxy,
        |  CAST(sum(x * x) OVER win AS BIGINT) AS sxx
        | FROM d
        | WINDOW win AS (ORDER BY x ROWS BETWEEN 6 PRECEDING
        |   AND CURRENT ROW))
        |SELECT day, y AS n_events,
        | round(CAST(n * sxy - sx * sy AS DOUBLE)
        |   / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS slope_7d
        |FROM w WHERE n = 7 ORDER BY day""".stripMargin,
    // Wilson 95% score interval per language for the q26 classifier
    // accuracy; z = 1.96 written as the same literal product
    "q344_wilson_ci" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        | FROM documents),
        |s AS (SELECT doc_id, lang,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t),
        |p AS (
        | SELECT lang, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        |  WHEN s_fr >= s_pt THEN 'fr'
        |  ELSE 'pt' END AS pred
        | FROM s),
        |c AS (
        | SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
        |   AS correct
        | FROM p GROUP BY 1)
        |SELECT lang, n, correct,
        | round(CAST(correct AS DOUBLE) / CAST(n AS DOUBLE), 4) AS acc,
        | round((CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)
        |    + 1.96 * 1.96 / (2.0 * n)
        |    - 1.96 * sqrt(CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)
        |       * (1.0 - CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)) / n
        |      + 1.96 * 1.96 / (4.0 * n * n)))
        |   / (1.0 + 1.96 * 1.96 / n), 4) AS wilson_lo,
        | round((CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)
        |    + 1.96 * 1.96 / (2.0 * n)
        |    + 1.96 * sqrt(CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)
        |       * (1.0 - CAST(correct AS DOUBLE) / CAST(n AS DOUBLE)) / n
        |      + 1.96 * 1.96 / (4.0 * n * n)))
        |   / (1.0 + 1.96 * 1.96 / n), 4) AS wilson_hi
        |FROM c ORDER BY lang""".stripMargin,
    // Goodman-Kruskal gamma from the 10x10 equal-width contingency
    // grid (cell cross-products, never the n^2 pair join)
    "q345_gk_gamma" ->
      """WITH base AS (
        | SELECT o.o_totalprice AS x, c.c_acctbal AS y
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |mm AS (SELECT min(x) AS xmn, max(x) AS xmx,
        |        min(y) AS ymn, max(y) AS ymx FROM base),
        |cells AS (
        | SELECT CAST(least(floor((x - xmn) * 10 / (xmx - xmn)), 9.0)
        |    AS BIGINT) AS i,
        |  CAST(least(floor((y - ymn) * 10 / (ymx - ymn)), 9.0)
        |    AS BIGINT) AS j,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM base CROSS JOIN mm GROUP BY 1, 2),
        |cd AS (
        | SELECT
        |  CAST(sum(CASE WHEN b.i > a.i AND b.j > a.j
        |    THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN b.i > a.i AND b.j < a.j
        |    THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d
        | FROM cells a CROSS JOIN cells b)
        |SELECT c AS concordant, d AS discordant,
        | round(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 4)
        |  AS gamma
        |FROM cd""".stripMargin,
    // Freedman-Diaconis bin design from exact interpolated quartiles;
    // h and the ratio 6dp-pinned before the ceil
    "q346_fd_bins" ->
      """WITH a AS (
        | SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
        |  min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        | FROM lineitem GROUP BY 1),
        |h AS (
        | SELECT *, round(2.0 * (q75 - q25) / pow(CAST(n AS DOUBLE),
        |   1.0 / 3.0), 6) AS h
        | FROM a)
        |SELECT l_returnflag, n, q25, q75,
        | round(q75 - q25, 4) AS iqr, h AS bin_width,
        | CAST(ceil(round((mx - mn) / h, 6)) AS BIGINT) AS n_bins
        |FROM h ORDER BY l_returnflag""".stripMargin,
    // word2vec subsampling keep probabilities for the top-50 terms,
    // t = 1e-3; frequencies pinned to 8dp before the closed form
    "q347_subsample_probs" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END)
        |  AS term
        | FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS c
        |      FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c),
        |top AS (
        | SELECT term, c, round(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE),
        |   8) AS f
        | FROM c CROSS JOIN tot
        | ORDER BY c DESC, term LIMIT 50)
        |SELECT term, c AS n_term, f,
        | round(least(1.0, (sqrt(f / 0.001) + 1.0) * (0.001 / f)), 4)
        |  AS p_keep
        |FROM top ORDER BY n_term DESC, term""".stripMargin,
    // Krippendorff's nominal alpha for the lang label vs the q26
    // classifier, coincidence-matrix form from the confusion cells
    "q348_kripp_alpha" ->
      (s"""WITH $langidPredCtes,
        |cc AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
        |       FROM lp GROUP BY 1, 2),
        |nu AS (SELECT CAST(sum(n) AS BIGINT) AS n_units FROM cc),
        |dis AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS disagree
        |        FROM cc WHERE lang <> pred),
        |marg AS (
        | SELECT v, CAST(sum(n) AS BIGINT) AS n_v FROM (
        |  SELECT lang AS v, n FROM cc
        |  UNION ALL SELECT pred AS v, n FROM cc) GROUP BY 1),
        |sq AS (SELECT CAST(sum(n_v * n_v) AS BIGINT) AS s2,
        |        CAST(sum(n_v) AS BIGINT) AS s1 FROM marg)
        |SELECT n_units, disagree AS n_disagree,
        | round(CAST(disagree AS DOUBLE) / n_units, 4) AS d_obs,
        | round(CAST(s1 * s1 - s2 AS DOUBLE)
        |   / CAST(s1 * (s1 - 1) AS DOUBLE), 4) AS d_exp,
        | round(1.0 - (CAST(disagree AS DOUBLE) / n_units)
        |   / (CAST(s1 * s1 - s2 AS DOUBLE)
        |      / CAST(s1 * (s1 - 1) AS DOUBLE)), 4) AS alpha
        |FROM nu CROSS JOIN dis CROSS JOIN sq""".stripMargin),
    // Monroe et al. log-odds with informative Dirichlet prior, es vs
    // fr, alpha0 = 100, top-20 by |z|
    "q349_fightin_words" ->
      """WITH t AS (
        | SELECT lang, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents WHERE lang IN ('es', 'fr')),
        |c AS (
        | SELECT term,
        |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS y1,
        |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS y2
        | FROM (SELECT lang, unnest(a) AS term FROM t) GROUP BY 1),
        |tot AS (SELECT CAST(sum(y1) AS BIGINT) AS n1,
        |         CAST(sum(y2) AS BIGINT) AS n2 FROM c),
        |w AS (
        | SELECT term, y1, y2, n1, n2,
        |  round(100.0 * CAST(y1 + y2 AS DOUBLE)
        |    / CAST(n1 + n2 AS DOUBLE), 8) AS aw
        | FROM c CROSS JOIN tot),
        |z AS (
        | SELECT term, y1, y2,
        |  ln((y1 + aw) / (n1 + 100.0 - y1 - aw))
        |   - ln((y2 + aw) / (n2 + 100.0 - y2 - aw)) AS d,
        |  1.0 / (y1 + aw) + 1.0 / (y2 + aw) AS v
        | FROM w)
        |SELECT term, y1 AS n_es, y2 AS n_fr,
        | round(d, 4) AS delta, round(d / sqrt(v), 4) AS zeta
        |FROM z
        |ORDER BY abs(round(d / sqrt(v), 4)) DESC, term LIMIT 20""".stripMargin,
    // McNemar continuity-corrected chi-square: q26 classifier vs the
    // majority-class baseline on the same documents
    "q350_mcnemar" ->
      (s"""WITH $langidPredCtes,
        |mj AS (
        | SELECT lang AS base_pred FROM lp
        | GROUP BY 1 ORDER BY count(*) DESC, lang LIMIT 1),
        |bc AS (
        | SELECT max(base_pred) AS baseline,
        |  CAST(sum(CASE WHEN pred = lang AND base_pred <> lang
        |    THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN pred <> lang AND base_pred = lang
        |    THEN 1 ELSE 0 END) AS BIGINT) AS c
        | FROM lp CROSS JOIN mj)
        |SELECT baseline, b, c,
        | round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
        |   / CAST(b + c AS DOUBLE), 4) AS chi2,
        | CAST(CASE WHEN CAST((abs(b - c) - 1) * (abs(b - c) - 1)
        |     AS DOUBLE) / CAST(b + c AS DOUBLE) > 3.841
        |  THEN 1 ELSE 0 END AS INTEGER) AS significant
        |FROM bc""".stripMargin),
    // order-3 permutation entropy of the daily count series,
    // <=-convention tie ranks, normalized by ln 6
    "q351_perm_entropy" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events GROUP BY 1),
        |trip AS (
        | SELECT x,
        |  lead(x, 1) OVER (ORDER BY day) AS b,
        |  lead(x, 2) OVER (ORDER BY day) AS c
        | FROM daily QUALIFY c IS NOT NULL),
        |pats AS (
        | SELECT (CASE WHEN x <= b THEN 4 ELSE 0 END
        |   + CASE WHEN b <= c THEN 2 ELSE 0 END
        |   + CASE WHEN x <= c THEN 1 ELSE 0 END) AS pattern,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM trip GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(count(*) AS BIGINT) AS n_patterns FROM pats)
        |SELECT nn AS n_windows, n_patterns,
        | round(sum(-(CAST(n AS DOUBLE) / nn)
        |   * ln(CAST(n AS DOUBLE) / nn)), 4) AS h_nats,
        | round(sum(-(CAST(n AS DOUBLE) / nn)
        |   * ln(CAST(n AS DOUBLE) / nn)) / ln(6.0), 4) AS h_norm
        |FROM pats CROSS JOIN tot GROUP BY 1, 2""".stripMargin,
    // Ljung-Box Q at lags 1..7 over the daily counts; r_k pinned 6dp,
    // chi2(7) 5% critical value 14.067
    "q352_ljung_box" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |m AS (SELECT round(avg(x), 6) AS m FROM daily),
        |dev AS (
        | SELECT day, x - m.m AS d FROM daily CROSS JOIN m),
        |lagged AS (
        | SELECT d,
        |  lag(d, 1) OVER (ORDER BY day) AS d1,
        |  lag(d, 2) OVER (ORDER BY day) AS d2,
        |  lag(d, 3) OVER (ORDER BY day) AS d3,
        |  lag(d, 4) OVER (ORDER BY day) AS d4,
        |  lag(d, 5) OVER (ORDER BY day) AS d5,
        |  lag(d, 6) OVER (ORDER BY day) AS d6,
        |  lag(d, 7) OVER (ORDER BY day) AS d7
        | FROM dev),
        |s AS (
        | SELECT CAST(count(*) AS BIGINT) AS n, sum(d * d) AS den,
        |  sum(d * d1) AS num1, sum(d * d2) AS num2, sum(d * d3) AS num3,
        |  sum(d * d4) AS num4, sum(d * d5) AS num5, sum(d * d6) AS num6,
        |  sum(d * d7) AS num7
        | FROM lagged),
        |r AS (
        | SELECT n,
        |  round(num1 / den, 6) AS r1, round(num2 / den, 6) AS r2,
        |  round(num3 / den, 6) AS r3, round(num4 / den, 6) AS r4,
        |  round(num5 / den, 6) AS r5, round(num6 / den, 6) AS r6,
        |  round(num7 / den, 6) AS r7
        | FROM s),
        |q AS (
        | SELECT n,
        |  (r1 * r1 / CAST(n - 1 AS DOUBLE)
        |   + r2 * r2 / CAST(n - 2 AS DOUBLE)
        |   + r3 * r3 / CAST(n - 3 AS DOUBLE)
        |   + r4 * r4 / CAST(n - 4 AS DOUBLE)
        |   + r5 * r5 / CAST(n - 5 AS DOUBLE)
        |   + r6 * r6 / CAST(n - 6 AS DOUBLE)
        |   + r7 * r7 / CAST(n - 7 AS DOUBLE))
        |   * CAST(n AS DOUBLE) * (n + 2) AS qv
        | FROM r)
        |SELECT n AS n_days, round(qv, 4) AS q_stat,
        | CAST(7 AS INTEGER) AS df,
        | CAST(CASE WHEN qv > 14.067 THEN 1 ELSE 0 END AS INTEGER)
        |  AS reject_white
        |FROM q""".stripMargin,
    // Wald-Wolfowitz runs test vs the 6dp-pinned median; equal days
    // drop; z from the exact closed form
    "q353_runs_test" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |med AS (SELECT round(quantile_cont(x, 0.5), 6) AS med
        |        FROM daily),
        |f AS (
        | SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS s
        | FROM daily CROSS JOIN med WHERE x <> med),
        |c AS (
        | SELECT s, CASE WHEN lag(s) OVER (ORDER BY day)
        |    IS DISTINCT FROM s THEN 1 ELSE 0 END AS chg
        | FROM f),
        |a AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(s) AS BIGINT) AS n1,
        |  CAST(sum(chg) AS BIGINT) AS runs
        | FROM c)
        |SELECT n AS n_days, n1 AS n_above, n - n1 AS n_below, runs,
        | round(2.0 * n1 * (n - n1) / CAST(n AS DOUBLE) + 1.0, 4)
        |  AS expected_runs,
        | round((CAST(runs AS DOUBLE)
        |   - (2.0 * n1 * (n - n1) / CAST(n AS DOUBLE) + 1.0))
        |  / sqrt(2.0 * n1 * (n - n1)
        |    * (2.0 * n1 * (n - n1) - CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |       * (CAST(n AS DOUBLE) - 1.0))), 4) AS z
        |FROM a""".stripMargin,
    // Hurst R/S over the dense hourly series; power-of-two blocks keep
    // R and S exact in binary, R/S pinned 6dp, 4-point log-log OLS
    "q354_hurst_rs" ->
      """WITH lohi AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |         AS hr FROM lohi),
        |cnt AS (SELECT date_trunc('hour', ts) AS hr,
        |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |hourly AS (SELECT g.hr, COALESCE(c.c, 0) AS x
        |           FROM grid g LEFT JOIN cnt c USING (hr)),
        |idx AS (SELECT x, row_number() OVER (ORDER BY hr) - 1 AS t
        |        FROM hourly),
        |sized AS (SELECT n, t, x, t // n AS blk
        |  FROM idx CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS n) s),
        |fullb AS (SELECT n, blk, t, x,
        |  count(*) OVER (PARTITION BY n, blk) AS bn,
        |  sum(x) OVER (PARTITION BY n, blk) AS bs FROM sized),
        |dev AS (SELECT n, blk, t,
        |  CAST(x AS DOUBLE) - CAST(bs AS DOUBLE) / n AS d
        | FROM fullb WHERE bn = n),
        |cum AS (SELECT n, blk, d,
        |  sum(d) OVER (PARTITION BY n, blk ORDER BY t) AS cd FROM dev),
        |blkstat AS (SELECT n, blk, max(cd) - min(cd) AS r,
        |  sqrt(sum(d * d) / n) AS sd FROM cum GROUP BY 1, 2),
        |rs AS (SELECT n, CAST(count(*) AS BIGINT) AS n_blocks,
        |  round(avg(round(r / sd, 6)), 6) AS rs
        | FROM blkstat WHERE sd > 0 GROUP BY 1),
        |ols AS (SELECT CAST(count(*) AS DOUBLE) AS k,
        |  sum(ln(n)) AS sx, sum(ln(rs)) AS sy,
        |  sum(ln(n) * ln(rs)) AS sxy, sum(ln(n) * ln(n)) AS sxx
        | FROM rs)
        |SELECT max(CASE WHEN n = 8 THEN rs END) AS rs_8,
        | max(CASE WHEN n = 16 THEN rs END) AS rs_16,
        | max(CASE WHEN n = 32 THEN rs END) AS rs_32,
        | max(CASE WHEN n = 64 THEN rs END) AS rs_64,
        | round(max((k * sxy - sx * sy) / (k * sxx - sx * sx)), 4)
        |  AS hurst
        |FROM rs CROSS JOIN ols""".stripMargin,
    // hourly periodogram at periods 2..48h; fixed-point trig (1e-6
    // integers) and integer-numerator centering make the spectral sums
    // exact; power pinned 4dp, rank computed after rounding
    "q355_periodogram" ->
      """WITH lohi AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |         AS hr FROM lohi),
        |cnt AS (SELECT date_trunc('hour', ts) AS hr,
        |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |hourly AS (SELECT g.hr, COALESCE(c.c, 0) AS x
        |           FROM grid g LEFT JOIN cnt c USING (hr)),
        |idx AS (SELECT x, row_number() OVER (ORDER BY hr) - 1 AS t
        |        FROM hourly),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |  CAST(sum(x) AS BIGINT) AS sx FROM idx),
        |terms AS (
        | SELECT p, x * nn - sx AS dn,
        |  CAST(round(cos(2 * pi() * (t % p) / p) * 1000000.0) AS BIGINT)
        |   AS cq,
        |  CAST(round(sin(2 * pi() * (t % p) / p) * 1000000.0) AS BIGINT)
        |   AS sq,
        |  nn
        | FROM idx CROSS JOIN tot
        | CROSS JOIN (SELECT unnest(generate_series(2, 48)) AS p) ps),
        |pw AS (
        | SELECT p AS period,
        |  round((CAST(sum(dn * cq) AS DOUBLE) * CAST(sum(dn * cq) AS DOUBLE)
        |    + CAST(sum(dn * sq) AS DOUBLE) * CAST(sum(dn * sq) AS DOUBLE))
        |   / (CAST(max(nn) AS DOUBLE) * CAST(max(nn) AS DOUBLE)) / 1e12,
        |   4) AS power
        | FROM terms GROUP BY 1)
        |SELECT period, power,
        | CAST(row_number() OVER (ORDER BY power DESC, period)
        |  AS INTEGER) AS rnk
        |FROM pw ORDER BY period""".stripMargin,
    // Mann-Kendall S with exact tie correction over the daily counts;
    // +-1 continuity correction, two-sided 5% decision on 4dp z
    "q356_mann_kendall" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events GROUP BY 1),
        |s AS (
        | SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
        |   WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        | FROM daily a JOIN daily b ON a.day < b.day),
        |ties AS (
        | SELECT CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT)
        |   AS tie_term,
        |  CAST(sum(tt) AS BIGINT) AS n
        | FROM (SELECT count(*) AS tt FROM daily GROUP BY x) g),
        |v AS (
        | SELECT s_stat, n,
        |  round(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
        |   / 18.0, 4) AS var_s
        | FROM s CROSS JOIN ties),
        |z AS (
        | SELECT n, s_stat, var_s,
        |  round(CASE WHEN s_stat > 0
        |    THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
        |   WHEN s_stat < 0
        |    THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        |   ELSE 0.0 END, 4) AS z
        | FROM v)
        |SELECT n AS n_days, s_stat, var_s, z,
        | CAST(CASE WHEN z > 1.96 THEN 1 WHEN z < -1.96 THEN -1
        |  ELSE 0 END AS INTEGER) AS trend
        |FROM z""".stripMargin,
    // effect sizes click vs view: integer recode vi = round(100v)
    // makes the moment sums exact; Cliff's delta from the midrank
    // histogram (2R1 integer), d/g from exact sums
    "q357_effect_sizes" ->
      """WITH ev AS (
        | SELECT event_type AS grp,
        |  CAST(round(value * 100) AS BIGINT) AS vi
        | FROM events WHERE event_type IN ('click', 'view')),
        |mom AS (
        | SELECT
        |  max(CASE WHEN grp = 'click' THEN n END) AS n1,
        |  max(CASE WHEN grp = 'click' THEN sv END) AS s1,
        |  max(CASE WHEN grp = 'click' THEN ssv END) AS ss1,
        |  max(CASE WHEN grp = 'view' THEN n END) AS n2,
        |  max(CASE WHEN grp = 'view' THEN sv END) AS s2,
        |  max(CASE WHEN grp = 'view' THEN ssv END) AS ss2
        | FROM (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(vi) AS BIGINT) AS sv,
        |        CAST(sum(vi * vi) AS BIGINT) AS ssv
        |       FROM ev GROUP BY 1) g),
        |hist AS (
        | SELECT vi AS v, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS cnt_a
        | FROM ev GROUP BY 1),
        |cumh AS (
        | SELECT cnt, cnt_a,
        |  sum(cnt) OVER (ORDER BY v) AS cum
        | FROM hist),
        |rk AS (
        | SELECT CAST(sum(cnt_a * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
        |  AS two_r1 FROM cumh),
        |calc AS (
        | SELECT n1, n2,
        |  CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        |  (CAST(ss1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1)
        |    * (CAST(s1 AS DOUBLE) / n1) * n1) / (n1 - 1) AS var1,
        |  (CAST(ss2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2)
        |    * (CAST(s2 AS DOUBLE) / n2) * n2) / (n2 - 1) AS var2,
        |  CAST(two_r1 AS DOUBLE) / 2
        |   - CAST(n1 AS DOUBLE) * (n1 + 1) / 2 AS u1
        | FROM mom CROSS JOIN rk),
        |eff AS (
        | SELECT n1, n2, m1, m2, u1,
        |  (m1 - m2) / sqrt(((n1 - 1) * var1 + (n2 - 1) * var2)
        |    / (n1 + n2 - 2)) AS d
        | FROM calc)
        |SELECT n1 AS n_click, n2 AS n_view,
        | round(m1 / 100, 4) AS mean_click,
        | round(m2 / 100, 4) AS mean_view,
        | round(d, 4) AS cohen_d,
        | round(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 4) AS hedges_g,
        | round(2.0 * u1 / (CAST(n1 AS DOUBLE) * n2) - 1.0, 4)
        |  AS cliff_delta
        |FROM eff""".stripMargin,
    // AMS F2 sketch vs exact second moment: 64 signed counters,
    // median of 4 means of 16 squared counters — integer arithmetic
    // end to end (means /16 and the 2-point median are exact binary)
    "q358_ams_f2" ->
      """WITH users AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY 1),
        |exact AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact
        | FROM users),
        |lanes AS (
        | SELECT u.cnt, j.j,
        |  CASE WHEN CAST(('0x' || substr(md5('ams:' || j.j || ':'
        |    || u.user_id), 1, 8)) AS BIGINT) % 2 = 0
        |   THEN 1 ELSE -1 END AS sgn
        | FROM users u
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) j),
        |ctr AS (
        | SELECT j, CAST(sum(cnt * sgn) AS BIGINT) AS c
        | FROM lanes GROUP BY 1),
        |means AS (
        | SELECT j // 16 AS grp,
        |  CAST(sum(c * c) AS DOUBLE) / 16 AS mean_est
        | FROM ctr GROUP BY 1),
        |med AS (SELECT quantile_cont(mean_est, 0.5) AS f2_est FROM means)
        |SELECT n_users, f2_exact, f2_est,
        | round((f2_est - CAST(f2_exact AS DOUBLE))
        |   / CAST(f2_exact AS DOUBLE), 4) AS rel_err
        |FROM exact CROSS JOIN med""".stripMargin,
    // nearest-centroid eval: md5 %5 test fold, 6dp-pinned train
    // centroids, 6dp cosine with (desc, label) tie-break
    "q359_centroid_eval" ->
      """WITH b AS (
        | SELECT vec_id, label,
        |  CAST(('0x' || substr(md5('ceval:' || vec_id), 1, 8)) AS BIGINT)
        |   % 5 = 0 AS is_test
        | FROM embeddings),
        |p AS (
        | SELECT e.vec_id, e.label, b.is_test,
        |  generate_subscripts(e.embedding, 1) - 1 AS dim,
        |  unnest(CAST(e.embedding AS DOUBLE[])) AS v
        | FROM embeddings e JOIN b USING (vec_id)),
        |c AS (
        | SELECT label AS lab, dim, round(avg(v), 6) AS cv
        | FROM p WHERE NOT is_test GROUP BY 1, 2),
        |sc AS (
        | SELECT p.vec_id, p.label, c.lab,
        |  round(sum(p.v * c.cv)
        |   / sqrt(sum(p.v * p.v) * sum(c.cv * c.cv)), 6) AS cos
        | FROM p JOIN c USING (dim) WHERE p.is_test
        | GROUP BY 1, 2, 3),
        |best AS (
        | SELECT vec_id, label, lab,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cos DESC, lab) AS rn
        | FROM sc)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_test,
        | CAST(sum(CASE WHEN lab = label THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_correct,
        | round(CAST(sum(CASE WHEN lab = label THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*), 4) AS acc
        |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    // Flesch reading ease, en slice: [aeiouy]+ vowel-run syllables,
    // [.!?]+ sentences floored at 1, per-doc score pinned 4dp
    "q360_flesch_panel" ->
      """WITH d AS (
        | SELECT source,
        |  greatest(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
        |   AS words,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sylls
        | FROM documents WHERE lang = 'en'),
        |f AS (
        | SELECT source, words, sents, sylls,
        |  round(206.835 - 1.015 * CAST(words AS DOUBLE) / sents
        |   - 84.6 * CAST(sylls AS DOUBLE) / words, 4) AS flesch
        | FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | round(avg(flesch), 4) AS mean_flesch,
        | round(avg(CAST(words AS DOUBLE) / sents), 4)
        |  AS words_per_sentence,
        | round(avg(CAST(sylls AS DOUBLE) / words), 4)
        |  AS syllables_per_word,
        | round(CAST(sum(CASE WHEN flesch < 30 THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*), 4) AS hard_rate
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // Yule's K per language from the token frequency spectrum;
    // integer arithmetic until the final 1e4 scaling
    "q361_yule_k" ->
      """WITH toks AS (
        | SELECT lang, unnest(regexp_split_to_array(trim(lower(text)),
        |   '\s+')) AS w
        | FROM documents WHERE len(trim(text)) > 0),
        |freq AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS m
        |         FROM toks GROUP BY 1, 2)
        |SELECT lang, CAST(sum(m) AS BIGINT) AS n_tokens,
        | CAST(count(*) AS BIGINT) AS vocab,
        | round(1e4 * CAST(sum(m * m) - sum(m) AS DOUBLE)
        |   / (CAST(sum(m) AS DOUBLE) * CAST(sum(m) AS DOUBLE)), 4)
        |  AS yule_k
        |FROM freq GROUP BY 1 ORDER BY 1""".stripMargin,
    // naive-Bayes langid on char trigrams: md5 %5 test fold,
    // Laplace-smoothed fixed-point (1e-6 BIGINT) log-probs, integer
    // per-doc score sums, argmax tie-broken by language
    "q362_nb_langid" ->
      """WITH docs AS (
        | SELECT doc_id, lang,
        |  regexp_replace(lower(text), '\s+', ' ', 'g') AS norm,
        |  CAST(('0x' || substr(md5('nb:' || doc_id), 1, 8)) AS BIGINT)
        |   % 5 = 0 AS is_test
        | FROM documents),
        |base AS (SELECT * FROM docs WHERE len(norm) >= 3),
        |tris AS (
        | SELECT doc_id, lang, is_test, substr(norm, CAST(i AS INTEGER), 3)
        |   AS tri
        | FROM (SELECT doc_id, lang, is_test, norm,
        |        unnest(generate_series(1, len(norm) - 2)) AS i
        |       FROM base) x),
        |counts AS (
        | SELECT lang, tri, CAST(count(*) AS BIGINT) AS c
        | FROM tris WHERE NOT is_test GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l
        |       FROM counts GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT tri) AS BIGINT) AS v
        |        FROM counts),
        |model AS (
        | SELECT counts.lang, tri,
        |  CAST(round(ln(CAST(c + 1 AS DOUBLE) / (n_l + v)) * 1e6)
        |   AS BIGINT) AS li
        | FROM counts JOIN nl ON counts.lang = nl.lang CROSS JOIN voc),
        |priors AS (
        | SELECT t.lang,
        |  CAST(round(ln(CAST(d_l AS DOUBLE) / d_tot) * 1e6) AS BIGINT)
        |   AS prior,
        |  CAST(round(ln(1.0 / (n_l + v)) * 1e6) AS BIGINT) AS li0
        | FROM (SELECT lang, count(*) AS d_l,
        |        sum(count(*)) OVER () AS d_tot
        |       FROM base WHERE NOT is_test GROUP BY 1) t
        | JOIN nl ON t.lang = nl.lang CROSS JOIN voc),
        |dt AS (
        | SELECT doc_id, lang AS actual, tri, CAST(count(*) AS BIGINT)
        |   AS ct
        | FROM tris WHERE is_test GROUP BY 1, 2, 3),
        |perdoc AS (
        | SELECT doc_id, actual, CAST(sum(ct) AS BIGINT) AS n_t
        | FROM dt GROUP BY 1, 2),
        |matched AS (
        | SELECT dt.doc_id, model.lang,
        |  CAST(sum(ct * li) AS BIGINT) AS mli,
        |  CAST(sum(ct) AS BIGINT) AS mct
        | FROM dt JOIN model ON dt.tri = model.tri GROUP BY 1, 2),
        |scored AS (
        | SELECT p.doc_id, p.actual, pr.lang,
        |  COALESCE(m.mli, 0) + (p.n_t - COALESCE(m.mct, 0)) * pr.li0
        |   + pr.prior AS score
        | FROM perdoc p CROSS JOIN priors pr
        | LEFT JOIN matched m
        |  ON m.doc_id = p.doc_id AND m.lang = pr.lang),
        |best AS (
        | SELECT doc_id, actual, lang AS pred,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang) AS rn
        | FROM scored)
        |SELECT actual AS lang, CAST(count(*) AS BIGINT) AS n_test,
        | CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_correct,
        | round(CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*), 4) AS acc
        |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    // Haar detail energy by level over the first 512 hours: one
    // prefix-sum pass, detail = (2*P1 - P0 - P2)/2^l — exact binary
    "q363_haar_energy" ->
      """WITH lohi AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |         AS hr FROM lohi),
        |cnt AS (SELECT date_trunc('hour', ts) AS hr,
        |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |hourly AS (SELECT g.hr, COALESCE(c.c, 0) AS x
        |           FROM grid g LEFT JOIN cnt c USING (hr)),
        |idx AS (SELECT x, row_number() OVER (ORDER BY hr) - 1 AS t
        |        FROM hourly QUALIFY t < 512),
        |ps AS (SELECT t, sum(x) OVER (ORDER BY t) AS c FROM idx),
        |lv AS (SELECT l, CAST(power(2, l - 1) AS BIGINT) AS h
        |       FROM (SELECT unnest(generate_series(1, 9)) AS l) x),
        |kg AS (SELECT l, h, unnest(generate_series(0, 512 // (2 * h) - 1))
        |        AS k FROM lv),
        |gr AS (SELECT l, h, k, k * 2 * h AS a FROM kg),
        |dd AS (
        | SELECT gr.l,
        |  (2 * p1.c - COALESCE(p0.c, 0) - p2.c)
        |   / power(2, gr.l) AS d
        | FROM gr
        | LEFT JOIN ps p0 ON p0.t = gr.a - 1
        | JOIN ps p1 ON p1.t = gr.a + gr.h - 1
        | JOIN ps p2 ON p2.t = gr.a + 2 * gr.h - 1),
        |pl AS (SELECT l, CAST(count(*) AS BIGINT) AS n_coeffs,
        |  sum(d * d) AS e FROM dd GROUP BY 1),
        |tot AS (SELECT sum(e) AS etot FROM pl)
        |SELECT l AS level, n_coeffs, round(e, 4) AS energy,
        | round(e / etot, 4) AS energy_share
        |FROM pl CROSS JOIN tot ORDER BY level""".stripMargin,
    // exact 2-hop harmonic centrality on the q93 bipartite graph:
    // h2 = |N1| + |N2|/2, N2 via edges join + distinct + anti-join
    "q364_harmonic2" ->
      """WITH pp AS (
        | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
        | FROM lineitem WHERE l_orderkey % 10 = 0),
        |edges AS (
        | SELECT p AS src, sp AS dst FROM pp
        | UNION ALL SELECT sp, p FROM pp),
        |n1 AS (SELECT src, CAST(count(*) AS BIGINT) AS d1
        |       FROM edges GROUP BY 1),
        |two AS (
        | SELECT src, CAST(count(*) AS BIGINT) AS d2 FROM (
        |  SELECT DISTINCT e1.src, e2.dst
        |  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
        |  WHERE e2.dst <> e1.src) c
        | WHERE NOT EXISTS (SELECT 1 FROM edges e
        |   WHERE e.src = c.src AND e.dst = c.dst)
        | GROUP BY 1),
        |h AS (
        | SELECT n1.src AS node, n1.d1 AS n_1hop,
        |  COALESCE(two.d2, 0) AS n_2hop,
        |  CAST(n1.d1 AS DOUBLE) + CAST(COALESCE(two.d2, 0) AS DOUBLE) / 2
        |   AS h2
        | FROM n1 LEFT JOIN two ON n1.src = two.src),
        |r AS (
        | SELECT node, n_1hop, n_2hop, h2,
        |  CAST(row_number() OVER (ORDER BY h2 DESC, node) AS INTEGER)
        |   AS rnk
        | FROM h)
        |SELECT * FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // embedding anisotropy: |mu|^2 vs E|x|^2 from per-dim sums, means
    // and per-dim variances pinned 6dp before squaring/sharing
    "q365_anisotropy" ->
      """WITH p AS (
        | SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |  unnest(CAST(embedding AS DOUBLE[])) AS v
        | FROM embeddings),
        |dims AS (
        | SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(v) AS sv,
        |  sum(v * v) AS ssv
        | FROM p GROUP BY 1),
        |pinned AS (
        | SELECT n, ssv, round(sv / n, 6) AS mu,
        |  round(ssv / n - round(sv / n, 6) * round(sv / n, 6), 6)
        |   AS vard
        | FROM dims),
        |agg AS (
        | SELECT max(n) AS n_vecs, CAST(count(*) AS BIGINT) AS n_dims,
        |  sum(mu * mu) AS mu2, sum(ssv) / max(n) AS en2,
        |  max(vard) AS vmax, sum(vard) AS vtot
        | FROM pinned)
        |SELECT n_vecs, n_dims, round(mu2, 4) AS mu_norm2,
        | round(en2, 4) AS mean_norm2,
        | round(mu2 / en2, 4) AS anisotropy,
        | round(vmax / vtot, 4) AS top_var_share
        |FROM agg""".stripMargin,
    // inter-arrival burstiness per type from per-(type,user) second
    // gaps; CV from exact integer sums, B = (CV-1)/(CV+1)
    "q366_interarrival" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |      PARTITION BY event_type, user_id
        |      ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |   AS gap
        | FROM events),
        |s AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS sg,
        |  CAST(sum(gap * gap) AS BIGINT) AS ssg
        | FROM g WHERE gap IS NOT NULL GROUP BY 1),
        |c AS (
        | SELECT event_type, n_gaps,
        |  CAST(sg AS DOUBLE) / n_gaps AS mean_s,
        |  sqrt(CAST(ssg AS DOUBLE) / n_gaps
        |    - (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))
        |   / (CAST(sg AS DOUBLE) / n_gaps) AS cv_raw
        | FROM s)
        |SELECT event_type, n_gaps, round(mean_s, 4) AS mean_gap_s,
        | round(cv_raw, 4) AS cv,
        | round((cv_raw - 1) / (cv_raw + 1), 4) AS burstiness
        |FROM c ORDER BY 1""".stripMargin,
    // ABC revenue classes from integer-cent revenue and a cumulative
    // share over the revenue-descending histogram; integer class gate
    "q367_abc_classes" ->
      """WITH rev AS (
        | SELECT l_partkey,
        |  CAST(sum(CAST(round(round(l_extendedprice * (1 - l_discount),
        |    2) * 100) AS BIGINT)) AS BIGINT) AS r
        | FROM lineitem GROUP BY 1),
        |hist AS (
        | SELECT -r AS v, CAST(count(*) AS BIGINT) AS np,
        |  CAST(sum(r) AS BIGINT) AS cnt
        | FROM rev GROUP BY 1),
        |cum AS (
        | SELECT np, cnt,
        |  sum(cnt) OVER (ORDER BY v) AS cum,
        |  sum(cnt) OVER () AS n
        | FROM hist),
        |cl AS (
        | SELECT np, cnt, n,
        |  CASE WHEN (cum - cnt) * 100 < n * 80 THEN 'A'
        |   WHEN (cum - cnt) * 100 < n * 95 THEN 'B'
        |   ELSE 'C' END AS cls
        | FROM cum)
        |SELECT cls, CAST(sum(np) AS BIGINT) AS n_parts,
        | CAST(sum(cnt) AS BIGINT) AS revenue_cents,
        | round(CAST(sum(cnt) AS DOUBLE) / CAST(max(n) AS DOUBLE), 4)
        |  AS revenue_share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    // sign-binarization fidelity: md5 1/97 pair sample, 8-bit Hamming
    // buckets, mean 6dp cosine per bucket
    "q368_sign_fidelity" ->
      """WITH sm AS (
        | SELECT vec_id, embedding FROM (
        |  SELECT vec_id, embedding,
        |   CAST(('0x' || substr(md5('sbq:' || vec_id), 1, 8)) AS BIGINT) AS h
        |  FROM embeddings) ORDER BY h, vec_id LIMIT 512),
        |pr AS (
        | SELECT a.vec_id AS ia, b.vec_id AS ib,
        |  a.embedding AS va, b.embedding AS vb
        | FROM sm a JOIN sm b ON a.vec_id < b.vec_id
        | WHERE CAST(('0x' || substr(md5('sb:' || a.vec_id || ':'
        |   || b.vec_id), 1, 8)) AS BIGINT) % 97 = 0),
        |d AS (
        | SELECT ia, ib,
        |  generate_subscripts(va, 1) AS dim,
        |  unnest(CAST(va AS DOUBLE[])) AS x,
        |  unnest(CAST(vb AS DOUBLE[])) AS y
        | FROM pr),
        |pp AS (
        | SELECT ia, ib,
        |  round(sum(x * y) / sqrt(sum(x * x) * sum(y * y)), 6) AS cos,
        |  CAST(sum(CASE WHEN (x >= 0) <> (y >= 0) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS ham
        | FROM d GROUP BY 1, 2)
        |SELECT ham // 8 AS bucket, CAST(count(*) AS BIGINT) AS n_pairs,
        | round(avg(cos), 4) AS mean_cos,
        | CAST(min(ham) AS BIGINT) AS min_hamming,
        | CAST(max(ham) AS BIGINT) AS max_hamming
        |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin,
    // global clustering coefficient of the exact J>=0.7 pair graph:
    // 3*triangles/wedges, pair set restated by the q32 shingle CTEs
    "q369_neardup_transitivity" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks),
        |ex AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
        |cand AS (
        | SELECT a.doc_id AS ia, b.doc_id AS ib FROM ex a
        | JOIN ex b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (
        | SELECT ia AS a, ib AS b FROM (
        |  SELECT ia, ib,
        |   round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |    / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))
        |      AS DOUBLE), 4) AS j
        |  FROM cand JOIN sh x ON x.doc_id = ia JOIN sh y ON y.doc_id = ib)
        | WHERE j >= 0.7),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p),
        |deg AS (
        | SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        |  SELECT a AS v FROM p UNION ALL SELECT b FROM p) u GROUP BY 1),
        |wg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |tri AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_triangles
        | FROM p e1 JOIN p e2 ON e1.b = e2.a
        | JOIN p e3 ON e1.a = e3.a AND e2.b = e3.b)
        |SELECT n_pairs, n_nodes, n_wedges, n_triangles,
        | CASE WHEN n_wedges = 0 THEN 0.0
        |  ELSE round(3.0 * n_triangles / n_wedges, 4) END AS transitivity
        |FROM np CROSS JOIN wg CROSS JOIN tri""".stripMargin,
    // Murphy decomposition of the q221 Brier score on the identical
    // score/label/bin convention, with the within-bin residual
    "q370_brier_decomp" ->
      """WITH scored AS (
        | SELECT CAST(('0x' || substr(md5('cal:' || vec_id), 1, 4))
        |   AS BIGINT) / 65536.0 AS score,
        |  CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS pos
        | FROM embeddings),
        |b AS (
        | SELECT CAST(floor(score * 10) AS INTEGER) AS bin,
        |  CAST(count(*) AS BIGINT) AS n, sum(score) AS sf,
        |  sum(pos) AS sp,
        |  sum((score - pos) * (score - pos)) AS sqerr
        | FROM scored GROUP BY 1),
        |g AS (
        | SELECT bin, n, sf, sp, sqerr,
        |  sum(n) OVER () AS nn, sum(sp) OVER () AS pp
        | FROM b),
        |t AS (
        | SELECT max(nn) AS n,
        |  sum(sqerr) / max(nn) AS brier_raw,
        |  sum(n * (sf / n - sp / n) * (sf / n - sp / n)) / max(nn)
        |   AS rel_raw,
        |  sum(n * (sp / n - pp / nn) * (sp / n - pp / nn)) / max(nn)
        |   AS res_raw,
        |  max((pp / nn) * (1.0 - pp / nn)) AS unc_raw
        | FROM g)
        |SELECT CAST(n AS BIGINT) AS n, round(brier_raw, 4) AS brier,
        | round(rel_raw, 4) AS reliability,
        | round(res_raw, 4) AS resolution,
        | round(unc_raw, 4) AS uncertainty,
        | round(brier_raw - (rel_raw - res_raw + unc_raw), 4) AS residual
        |FROM t""".stripMargin,
    // Lincoln-Petersen / Chapman capture-recapture from two md5 1/3
    // marks of the distinct user space vs the exact count
    "q371_capture_recapture" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |m AS (
        | SELECT user_id,
        |  CAST(('0x' || substr(md5('cr1:' || user_id), 1, 8)) AS BIGINT)
        |   % 3 = 0 AS s1,
        |  CAST(('0x' || substr(md5('cr2:' || user_id), 1, 8)) AS BIGINT)
        |   % 3 = 0 AS s2
        | FROM u),
        |a AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_true,
        |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS m
        | FROM m)
        |SELECT n_true, n1, n2, m,
        | CASE WHEN m = 0 THEN NULL
        |  ELSE round(CAST(n1 AS DOUBLE) * n2 / m, 4) END AS lp_est,
        | round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0, 4)
        |  AS chapman_est,
        | round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0
        |   - CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE), 4)
        |  AS chapman_rel_err
        |FROM a""".stripMargin,
    // PACF lags 1..5 by the unrolled Durbin-Levinson recursion over
    // the q352-pinned ACF; identical operation order in every line
    "q372_pacf" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |m AS (SELECT round(avg(x), 6) AS m FROM daily),
        |dev AS (
        | SELECT day, x - m.m AS d FROM daily CROSS JOIN m),
        |lagged AS (
        | SELECT d,
        |  lag(d, 1) OVER (ORDER BY day) AS d1,
        |  lag(d, 2) OVER (ORDER BY day) AS d2,
        |  lag(d, 3) OVER (ORDER BY day) AS d3,
        |  lag(d, 4) OVER (ORDER BY day) AS d4,
        |  lag(d, 5) OVER (ORDER BY day) AS d5
        | FROM dev),
        |acf AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(sum(d * d1) / sum(d * d), 6) AS r1,
        |  round(sum(d * d2) / sum(d * d), 6) AS r2,
        |  round(sum(d * d3) / sum(d * d), 6) AS r3,
        |  round(sum(d * d4) / sum(d * d), 6) AS r4,
        |  round(sum(d * d5) / sum(d * d), 6) AS r5
        | FROM lagged),
        |l1 AS (SELECT *, r1 AS p1, 1.0 - r1 * r1 AS v1 FROM acf),
        |l2 AS (SELECT *, (r2 - p1 * r1) / v1 AS p2 FROM l1),
        |l2b AS (SELECT *, p1 - p2 * p1 AS a21,
        |        v1 * (1.0 - p2 * p2) AS v2 FROM l2),
        |l3 AS (SELECT *,
        |  (r3 - (a21 * r2 + p2 * r1)) / v2 AS p3 FROM l2b),
        |l3b AS (SELECT *, a21 - p3 * p2 AS a31, p2 - p3 * a21 AS a32,
        |        v2 * (1.0 - p3 * p3) AS v3 FROM l3),
        |l4 AS (SELECT *,
        |  (r4 - (a31 * r3 + a32 * r2 + p3 * r1)) / v3 AS p4 FROM l3b),
        |l4b AS (SELECT *, a31 - p4 * p3 AS a41, a32 - p4 * a32 AS a42,
        |        p3 - p4 * a31 AS a43,
        |        v3 * (1.0 - p4 * p4) AS v4 FROM l4),
        |l5 AS (SELECT *,
        |  (r5 - (a41 * r4 + a42 * r3 + a43 * r2 + p4 * r1)) / v4 AS p5
        | FROM l4b)
        |SELECT n AS n_days, r1, r2, r3, r4, r5,
        | round(p1, 4) AS pacf1, round(p2, 4) AS pacf2,
        | round(p3, 4) AS pacf3, round(p4, 4) AS pacf4,
        | round(p5, 4) AS pacf5
        |FROM l5""".stripMargin,
    // sample-size design: n0 = (1.96 sd / (0.01 mean))^2 with finite-
    // population correction, from the exact integer vi recode
    "q373_sample_size" ->
      """WITH ev AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vi
        | FROM events),
        |mom AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vi) AS BIGINT) AS sv,
        |  CAST(sum(vi * vi) AS BIGINT) AS ssv
        | FROM ev GROUP BY 1),
        |c AS (
        | SELECT event_type, n,
        |  CAST(sv AS DOUBLE) / n AS mean_vi,
        |  (CAST(ssv AS DOUBLE) - (CAST(sv AS DOUBLE) / n)
        |    * (CAST(sv AS DOUBLE) / n) * n) / (n - 1.0) AS var_vi
        | FROM mom),
        |d AS (
        | SELECT event_type, n, mean_vi, var_vi,
        |  (1.96 * sqrt(var_vi) / (0.01 * mean_vi))
        |   * (1.96 * sqrt(var_vi) / (0.01 * mean_vi)) AS n0
        | FROM c)
        |SELECT event_type, n AS n_pop,
        | round(mean_vi / 100.0, 4) AS mean_value,
        | round(sqrt(var_vi) / 100.0, 4) AS sd_value,
        | round(n0, 4) AS n_infinite,
        | CAST(ceil(n0 / (1.0 + n0 / n)) AS BIGINT) AS n_required,
        | round(ceil(n0 / (1.0 + n0 / n)) / n, 4) AS sample_frac
        |FROM d ORDER BY 1""".stripMargin,
    // empirical-Bernstein anytime radius on the running purchase
    // mean, daily grain; stop flag on the 4dp-pinned comparison
    "q374_eb_stopping" ->
      """WITH base AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  CAST(round(value * 100) AS BIGINT) AS vi
        | FROM events WHERE event_type = 'purchase'),
        |rng AS (SELECT CAST(max(vi) - min(vi) AS DOUBLE) / 100.0 AS c
        |        FROM base),
        |daily AS (
        | SELECT day, CAST(count(*) AS BIGINT) AS dn,
        |  CAST(sum(vi) AS BIGINT) AS dsv,
        |  CAST(sum(vi * vi) AS BIGINT) AS dssv
        | FROM base GROUP BY 1),
        |cum AS (
        | SELECT day, c,
        |  sum(dn) OVER (ORDER BY day) AS n,
        |  sum(dsv) OVER (ORDER BY day) AS sv,
        |  sum(dssv) OVER (ORDER BY day) AS ssv
        | FROM daily CROSS JOIN rng),
        |s AS (
        | SELECT day, n,
        |  CAST(sv AS DOUBLE) / n / 100.0 AS mean,
        |  sqrt(2.0 * ((CAST(ssv AS DOUBLE)
        |     - (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / n)
        |    / n / 1e4) * ln(60.0) / n)
        |   + 3.0 * c * ln(60.0) / n AS eb
        | FROM cum)
        |SELECT day, CAST(n AS BIGINT) AS n_cum,
        | round(mean, 4) AS running_mean,
        | round(eb, 4) AS eb_radius,
        | CAST(CASE WHEN round(eb, 4) < round(mean, 4) * 0.05
        |  THEN 1 ELSE 0 END AS INTEGER) AS can_stop
        |FROM s ORDER BY day""".stripMargin,
    // whole-schema FK panel: one edge block per declared edge, child
    // counts full-outer parent keys, orphan rate + parent coverage
    "q375_fk_panel" -> {
      val edges = Seq(
        ("customer->nation", "customer", "c_nationkey", "nation",
          "n_nationkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders",
          "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
          "s_suppkey"),
        ("nation->region", "nation", "n_regionkey", "region",
          "r_regionkey"),
        ("orders->customer", "orders", "o_custkey", "customer",
          "c_custkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation",
          "n_nationkey"))
      val body = edges.map { case (n, c, ck, p, pk) =>
        "(" + fkEdgeOracle(n, c, ck, p, pk) + ")"
      }.mkString("\nUNION ALL\n")
      s"""WITH panel AS (
         |$body
         |)
         |SELECT edge, n_child, n_orphan_rows, n_parents, n_unreferenced,
         | round(CAST(n_orphan_rows AS DOUBLE) / n_child, 4)
         |  AS orphan_rate,
         | round(1.0 - CAST(n_unreferenced AS DOUBLE) / n_parents, 4)
         |  AS coverage
         |FROM panel ORDER BY edge""".stripMargin
    },
    // insert-only delta-join IVM identity per market segment
    "q376_ivm_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer),
        |oo AS (SELECT * FROM o WHERE o_orderkey % 97 <> 0),
        |od AS (SELECT * FROM o WHERE o_orderkey % 97 = 0),
        |co AS (SELECT * FROM c WHERE c_custkey % 89 <> 0),
        |cd AS (SELECT * FROM c WHERE c_custkey % 89 = 0),
        |fullv AS (
        | SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_full
        | FROM o JOIN c ON o_custkey = c_custkey GROUP BY 1),
        |ivm AS (
        | SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS n_ivm FROM (
        |  SELECT c_mktsegment, count(*) AS n FROM oo
        |   JOIN co ON o_custkey = c_custkey GROUP BY 1
        |  UNION ALL SELECT c_mktsegment, count(*) FROM od
        |   JOIN co ON o_custkey = c_custkey GROUP BY 1
        |  UNION ALL SELECT c_mktsegment, count(*) FROM oo
        |   JOIN cd ON o_custkey = c_custkey GROUP BY 1
        |  UNION ALL SELECT c_mktsegment, count(*) FROM od
        |   JOIN cd ON o_custkey = c_custkey GROUP BY 1) u
        | GROUP BY 1)
        |SELECT c_mktsegment,
        | COALESCE(n_full, 0) AS n_full, COALESCE(n_ivm, 0) AS n_ivm,
        | CAST(CASE WHEN COALESCE(n_full, 0) = COALESCE(n_ivm, 0)
        |  THEN 1 ELSE 0 END AS INTEGER) AS consistent
        |FROM fullv FULL OUTER JOIN ivm USING (c_mktsegment)
        |ORDER BY c_mktsegment""".stripMargin,
    // split-half langid stability: q26 profile argmax per half,
    // disagreement rate per actual language
    "q377_langid_stability" ->
      """WITH t AS (
        | SELECT lang,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
        |   AS toks
        | FROM documents),
        |b AS (
        | SELECT lang, toks, len(toks) AS n, len(toks) // 2 AS h
        | FROM t WHERE len(toks) >= 4),
        |halves AS (
        | SELECT lang, toks[1:h] AS t1, toks[h+1:n] AS t2 FROM b),
        |s AS (
        | SELECT lang,
        |  len(list_filter(t1, x -> x IN ('der','die','und','das','ist'))) AS a_de,
        |  len(list_filter(t1, x -> x IN ('the','and','of','to','is'))) AS a_en,
        |  len(list_filter(t1, x -> x IN ('el','la','de','que','y'))) AS a_es,
        |  len(list_filter(t1, x -> x IN ('le','la','de','et','les'))) AS a_fr,
        |  len(list_filter(t1, x -> x IN ('o','a','de','que','e'))) AS a_pt,
        |  len(list_filter(t2, x -> x IN ('der','die','und','das','ist'))) AS b_de,
        |  len(list_filter(t2, x -> x IN ('the','and','of','to','is'))) AS b_en,
        |  len(list_filter(t2, x -> x IN ('el','la','de','que','y'))) AS b_es,
        |  len(list_filter(t2, x -> x IN ('le','la','de','et','les'))) AS b_fr,
        |  len(list_filter(t2, x -> x IN ('o','a','de','que','e'))) AS b_pt
        | FROM halves),
        |p AS (
        | SELECT lang,
        |  CASE
        |   WHEN a_de >= a_en AND a_de >= a_es AND a_de >= a_fr AND a_de >= a_pt THEN 'de'
        |   WHEN a_en >= a_es AND a_en >= a_fr AND a_en >= a_pt THEN 'en'
        |   WHEN a_es >= a_fr AND a_es >= a_pt THEN 'es'
        |   WHEN a_fr >= a_pt THEN 'fr' ELSE 'pt' END AS p1,
        |  CASE
        |   WHEN b_de >= b_en AND b_de >= b_es AND b_de >= b_fr AND b_de >= b_pt THEN 'de'
        |   WHEN b_en >= b_es AND b_en >= b_fr AND b_en >= b_pt THEN 'en'
        |   WHEN b_es >= b_fr AND b_es >= b_pt THEN 'es'
        |   WHEN b_fr >= b_pt THEN 'fr' ELSE 'pt' END AS p2
        | FROM s)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN p1 <> p2 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_unstable,
        | round(CAST(sum(CASE WHEN p1 <> p2 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 4) AS unstable_rate
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // skyline on (quality, n_chars): per-quality max length, exclusive
    // running max over strictly-higher quality, dominance filter
    "q378_skyline" ->
      """WITH d AS (
        | SELECT doc_id,
        |  round((CAST(len(list_distinct(CASE WHEN len(trim(text)) = 0
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE regexp_split_to_array(trim(text), '\s+') END))
        |     AS DOUBLE)
        |    / CAST(greatest(len(CASE WHEN len(trim(text)) = 0
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE regexp_split_to_array(trim(text), '\s+') END), 1)
        |     AS DOUBLE)) * 0.7
        |   + (CASE WHEN length(text) BETWEEN 20 AND 20000
        |      THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality,
        |  n_chars
        | FROM documents),
        |pq AS (
        | SELECT quality, max(n_chars) AS q_max FROM d GROUP BY 1),
        |rm AS (
        | SELECT quality, q_max,
        |  max(q_max) OVER (ORDER BY quality DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi_max
        | FROM pq)
        |SELECT d.doc_id, d.quality, d.n_chars
        |FROM d JOIN rm ON d.quality = rm.quality
        |WHERE d.n_chars = rm.q_max
        | AND (rm.hi_max IS NULL OR d.n_chars > rm.hi_max)
        |ORDER BY d.quality DESC, d.doc_id""".stripMargin,
    // equi-depth histogram selectivity vs exact count for the
    // [10k, 30k) USD net-price predicate; uniform-within-bucket
    "q379_selectivity" ->
      """WITH base AS (
        | SELECT CAST(round(round(l_extendedprice * (1 - l_discount), 2)
        |   * 100) AS BIGINT) AS vi
        | FROM lineitem),
        |b AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(vi, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
        |   0.9]) AS qs,
        |  CAST(min(vi) AS DOUBLE) AS vmin,
        |  CAST(max(vi) AS DOUBLE) + 1.0 AS vmax1,
        |  CAST(sum(CASE WHEN vi >= 1000000 AND vi < 3000000 THEN 1
        |   ELSE 0 END) AS BIGINT) AS actual_rows
        | FROM base),
        |e AS (
        | SELECT n, actual_rows,
        |  (SELECT sum(CASE WHEN bhi > blo THEN
        |      greatest(0.0, least(bhi, 3000000.0)
        |       - greatest(blo, 1000000.0))
        |       / (bhi - blo) ELSE 0.0 END)
        |   FROM (SELECT
        |     CASE WHEN k = 0 THEN vmin ELSE qs[k] END AS blo,
        |     CASE WHEN k = 9 THEN vmax1 ELSE qs[k + 1] END AS bhi
        |    FROM (SELECT unnest(generate_series(0, 9)) AS k) ks) bu)
        |   * CAST(n AS DOUBLE) / 10.0 AS est
        | FROM b)
        |SELECT n AS n_rows,
        | CAST(1000000 AS BIGINT) AS pred_lo_cents,
        | CAST(3000000 AS BIGINT) AS pred_hi_cents,
        | round(est, 4) AS est_rows, actual_rows,
        | round((est - CAST(actual_rows AS DOUBLE))
        |   / CAST(actual_rows AS DOUBLE), 4) AS rel_err
        |FROM e""".stripMargin,
    // Zipf vs log-logistic R^2 on the rank-frequency points, 1e-4
    // fixed-point ln terms so the OLS sums are exact integers
    "q380_zipf_loglog" ->
      """WITH toks AS (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |   AS wd
        | FROM documents WHERE len(trim(text)) > 0),
        |freq AS (
        | SELECT wd, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
        |rk AS (
        | SELECT f, CAST(row_number() OVER (ORDER BY f DESC, wd)
        |   AS BIGINT) AS r
        | FROM freq),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM rk),
        |t AS (
        | SELECT
        |  CAST(round(ln(CAST(f AS DOUBLE)) * 1e4) AS BIGINT) AS y,
        |  CAST(round(ln(CAST(r AS DOUBLE)) * 1e4) AS BIGINT) AS x1,
        |  CAST(round(ln(((CAST(r AS DOUBLE) - 0.5) / v)
        |    / (1.0 - (CAST(r AS DOUBLE) - 0.5) / v)) * 1e4) AS BIGINT)
        |   AS x2
        | FROM rk CROSS JOIN v),
        |s AS (
        | SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(y * y) AS BIGINT) AS syy,
        |  CAST(sum(x1) AS BIGINT) AS sx1,
        |  CAST(sum(x1 * x1) AS BIGINT) AS sx1x1,
        |  CAST(sum(x1 * y) AS BIGINT) AS sx1y,
        |  CAST(sum(x2) AS BIGINT) AS sx2,
        |  CAST(sum(x2 * x2) AS BIGINT) AS sx2x2,
        |  CAST(sum(x2 * y) AS BIGINT) AS sx2y
        | FROM t),
        |r2 AS (
        | SELECT k,
        |  (CAST(k AS DOUBLE) * sx1y - CAST(sx1 AS DOUBLE) * sy)
        |   * (CAST(k AS DOUBLE) * sx1y - CAST(sx1 AS DOUBLE) * sy)
        |   / ((CAST(k AS DOUBLE) * sx1x1 - CAST(sx1 AS DOUBLE) * sx1)
        |    * (CAST(k AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |   AS z_r2,
        |  (CAST(k AS DOUBLE) * sx2y - CAST(sx2 AS DOUBLE) * sy)
        |   * (CAST(k AS DOUBLE) * sx2y - CAST(sx2 AS DOUBLE) * sy)
        |   / ((CAST(k AS DOUBLE) * sx2x2 - CAST(sx2 AS DOUBLE) * sx2)
        |    * (CAST(k AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |   AS l_r2
        | FROM s)
        |SELECT k AS vocab, round(z_r2, 4) AS zipf_r2,
        | round(l_r2, 4) AS loglogistic_r2,
        | CASE WHEN round(z_r2, 4) >= round(l_r2, 4) THEN 'zipf'
        |  ELSE 'loglogistic' END AS better_model
        |FROM r2""".stripMargin,
    // bitemporal as-of: corrections visible only once their tx date
    // has passed; per-key latest belief at T, then the status rollup
    "q381_bitemporal" ->
      """WITH o AS (
        | SELECT o_orderkey, o_orderstatus,
        |  CAST(o_orderdate AS DATE) AS od, o_totalprice
        | FROM orders),
        |t AS (SELECT min(od) + 60 AS t0 FROM o),
        |vers AS (
        | SELECT o_orderkey, o_orderstatus, od AS valid_from,
        |  od AS tx_from, o_totalprice AS price
        | FROM o
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, od, od + 10,
        |  round(o_totalprice + 100.0, 2)
        | FROM o WHERE o_orderkey % 37 = 0),
        |vis AS (
        | SELECT v.*, row_number() OVER (PARTITION BY o_orderkey
        |   ORDER BY tx_from DESC) AS rn
        | FROM vers v CROSS JOIN t
        | WHERE tx_from <= t0 AND valid_from <= t0)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CASE WHEN tx_from <> valid_from THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_corrected,
        | round(sum(price), 2) AS believed_total
        |FROM vis WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // overlapping-interval merge per user: running-max sweep groups,
    // covered seconds + merged count, top 20
    "q382_interval_union" ->
      """WITH iv AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS a,
        |  CAST(floor(epoch(ts)) AS BIGINT) + 900 AS b
        | FROM events),
        |g AS (
        | SELECT user_id, a, b,
        |  CASE WHEN max(b) OVER (PARTITION BY user_id ORDER BY a, b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |   OR a > max(b) OVER (PARTITION BY user_id ORDER BY a, b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   THEN 1 ELSE 0 END AS is_new
        | FROM iv),
        |gg AS (
        | SELECT user_id, a, b,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY a, b
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        | FROM g),
        |m AS (
        | SELECT user_id, grp, min(a) AS lo, max(b) AS hi
        | FROM gg GROUP BY 1, 2),
        |cov AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n_merged,
        |  CAST(sum(hi - lo) AS BIGINT) AS covered_s
        | FROM m GROUP BY 1),
        |r AS (
        | SELECT user_id, n_merged, covered_s,
        |  CAST(row_number() OVER (ORDER BY covered_s DESC, user_id)
        |   AS INTEGER) AS rnk
        | FROM cov)
        |SELECT * FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // nation revenue with share-of-region and share-of-total in
    // exact integer cents
    "q383_contribution" ->
      """WITH rev AS (
        | SELECT r.r_name, n.n_name,
        |  CAST(sum(CAST(round(round(o_totalprice, 2) * 100) AS BIGINT))
        |   AS BIGINT) AS revenue_cents
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY 1, 2)
        |SELECT r_name, n_name, revenue_cents,
        | round(CAST(revenue_cents AS DOUBLE)
        |   / CAST(sum(revenue_cents) OVER (PARTITION BY r_name)
        |     AS DOUBLE), 4) AS share_of_region,
        | round(CAST(revenue_cents AS DOUBLE)
        |   / CAST(sum(revenue_cents) OVER () AS DOUBLE), 4)
        |  AS share_of_total
        |FROM rev ORDER BY r_name, n_name""".stripMargin,
    // DSv2 tar manifest: q157's closed form off the documents table
    // (shard = doc_id//50, members doc_id-ordered, md5(text) payload)
    "q384_dsv2_tar" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  doc_id || '.txt' AS name,
        |  CAST(strlen(text) AS BIGINT) AS size, md5(text) AS payload_md5
        | FROM documents)
        |SELECT shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1
        |  AS INTEGER) AS idx,
        | name, size, payload_md5
        |FROM m ORDER BY shard, idx""".stripMargin,
    // consistent-hash ring: first point clockwise (wrap to global
    // min), 8 nodes x {1,16,256} vnodes, load spread per panel
    "q385_hash_ring" -> {
      def panel(vn: Int): String =
        s"""SELECT CAST($vn AS BIGINT) AS n_vnodes,
           | CAST(sum(nk) AS BIGINT) AS n_keys,
           | round(CAST(max(nk) AS DOUBLE) / sum(nk), 4) AS max_share,
           | round(CAST(min(nk) AS DOUBLE) / sum(nk), 4) AS min_share,
           | round(sqrt(avg(CAST(nk AS DOUBLE) * nk)
           |   - avg(CAST(nk AS DOUBLE)) * avg(CAST(nk AS DOUBLE)))
           |  / avg(CAST(nk AS DOUBLE)), 4) AS cv_load
           |FROM (
           | SELECT node, CAST(count(*) AS BIGINT) AS nk FROM (
           |  SELECT k.user_id,
           |   COALESCE(
           |    (SELECT min_by(r.node, r.pt) FROM ring$vn r
           |     WHERE r.pt >= k.pos),
           |    (SELECT min_by(r.node, r.pt) FROM ring$vn r)) AS node
           |  FROM keys k) a
           | GROUP BY 1) l""".stripMargin
      s"""WITH keys AS (
         | SELECT user_id,
         |  CAST(('0x' || substr(md5('key:' || user_id), 1, 8)) AS BIGINT)
         |   AS pos
         | FROM (SELECT DISTINCT user_id FROM events) u),
         |ring1 AS (
         | SELECT i % 8 AS node,
         |  CAST(('0x' || substr(md5('ring1:' || (i % 8) || ':'
         |    || (i // 8)), 1, 8)) AS BIGINT) AS pt
         | FROM (SELECT unnest(generate_series(0, 7)) AS i) g),
         |ring16 AS (
         | SELECT i % 8 AS node,
         |  CAST(('0x' || substr(md5('ring16:' || (i % 8) || ':'
         |    || (i // 8)), 1, 8)) AS BIGINT) AS pt
         | FROM (SELECT unnest(generate_series(0, 127)) AS i) g),
         |ring256 AS (
         | SELECT i % 8 AS node,
         |  CAST(('0x' || substr(md5('ring256:' || (i % 8) || ':'
         |    || (i // 8)), 1, 8)) AS BIGINT) AS pt
         | FROM (SELECT unnest(generate_series(0, 2047)) AS i) g)
         |${panel(1)}
         |UNION ALL
         |${panel(16)}
         |UNION ALL
         |${panel(256)}
         |ORDER BY n_vnodes""".stripMargin
    },
    // FK-chain deletion dry run for the md5 1% of customers
    "q386_deletion_cascade" ->
      """WITH dc AS (
        | SELECT c_custkey FROM customer
        | WHERE CAST(('0x' || substr(md5('del:' || c_custkey), 1, 8))
        |   AS BIGINT) % 100 = 0),
        |dor AS (
        | SELECT o_orderkey FROM orders
        | JOIN dc ON o_custkey = c_custkey),
        |p AS (
        | SELECT 'customer' AS "table",
        |  (SELECT count(*) FROM dc) AS n_deleted,
        |  (SELECT count(*) FROM customer) AS n_total
        | UNION ALL SELECT 'lineitem',
        |  (SELECT count(*) FROM lineitem l JOIN dor
        |    ON l.l_orderkey = dor.o_orderkey),
        |  (SELECT count(*) FROM lineitem)
        | UNION ALL SELECT 'orders',
        |  (SELECT count(*) FROM dor),
        |  (SELECT count(*) FROM orders))
        |SELECT "table", CAST(n_deleted AS BIGINT) AS n_deleted,
        | CAST(n_total AS BIGINT) AS n_total,
        | round(CAST(n_deleted AS DOUBLE) / n_total, 4) AS share
        |FROM p ORDER BY "table"""".stripMargin,
    // epsilon-greedy replay: exclusive cumulative means pick the
    // greedy arm, md5 forces exploration days, regret vs the global
    // best-in-hindsight arm's realized day reward
    "q387_bandit_replay" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
        | FROM events GROUP BY 1, 2),
        |scored AS (
        | SELECT day, event_type, n, sv,
        |  round(CAST(sum(sv) OVER w AS DOUBLE)
        |    / sum(n) OVER w / 100.0, 6) AS past_mean,
        |  round(CAST(sv AS DOUBLE) / n / 100.0, 6) AS day_mean
        | FROM daily
        | WINDOW w AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |arms AS (
        | SELECT *,
        |  row_number() OVER (PARTITION BY day
        |    ORDER BY past_mean DESC NULLS LAST, event_type) AS greedy_rn,
        |  dense_rank() OVER (PARTITION BY day ORDER BY event_type) - 1
        |   AS arm_idx
        | FROM scored),
        |pick AS (
        | SELECT day, event_type AS chosen,
        |  CAST(CASE WHEN CAST(('0x' || substr(md5('eps:' || day), 1, 8))
        |    AS BIGINT) % 10 = 0 THEN 1 ELSE 0 END AS INTEGER) AS forced,
        |  day_mean AS reward
        | FROM arms
        | WHERE (CAST(('0x' || substr(md5('eps:' || day), 1, 8))
        |    AS BIGINT) % 10 = 0
        |   AND arm_idx = CAST(('0x' || substr(md5('arm:' || day), 1, 8))
        |    AS BIGINT) % 5)
        |  OR (CAST(('0x' || substr(md5('eps:' || day), 1, 8))
        |    AS BIGINT) % 10 <> 0 AND greedy_rn = 1)),
        |best AS (
        | SELECT event_type AS best_arm FROM daily
        | GROUP BY 1
        | ORDER BY round(CAST(sum(sv) AS DOUBLE) / sum(n) / 100.0, 6)
        |   DESC, event_type DESC LIMIT 1),
        |bd AS (
        | SELECT day, round(CAST(sv AS DOUBLE) / n / 100.0, 6)
        |   AS best_reward
        | FROM daily JOIN best ON event_type = best_arm)
        |SELECT p.day, p.chosen, p.forced,
        | round(p.reward, 4) AS reward,
        | round(bd.best_reward, 4) AS best_reward,
        | round(sum(bd.best_reward - p.reward) OVER (ORDER BY p.day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |  AS cum_regret
        |FROM pick p JOIN bd USING (day) ORDER BY p.day""".stripMargin,
    // ARI between the q26 predicted partition and the lang labels:
    // exact pair-counting terms off one contingency aggregate
    "q388_adjusted_rand" ->
      """WITH t AS (
        | SELECT lang,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
        |   AS toks
        | FROM documents),
        |s AS (SELECT lang,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t),
        |p AS (
        | SELECT lang, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        |  WHEN s_fr >= s_pt THEN 'fr' ELSE 'pt' END AS pred
        | FROM s),
        |cells AS (
        | SELECT lang, pred, CAST(count(*) AS BIGINT) AS nij
        | FROM p GROUP BY 1, 2),
        |a AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sum_a2
        |      FROM (SELECT sum(nij) AS ai FROM cells GROUP BY lang) x),
        |b AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sum_b2
        |      FROM (SELECT sum(nij) AS bj FROM cells GROUP BY pred) x),
        |c AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT)
        |        AS sum_cells2,
        |       CAST(sum(nij) AS BIGINT) AS n FROM cells),
        |f AS (
        | SELECT n, sum_cells2, sum_a2, sum_b2,
        |  CAST(sum_a2 AS DOUBLE) * sum_b2 / (n * (n - 1) // 2)
        |   AS expected,
        |  CAST(sum_a2 + sum_b2 AS DOUBLE) / 2 AS max_index
        | FROM c CROSS JOIN a CROSS JOIN b)
        |SELECT n AS n_docs, sum_cells2, sum_a2, sum_b2,
        | round(expected, 4) AS expected_index,
        | round((CAST(sum_cells2 AS DOUBLE) - expected)
        |   / (max_index - expected), 4) AS ari
        |FROM f""".stripMargin,
    // temperature grid on the q221 score: fixed-point NLL sums,
    // argmin on the exact integer totals
    "q389_temp_scaling" -> {
      def leg(t: Double): String = {
        val inv = 1.0 / t
        s"""SELECT CAST($t AS DOUBLE) AS temperature,
           | CAST(count(*) AS BIGINT) AS n,
           | round(CAST(sum(ti) AS DOUBLE) / 1e6 / count(*), 4)
           |  AS mean_nll,
           | CAST(sum(ti) AS BIGINT) AS nll_fp
           |FROM (
           | SELECT CAST(round(-(y * ln(pow(p, $inv)
           |    / (pow(p, $inv) + pow(1.0 - p, $inv)))
           |   + (1.0 - y) * ln(1.0 - pow(p, $inv)
           |    / (pow(p, $inv) + pow(1.0 - p, $inv)))) * 1e6) AS BIGINT)
           |  AS ti
           | FROM scored) x"""
      }
      s"""WITH scored AS (
         | SELECT greatest(1e-6, least(1.0 - 1e-6,
         |   CAST(('0x' || substr(md5('cal:' || vec_id), 1, 4)) AS BIGINT)
         |    / 65536.0)) AS p,
         |  CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
         | FROM embeddings),
         |grid AS (
         |${leg(0.5).replace("\n", "\n")}
         |UNION ALL
         |${leg(1.0)}
         |UNION ALL
         |${leg(2.0)}
         |),
         |best AS (SELECT min(nll_fp) AS best_fp FROM grid)
         |SELECT temperature, n, mean_nll,
         | CAST(CASE WHEN nll_fp = best_fp THEN 1 ELSE 0 END AS INTEGER)
         |  AS is_best
         |FROM grid CROSS JOIN best ORDER BY temperature""".stripMargin
    },
    // Theil-T with within/between decomposition; 1e-6 fixed-point
    // entropy terms, '__all' row carries the global T
    "q390_theil" ->
      """WITH cust AS (
        | SELECT n.n_name,
        |  CAST(sum(CAST(round(round(o_totalprice, 2) * 100) AS BIGINT))
        |   AS BIGINT) AS x
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | GROUP BY o.o_custkey, n.n_name),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx FROM cust),
        |wtot AS (
        | SELECT sum(ti) / 1e6 AS tsum FROM (
        |  SELECT CAST(round((CAST(x AS DOUBLE)
        |     / (CAST(sx AS DOUBLE) / n))
        |    * ln(CAST(x AS DOUBLE) / (CAST(sx AS DOUBLE) / n)) * 1e6)
        |   AS BIGINT) AS ti
        |  FROM cust CROSS JOIN tot) z),
        |grp AS (
        | SELECT n_name, CAST(count(*) AS BIGINT) AS ng,
        |  CAST(sum(x) AS BIGINT) AS sxg
        | FROM cust GROUP BY 1),
        |wgrp AS (
        | SELECT n_name, sum(ti) / 1e6 AS tg FROM (
        |  SELECT cust.n_name,
        |   CAST(round((CAST(x AS DOUBLE)
        |      / (CAST(sxg AS DOUBLE) / ng))
        |     * ln(CAST(x AS DOUBLE) / (CAST(sxg AS DOUBLE) / ng)) * 1e6)
        |    AS BIGINT) AS ti
        |  FROM cust JOIN grp ON cust.n_name = grp.n_name) z
        | GROUP BY 1),
        |nations AS (
        | SELECT grp.n_name AS "group", ng AS n_members,
        |  round(CAST(sxg AS DOUBLE) / sx, 6) AS rev_share,
        |  round(tg / ng, 4) AS theil_within,
        |  round((CAST(sxg AS DOUBLE) / sx)
        |    * ln((CAST(sxg AS DOUBLE) / ng)
        |      / (CAST(sx AS DOUBLE) / n)), 4) AS between_contrib
        | FROM grp JOIN wgrp ON grp.n_name = wgrp.n_name CROSS JOIN tot),
        |total AS (
        | SELECT '__all' AS "group", n AS n_members, 1.0 AS rev_share,
        |  round(tsum / n, 4) AS theil_within,
        |  CAST(NULL AS DOUBLE) AS between_contrib
        | FROM tot CROSS JOIN wtot)
        |SELECT * FROM nations UNION ALL SELECT * FROM total
        |ORDER BY "group"""".stripMargin,
    // split-conformal: md5 thirds, per-type integer-mean predictor,
    // exact k-th smallest calibration residual, test coverage
    "q391_conformal" ->
      """WITH ev AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vi,
        |  CAST(('0x' || substr(md5('cf:' || event_id), 1, 8)) AS BIGINT)
        |   % 3 AS fold
        | FROM events),
        |pred AS (
        | SELECT event_type,
        |  CAST(round(CAST(sum(vi) AS DOUBLE) / count(*)) AS BIGINT)
        |   AS pv
        | FROM ev WHERE fold = 0 GROUP BY 1),
        |cal AS (
        | SELECT abs(vi - pv) AS r FROM ev JOIN pred USING (event_type)
        | WHERE fold = 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |hist AS (SELECT r, count(*) AS cnt FROM cal GROUP BY 1),
        |qh AS (
        | SELECT min(r) AS qh, max(n_cal) AS n_cal FROM (
        |  SELECT r, n_cal,
        |   sum(cnt) OVER (ORDER BY r) AS cum,
        |   CAST(ceil((n_cal + 1) * 0.9) AS BIGINT) AS k
        |  FROM hist CROSS JOIN nc) x
        | WHERE cum >= k),
        |tst AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN abs(vi - pv) <= qh THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_covered,
        |  max(qh) AS qh, max(n_cal) AS n_cal
        | FROM ev JOIN pred USING (event_type) CROSS JOIN qh
        | WHERE fold = 2),
        |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM ev
        |       WHERE fold = 0)
        |SELECT n_train, n_cal, n_test,
        | round(CAST(qh AS DOUBLE) / 100.0, 4) AS qhat_value,
        | round(CAST(n_covered AS DOUBLE) / n_test, 4) AS coverage,
        | CAST(0.9 AS DOUBLE) AS target
        |FROM tst CROSS JOIN tr""".stripMargin,
    // fairness audit of the q26 classifier across sources: selection
    // rate, TPR, FPR per group, '__overall' parity ratio row
    "q392_fairness" ->
      """WITH t AS (
        | SELECT source, lang = 'en' AS act_pos,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
        |   AS toks
        | FROM documents),
        |s AS (SELECT source, act_pos,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t),
        |p AS (
        | SELECT source, act_pos,
        |  (CASE
        |   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        |   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        |   WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        |   WHEN s_fr >= s_pt THEN 'fr' ELSE 'pt' END) = 'en' AS pred_pos
        | FROM s),
        |g AS (
        | SELECT source AS "group", CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN pred_pos THEN 1 ELSE 0 END) AS BIGINT)
        |   AS np,
        |  CAST(sum(CASE WHEN act_pos THEN 1 ELSE 0 END) AS BIGINT)
        |   AS na,
        |  CAST(sum(CASE WHEN pred_pos AND act_pos THEN 1 ELSE 0 END)
        |   AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN pred_pos AND NOT act_pos THEN 1 ELSE 0 END)
        |   AS BIGINT) AS fp
        | FROM p GROUP BY 1),
        |rows_ AS (
        | SELECT "group", n_docs,
        |  round(CAST(np AS DOUBLE) / n_docs, 4) AS sel_rate,
        |  CASE WHEN na > 0
        |   THEN round(CAST(tp AS DOUBLE) / na, 4) END AS tpr,
        |  CASE WHEN n_docs - na > 0
        |   THEN round(CAST(fp AS DOUBLE) / (n_docs - na), 4) END AS fpr
        | FROM g),
        |ov AS (
        | SELECT '__overall' AS "group",
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  round(min(sel_rate) / greatest(max(sel_rate), 1e-12), 4)
        |   AS sel_rate,
        |  CAST(NULL AS DOUBLE) AS tpr, CAST(NULL AS DOUBLE) AS fpr
        | FROM rows_)
        |SELECT * FROM rows_ UNION ALL SELECT * FROM ov
        |ORDER BY "group"""".stripMargin,
    // Shapley channel attribution: exact-coalition conversion rates,
    // literal 16-subset frame, phi per channel
    "q393_shapley" ->
      """WITH um AS (
        | SELECT user_id,
        |  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |   + 2 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |   + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |   + 8 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |   AS m,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS conv
        | FROM events GROUP BY 1),
        |rates AS (
        | SELECT m, round(CAST(sum(conv) AS DOUBLE) / count(*), 6) AS v
        | FROM um GROUP BY 1),
        |sub AS (
        | SELECT s0, i, s0 + CAST(pow(2, i) AS BIGINT) AS s1,
        |  (s0 % 2) + (s0 // 2) % 2 + (s0 // 4) % 2 + (s0 // 8) % 2
        |   AS sz
        | FROM (SELECT unnest(generate_series(0, 15)) AS s0) a
        | CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) b
        | WHERE (s0 // CAST(pow(2, i) AS BIGINT)) % 2 = 0),
        |w AS (
        | SELECT s0, i, s1,
        |  CASE WHEN sz = 0 THEN 6.0 / 24 WHEN sz = 1 THEN 2.0 / 24
        |   WHEN sz = 2 THEN 2.0 / 24 ELSE 6.0 / 24 END AS w
        | FROM sub),
        |phi AS (
        | SELECT i,
        |  round(sum(w * (COALESCE(r1.v, 0.0) - COALESCE(r0.v, 0.0))), 4)
        |   AS phi
        | FROM w
        | LEFT JOIN rates r0 ON w.s0 = r0.m
        | LEFT JOIN rates r1 ON w.s1 = r1.m
        | GROUP BY 1)
        |SELECT CASE i WHEN 0 THEN 'click' WHEN 1 THEN 'error'
        |  WHEN 2 THEN 'signup' ELSE 'view' END AS channel, phi
        |FROM phi ORDER BY channel""".stripMargin,
    // gains/lift deciles of the q221 score: ntile over (score desc,
    // id), cumulative capture vs the random baseline
    "q394_gains_table" ->
      """WITH scored AS (
        | SELECT vec_id,
        |  CAST(('0x' || substr(md5('cal:' || vec_id), 1, 4)) AS BIGINT)
        |   AS sc,
        |  CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
        | FROM embeddings),
        |r AS (
        | SELECT pos,
        |  CAST(ntile(10) OVER (ORDER BY sc DESC, vec_id) - 1 AS BIGINT)
        |   AS decile
        | FROM scored),
        |d AS (
        | SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS np
        | FROM r GROUP BY 1),
        |c AS (
        | SELECT decile, n, np,
        |  sum(n) OVER (ORDER BY decile) AS cum_n,
        |  sum(np) OVER (ORDER BY decile) AS cum_np,
        |  sum(n) OVER () AS tot_n, sum(np) OVER () AS tot_np
        | FROM d)
        |SELECT decile, n, np,
        | round(CAST(cum_np AS DOUBLE) / tot_np, 4) AS cum_capture,
        | round((CAST(cum_np AS DOUBLE) / cum_n)
        |   / (CAST(tot_np AS DOUBLE) / tot_n), 4) AS lift
        |FROM c ORDER BY decile""".stripMargin,
    // MATCH_RECOGNIZE-style pattern: sessions (q54 convention) to
    // initials strings, regex 'cv*p' per session
    "q395_pattern_match" ->
      """WITH ev AS (
        | SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS us
        | FROM events),
        |flag AS (
        | SELECT user_id, event_id, event_type, us,
        |  CASE WHEN lag(us) OVER w IS NULL THEN 1
        |   WHEN us - lag(us) OVER w > 30 * 60 * 1000000 THEN 1
        |   ELSE 0 END AS new_s
        | FROM ev
        | WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        | SELECT user_id, event_type, us, event_id,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM flag),
        |seqs AS (
        | SELECT user_id, sid,
        |  string_agg(substr(event_type, 1, 1), '' ORDER BY us, event_id)
        |   AS seq,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM sess GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        | CAST(sum(CASE WHEN regexp_matches(seq, 'cv*p') THEN 1 ELSE 0
        |  END) AS BIGINT) AS n_matched,
        | round(avg(CAST(n_events AS DOUBLE)), 4) AS mean_events,
        | round(CAST(sum(CASE WHEN regexp_matches(seq, 'cv*p')
        |   THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS match_rate
        |FROM seqs""".stripMargin,
    // energy distance between click/view daily distributions: exact
    // integer pairwise |diffs| on days-sized frames
    "q396_energy_dist" ->
      """WITH a AS (
        | SELECT CAST(count(*) AS BIGINT) AS xa
        | FROM events WHERE event_type = 'click'
        | GROUP BY CAST(ts AS DATE)),
        |b AS (
        | SELECT CAST(count(*) AS BIGINT) AS xb
        | FROM events WHERE event_type = 'view'
        | GROUP BY CAST(ts AS DATE)),
        |xy AS (SELECT CAST(sum(abs(xa - xb)) AS BIGINT) AS sxy,
        |  CAST(count(*) AS BIGINT) AS nm FROM a CROSS JOIN b),
        |xx AS (SELECT CAST(sum(abs(a1.xa - a2.xa)) AS BIGINT) AS sxx,
        |  CAST(count(*) AS BIGINT) AS nn
        | FROM a a1 CROSS JOIN a a2),
        |yy AS (SELECT CAST(sum(abs(b1.xb - b2.xb)) AS BIGINT) AS syy,
        |  CAST(count(*) AS BIGINT) AS mm
        | FROM b b1 CROSS JOIN b b2),
        |e AS (
        | SELECT sqrt(CAST(nn AS DOUBLE)) AS n,
        |  sqrt(CAST(mm AS DOUBLE)) AS m,
        |  2.0 * sxy / nm - CAST(sxx AS DOUBLE) / nn
        |   - CAST(syy AS DOUBLE) / mm AS ed
        | FROM xy CROSS JOIN xx CROSS JOIN yy)
        |SELECT CAST(n AS BIGINT) AS n_days_a, CAST(m AS BIGINT)
        |  AS n_days_b,
        | round(ed, 4) AS energy_dist,
        | round(ed * (n * m / (n + m)), 4) AS e_statistic
        |FROM e""".stripMargin,
    // q397 reads customer/nation through the staged Derby JDBC round
    // trip; the oracle is the identical join-agg over the parquet the
    // stage was loaded from — round-trip row loss/dup/type-mangling
    // goes red. Money compared as floor(bal*100) longs, never a float
    // sum.
    "q397_jdbc_join_agg" ->
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust,
        | min(c_custkey) AS min_key, max(c_custkey) AS max_key,
        | CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |   AS acct_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 1000.0
        |GROUP BY n_name""".stripMargin,
    // q398: PAV isotonic fit via the minimax closed form — segment
    // averages are exact-integer ratios, min/max over identical doubles
    "q398_isotonic_calibration" ->
      """WITH b AS (
        | SELECT CAST(user_id % 16 AS INTEGER) AS b,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS k
        | FROM events GROUP BY 1),
        |c AS (SELECT b, n, k,
        |  CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cn,
        |  CAST(sum(k) OVER (ORDER BY b) AS BIGINT) AS ck FROM b),
        |seg AS (
        | SELECT lo.b AS i, hi.b AS j,
        |  CAST(hi.ck - (lo.ck - lo.k) AS DOUBLE)
        |    / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS avgij
        | FROM c lo JOIN c hi ON lo.b <= hi.b),
        |mi AS (
        | SELECT kb.b AS kb, seg.i AS i, min(avgij) AS mi
        | FROM c kb JOIN seg ON seg.i <= kb.b AND kb.b <= seg.j
        | GROUP BY 1, 2),
        |iso AS (SELECT kb, max(mi) AS iso FROM mi GROUP BY kb)
        |SELECT c.b, c.n, c.k,
        | round(CAST(c.k AS DOUBLE) / CAST(c.n AS DOUBLE), 4) AS raw_rate,
        | round(iso.iso, 4) AS iso_rate
        |FROM c JOIN iso ON iso.kb = c.b ORDER BY c.b""".stripMargin,
    // q399: the CUSUM recursion via its prefix-min identity; all sums
    // stay BIGINT under the x56 scaling
    "q399_cusum_changepoint" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
        |a AS (SELECT CAST(sum(x) AS BIGINT) AS burn FROM r WHERE rn <= 14),
        |p AS (
        | SELECT day, x, burn,
        |  CAST(sum(x*56 - burn*5) OVER (ORDER BY day) AS BIGINT) AS p56
        | FROM r CROSS JOIN a WHERE rn > 14),
        |sc AS (SELECT day, x, burn,
        |  p56 - least(CAST(0 AS BIGINT), min(p56) OVER (ORDER BY day)) AS s56
        | FROM p)
        |SELECT day, x, CAST(s56 AS BIGINT) AS s56,
        | round(CAST(s56 AS DOUBLE) / 56.0, 4) AS cusum,
        | s56 > burn * 20 AS alarm
        |FROM sc ORDER BY day""".stripMargin,
    // q400: AP/R-precision of the IVF leg vs the exact top-5 — the
    // q106 leg CTEs recomposed; precision@r 1e-6-pinned before the sum
    "q400_avg_precision" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), j AS (
         | SELECT i.query_id, i.neighbor_id, i.rnk,
         |  CASE WHEN e.neighbor_id IS NOT NULL THEN 1 END AS rel
         | FROM ivf i LEFT JOIN exact e USING (query_id, neighbor_id)),
         |sc AS (
         | SELECT query_id, rnk, rel,
         |  CAST(sum(coalesce(rel, 0)) OVER (PARTITION BY query_id
         |    ORDER BY rnk) AS BIGINT) AS cumhits
         | FROM j),
         |pq AS (
         | SELECT query_id, rnk, rel, cumhits,
         |  CAST(floor(cumhits * 1000000.0 / rnk + 0.5) AS BIGINT) AS pq
         | FROM sc)
         |SELECT query_id, CAST(count(rel) AS INTEGER) AS n_hits,
         | round(CAST(coalesce(sum(CASE WHEN rel IS NOT NULL THEN pq END), 0)
         |   AS DOUBLE) / 5000000.0, 4) AS avg_precision,
         | round(CAST(max(CASE WHEN rnk = 5 THEN cumhits END) AS DOUBLE)
         |   / 5.0, 4) AS r_precision
         |FROM pq GROUP BY query_id ORDER BY query_id""".stripMargin,
    // q401: md5-indexed bootstrap — every resample reproduced
    // bit-for-bit (the q279 determinism contract); CI = order stats
    // 5/195 of 200 resample means
    "q401_bootstrap_ci" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY day) - 1 AS idx FROM d),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |  CAST(sum(x) AS BIGINT) AS sx FROM r),
        |g AS (
        | SELECT b.b AS bb, i.i AS i, nd, sx,
        |  CAST(('0x' || substr(md5('boot:' || b.b || ':' || i.i), 1, 8))
        |    AS BIGINT) % nd AS pick
        | FROM n, generate_series(0, 199) AS b(b),
        |   generate_series(0, 499) AS i(i)
        | WHERE i.i < nd),
        |m AS (
        | SELECT bb, CAST(sum(x) AS DOUBLE) / CAST(max(nd) AS DOUBLE) AS m,
        |  max(nd) AS nd, max(sx) AS sx
        | FROM g JOIN r ON r.idx = g.pick GROUP BY bb),
        |o AS (SELECT m.*, row_number() OVER (ORDER BY m, bb) AS rk FROM m)
        |SELECT max(nd) AS n_days,
        | round(CAST(max(sx) AS DOUBLE) / CAST(max(nd) AS DOUBLE), 4)
        |   AS observed_mean,
        | CAST(count(*) AS INTEGER) AS n_resamples,
        | round(max(CASE WHEN rk = 5 THEN m END), 4) AS ci_lo,
        | round(max(CASE WHEN rk = 195 THEN m END), 4) AS ci_hi
        |FROM o""".stripMargin,
    // q402: Hamilton floor+remainder in exact integers; d'Hondt via
    // the ranked divisor table on identical doubles
    "q402_quota_apportion" ->
      """WITH src AS (
        | SELECT source,
        |  CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |    AS BIGINT) AS toks
        | FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(toks) AS BIGINT) AS tt FROM src),
        |b AS (SELECT source, toks, (toks * 20) // tt AS floor_seats,
        |  (toks * 20) % tt AS rem, tt FROM src CROSS JOIN t),
        |h AS (SELECT source, toks, floor_seats, rem, tt,
        |  20 - CAST(sum(floor_seats) OVER () AS BIGINT) AS leftover,
        |  row_number() OVER (ORDER BY rem DESC, source) AS rrank FROM b),
        |dh AS (
        | SELECT source, CAST(count(*) AS INTEGER) AS dhondt FROM (
        |  SELECT src.source, k.k,
        |   row_number() OVER (ORDER BY CAST(toks AS DOUBLE) / k.k DESC,
        |     source, k.k) AS cr
        |  FROM src, generate_series(1, 20) AS k(k)) x
        | WHERE cr <= 20 GROUP BY source)
        |SELECT h.source, h.toks,
        | round(CAST(h.toks AS DOUBLE) * 20 / CAST(h.tt AS DOUBLE), 4)
        |   AS exact_quota,
        | CAST(h.floor_seats AS INTEGER) AS floor_seats,
        | CAST(h.floor_seats + CASE WHEN h.rrank <= h.leftover
        |   THEN 1 ELSE 0 END AS INTEGER) AS hamilton,
        | CAST(coalesce(dh.dhondt, 0) AS INTEGER) AS dhondt
        |FROM h LEFT JOIN dh ON dh.source = h.source
        |ORDER BY h.source""".stripMargin,
    // q403: the q29 signature formula + the q32 verified pair set
    // recomposed — estimator error audited bit-for-bit
    "q403_minhash_est_audit" ->
      s"""WITH jp AS (
         |${jaccardPairOracle(0.3)}
         |), toks2 AS (
         | SELECT doc_id, CASE WHEN len(trim(text)) = 0
         |   THEN CAST([] AS VARCHAR[])
         |   ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
         | FROM documents),
         |sh2 AS (
         | SELECT doc_id, CASE WHEN len(t) >= 3
         |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  ELSE [array_to_string(t, ' ')] END AS s
         | FROM toks2),
         |ids AS (SELECT DISTINCT doc_id FROM
         |  (SELECT id_a AS doc_id FROM jp UNION ALL
         |   SELECT id_b AS doc_id FROM jp) u),
         |sig AS (
         | SELECT sh2.doc_id, CAST(g.i AS INTEGER) AS i,
         |  list_min(list_transform(s, x ->
         |    (CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) * (2*g.i + 1)
         |     + g.i * 40503) % 2147483647)) AS mh
         | FROM sh2 JOIN ids USING (doc_id), generate_series(0, 63) AS g(i)),
         |m AS (
         | SELECT jp.id_a, jp.id_b, jp.jaccard,
         |  CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
         |    AS matches
         | FROM jp JOIN sig a ON a.doc_id = jp.id_a
         |  JOIN sig b ON b.doc_id = jp.id_b AND b.i = a.i
         | GROUP BY 1, 2, 3)
         |SELECT id_a, id_b, jaccard AS j_exact, matches,
         | round(CAST(matches AS DOUBLE) / 64.0, 4) AS j_est,
         | round(abs(CAST(matches AS DOUBLE) / 64.0 - jaccard), 4) AS abs_err
         |FROM m ORDER BY id_a, id_b""".stripMargin,
    // q404: TextRank = the q73 pagerank CTE chain over the word
    // co-occurrence graph — vocab cut, bigram edges, symmetrize,
    // 5 pinned rounds, top-20
    "q404_textrank_keywords" ->
      s"""WITH tk AS (
         | SELECT CASE WHEN len(trim(lower(text))) = 0
         |   THEN CAST([] AS VARCHAR[])
         |   ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS a
         | FROM documents),
         |vocab AS (
         | SELECT term FROM (SELECT unnest(a) AS term FROM tk) v
         | GROUP BY term HAVING count(*) >= 5),
         |bp AS (
         | SELECT pr2[1] AS w1, pr2[2] AS w2 FROM (
         |  SELECT unnest(list_transform(generate_series(1, len(a)-1),
         |    i -> [a[i], a[i+1]])) AS pr2
         |  FROM tk WHERE len(a) >= 2) t
         | WHERE pr2[1] <> pr2[2]),
         |ev AS (
         | SELECT w1, w2 FROM bp
         | JOIN vocab v1 ON v1.term = bp.w1
         | JOIN vocab v2 ON v2.term = bp.w2),
         |e AS (SELECT DISTINCT src, dst FROM (
         | SELECT w1 AS src, w2 AS dst FROM ev
         | UNION ALL SELECT w2, w1 FROM ev) u),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
         |p0 AS (SELECT node, round(1.0 / n.n, 6) AS pr FROM nodes, n),
         |${prIterCtes(5)}
         |SELECT node AS term, pr, CAST(rnk AS INTEGER) AS rnk FROM (
         | SELECT node, pr,
         |  row_number() OVER (ORDER BY pr DESC, node) AS rnk
         | FROM p5) t WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // q405: the DP unrolled — one min-CTE per decoded day
    "q405_viterbi_decode" -> viterbiOracle(16),
    // q407: 2-D skyline via the strict-prefix range frame + the
    // equal-key partition max
    "q407_skyline" ->
      """WITH per AS (
        | SELECT o_custkey AS c_custkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS spend_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        | FROM orders GROUP BY 1),
        |w AS (
        | SELECT c_custkey, spend_cents, n_orders,
        |  max(n_orders) OVER (ORDER BY -spend_cents
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS dom_strict,
        |  max(n_orders) OVER (PARTITION BY spend_cents) AS dom_eq
        | FROM per)
        |SELECT c_custkey, spend_cents, n_orders FROM w
        |WHERE (dom_strict IS NULL OR dom_strict < n_orders)
        | AND dom_eq = n_orders
        |ORDER BY c_custkey""".stripMargin,
    // q408: the coupled level/trend recursion unrolled, numerators
    // exact over 4^t
    "q408_holt_linear" -> holtOracle(16),
    // q409: exact minimal-SSE 4-segmentation — prefix-sum SSE closed
    // form over the enumerated split triples, (i,j,k) tie-break
    "q409_optimal_segments" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn,
        |  CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS cs,
        |  CAST(sum(x*x) OVER (ORDER BY day) AS BIGINT) AS cs2 FROM d),
        |nn AS (SELECT CAST(count(*) AS INTEGER) AS n FROM r),
        |p AS (SELECT 0 AS rn, CAST(0 AS BIGINT) AS cs,
        |   CAST(0 AS BIGINT) AS cs2
        | UNION ALL SELECT CAST(rn AS INTEGER), cs, cs2 FROM r),
        |e AS (SELECT p.cs AS ecs, p.cs2 AS ecs2, nn.n
        |      FROM p, nn WHERE p.rn = nn.n),
        |c AS (
        | SELECT i.rn AS i, j.rn AS j, k.rn AS k,
        |  (CAST(i.cs2 AS DOUBLE)
        |    - CAST(i.cs*i.cs AS DOUBLE)/CAST(i.rn AS DOUBLE))
        |  + (CAST(j.cs2 - i.cs2 AS DOUBLE)
        |    - CAST((j.cs-i.cs)*(j.cs-i.cs) AS DOUBLE)
        |      /CAST(j.rn-i.rn AS DOUBLE))
        |  + (CAST(k.cs2 - j.cs2 AS DOUBLE)
        |    - CAST((k.cs-j.cs)*(k.cs-j.cs) AS DOUBLE)
        |      /CAST(k.rn-j.rn AS DOUBLE))
        |  + (CAST(e.ecs2 - k.cs2 AS DOUBLE)
        |    - CAST((e.ecs-k.cs)*(e.ecs-k.cs) AS DOUBLE)
        |      /CAST(e.n-k.rn AS DOUBLE)) AS total
        | FROM p i JOIN p j ON i.rn < j.rn JOIN p k ON j.rn < k.rn
        | CROSS JOIN e
        | WHERE i.rn > 0 AND k.rn < e.n),
        |best AS (
        | SELECT i, j, k, round(total, 4) AS total_sse FROM (
        |  SELECT i, j, k, total,
        |   row_number() OVER (ORDER BY total, i, j, k) AS rnk FROM c) t
        | WHERE rnk = 1),
        |segs AS (
        | SELECT 1 AS seg_id, 1 AS lo, i AS hi, total_sse FROM best
        | UNION ALL SELECT 2, i+1, j, total_sse FROM best
        | UNION ALL SELECT 3, j+1, k, total_sse FROM best
        | UNION ALL SELECT 4, k+1, (SELECT n FROM nn), total_sse FROM best)
        |SELECT seg_id, min(day) AS start_day, max(day) AS end_day,
        | CAST(count(*) AS BIGINT) AS n_days,
        | round(CAST(sum(x) AS DOUBLE)/count(*), 4) AS seg_mean, total_sse
        |FROM segs JOIN r ON r.rn BETWEEN lo AND hi
        |GROUP BY seg_id, total_sse ORDER BY seg_id""".stripMargin,
    // q406: 1-D DBSCAN's closed form — neighbor counts on the count
    // axis, core runs split at gap > eps, borders to the nearest core
    "q406_dbscan_daily" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |ep AS (SELECT (max(x) - min(x)) // 10 + 1 AS eps FROM d),
        |cnt AS (
        | SELECT p.day, p.x, ep.eps, CAST(count(*) AS BIGINT) AS nbrs,
        |  count(*) >= 3 AS is_core
        | FROM d p CROSS JOIN ep JOIN d q ON abs(p.x - q.x) <= ep.eps
        | GROUP BY p.day, p.x, ep.eps),
        |cores AS (
        | SELECT day AS cday, x AS cx, eps,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > eps THEN 1 ELSE 0 END)
        |    OVER (ORDER BY x, day) AS INTEGER) AS cluster_id
        | FROM (SELECT day, x, eps,
        |   x - lag(x) OVER (ORDER BY x, day) AS gap
        |  FROM cnt WHERE is_core) t),
        |border AS (
        | SELECT day, cluster_id FROM (
        |  SELECT c.day, k.cluster_id,
        |   row_number() OVER (PARTITION BY c.day
        |     ORDER BY abs(c.x - k.cx), k.cx, k.cday) AS rn
        |  FROM cnt c JOIN cores k ON abs(c.x - k.cx) <= c.eps
        |  WHERE NOT c.is_core) t WHERE rn = 1)
        |SELECT c.day, c.x, c.nbrs, c.is_core,
        | coalesce(k.cluster_id, b.cluster_id) AS cluster_id,
        | k.cluster_id IS NULL AND b.cluster_id IS NULL AS is_noise
        |FROM cnt c
        | LEFT JOIN cores k ON k.cday = c.day
        | LEFT JOIN border b ON b.day = c.day
        |ORDER BY c.day""".stripMargin,
    "q67_stats_moments" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q68_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // Exact per-stratum quota sample: ⌈n·20/100⌉ smallest md5 ranks per
    // language; the quota is computed in integer arithmetic on both
    // sides (the float form n*0.2 is not exactly ⌈⌉ at representability
    // boundaries).
    "q69_stratified_sample" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY
        |    CAST(('0x' || substr(md5('sample:' || doc_id), 1, 8)) AS BIGINT),
        |    doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents)
        |SELECT doc_id, lang FROM t
        |WHERE rn <= CAST(floor((n * 20 + 99) / 100) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    // Sequence packing: the oracle states the semantics as ONE global
    // cumulative sum; the Spark side computes the identical integers
    // with a two-level (bucketed) prefix sum so no window is global.
    "q70_seq_pack" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |   AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS start_off
        | FROM t)
        |SELECT doc_id, n_tokens, start_off,
        | CAST(floor(start_off / 512.0) AS BIGINT) AS block
        |FROM c ORDER BY doc_id""".stripMargin,
    // q70's packing with the block-SPAN metadata: exclusive end offset
    // and the block count each doc straddles, all from the same cumsum
    // (n_blocks = last block − first block + 1; an empty doc touches 0).
    "q74_seq_pack_spans" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |   AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS start_off
        | FROM t)
        |SELECT doc_id, n_tokens, start_off,
        | CAST(floor(start_off / 512.0) AS BIGINT) AS block,
        | start_off + n_tokens AS end_off,
        | CAST(CASE WHEN n_tokens = 0 THEN 0
        |  ELSE floor((start_off + n_tokens - 1) / 512.0)
        |   - floor(start_off / 512.0) + 1 END AS BIGINT) AS n_blocks
        |FROM c ORDER BY doc_id""".stripMargin,
    "q71_moving_window" ->
      """SELECT event_id, user_id, us,
        | round(sum(value) OVER w, 2) AS trail_30m,
        | count(*) OVER w AS n_30m
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // Fixed-iteration PageRank unrolled like q53: per-iteration 6-dp
    // rank rounding re-pins the one unordered float sum each step, so
    // three chained contribution/update CTE pairs reproduce the Spark
    // fixpoint hash-for-hash.
    "q73_pagerank" -> pageRankOracle(iters = 3),
    "q93_label_prop" -> lpaOracle(iters = 2),
    // Newman modularity over the same LPA fixpoint: integer
    // Q*4m^2 = sum(2m*intra2 - dc^2) on the labeled directed edges
    "q305_modularity" -> lpaOracleWithTail(2,
      """,
        |lab AS (SELECT node, label FROM l2),
        |el AS (
        | SELECT ls.label AS sl, ld.label AS dl
        | FROM e JOIN lab ls ON ls.node = e.src
        | JOIN lab ld ON ld.node = e.dst),
        |m AS (SELECT count(*) // 2 AS m FROM el),
        |g AS (
        | SELECT sl AS label, count(*) AS dc,
        |  sum(CASE WHEN sl = dl THEN 1 ELSE 0 END) AS intra2
        | FROM el GROUP BY 1),
        |sz AS (SELECT label, count(*) AS nc FROM lab GROUP BY 1),
        |tp AS (SELECT count(*) AS n_comm, sum(nc) AS n_nodes,
        |        max(nc) AS top_nodes FROM sz),
        |sq AS (SELECT sum(2 * m.m * intra2 - dc * dc) AS s,
        |        max(m.m) AS m FROM g, m)
        |SELECT CAST(n_comm AS BIGINT) AS n_comm,
        | CAST(n_nodes AS BIGINT) AS n_nodes,
        | CAST(m AS BIGINT) AS m_edges,
        | round(CAST(s AS DOUBLE) / (4.0 * m * m), 4) AS modularity,
        | round(CAST(top_nodes AS DOUBLE) / n_nodes, 4) AS top_share
        |FROM sq, tp""".stripMargin),
    // Cochran-Armitage: integer cross-product trend numerator,
    // z from five integer sums, weekday weights (DuckDB dayofweek
    // 0=Sunday..6 == Spark dayofweek-1)
    "q306_cochran_armitage" ->
      """WITH g AS (
        | SELECT dayofweek(ts) AS w, count(*) AS n_i,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r_i
        | FROM events WHERE event_type IN ('purchase', 'view')
        | GROUP BY 1),
        |t AS (SELECT count(*) AS k, sum(n_i) AS n, sum(r_i) AS r,
        |       sum(w * r_i) AS swr, sum(w * n_i) AS swn,
        |       sum(w * w * n_i) AS swwn FROM g),
        |z0 AS (
        | SELECT k, n, r,
        |  CAST(n * swr - r * swn AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
        |   / sqrt(CAST(r AS DOUBLE) * (n - r)
        |      * CAST(n * swwn - swn * swn AS DOUBLE)) AS z
        | FROM t)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        | CAST(r AS BIGINT) AS r,
        | round(z, 4) AS z, round(z * z, 4) AS chi2_trend
        |FROM z0""".stripMargin,
    // Hubness: in-degree of every corpus point over the sample's
    // exact-cosine top-5 lists, zero-degree points included; moment
    // skewness from exact integer power sums (m2*sqrt(m2), no pow)
    "q307_hubness" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM (
        |  SELECT vec_id, e,
        |   CAST(('0x' || substr(md5('hubq:' || vec_id), 1, 8)) AS BIGINT) AS h
        |  FROM e) ORDER BY h, vec_id LIMIT 64),
        |sc AS (
        | SELECT q.qid, c.vec_id AS cid,
        |  list_inner_product(q.qe, c.e) /
        |   (sqrt(list_inner_product(q.qe, q.qe)) *
        |    sqrt(list_inner_product(c.e, c.e))) AS cos
        | FROM q JOIN e c ON c.vec_id <> q.qid),
        |t5 AS (SELECT qid, cid FROM (
        |        SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |          ORDER BY cos DESC, cid) AS rnk FROM sc) x
        |       WHERE rnk <= 5),
        |ind AS (
        | SELECT e.vec_id, coalesce(d.d, 0) AS d
        | FROM e LEFT JOIN (SELECT cid AS vec_id, count(*) AS d
        |                   FROM t5 GROUP BY 1) d USING (vec_id)),
        |nq AS (SELECT count(*) AS n_queries FROM q),
        |tp AS (SELECT sum(d) AS top10 FROM (
        |        SELECT d FROM ind ORDER BY d DESC, vec_id LIMIT 10) y),
        |m AS (SELECT count(*) AS n, sum(d) AS s1, sum(d * d) AS s2,
        |       sum(d * d * d) AS s3, max(d) AS max_indeg,
        |       sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS n_reached
        |      FROM ind)
        |SELECT CAST(n_queries AS BIGINT) AS n_queries,
        | CAST(n AS BIGINT) AS n_points,
        | CAST(n_reached AS BIGINT) AS n_reached,
        | CAST(max_indeg AS BIGINT) AS max_indeg,
        | round((CAST(s3 AS DOUBLE) / n
        |    - 3.0 * (CAST(s1 AS DOUBLE) / n) * CAST(s2 AS DOUBLE) / n
        |    + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      * (CAST(s1 AS DOUBLE) / n))
        |  / ((CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |    * sqrt(CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
        |  4) AS skew,
        | round(CAST(top10 AS DOUBLE) / (n_queries * 5), 4) AS top10_share
        |FROM m, nq, tp""".stripMargin,
    // IVM theorem as the gate: the oracle RE-AGGREGATES the merged
    // snapshot from scratch; the engine only ever applies deltas
    "q308_ivm_agg" ->
      """WITH base AS (
        | SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS c
        | FROM orders),
        |merged AS (
        | SELECT k, CASE WHEN k % 37 = 0 THEN 'U' ELSE st END AS st,
        |  CASE WHEN k % 37 = 0 THEN c + 1000 ELSE c END AS c
        | FROM base WHERE k % 41 <> 0
        | UNION ALL
        | SELECT k + 10000000, st, c FROM base WHERE k % 43 = 0)
        |SELECT st AS o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(c) AS BIGINT) AS total_cents,
        | round(CAST(sum(c) AS DOUBLE) / 100, 2) AS total_price
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    // Compaction plan: contiguous cumsum bucketing, out = cum_before
    // div 20000 over the doc_id-ordered manifest
    "q309_compaction_plan" ->
      """WITH f AS (
        | SELECT doc_id AS v, CAST(n_chars AS BIGINT) AS cnt
        | FROM documents),
        |c AS (
        | SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM f),
        |a AS (
        | SELECT v, cnt, (cum - cnt) // 20000 AS out_file FROM c)
        |SELECT CAST(out_file AS BIGINT) AS out_file,
        | CAST(count(*) AS BIGINT) AS n_inputs,
        | CAST(sum(cnt) AS BIGINT) AS bytes,
        | CAST(min(v) AS BIGINT) AS first_doc,
        | CAST(max(v) AS BIGINT) AS last_doc,
        | round(CAST(sum(cnt) AS DOUBLE) / 20000, 4) AS fill_ratio
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // RFM: per-metric value-histogram quintiles, exact integer ceil,
    // ties share a score, recency inverted
    "q310_rfm_segments" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
        |u AS (
        | SELECT user_id,
        |  date_diff('day', max(CAST(ts AS DATE)), (SELECT mx FROM mx))
        |    AS r_days,
        |  count(*) AS f_cnt,
        |  sum(CASE WHEN event_type = 'purchase'
        |       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |    AS m_cents
        | FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM u),
        |rs AS (
        | SELECT r_days, 6 - (5 * cum + n.n - 1) // n.n AS r_score
        | FROM (SELECT r_days, count(*) AS c,
        |        sum(count(*)) OVER (ORDER BY r_days) AS cum
        |       FROM u GROUP BY 1) h, n),
        |fs AS (
        | SELECT f_cnt, (5 * cum + n.n - 1) // n.n AS f_score
        | FROM (SELECT f_cnt, count(*) AS c,
        |        sum(count(*)) OVER (ORDER BY f_cnt) AS cum
        |       FROM u GROUP BY 1) h, n),
        |ms AS (
        | SELECT m_cents, (5 * cum + n.n - 1) // n.n AS m_score
        | FROM (SELECT m_cents, count(*) AS c,
        |        sum(count(*)) OVER (ORDER BY m_cents) AS cum
        |       FROM u GROUP BY 1) h, n)
        |SELECT u.user_id, CAST(u.r_days AS BIGINT) AS r_days,
        | CAST(u.f_cnt AS BIGINT) AS f_cnt,
        | CAST(u.m_cents AS BIGINT) AS m_cents,
        | CAST(rs.r_score AS BIGINT) AS r_score,
        | CAST(fs.f_score AS BIGINT) AS f_score,
        | CAST(ms.m_score AS BIGINT) AS m_score,
        | CAST(rs.r_score AS VARCHAR) || CAST(fs.f_score AS VARCHAR)
        |  || CAST(ms.m_score AS VARCHAR) AS rfm_cell
        |FROM u JOIN rs USING (r_days) JOIN fs USING (f_cnt)
        | JOIN ms USING (m_cents)
        |ORDER BY u.user_id""".stripMargin,
    // Degree assortativity: Pearson r from six integer edge sums
    "q311_assortativity" ->
      """WITH pairs AS (
        | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
        | FROM lineitem WHERE l_orderkey % 10 = 0),
        |e AS (SELECT p AS src, sp AS dst FROM pairs
        |      UNION ALL SELECT sp, p FROM pairs),
        |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
        |ed AS (
        | SELECT dx.d AS dx, dy.d AS dy
        | FROM e JOIN deg dx ON dx.node = e.src
        | JOIN deg dy ON dy.node = e.dst),
        |t AS (SELECT count(*) AS m,
        |       (SELECT count(*) FROM deg) AS n_nodes,
        |       sum(dx) AS sx, sum(dy) AS sy, sum(dx * dy) AS sxy,
        |       sum(dx * dx) AS sxx, sum(dy * dy) AS syy FROM ed)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        | CAST(m AS BIGINT) AS m_directed,
        | round(CAST(m * sxy - sx * sy AS DOUBLE)
        |  / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
        |     * CAST(m * syy - sy * sy AS DOUBLE)), 4) AS assortativity
        |FROM t""".stripMargin,
    // Order-free table digest: canonical integer-safe row strings,
    // 40-bit md5 prefixes summed per bucket, root = sum of buckets
    "q312_table_digest" ->
      """WITH r AS (
        | SELECT l_orderkey % 64 AS bucket,
        |  CAST(('0x' || substr(md5(
        |    'r:' || l_orderkey || ':' || l_linenumber || ':' ||
        |    CAST(round(l_quantity) AS BIGINT) || ':' ||
        |    CAST(round(l_extendedprice * 100) AS BIGINT) || ':' ||
        |    l_returnflag || ':' || l_linestatus), 1, 10)) AS BIGINT) AS h
        | FROM lineitem),
        |b AS (
        | SELECT bucket, count(*) AS n_rows, sum(h) AS digest
        | FROM r GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        | CAST(n_rows AS BIGINT) AS n_rows,
        | CAST(digest AS BIGINT) AS digest FROM b
        |UNION ALL
        |SELECT -1, CAST(sum(n_rows) AS BIGINT),
        | CAST(sum(digest) AS BIGINT) FROM b
        |ORDER BY bucket""".stripMargin,
    // Card diff: the q272 card computed twice (full corpus vs the
    // release candidate dropping src0 + short docs), joined on metric
    "q313_card_diff" ->
      """WITH da AS (
        | SELECT *, len(string_split_regex(trim(text), '\s+')) AS nw
        | FROM documents),
        |aa AS (
        | SELECT
        |  CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
        |  round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4)
        |   AS exact_dup_rate,
        |  round(avg(n_chars), 4) AS mean_chars,
        |  CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS p50_chars,
        |  CAST(sum(nw) AS DOUBLE) AS tokens_total,
        |  round(sum(nw) * 1.0 / count(*), 4) AS mean_tokens,
        |  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4)
        |   AS pct_en
        | FROM da),
        |ca AS (
        | SELECT 'n_docs' AS metric, n_docs AS v FROM aa
        | UNION ALL SELECT 'n_langs', n_langs FROM aa
        | UNION ALL SELECT 'n_sources', n_sources FROM aa
        | UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM aa
        | UNION ALL SELECT 'mean_chars', mean_chars FROM aa
        | UNION ALL SELECT 'p50_chars', p50_chars FROM aa
        | UNION ALL SELECT 'tokens_total', tokens_total FROM aa
        | UNION ALL SELECT 'mean_tokens', mean_tokens FROM aa
        | UNION ALL SELECT 'pct_en', pct_en FROM aa),
        |db AS (
        | SELECT *, len(string_split_regex(trim(text), '\s+')) AS nw
        | FROM documents WHERE source <> 'src0' AND n_chars >= 100),
        |ab AS (
        | SELECT
        |  CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
        |  round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4)
        |   AS exact_dup_rate,
        |  round(avg(n_chars), 4) AS mean_chars,
        |  CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS p50_chars,
        |  CAST(sum(nw) AS DOUBLE) AS tokens_total,
        |  round(sum(nw) * 1.0 / count(*), 4) AS mean_tokens,
        |  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4)
        |   AS pct_en
        | FROM db),
        |cb AS (
        | SELECT 'n_docs' AS metric, n_docs AS v FROM ab
        | UNION ALL SELECT 'n_langs', n_langs FROM ab
        | UNION ALL SELECT 'n_sources', n_sources FROM ab
        | UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM ab
        | UNION ALL SELECT 'mean_chars', mean_chars FROM ab
        | UNION ALL SELECT 'p50_chars', p50_chars FROM ab
        | UNION ALL SELECT 'tokens_total', tokens_total FROM ab
        | UNION ALL SELECT 'mean_tokens', mean_tokens FROM ab
        | UNION ALL SELECT 'pct_en', pct_en FROM ab)
        |SELECT ca.metric, ca.v AS value_a, cb.v AS value_b,
        | round(cb.v - ca.v, 4) AS delta,
        | CASE WHEN ca.v <> 0.0 THEN round((cb.v - ca.v) / ca.v, 4) END
        |  AS pct_change
        |FROM ca JOIN cb ON ca.metric = cb.metric
        |ORDER BY ca.metric""".stripMargin,
    // Capped-histogram join estimate vs exact self-join cardinality
    "q314_join_estimate" ->
      """WITH h AS (
        | SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |hd AS (SELECT k, c FROM h ORDER BY c DESC, k LIMIT 100),
        |ha AS (SELECT coalesce(sum(c * c), 0) AS est_head,
        |        coalesce(sum(c), 0) AS head_rows,
        |        count(*) AS head_ndv FROM hd),
        |t AS (SELECT sum(c) AS rows_t, count(*) AS ndv,
        |       sum(c * c) AS actual FROM h),
        |e AS (SELECT rows_t, ndv, actual,
        |  CAST(est_head AS DOUBLE)
        |   + CAST(rows_t - head_rows AS DOUBLE)
        |     * CAST(rows_t - head_rows AS DOUBLE)
        |     / greatest(ndv - head_ndv, 1) AS est
        | FROM ha, t)
        |SELECT CAST(rows_t AS BIGINT) AS n_rows,
        | CAST(ndv AS BIGINT) AS ndv, CAST(actual AS BIGINT) AS actual,
        | round(est, 4) AS estimate,
        | round(greatest(est / CAST(actual AS DOUBLE),
        |   CAST(actual AS DOUBLE) / est), 4) AS q_error
        |FROM e""".stripMargin,
    // Disorder profile: running max over event_id order (two-level in
    // the engine, plain window here), integer ms lags, exact
    // cum-rank percentiles
    "q315_disorder_profile" ->
      """WITH ev AS (
        | SELECT event_id, epoch_us(ts) AS us,
        |  event_id + CAST(('0x' || substr(md5('arr:' || event_id), 1, 8))
        |    AS BIGINT) % 200 AS arr
        | FROM events),
        |r AS (
        | SELECT event_id, us,
        |  max(us) OVER (ORDER BY arr, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_mx
        | FROM ev),
        |l AS (
        | SELECT greatest(coalesce(run_mx, us) - us, 0) // 1000 AS v
        | FROM r),
        |h AS (SELECT v, count(*) AS cnt FROM l GROUP BY 1),
        |c AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum,
        |       sum(cnt) OVER () AS n FROM h)
        |SELECT CAST(max(n) AS BIGINT) AS n_events,
        | CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT)
        |  AS p50_ms,
        | CAST(min(CASE WHEN cum * 100 >= n * 95 THEN v END) AS BIGINT)
        |  AS p95_ms,
        | CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT)
        |  AS p99_ms,
        | CAST(max(v) AS BIGINT) AS max_ms
        |FROM c""".stripMargin,
    // DuckDB has no width_bucket; the oracle spells out the same
    // arithmetic (bucket width (hi-lo)/n = 100, below-range -> 0,
    // at-or-above-range -> n+1).
    "q72_histogram" ->
      """SELECT CASE WHEN n_chars < 0 THEN 0
        |  WHEN n_chars >= 2000 THEN 21
        |  ELSE CAST(floor(CAST(n_chars AS DOUBLE) / 100.0) AS BIGINT) + 1
        | END AS bucket, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    // Bigram PMI collocations: the q56 tokenization, bigrams via the
    // q85-style generate_series index, pmi = ln((c_ab/M)/((c1/N)(c2/N)))
    // with the identical division order on both sides, ranked on the
    // 4-dp ROUNDED score (ties by the pair).
    "q98_bigram_pmi" ->
      """WITH t AS (
        | SELECT CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |toks AS (SELECT unnest(a) AS w FROM t),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |bg AS (
        | SELECT a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM bg),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg
        |        GROUP BY 1, 2 HAVING count(*) >= 5),
        |scored AS (
        | SELECT w1, w2, c_ab,
        |  round(ln((c_ab / m.m) / ((u1.c / n.n) * (u2.c / n.n))), 4) AS pmi
        | FROM cab JOIN uni u1 ON cab.w1 = u1.w JOIN uni u2 ON cab.w2 = u2.w, n, m)
        |SELECT w1, w2, c_ab, pmi,
        | CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER) AS rnk
        |FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin,
    // Context-window chunk plan: pure token-count arithmetic (stride =
    // 32 − 8 = 24), so the oracle restates it with generate_series.
    "q99_chunk_plan" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n
        | FROM documents),
        |c AS (
        | SELECT doc_id, n,
        |  unnest(generate_series(0,
        |    CAST(greatest(0, ceil((n - 32) / 24.0)) AS BIGINT))) AS k
        | FROM t WHERE n > 0)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        | CAST(k * 24 AS BIGINT) AS start_tok,
        | CAST(least(32, n - k * 24) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // Incremental dedup: the md5-derived quarter is the incoming batch,
    // the rest the reference; the oracle reproduces split, fingerprints
    // and the min-id batch-canonical rule directly. q111 is the
    // persisted-fingerprint form — same result by construction (the
    // stage source is invisible to the output), same oracle.
    "q100_incr_dedup" -> incrDedupOracle,
    "q111_incr_dedup_fps" -> incrDedupOracle,
    // Incremental near-dup: the exact J >= 0.7 pair set RESTRICTED to
    // pairs crossing the q100 md5 batch/reference split (the engine's
    // cross-side LSH banding is recall-complete here — the same
    // signatures/banding catch every exact pair in the intra-corpus
    // q30 gate at both sf scales, and this is a subset of those pairs).
    // VALIDITY ENVELOPE (not modeled by the oracle, both vacuous on the
    // committed testdata): (a) 16-band/4-row banding has a ~1.2 %
    // per-pair miss probability at exactly J = 0.7 — every gate pair
    // sits high on the S-curve where it is ≈ 0; (b) the maxBucket=1000
    // hot-bucket cap drops no bucket here (hottest combined bucket
    // spans far fewer docs). Regenerating the corpus or raising the
    // gate scale requires re-checking both, exactly as documented for
    // q85's maxDf.
    "q103_incr_neardup" -> incrNearDupOracle,
    "q104_incr_neardup_stages" -> incrNearDupOracle,
    // Real WAV decode: the engine BUILDS canonical RIFF bytes from
    // doc_id-derived parameters and re-reads them by parsing the
    // header; the oracle restates the parameters directly — a parser
    // or writer bug (offset, endianness, block align) breaks the
    // round-trip and goes red. duration = n*1000.0/rate with the same
    // operation order (exact-integer doubles in, identical IEEE out).
    "q105_wav_decode" ->
      """SELECT doc_id,
        | CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        | CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
        | CAST(16 AS INTEGER) AS bits,
        | CAST(doc_id % 997 + 1 AS BIGINT) AS n_samples,
        | round((doc_id % 997 + 1) * 1000.0 /
        |   (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |    WHEN 2 THEN 22050 ELSE 44100 END), 4) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // PQ/ADC: the full product-quantization pipeline recomposed in SQL
    // (per-subspace Lloyd + codes + LUT scan + re-rank) — see pqOracle.
    "q116_pq_topk" -> pqOracle(m = 8, ksub = 16, dsub = 8, iters = 3,
      seed = 4242, k = 5, refine = 20, queryMax = 8),
    // IVF-PQ: both Lloyd builds chained + probe-restricted ADC + re-rank
    "q117_ivfpq_topk" -> ivfPqOracle(nlist = 16, nprobe = 4, m = 8,
      ksub = 16, dsub = 8, iters = 3, coarseSeed = 42, pqSeed = 4242,
      k = 5, refine = 20, queryMax = 8),
    // q137/q138/q139: persisted-fit twins — same results as
    // q53/q116/q117 by the bit-exact parquet round-trip of the fit
    // tensors, so the oracles are the SAME parameterized SQL (the
    // q103/q104 twin convention): a round-trip that altered one
    // coordinate would flip the assignment of some vector and go red.
    "q137_ivf_topk_persist" -> ivfOracle(nlist = 16, nprobe = 4,
      iters = 3, dim = 64, k = 5, seed = 42, queryMax = 8),
    "q138_pq_topk_persist" -> pqOracle(m = 8, ksub = 16, dsub = 8,
      iters = 3, seed = 4242, k = 5, refine = 20, queryMax = 8),
    "q139_ivfpq_topk_persist" -> ivfPqOracle(nlist = 16, nprobe = 4,
      m = 8, ksub = 16, dsub = 8, iters = 3, coarseSeed = 42,
      pqSeed = 4242, k = 5, refine = 20, queryMax = 8),
    // Bigram LM: add-0.5-smoothed P(w2|w1), per-doc mean log10 over
    // bigram occurrences; exact-integer count inputs, the q77 log10/
    // avg/round-4 determinism pattern
    // KMV sketch set algebra: every sketch is a deterministic k-row
    // ascending head over md5 hashes, so the estimates themselves have
    // a closed form — estimate AND exact truth both checked
    "q153_kmv_overlap" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |tri AS (
        | SELECT doc_id,
        |  a[CAST(i AS INTEGER)] || ' ' || a[CAST(i AS INTEGER) + 1] ||
        |   ' ' || a[CAST(i AS INTEGER) + 2] AS w
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 2)) AS i
        |       FROM t WHERE len(a) >= 3) x),
        |sided AS (
        | SELECT DISTINCT
        |  CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
        |    % 100 < 50 AS sa,
        |  CAST(('0x' || substr(md5('kmv:' || w), 1, 15)) AS BIGINT) AS h
        | FROM tri),
        |flags AS (
        | SELECT h, max(CASE WHEN sa THEN 1 ELSE 0 END) AS ina,
        |  max(CASE WHEN NOT sa THEN 1 ELSE 0 END) AS inb
        | FROM sided GROUP BY h),
        |sa_ AS (
        | SELECT count(*) AS c, max(h) / 1152921504606846976.0 AS xk
        | FROM (SELECT h FROM flags WHERE ina = 1 ORDER BY h LIMIT 256) s),
        |sb_ AS (
        | SELECT count(*) AS c, max(h) / 1152921504606846976.0 AS xk
        | FROM (SELECT h FROM flags WHERE inb = 1 ORDER BY h LIMIT 256) s),
        |su_ AS (
        | SELECT count(*) AS c, max(h) / 1152921504606846976.0 AS xk,
        |  sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS rho
        | FROM (SELECT h, ina, inb FROM flags ORDER BY h LIMIT 256) s),
        |ex AS (
        | SELECT CAST(sum(ina) AS BIGINT) AS n_a,
        |  CAST(sum(inb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_union,
        |  CAST(sum(ina * inb) AS BIGINT) AS n_intersect
        | FROM flags)
        |SELECT CAST(256 AS INTEGER) AS k,
        | round(CASE WHEN sa_.c < 256 THEN CAST(sa_.c AS DOUBLE)
        |  ELSE 255.0 / sa_.xk END, 4) AS est_a,
        | round(CASE WHEN sb_.c < 256 THEN CAST(sb_.c AS DOUBLE)
        |  ELSE 255.0 / sb_.xk END, 4) AS est_b,
        | round(CASE WHEN su_.c < 256 THEN CAST(su_.c AS DOUBLE)
        |  ELSE 255.0 / su_.xk END, 4) AS est_union,
        | round(CAST(su_.rho AS DOUBLE) / su_.c, 4) AS est_jaccard,
        | round((CAST(su_.rho AS DOUBLE) / su_.c) *
        |  (CASE WHEN su_.c < 256 THEN CAST(su_.c AS DOUBLE)
        |   ELSE 255.0 / su_.xk END), 4) AS est_intersect,
        | ex.n_a, ex.n_b, ex.n_union, ex.n_intersect
        |FROM sa_, sb_, su_, ex""".stripMargin,
    // USTAR shard round-trip: names/sizes/order are pure functions of
    // the docs, shard length has a closed form, payload md5 = md5(text)
    "q157_tar_shards" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  doc_id || '.txt' AS name,
        |  CAST(strlen(text) AS BIGINT) AS sz, md5(text) AS payload_md5
        | FROM documents),
        |o AS (
        | SELECT shard, doc_id, name, sz, payload_md5,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1
        |   AS INTEGER) AS idx
        | FROM m),
        |s AS (
        | SELECT shard, CAST(count(*) AS INTEGER) AS n_entries,
        |  CAST(sum(512 * (1 + CAST(ceil(sz / 512.0) AS BIGINT))) + 1024
        |   AS BIGINT) AS tar_len
        | FROM o GROUP BY shard)
        |SELECT o.shard, s.n_entries, s.tar_len, o.idx, o.name,
        | o.sz AS size, o.payload_md5
        |FROM o JOIN s USING (shard) ORDER BY shard, idx""".stripMargin,
    // BPE vocabulary learning: the merge elections and the rewritten
    // corpus restate round-by-round as an unrolled CTE chain
    "q160_bpe_merges" -> bpeOracle(6),
    // BPE apply/fertility: same fit chain, per-doc encode tail
    "q164_bpe_encode" -> bpeEncodeOracle(6),
    // BPE round-trip: decode CTEs expand the merge chain in reverse;
    // ok must be TRUE per doc (PUA symbols can't occur in input)
    "q176_bpe_roundtrip" -> bpeRoundtripOracle(6),
    // phrase probe: bigram election + consecutive-position scan both
    // restate over the split arrays
    "q165_phrase_search" ->
      """WITH a AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
        |  AS a FROM documents),
        |b0 AS MATERIALIZED (
        | SELECT doc_id, unnest(generate_series(1, len(a) - 1)) AS i, a
        | FROM a WHERE len(a) >= 2),
        |pr AS (SELECT a[CAST(i AS INTEGER)] AS w1,
        |  a[CAST(i AS INTEGER) + 1] AS w2 FROM b0),
        |bi AS (SELECT w1, w2, count(*) AS cnt FROM pr GROUP BY w1, w2),
        |best AS MATERIALIZED (
        | SELECT w1, w2 FROM bi ORDER BY cnt DESC, w1, w2 LIMIT 1),
        |occ AS (SELECT b0.doc_id, i - 1 AS pos0 FROM b0, best
        | WHERE a[CAST(i AS INTEGER)] = best.w1
        |  AND a[CAST(i AS INTEGER) + 1] = best.w2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        | CAST(min(pos0) AS BIGINT) AS first_pos,
        | (SELECT w1 FROM best) AS w1, (SELECT w2 FROM best) AS w2
        |FROM occ GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Zipf fit: fixed-point regression sums are exact integers; the
    // slope/intercept/R2 ratios evaluate in the same IEEE sequence
    "q166_zipf_fit" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 100),
        |r AS (SELECT cnt,
        |  row_number() OVER (ORDER BY cnt DESC, term) AS rnk FROM top),
        |q AS (SELECT CAST(floor(ln(rnk) * 1000000.0 + 0.5) AS BIGINT) AS x,
        |  CAST(floor(ln(cnt) * 1000000.0 + 0.5) AS BIGINT) AS y FROM r),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(y * y) AS BIGINT) AS syy FROM q),
        |f AS (SELECT n, sx, sy,
        |  CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
        |  CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS denx,
        |  CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS deny
        | FROM s)
        |SELECT n AS n_terms,
        | round(num / denx, 6) AS slope,
        | round((CAST(sy AS DOUBLE) - (num / denx) * sx) / n / 1000000.0, 6)
        |  AS intercept,
        | round(num * num / (denx * deny), 6) AS r2
        |FROM f""".stripMargin,
    // HyperLogLog: register construction is pure integer arithmetic on
    // the shared md5 hash (bucket = h mod 64, rank via minimal-width
    // bin()), the indicator sum stays a 2^55-scaled BIGINT, and only
    // the final alpha*m^2/Z ratio runs in doubles — so the ESTIMATE
    // reproduces bit-for-bit, not just the exact count
    "q167_hll_distinct" ->
      """WITH d0 AS (SELECT lang,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |g AS (SELECT lang, a, unnest(generate_series(1, len(a) - 1)) AS i
        | FROM d0 WHERE len(a) >= 2),
        |bgs AS (SELECT lang,
        |  a[CAST(i AS INTEGER)] || ' ' || a[CAST(i AS INTEGER) + 1] AS bg
        | FROM g),
        |h AS (SELECT lang, bg,
        |  CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) AS hv FROM bgs),
        |r AS (SELECT lang, hv % 64 AS bucket, hv >> 6 AS w FROM h),
        |reg AS (SELECT lang, bucket,
        |  max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS rho
        | FROM r GROUP BY lang, bucket),
        |z AS (SELECT lang, CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER)) AS BIGINT)
        |    AS z_regs
        | FROM reg GROUP BY lang),
        |ex AS (SELECT lang, CAST(count(DISTINCT bg) AS BIGINT) AS n_exact
        | FROM bgs GROUP BY lang),
        |f AS (SELECT z.lang, CAST(64 - nb AS BIGINT) AS v_zero,
        |  z_regs + CAST(64 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 55)
        |    AS z_scaled, n_exact
        | FROM z JOIN ex ON z.lang = ex.lang),
        |e1 AS (SELECT lang, v_zero, z_scaled, n_exact,
        |  CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |    * CAST(36028797018963968 AS DOUBLE)
        |    / CAST(z_scaled AS DOUBLE) AS est_raw
        | FROM f),
        |e2 AS (SELECT lang, v_zero, z_scaled, n_exact,
        |  CASE WHEN est_raw <= 160.0 AND v_zero > 0
        |    THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
        |    ELSE est_raw END AS eu
        | FROM e1)
        |SELECT lang, v_zero, z_scaled, n_exact, round(eu, 4) AS est,
        | round((round(eu, 4) - CAST(n_exact AS DOUBLE))
        |   / CAST(n_exact AS DOUBLE), 6) AS rel_err
        |FROM e2 ORDER BY lang""".stripMargin,
    // k-center coreset: chained-CTE greedy replay, rank-only compare
    "q201_kcenter_coreset" -> kcenterOracle(8),
    // Aho-Corasick counts re-derived by brute-force position scan —
    // overlapping occurrences, unlike replace-based counting
    "q202_multi_match" ->
      """WITH pats(p) AS (VALUES ('a'), ('an'), ('scan'), ('in'),
        |  ('join'), ('ta'), ('data'), ('batch batch'), ('rde')),
        |m AS (
        | SELECT d.doc_id, p.p AS pattern,
        |  CAST(len(list_filter(
        |    generate_series(1, greatest(0, length(d.text) - length(p.p) + 1)),
        |    j -> substr(d.text, CAST(j AS INTEGER), length(p.p)) = p.p))
        |   AS BIGINT) AS n_occ
        | FROM documents d, pats p)
        |SELECT doc_id, pattern, n_occ FROM m WHERE n_occ > 0
        |ORDER BY doc_id, pattern""".stripMargin,
    // Goertzel: the recursive CTE replays the exact integer recurrence
    // (fixed-point literal coefficients, power-of-two floor division)
    // over the md5 closed-form PCM samples, state for all 4 bins in
    // one walk; bins named a/b/c/e (d collides with nothing but stay
    // clear of reserved-ish names)
    "q200_goertzel_tones" ->
      """WITH RECURSIVE g AS (
        | SELECT doc_id, 0 AS j,
        |  CAST(0 AS BIGINT) AS a1, CAST(0 AS BIGINT) AS a2,
        |  CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2,
        |  CAST(0 AS BIGINT) AS c1, CAST(0 AS BIGINT) AS c2,
        |  CAST(0 AS BIGINT) AS e1, CAST(0 AS BIGINT) AS e2
        | FROM documents WHERE doc_id % 97 >= 12
        | UNION ALL
        | SELECT doc_id, j + 1,
        |  x + CAST(floor(CAST(30274 * a1 AS DOUBLE) / 16384) AS BIGINT) - a2, a1,
        |  x + CAST(floor(CAST(23170 * b1 AS DOUBLE) / 16384) AS BIGINT) - b2, b1,
        |  x + CAST(floor(CAST(12540 * c1 AS DOUBLE) / 16384) AS BIGINT) - c2, c1,
        |  x - e2, e1
        | FROM (
        |  SELECT doc_id, j, a1, a2, b1, b2, c1, c2, e1, e2,
        |   u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS x
        |  FROM (
        |   SELECT doc_id, j, a1, a2, b1, b2, c1, c2, e1, e2,
        |    CAST(('0x' || substr(md5('pcm:' || doc_id || ':' || j), 1, 8))
        |      AS BIGINT) % 65536 AS u
        |   FROM g WHERE j < 16) s0) s1)
        |,pw AS (
        | SELECT doc_id,
        |  a1*a1 + a2*a2
        |   - CAST(floor(CAST(30274 * a1 * a2 AS DOUBLE) / 16384) AS BIGINT) AS p1,
        |  b1*b1 + b2*b2
        |   - CAST(floor(CAST(23170 * b1 * b2 AS DOUBLE) / 16384) AS BIGINT) AS p2,
        |  c1*c1 + c2*c2
        |   - CAST(floor(CAST(12540 * c1 * c2 AS DOUBLE) / 16384) AS BIGINT) AS p3,
        |  e1*e1 + e2*e2 AS p4
        | FROM g WHERE j = 16)
        |SELECT doc_id, p1, p2, p3, p4,
        | CAST(CASE WHEN p1 >= p2 AND p1 >= p3 AND p1 >= p4 THEN 1
        |  WHEN p2 >= p3 AND p2 >= p4 THEN 2
        |  WHEN p3 >= p4 THEN 3 ELSE 4 END AS INTEGER) AS dominant_bin
        |FROM pw ORDER BY doc_id""".stripMargin,
    // q-digest quantiles, the q52 sketch-facts pattern: exact stats +
    // all-true bound proofs; sketch internals stay engine-specific
    "q199_qdigest_quantiles" ->
      """WITH t AS (
        | SELECT lang,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |   AS BIGINT) AS v
        | FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | round(quantile_cont(v, 0.5), 4) AS p50_exact,
        | round(quantile_cont(v, 0.9), 4) AS p90_exact,
        | round(quantile_cont(v, 0.99), 4) AS p99_exact,
        | true AS p50_in_bound, true AS p90_in_bound,
        | true AS p99_in_bound, true AS size_bounded
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // NFC audit: DuckDB's utf8proc nfc_normalize vs the engine's JDK
    // Normalizer — the digest of the NORMALIZED text only matches if
    // both compose identically; chr() picks the planted combining
    // marks by code point
    "q198_nfc_audit" ->
      """WITH r AS (
        | SELECT lang,
        |  text || CASE WHEN doc_id % 4 = 0 THEN ''
        |    WHEN doc_id % 3 = 0 THEN ' e' || chr(769)
        |    WHEN doc_id % 3 = 1 THEN ' A' || chr(778)
        |    ELSE ' n' || chr(771) END AS raw
        | FROM documents),
        |n AS (SELECT lang, raw, nfc_normalize(raw) AS norm FROM r)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN raw = norm THEN 0 ELSE 1 END) AS BIGINT)
        |   AS n_denorm,
        | CAST(sum(length(raw)) AS BIGINT) AS sum_len_raw,
        | CAST(sum(length(norm)) AS BIGINT) AS sum_len_nfc,
        | CAST(sum(CAST(('0x' || substr(md5(norm), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM n GROUP BY lang ORDER BY lang""".stripMargin,
    // ORC round-trip: parquet-truth oracle; the WHERE mirrors the
    // predicate the engine pushes into the ORC scan
    "q197_orc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id,
        | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM documents WHERE n_chars >= 120
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // JSONL round-trip: the oracle reads the PARQUET truth — equality
    // proves the export+re-ingest moved every byte
    // URL canonicalization: the oracle replants and re-canonicalizes
    // with DuckDB's own string/list functions (split_part/list_sort/
    // list_filter), so the digest only matches if both engines land on
    // byte-identical canonical forms
    "q218_url_canonical" ->
      """WITH u AS (
        | SELECT doc_id, lang,
        |  'https://WWW.' || upper(source) || '.Example.COM:443/' || lang
        |   || '/doc/' || CAST(doc_id % 50 AS VARCHAR)
        |   || '?utm_source=feed&utm_ref=' || CAST(doc_id % 7 AS VARCHAR)
        |   || '&b=2&a=1#frag' AS url
        | FROM documents),
        |p AS (
        | SELECT lang, url,
        |  split_part(split_part(url, '#', 1), '?', 1) AS pre,
        |  split_part(split_part(url, '#', 1), '?', 2) AS q
        | FROM u),
        |p2 AS (
        | SELECT lang, url, q, substr(pre, 9) AS rest,
        |  split_part(substr(pre, 9), '/', 1) AS hostport
        | FROM p),
        |c AS (
        | SELECT lang, url,
        |  'https://' || regexp_replace(lower(hostport), ':443$', '')
        |   || substr(rest, length(hostport) + 1) || '?'
        |   || array_to_string(list_sort(list_filter(string_split(q, '&'),
        |        x -> NOT starts_with(x, 'utm_'))), '&') AS canon
        | FROM p2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
        | CAST(count(DISTINCT canon) AS BIGINT) AS n_canon_distinct,
        | CAST(sum(CAST(('0x' || substr(md5(canon), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS canon_sum
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    // MAD outliers: median/MAD via quantile_cont (percentile parity),
    // both 4-dp-pinned BEFORE the modified-z compare
    "q219_mad_outliers" ->
      """WITH li AS (
        | SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q
        | FROM lineitem),
        |med AS (
        | SELECT l_returnflag, round(quantile_cont(q, 0.5), 4) AS med
        | FROM li GROUP BY 1),
        |mad AS (
        | SELECT li.l_returnflag,
        |  round(quantile_cont(abs(q - med), 0.5), 4) AS mad
        | FROM li JOIN med USING (l_returnflag)
        | GROUP BY li.l_returnflag)
        |SELECT li.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | max(med) AS med, max(mad) AS mad,
        | CAST(sum(CASE WHEN abs(0.6745 * (q - med) / mad) > 3.5
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM li JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,
    // temporal split: membership flags per user, leak = shared with a
    // LATER split
    "q220_temporal_split" ->
      """WITH e AS (
        | SELECT user_id,
        |  CASE WHEN CAST(ts AS DATE) < DATE '2024-01-20' THEN '1_train'
        |       WHEN CAST(ts AS DATE) < DATE '2024-01-25' THEN '2_val'
        |       ELSE '3_test' END AS split
        | FROM events),
        |ps AS (
        | SELECT split, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        | FROM e GROUP BY 1),
        |m AS (
        | SELECT user_id,
        |  max(CASE WHEN split = '1_train' THEN 1 ELSE 0 END) AS t,
        |  max(CASE WHEN split = '2_val' THEN 1 ELSE 0 END) AS v,
        |  max(CASE WHEN split = '3_test' THEN 1 ELSE 0 END) AS x
        | FROM e GROUP BY 1),
        |lk AS (
        | SELECT
        |  CAST(sum(CASE WHEN t = 1 AND (v = 1 OR x = 1) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tl,
        |  CAST(sum(CASE WHEN v = 1 AND x = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vl
        | FROM m),
        |lv(split, n_leaked_users) AS (
        | SELECT '1_train', tl FROM lk
        | UNION ALL SELECT '2_val', vl FROM lk
        | UNION ALL SELECT '3_test', CAST(0 AS BIGINT))
        |SELECT ps.split, n_events, n_users, n_leaked_users
        |FROM ps JOIN lv ON ps.split = lv.split
        |ORDER BY ps.split""".stripMargin,
    // calibration: md5-derived scores, exact bin arithmetic, globals
    // repeated per row (one result shape)
    "q221_calibration_bins" ->
      """WITH s AS (
        | SELECT CAST(('0x' || substr(md5('cal:' || vec_id), 1, 4))
        |   AS BIGINT) / 65536.0 AS score,
        |  CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS pos
        | FROM embeddings),
        |b AS (
        | SELECT CAST(floor(score * 10) AS INTEGER) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  avg(score) AS conf_raw, avg(pos) AS acc_raw,
        |  sum((score - pos) * (score - pos)) AS sqerr
        | FROM s GROUP BY 1),
        |g AS (
        | SELECT round(sum(sqerr) / sum(n), 4) AS brier,
        |  round(sum(n * abs(acc_raw - conf_raw)) / sum(n), 4) AS ece
        | FROM b)
        |SELECT bin, n, round(conf_raw, 4) AS mean_score,
        | round(acc_raw, 4) AS frac_pos, brier, ece
        |FROM b, g ORDER BY bin""".stripMargin,
    // KS: integer-exact numerator over the distinct value grid
    "q222_ks_stat" ->
      """WITH v AS (
        | SELECT n_chars,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        | FROM documents WHERE lang IN ('en', 'fr') GROUP BY 1),
        |c AS (
        | SELECT ca, cb,
        |  sum(ca) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cuma,
        |  sum(cb) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cumb
        | FROM v),
        |t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM v)
        |SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
        | CAST(max(abs(cuma * t.n_b - cumb * t.n_a)) AS BIGINT) AS d_num,
        | round(CAST(max(abs(cuma * t.n_b - cumb * t.n_a)) AS DOUBLE)
        |   / (t.n_a * t.n_b), 4) AS ks
        |FROM c, t GROUP BY t.n_a, t.n_b""".stripMargin,
    // STL anomaly: q241's remainder CTEs + the q219 robust rule
    "q244_stl_anomaly" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |t AS (
        | SELECT day, x,
        |  CASE WHEN count(*) OVER w = 7
        |   THEN round(avg(x) OVER w, 4) END AS trend,
        |  CAST((day - DATE '2024-01-01') % 7 AS INTEGER) AS dow
        | FROM daily
        | WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT day, x, trend, dow, x - trend AS det FROM t),
        |sr AS (SELECT dow, avg(det) AS s_raw FROM d
        |       WHERE det IS NOT NULL GROUP BY 1),
        |sm AS (SELECT avg(s_raw) AS s_mean FROM sr),
        |se AS (SELECT dow, round(s_raw - sm.s_mean, 4) AS seasonal
        |       FROM sr, sm),
        |r AS (
        | SELECT d.day, round(d.x - d.trend - se.seasonal, 4) AS remainder
        | FROM d LEFT JOIN se ON d.dow = se.dow
        | WHERE d.trend IS NOT NULL),
        |med AS (SELECT round(quantile_cont(remainder, 0.5), 4) AS med FROM r),
        |mad AS (
        | SELECT round(quantile_cont(abs(remainder - med), 0.5), 4) AS mad
        | FROM r, med)
        |SELECT r.day, r.remainder,
        | round(0.6745 * (r.remainder - med.med) / mad.mad, 4) AS robust_z,
        | abs(0.6745 * (r.remainder - med.med) / mad.mad) > 3.5 AS is_anomaly
        |FROM r, med, mad ORDER BY r.day""".stripMargin,
    // fanout audit: per-key multiplicity histogram + exact join
    // cardinality prediction
    "q245_fanout_audit" ->
      """WITH f AS (
        | SELECT l_orderkey, CAST(count(*) AS BIGINT) AS fanout
        | FROM lineitem GROUP BY 1),
        |h AS (SELECT fanout, CAST(count(*) AS BIGINT) AS n_keys
        |      FROM f GROUP BY 1),
        |t AS (SELECT CAST(max(fanout) AS BIGINT) AS max_fanout,
        |      CAST(sum(fanout) AS BIGINT) AS join_output_rows FROM f)
        |SELECT h.fanout, h.n_keys, t.max_fanout, t.join_output_rows
        |FROM h, t ORDER BY h.fanout""".stripMargin,
    // mutual information: joint histogram once, marginals/total as
    // window sums over the tiny cell frame; contribs 4-dp-pinned
    // before the mi_total sum
    "q246_mutual_info" ->
      """WITH j AS (
        | SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        | FROM documents GROUP BY 1, 2),
        |c AS (
        | SELECT lang, source, n_xy,
        |  sum(n_xy) OVER () AS n,
        |  sum(n_xy) OVER (PARTITION BY lang) AS n_x,
        |  sum(n_xy) OVER (PARTITION BY source) AS n_y
        | FROM j),
        |p AS (
        | SELECT lang, source, n_xy,
        |  round(ln(n_xy * 1.0 * n / (n_x * 1.0 * n_y)), 4) AS pmi,
        |  round((n_xy * 1.0 / n) *
        |        ln(n_xy * 1.0 * n / (n_x * 1.0 * n_y)), 4) AS contrib
        | FROM c)
        |SELECT lang, source, n_xy, pmi, contrib,
        | round(sum(contrib) OVER (), 4) AS mi_total
        |FROM p ORDER BY lang, source""".stripMargin,
    // mean shift: symmetric ROWS frames over the daily count, edge
    // days filtered after the window pass
    "q247_mean_shift" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |w AS (
        | SELECT day, x,
        |  count(*) OVER wpre AS n_pre, count(*) OVER wpost AS n_post,
        |  round(avg(x) OVER wpre, 4) AS pre,
        |  round(avg(x) OVER wpost, 4) AS post
        | FROM daily
        | WINDOW
        |  wpre AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
        |  wpost AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING))
        |SELECT day, CAST(x AS BIGINT) AS n_events, pre, post,
        | round(post - pre, 4) AS shift,
        | abs(round(post - pre, 4)) > 0.25 * pre AS is_shift
        |FROM w WHERE n_pre = 7 AND n_post = 7 ORDER BY day""".stripMargin,
    // Theil-Sen: median pairwise slope over the daily frame, slope
    // 4-dp-pinned before the intercept median
    "q248_theil_sen" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |d AS (SELECT (day - DATE '2024-01-01') * 1.0 AS d, x FROM daily),
        |p AS (SELECT (b.x - a.x) / (b.d - a.d) AS slope
        |      FROM d a JOIN d b ON a.d < b.d),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       round(quantile_cont(slope, 0.5), 4) AS slope FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        | max(f.n_pairs) AS n_pairs, max(f.slope) AS slope,
        | round(quantile_cont(d.x - f.slope * d.d, 0.5), 4) AS intercept
        |FROM d, f""".stripMargin,
    // compressibility proxy: distinct-trigram ratio deciles (deflate
    // itself is not DuckDB-statable; the shingle-novelty ratio is the
    // same curation signal and restates exactly on both sides)
    "q249_compressibility" ->
      """WITH pos AS (
        | SELECT doc_id, strlen(text) AS raw_bytes, text,
        |  unnest(generate_series(1, length(text) - 2)) AS i
        | FROM documents WHERE length(text) >= 3),
        |sh AS (
        | SELECT doc_id, raw_bytes,
        |  CAST(count(DISTINCT substring(text, CAST(i AS INTEGER), 3))
        |    AS DOUBLE) / count(*) AS ratio
        | FROM pos GROUP BY doc_id, raw_bytes)
        |SELECT least(CAST(floor(ratio * 10) AS INTEGER), 9)
        |  AS ratio_decile,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | round(avg(ratio), 4) AS mean_ratio,
        | round(avg(raw_bytes), 2) AS mean_bytes
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,
    // blocked JW linkage: distinct names per (brand,size) block,
    // in-block pairs scored with the engine's own jaro_winkler
    // (byte-level, boost 0.7 — semantics pinned in StatsWaveSpec),
    // 4-dp pinned before threshold and rank
    "q250_record_linkage" ->
      """WITH n AS (
        | SELECT DISTINCT p_brand, p_size, p_name AS name
        | FROM part WHERE p_name IS NOT NULL),
        |p AS (
        | SELECT a.p_brand AS brand, a.name AS name_a, b.name AS name_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
        | FROM n a JOIN n b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |   AND a.name < b.name),
        |r AS (
        | SELECT brand, name_a, name_b, jw,
        |  CAST(row_number() OVER (
        |   PARTITION BY brand ORDER BY jw DESC, name_a, name_b)
        |   AS BIGINT) AS rnk
        | FROM p WHERE jw >= 0.8)
        |SELECT brand, name_a, name_b, jw, rnk
        |FROM r WHERE rnk <= 5 ORDER BY brand, rnk""".stripMargin,
    // Spearman: fractional (average) ranks via min-rank + (ties-1)/2,
    // avg_value 6-dp-pinned before ranking so tie groups align
    "q251_spearman" ->
      """WITH u AS (
        | SELECT user_id, CAST(count(*) AS DOUBLE) AS n_events,
        |  round(avg(value), 6) AS avg_value
        | FROM events GROUP BY 1),
        |r AS (
        | SELECT n_events, avg_value,
        |  rank() OVER (ORDER BY n_events) +
        |   (count(*) OVER (PARTITION BY n_events) - 1) / 2.0 AS rx,
        |  rank() OVER (ORDER BY avg_value) +
        |   (count(*) OVER (PARTITION BY avg_value) - 1) / 2.0 AS ry
        | FROM u)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        | round(corr(rx, ry), 4) AS rho_spearman,
        | round(corr(n_events, avg_value), 4) AS rho_pearson
        |FROM r""".stripMargin,
    // Kendall tau-b on the daily frame: sign counts over all day
    // pairs; days are distinct so ties occur only in x
    "q252_kendall_tau" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |d AS (SELECT (day - DATE '2024-01-01') * 1.0 AS d, x FROM daily),
        |p AS (
        | SELECT sign(b.x - a.x) AS sgn
        | FROM d a JOIN d b ON a.d < b.d),
        |c AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS discordant,
        |  CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS ties_x
        | FROM p)
        |SELECT n_pairs, concordant, discordant, ties_x,
        | round((concordant - discordant) * 1.0 /
        |  sqrt((n_pairs - ties_x) * 1.0 * n_pairs), 4) AS tau_b
        |FROM c""".stripMargin,
    // Welch t per source vs rest, all moments from exact integer sums
    "q253_welch_ttest" ->
      """WITH g AS (
        | SELECT source, CAST(count(*) AS DOUBLE) AS n_g,
        |  sum(CAST(n_chars AS DOUBLE)) AS s_g,
        |  sum(CAST(n_chars AS DOUBLE) * n_chars) AS ss_g
        | FROM documents GROUP BY 1),
        |t AS (
        | SELECT source, n_g, s_g, ss_g,
        |  sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
        |  sum(ss_g) OVER () AS ss
        | FROM g),
        |d AS (
        | SELECT source, n_g,
        |  s_g / n_g AS mean_g,
        |  (ss_g - s_g * s_g / n_g) / (n_g - 1) AS var_g,
        |  n - n_g AS n_c,
        |  (s - s_g) / (n - n_g) AS mean_c,
        |  (ss - ss_g - (s - s_g) * (s - s_g) / (n - n_g)) / (n - n_g - 1)
        |   AS var_c
        | FROM t),
        |v AS (
        | SELECT source, n_g, mean_g, mean_c,
        |  var_g / n_g AS va, var_c / n_c AS vb, n_c
        | FROM d)
        |SELECT source, CAST(n_g AS BIGINT) AS n_docs,
        | round(mean_g, 4) AS mean_src, round(mean_c, 4) AS mean_rest,
        | round((mean_g - mean_c) / sqrt(va + vb), 4) AS t_stat,
        | round(pow(va + vb, 2) /
        |  (pow(va, 2) / (n_g - 1) + pow(vb, 2) / (n_c - 1)), 4)
        |  AS df_welch
        |FROM v ORDER BY source""".stripMargin,
    // one-way ANOVA F from the same exact group sums
    "q254_anova_f" ->
      """WITH g AS (
        | SELECT source, CAST(count(*) AS DOUBLE) AS n_g,
        |  sum(CAST(n_chars AS DOUBLE)) AS s_g,
        |  sum(CAST(n_chars AS DOUBLE) * n_chars) AS ss_g
        | FROM documents GROUP BY 1),
        |t AS (
        | SELECT n_g, s_g, ss_g,
        |  sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
        |  sum(ss_g) OVER () AS ss,
        |  CAST(count(*) OVER () AS DOUBLE) AS k
        | FROM g),
        |c AS (
        | SELECT n, k,
        |  sum(n_g * pow(s_g / n_g - s / n, 2)) OVER () AS ssb,
        |  sum(ss_g - s_g * s_g / n_g) OVER () AS ssw
        | FROM t LIMIT 1)
        |SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_docs,
        | CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
        | round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
        | round(ssb / (ssb + ssw), 4) AS eta_sq
        |FROM c""".stripMargin,
    // Within-doc block dedup: q297's CTEs with per-(doc, block) firsts
    "q316_intradoc_dedup" ->
      """WITH toks AS (
        | SELECT doc_id, source,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |b AS (
        | SELECT doc_id, source, i AS pos,
        |  array_to_string(list_slice(a, i*10+1, i*10+10), ' ') AS blk,
        |  least(10, len(a) - i*10) AS btoks
        | FROM (SELECT doc_id, source, a, unnest(generate_series(0,
        |        CAST(ceil(len(a)/10.0) AS INTEGER) - 1)) AS i
        |       FROM toks) t),
        |f AS (SELECT doc_id, blk, min(pos) AS f_pos
        |      FROM b GROUP BY 1, 2),
        |m AS (
        | SELECT b.source, b.doc_id, b.btoks, (b.pos <> f.f_pos) AS dup
        | FROM b JOIN f ON f.doc_id = b.doc_id AND f.blk = b.blk)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_blocks,
        | CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dup,
        | round(CAST(count(*) FILTER (WHERE dup) AS DOUBLE) / count(*), 4)
        |   AS dup_rate,
        | CAST(sum(btoks) AS BIGINT) AS toks_total,
        | CAST(coalesce(sum(btoks) FILTER (WHERE dup), 0) AS BIGINT)
        |   AS toks_dropped,
        | round(1.0 - CAST(coalesce(sum(btoks) FILTER (WHERE dup), 0)
        |     AS DOUBLE) / sum(btoks), 4) AS keep_rate,
        | CAST(count(DISTINCT CASE WHEN dup THEN doc_id END) AS BIGINT)
        |   AS n_docs_hit
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // Confusion matrix over the q26 classifier CASE vs the label
    "q317_langid_confusion" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        | FROM documents),
        |s AS (SELECT doc_id, lang,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t),
        |p AS (
        | SELECT lang, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        |  WHEN s_fr >= s_pt THEN 'fr'
        |  ELSE 'pt' END AS lang_pred
        | FROM s),
        |c AS (SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2),
        |lt AS (SELECT lang, sum(n) AS label_total FROM c GROUP BY 1)
        |SELECT c.lang, c.lang_pred, CAST(c.n AS BIGINT) AS n,
        | CAST(lt.label_total AS BIGINT) AS label_total,
        | round(CAST(c.n AS DOUBLE) / lt.label_total, 4) AS share,
        | (c.lang = c.lang_pred) AS is_correct
        |FROM c JOIN lt ON lt.lang = c.lang
        |ORDER BY c.lang, c.lang_pred""".stripMargin,
    // SRT timeline facts straight from the cue closed form; parse_ok
    // asserts the engine's parser recovered every planted cue
    "q318_srt_roundtrip" ->
      """WITH p AS (
        | SELECT doc_id, CAST(3 + doc_id % 5 AS BIGINT) AS nc
        | FROM documents),
        |cue AS (
        | SELECT doc_id, nc, unnest(generate_series(0, nc - 1)) AS i
        | FROM p),
        |v AS (
        | SELECT doc_id, nc, i,
        |  i * 4000 + CAST(('0x' || substr(md5('srt:' || doc_id || ':' ||
        |    i), 1, 8)) AS BIGINT) % 1000 AS st,
        |  i * 4000 + CAST(('0x' || substr(md5('srt:' || doc_id || ':' ||
        |    i), 1, 8)) AS BIGINT) % 1000
        |   + 1200 + CAST(('0x' || substr(md5('srtd:' || doc_id || ':' ||
        |    i), 1, 8)) AS BIGINT) % 2500 AS en
        | FROM cue),
        |l AS (SELECT doc_id, nc, i, st, en,
        |       lead(st) OVER (PARTITION BY doc_id ORDER BY i) AS ns,
        |       lag(en) OVER (PARTITION BY doc_id ORDER BY i) AS pe
        |      FROM v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cues,
        | CAST(sum(en - st) AS BIGINT) AS caption_ms,
        | CAST(count(*) FILTER (WHERE ns IS NOT NULL AND en > ns)
        |   AS BIGINT) AS n_overlaps,
        | CAST(count(*) FILTER (WHERE pe IS NOT NULL AND st - pe > 2000)
        |   AS BIGINT) AS n_gaps_2s,
        | true AS parse_ok
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    // License taint through the q49 recursive-CTE components
    "q319_license_propagation" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, min(dst) AS comp
        |         FROM reach GROUP BY src),
        |d AS (
        | SELECT dd.doc_id, dd.source,
        |  CASE WHEN CAST(substring(dd.source, 4) AS INTEGER) % 5 = 0
        |   THEN 1 ELSE 0 END AS direct,
        |  coalesce(c.comp, dd.doc_id) AS comp
        | FROM documents dd LEFT JOIN comp c ON c.doc_id = dd.doc_id),
        |t AS (SELECT comp, max(direct) AS tainted FROM d GROUP BY 1)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(d.direct) AS BIGINT) AS n_direct,
        | CAST(sum(CASE WHEN d.direct = 0 AND t.tainted = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inherited,
        | round(1.0 - CAST(sum(d.direct) + sum(CASE WHEN d.direct = 0
        |      AND t.tainted = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 4) AS clear_rate
        |FROM d JOIN t ON t.comp = d.comp
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // Temperature sampling weights: 6-dp-pinned shares before pow
    "q320_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM c),
        |p AS (SELECT lang, c, round(CAST(c AS DOUBLE) / n.n, 6) AS p
        |      FROM c, n),
        |a AS (SELECT unnest([0.2, 0.5, 1.0]) AS alpha),
        |b AS (SELECT lang, c, p, alpha, pow(p, alpha) AS pa FROM p, a),
        |z AS (SELECT alpha, sum(pa) AS z FROM b GROUP BY 1)
        |SELECT b.lang, b.alpha, CAST(b.c AS BIGINT) AS n_docs, b.p,
        | round(b.pa / z.z, 4) AS w,
        | round(b.pa / z.z / b.p, 4) AS boost
        |FROM b JOIN z ON b.alpha = z.alpha
        |ORDER BY b.lang, b.alpha""".stripMargin,
    // Digest-localized snapshot diff: only buckets whose digest moved
    "q321_digest_diff" ->
      """WITH base AS (
        | SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS c
        | FROM orders),
        |merged AS (
        | SELECT k, CASE WHEN k % 983 = 0 THEN 'U' ELSE st END AS st,
        |  CASE WHEN k % 983 = 0 THEN c + 1000 ELSE c END AS c
        | FROM base WHERE k % 977 <> 0
        | UNION ALL
        | SELECT k + 10000000, st, c FROM base WHERE k % 991 = 0),
        |da AS (
        | SELECT k % 64 AS bucket, count(*) AS rows_a,
        |  CAST(sum(CAST(('0x' || substr(md5('o:' || k || ':' || st ||
        |    ':' || c), 1, 10)) AS BIGINT)) AS BIGINT) AS dig_a
        | FROM base GROUP BY 1),
        |db AS (
        | SELECT k % 64 AS bucket, count(*) AS rows_b,
        |  CAST(sum(CAST(('0x' || substr(md5('o:' || k || ':' || st ||
        |    ':' || c), 1, 10)) AS BIGINT)) AS BIGINT) AS dig_b
        | FROM merged GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        | CAST(coalesce(rows_a, 0) AS BIGINT) AS rows_a,
        | CAST(coalesce(rows_b, 0) AS BIGINT) AS rows_b,
        | CAST(coalesce(rows_b, 0) - coalesce(rows_a, 0) AS BIGINT)
        |  AS row_delta
        |FROM da FULL OUTER JOIN db USING (bucket)
        |WHERE coalesce(dig_a, 0) <> coalesce(dig_b, 0)
        |ORDER BY bucket""".stripMargin,
    // Cohen's kappa over the q26 classifier vs the label: one ratio
    // of exact integer cross-products
    "q322_cohens_kappa" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        | FROM documents),
        |s AS (SELECT doc_id, lang,
        | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
        | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
        | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
        | FROM t),
        |p AS (
        | SELECT lang, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
        |  WHEN s_fr >= s_pt THEN 'fr'
        |  ELSE 'pt' END AS pred
        | FROM s),
        |c AS (SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2),
        |r AS (SELECT lang AS l, sum(n) AS rn FROM c GROUP BY 1),
        |k AS (SELECT pred AS l, sum(n) AS cn FROM c GROUP BY 1),
        |m AS (
        | SELECT CAST(sum(coalesce(rn, 0) * coalesce(cn, 0)) AS BIGINT)
        |   AS src
        | FROM r FULL OUTER JOIN k USING (l)),
        |d AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |       CAST(sum(CASE WHEN lang = pred THEN n ELSE 0 END)
        |         AS BIGINT) AS sdiag FROM c)
        |SELECT nn AS n_docs, sdiag AS n_agree,
        | round(CAST(sdiag AS DOUBLE) / nn, 4) AS po,
        | round(CAST(src AS DOUBLE) / (nn * nn), 4) AS pe,
        | round(CAST(nn * sdiag - src AS DOUBLE)
        |   / CAST(nn * nn - src AS DOUBLE), 4) AS kappa
        |FROM d, m""".stripMargin,
    // CCF at lags -7..+7 between the click and purchase daily counts
    "q255_ccf_daily" ->
      """WITH x AS (
        | SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INT) AS d,
        |  CAST(count(*) AS DOUBLE) AS x
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |y AS (
        | SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INT) AS d,
        |  CAST(count(*) AS DOUBLE) AS y
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT CAST(range AS INT) AS lag FROM range(-7, 8))
        |SELECT l.lag, CAST(count(*) AS BIGINT) AS n_days,
        | round(corr(x.x, y.y), 4) AS ccf
        |FROM x CROSS JOIN l JOIN y ON y.d = x.d + l.lag
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-source language diversity: Shannon, Simpson, exp(H)
    "q256_diversity" ->
      """WITH cells AS (
        | SELECT source, lang, CAST(count(*) AS DOUBLE) AS c
        | FROM documents GROUP BY 1, 2),
        |p AS (
        | SELECT source, c, sum(c) OVER (PARTITION BY source) AS tot
        | FROM cells)
        |SELECT source, CAST(max(tot) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_langs,
        | round(-sum(c / tot * ln(c / tot)), 4) AS shannon,
        | round(sum((c / tot) * (c / tot)), 4) AS simpson,
        | round(exp(-sum(c / tot * ln(c / tot))), 4) AS eff_langs
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // dHash closed form: the engine really decodes the PNG; the oracle
    // recomputes the 9×8 NN grid straight from the generator's md5
    // pixel formula — grid point (x,y) samples raster index
    // (y·h/8)·w + (x·w/9) (integer floor), gray = r+g+b, bit k=y·8+x
    // set iff gray(x,y) > gray(x+1,y), bands little-endian 16-bit
    "q258_image_dhash" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 12 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 9 + 5 AS BIGINT) AS h
        | FROM documents),
        |gx AS (
        | SELECT doc_id, w, h, unnest(generate_series(0, 8)) AS x
        | FROM dims),
        |grid AS (
        | SELECT doc_id, w, h, x, unnest(generate_series(0, 7)) AS y
        | FROM gx),
        |pix AS (
        | SELECT doc_id, x, y,
        |  ((y * h) // 8) * w + ((x * w) // 9) AS p
        | FROM grid),
        |gray AS (
        | SELECT doc_id, x, y,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p + 1)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p + 2)), 1, 8))
        |    AS BIGINT) % 256 AS g
        | FROM pix),
        |bits AS (
        | SELECT a.doc_id, (a.y * 8 + a.x) AS k,
        |  CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
        | FROM gray a JOIN gray b
        |  ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
        | WHERE a.x < 8)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN k < 16 THEN bit * (1 << (k % 16)) ELSE 0 END)
        |  AS INT) AS b0,
        | CAST(sum(CASE WHEN k >= 16 AND k < 32 THEN bit * (1 << (k % 16))
        |  ELSE 0 END) AS INT) AS b1,
        | CAST(sum(CASE WHEN k >= 32 AND k < 48 THEN bit * (1 << (k % 16))
        |  ELSE 0 END) AS INT) AS b2,
        | CAST(sum(CASE WHEN k >= 48 THEN bit * (1 << (k % 16)) ELSE 0 END)
        |  AS INT) AS b3
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // image near-dup: same closed form over original + clamped
    // +8-brightness planted copies, banded candidates, Hamming <= 10
    "q259_image_neardup" ->
      """WITH imgs AS (
        | SELECT doc_id * 2 AS img_id, doc_id, 0 AS delta FROM documents
        | UNION ALL
        | SELECT doc_id * 2 + 1, doc_id, 8 FROM documents
        | WHERE doc_id % 17 = 0),
        |dims AS (
        | SELECT img_id, doc_id, delta,
        |  CAST(doc_id % 12 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 9 + 5 AS BIGINT) AS h
        | FROM imgs),
        |gx AS (
        | SELECT img_id, doc_id, delta, w, h,
        |  unnest(generate_series(0, 8)) AS x
        | FROM dims),
        |grid AS (
        | SELECT img_id, doc_id, delta, w, h, x,
        |  unnest(generate_series(0, 7)) AS y
        | FROM gx),
        |pix AS (
        | SELECT img_id, doc_id, delta, x, y,
        |  ((y * h) // 8) * w + ((x * w) // 9) AS p
        | FROM grid),
        |gray AS (
        | SELECT img_id, x, y,
        |  least(255, CAST(('0x' || substr(md5('png:' || doc_id || ':' ||
        |    (3*p)), 1, 8)) AS BIGINT) % 256 + delta) +
        |  least(255, CAST(('0x' || substr(md5('png:' || doc_id || ':' ||
        |    (3*p + 1)), 1, 8)) AS BIGINT) % 256 + delta) +
        |  least(255, CAST(('0x' || substr(md5('png:' || doc_id || ':' ||
        |    (3*p + 2)), 1, 8)) AS BIGINT) % 256 + delta) AS g
        | FROM pix),
        |bits AS (
        | SELECT a.img_id, (a.y * 8 + a.x) AS k,
        |  CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
        | FROM gray a JOIN gray b
        |  ON a.img_id = b.img_id AND b.y = a.y AND b.x = a.x + 1
        | WHERE a.x < 8),
        |bands AS (
        | SELECT img_id,
        |  CAST(sum(CASE WHEN k < 16 THEN bit * (1 << (k % 16)) ELSE 0 END)
        |   AS INT) AS b0,
        |  CAST(sum(CASE WHEN k >= 16 AND k < 32 THEN bit * (1 << (k % 16))
        |   ELSE 0 END) AS INT) AS b1,
        |  CAST(sum(CASE WHEN k >= 32 AND k < 48 THEN bit * (1 << (k % 16))
        |   ELSE 0 END) AS INT) AS b2,
        |  CAST(sum(CASE WHEN k >= 48 THEN bit * (1 << (k % 16)) ELSE 0 END)
        |   AS INT) AS b3
        | FROM bits GROUP BY img_id),
        |ex AS (
        | SELECT img_id, unnest([b0, b1, b2, b3]) AS v,
        |  unnest([0, 1, 2, 3]) AS band
        | FROM bands),
        |cand AS (
        | SELECT a.img_id AS id_a, b.img_id AS id_b,
        |  CAST(count(*) AS INT) AS n_bands
        | FROM ex a JOIN ex b ON a.band = b.band AND a.v = b.v
        |  AND a.img_id < b.img_id
        | GROUP BY 1, 2 HAVING count(*) >= 2),
        |ham AS (
        | SELECT id_a, id_b, n_bands,
        |  CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1)) +
        |   bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
        |   AS INT) AS hamming
        | FROM cand
        | JOIN bands ha ON ha.img_id = cand.id_a
        | JOIN bands hb ON hb.img_id = cand.id_b)
        |SELECT id_a, id_b, n_bands, hamming FROM ham
        |WHERE hamming <= 10 ORDER BY id_a, id_b""".stripMargin,
    // HyperANF: per-vertex HLL registers (q167 conventions: p=6,
    // 15-hex md5 hash, rho = 55 - bitlen), three unrolled
    // pointwise-max iterations, then the alpha*m^2/Z estimate per
    // (radius, node) and the neighborhood-function rollup
    "q260_hyperanf" ->
      """WITH pairs AS (
        | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
        | FROM lineitem WHERE l_orderkey % 10 = 0),
        |edges AS (
        | SELECT p AS src, sp AS dst FROM pairs
        | UNION ALL SELECT sp, p FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |h AS (
        | SELECT node,
        |  CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15))
        |   AS BIGINT) AS hv
        | FROM nodes),
        |r0 AS (
        | SELECT node, hv % 64 AS bucket,
        |  CAST(CASE WHEN hv >> 6 = 0 THEN 55
        |   ELSE 55 - length(bin(hv >> 6)) END AS INT) AS rho
        | FROM h),
        |r1 AS (
        | SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT * FROM r0
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN r0 r ON r.node = e.dst)
        | GROUP BY 1, 2),
        |r2 AS (
        | SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT * FROM r1
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN r1 r ON r.node = e.dst)
        | GROUP BY 1, 2),
        |r3 AS (
        | SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT * FROM r2
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN r2 r ON r.node = e.dst)
        | GROUP BY 1, 2),
        |allregs AS (
        | SELECT 0 AS r, * FROM r0
        | UNION ALL SELECT 1, * FROM r1
        | UNION ALL SELECT 2, * FROM r2
        | UNION ALL SELECT 3, * FROM r3),
        |z AS (
        | SELECT r, node, CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER))
        |   AS BIGINT) AS z_regs
        | FROM allregs GROUP BY 1, 2),
        |f AS (
        | SELECT r, node, CAST(64 - nb AS BIGINT) AS v_zero,
        |  z_regs + (64 - nb) * (CAST(1 AS BIGINT) << 55) AS z_scaled
        | FROM z),
        |e1 AS (
        | SELECT r, node, v_zero,
        |  CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |   * CAST(36028797018963968 AS DOUBLE)
        |   / CAST(z_scaled AS DOUBLE) AS est_raw
        | FROM f),
        |e2 AS (
        | SELECT r, node,
        |  round(CASE WHEN est_raw <= 160.0 AND v_zero > 0
        |   THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
        |   ELSE est_raw END, 4) AS est
        | FROM e1),
        |nf AS (
        | SELECT r, CAST(count(*) AS BIGINT) AS n_nodes,
        |  round(sum(est), 4) AS nf_est, round(avg(est), 4) AS avg_ball
        | FROM e2 GROUP BY 1)
        |SELECT r, n_nodes, nf_est, avg_ball,
        | nf_est >= 0.9 * max(nf_est) OVER () AS reached_90
        |FROM nf ORDER BY r""".stripMargin,
    // WL refinement: degree colors, two rounds of
    // hash(self : sorted neighbor multiset), class-size histograms
    "q261_wl_refinement" ->
      """WITH pairs AS (
        | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
        | FROM lineitem WHERE l_orderkey % 10 = 0),
        |edges AS (
        | SELECT p AS src, sp AS dst FROM pairs
        | UNION ALL SELECT sp, p FROM pairs),
        |c0 AS (
        | SELECT src AS node, CAST(count(*) AS BIGINT) AS c
        | FROM edges GROUP BY 1),
        |s1 AS (
        | SELECT e.src AS node,
        |  string_agg(CAST(c.c AS VARCHAR), ',' ORDER BY c.c) AS sig
        | FROM edges e JOIN c0 c ON c.node = e.dst GROUP BY 1),
        |c1 AS (
        | SELECT c0.node,
        |  CAST(('0x' || substr(md5(CAST(c0.c AS VARCHAR) || ':' || s1.sig),
        |   1, 15)) AS BIGINT) AS c
        | FROM c0 JOIN s1 ON s1.node = c0.node),
        |s2 AS (
        | SELECT e.src AS node,
        |  string_agg(CAST(c.c AS VARCHAR), ',' ORDER BY c.c) AS sig
        | FROM edges e JOIN c1 c ON c.node = e.dst GROUP BY 1),
        |c2 AS (
        | SELECT c1.node,
        |  CAST(('0x' || substr(md5(CAST(c1.c AS VARCHAR) || ':' || s2.sig),
        |   1, 15)) AS BIGINT) AS c
        | FROM c1 JOIN s2 ON s2.node = c1.node),
        |hist AS (
        | SELECT 0 AS iter, sz FROM (
        |  SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c0 GROUP BY 1)
        | UNION ALL
        | SELECT 1, sz FROM (
        |  SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c1 GROUP BY 1)
        | UNION ALL
        | SELECT 2, sz FROM (
        |  SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c2 GROUP BY 1))
        |SELECT iter, sz AS class_size, CAST(count(*) AS BIGINT) AS n_classes
        |FROM hist GROUP BY 1, 2 ORDER BY iter, class_size""".stripMargin,
    // audio fingerprint: md5 PCM closed form, 16x32 frames, energy +
    // zero-crossing gradient bits, equal-fp dup pairs (planted
    // re-wrapped copies share identical PCM)
    "q262_audio_fingerprint" ->
      """WITH audios AS (
        | SELECT doc_id * 2 AS audio_id, doc_id FROM documents
        | UNION ALL
        | SELECT doc_id * 2 + 1, doc_id FROM documents
        | WHERE doc_id % 13 = 0),
        |idx AS (
        | SELECT audio_id, doc_id,
        |  unnest(generate_series(0, 511)) AS j
        | FROM audios),
        |smp AS (
        | SELECT audio_id, j,
        |  CAST(('0x' || substr(md5('pcm:' || doc_id || ':' || j), 1, 8))
        |   AS BIGINT) % 65536 AS raw
        | FROM idx),
        |sgn AS (
        | SELECT audio_id, j,
        |  raw - CASE WHEN raw >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM smp),
        |lg AS (
        | SELECT audio_id, j, s,
        |  lag(s) OVER (PARTITION BY audio_id ORDER BY j) AS sprev
        | FROM sgn),
        |fr AS (
        | SELECT audio_id, CAST(j // 32 AS INT) AS f,
        |  sum(s * s) AS e,
        |  sum(CASE WHEN j % 32 <> 0 AND ((s >= 0) <> (sprev >= 0))
        |   THEN 1 ELSE 0 END) AS z
        | FROM lg GROUP BY 1, 2),
        |bt AS (
        | SELECT audio_id, f, e, z,
        |  lead(e) OVER (PARTITION BY audio_id ORDER BY f) AS en,
        |  lead(z) OVER (PARTITION BY audio_id ORDER BY f) AS zn
        | FROM fr),
        |fp AS (
        | SELECT audio_id,
        |  CAST(sum(CASE WHEN en > e THEN 1 << f ELSE 0 END)
        |   + sum(CASE WHEN zn > z THEN 1 << (f + 15) ELSE 0 END)
        |   AS BIGINT) AS fp
        | FROM bt WHERE f < 15 GROUP BY 1)
        |SELECT a.audio_id AS id_a, b.audio_id AS id_b, a.fp
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.audio_id < b.audio_id
        |ORDER BY 1, 2""".stripMargin,
    // scale-robustness: the 2x-NN-resized image's dHash vs the
    // original's — grid sampling composes floors
    // (grid -> resized -> original), restated exactly
    "q264_image_scale_hash" ->
      """WITH dims AS (
        | SELECT doc_id, CAST(doc_id % 12 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 9 + 5 AS BIGINT) AS h
        | FROM documents WHERE doc_id % 11 = 0),
        |gx AS (
        | SELECT doc_id, w, h, unnest(generate_series(0, 8)) AS x
        | FROM dims),
        |grid AS (
        | SELECT doc_id, w, h, x, unnest(generate_series(0, 7)) AS y
        | FROM gx),
        |pix AS (
        | SELECT doc_id, x, y,
        |  ((y * h) // 8) * w + ((x * w) // 9) AS p1,
        |  (((y * (2*h)) // 8) // 2) * w + (((x * (2*w)) // 9) // 2) AS p2
        | FROM grid),
        |gray AS (
        | SELECT doc_id, x, y,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p1)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p1 + 1)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p1 + 2)), 1, 8))
        |    AS BIGINT) % 256 AS g1,
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p2)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p2 + 1)), 1, 8))
        |    AS BIGINT) % 256 +
        |  CAST(('0x' || substr(md5('png:' || doc_id || ':' || (3*p2 + 2)), 1, 8))
        |    AS BIGINT) % 256 AS g2
        | FROM pix),
        |bits AS (
        | SELECT a.doc_id,
        |  CASE WHEN a.g1 > b.g1 THEN 1 ELSE 0 END AS bit1,
        |  CASE WHEN a.g2 > b.g2 THEN 1 ELSE 0 END AS bit2
        | FROM gray a JOIN gray b
        |  ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
        | WHERE a.x < 8)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN bit1 <> bit2 THEN 1 ELSE 0 END) AS INT)
        |  AS hamming
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // dataset card: one multi-aggregate scan, long (metric, value)
    "q272_dataset_card" ->
      """WITH d AS (
        | SELECT *, len(string_split_regex(trim(text), '\s+')) AS nw
        | FROM documents),
        |a AS (
        | SELECT
        |  CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
        |  round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4)
        |   AS exact_dup_rate,
        |  round(avg(n_chars), 4) AS mean_chars,
        |  CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS p50_chars,
        |  CAST(sum(nw) AS DOUBLE) AS tokens_total,
        |  round(sum(nw) * 1.0 / count(*), 4) AS mean_tokens,
        |  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4)
        |   AS pct_en
        | FROM d)
        |SELECT 'n_docs' AS metric, n_docs AS value FROM a
        |UNION ALL SELECT 'n_langs', n_langs FROM a
        |UNION ALL SELECT 'n_sources', n_sources FROM a
        |UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM a
        |UNION ALL SELECT 'mean_chars', mean_chars FROM a
        |UNION ALL SELECT 'p50_chars', p50_chars FROM a
        |UNION ALL SELECT 'tokens_total', tokens_total FROM a
        |UNION ALL SELECT 'mean_tokens', mean_tokens FROM a
        |UNION ALL SELECT 'pct_en', pct_en FROM a
        |ORDER BY metric""".stripMargin,
    // life table: per-user lifetime, right-censoring on the corpus
    // max day, suffix-sum risk sets, survival via exp(sum(ln(1-h)))
    "q270_survival_hazard" ->
      """WITH u AS (
        | SELECT user_id, min(CAST(ts AS DATE)) AS d0,
        |  max(CAST(ts AS DATE)) AS dn
        | FROM events GROUP BY 1),
        |m AS (SELECT max(dn) AS m FROM u),
        |lv AS (
        | SELECT user_id, CAST(dn - d0 AS INT) AS life,
        |  dn = (SELECT m FROM m) AS censored
        | FROM u),
        |hist AS (
        | SELECT life, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_churn
        | FROM lv GROUP BY 1),
        |r AS (
        | SELECT life, n, n_churn,
        |  sum(n) OVER (ORDER BY life ROWS BETWEEN CURRENT ROW AND
        |   UNBOUNDED FOLLOWING) AS n_risk
        | FROM hist),
        |h AS (
        | SELECT life, n_risk, n_churn,
        |  n_churn * 1.0 / n_risk AS hazard_raw
        | FROM r),
        |sv AS (
        | SELECT life, n_risk, n_churn, hazard_raw,
        |  exp(sum(ln(1.0 - hazard_raw)) OVER (ORDER BY life
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |   AS survival_raw
        | FROM h)
        |SELECT life AS age_days, CAST(n_risk AS BIGINT) AS n_risk,
        | n_churn, round(hazard_raw, 4) AS hazard,
        | round(survival_raw, 4) AS survival
        |FROM sv ORDER BY age_days""".stripMargin,
    // MRR/recall@5 with label relevance over exact cosine ranks
    "q271_retrieval_mrr" ->
      """WITH e AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        | FROM embeddings),
        |q AS (
        | SELECT vec_id AS qid, label AS qlabel, e AS qe FROM (
        |  SELECT vec_id, label, e,
        |   CAST(('0x' || substr(md5('mrrq:' || vec_id), 1, 8)) AS BIGINT) AS h
        |  FROM e) ORDER BY h, vec_id LIMIT 24),
        |sc AS (
        | SELECT q.qid, q.qlabel, c.vec_id AS cid, c.label AS clabel,
        |  list_inner_product(q.qe, c.e) /
        |   (sqrt(list_inner_product(q.qe, q.qe)) *
        |    sqrt(list_inner_product(c.e, c.e))) AS cos
        | FROM q JOIN e c ON c.vec_id <> q.qid),
        |r AS (
        | SELECT qid, qlabel, cid, clabel, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
        |   AS rnk
        | FROM sc),
        |pq AS (
        | SELECT qid,
        |  min(CASE WHEN clabel = qlabel THEN rnk END) AS first_hit,
        |  sum(CASE WHEN clabel = qlabel AND rnk <= 5 THEN 1 ELSE 0 END)
        |   AS hits_at_5
        | FROM r GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        | round(avg(CASE WHEN first_hit IS NOT NULL
        |  THEN 1.0 / first_hit ELSE 0.0 END), 4) AS mrr,
        | round(avg(CASE WHEN hits_at_5 > 0 THEN 1.0 ELSE 0.0 END), 4)
        |  AS recall_at_5
        |FROM pq""".stripMargin,
    // per-lang fertility/compression over the same 6-round BPE CTEs
    "q269_bpe_fertility" -> (bpeCtes(6) +
      """,
        |fert AS (
        | SELECT a.doc_id,
        |  CAST(length(b.t) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split_regex(trim(a.t), '\s+')) AS BIGINT)
        |   AS n_words,
        |  CAST(length(a.t) AS BIGINT) AS n_chars
        | FROM t0 a JOIN t6 b USING (doc_id))
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        | round(sum(f.n_tokens) * 1.0 / sum(f.n_words), 4) AS fertility,
        | round(sum(f.n_chars) * 1.0 / sum(f.n_tokens), 4) AS compression
        |FROM fert f JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // OLS + diagnostics: exact window sums, residual lag for DW
    "q267_ols_diagnostics" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |dd AS (
        | SELECT day, x, (day - DATE '2024-01-01') * 1.0 AS d FROM daily),
        |t1 AS (
        | SELECT day, x, d,
        |  CAST(count(*) OVER () AS DOUBLE) AS n,
        |  avg(d) OVER () AS dbar, avg(x) OVER () AS xbar
        | FROM dd),
        |t2 AS (
        | SELECT day, x, d, n, dbar, xbar,
        |  sum((d - dbar) * (d - dbar)) OVER () AS sdd,
        |  sum((d - dbar) * (x - xbar)) OVER () AS sdx,
        |  sum((x - xbar) * (x - xbar)) OVER () AS sxx
        | FROM t1),
        |f AS (
        | SELECT day, x, d, n, sxx,
        |  sdx / sdd AS b, xbar - sdx / sdd * dbar AS a
        | FROM t2),
        |e AS (
        | SELECT day, n, sxx, round(b, 4) AS slope,
        |  round(a, 4) AS intercept, x - a - b * d AS e
        | FROM f),
        |l AS (
        | SELECT n, sxx, slope, intercept, e,
        |  lag(e) OVER (ORDER BY day) AS eprev
        | FROM e)
        |SELECT CAST(max(n) AS BIGINT) AS n_days, max(slope) AS slope,
        | max(intercept) AS intercept,
        | round(1.0 - sum(e * e) / max(sxx), 4) AS r_sq,
        | round(sum(pow(e - eprev, 2)) / sum(e * e), 4) AS durbin_watson
        |FROM l""".stripMargin,
    // generalized ESD, 3 unrolled rounds of z-score-and-remove
    "q268_esd_outliers" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |s1 AS (
        | SELECT day, x, avg(x) OVER () AS mu,
        |  CAST(count(*) OVER () AS DOUBLE) AS n,
        |  sum(x * x) OVER () AS sxx2
        | FROM daily),
        |r1 AS (
        | SELECT day, x, mu,
        |  abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) AS z,
        |  row_number() OVER (ORDER BY
        |   abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) DESC, day)
        |   AS rn
        | FROM s1),
        |o1 AS (
        | SELECT 1 AS round, day, CAST(x AS BIGINT) AS n_events,
        |  round(z, 4) AS z, z > 3.0 AS is_outlier
        | FROM r1 WHERE rn = 1),
        |d2 AS (SELECT day, x FROM r1 WHERE rn <> 1),
        |s2 AS (
        | SELECT day, x, avg(x) OVER () AS mu,
        |  CAST(count(*) OVER () AS DOUBLE) AS n,
        |  sum(x * x) OVER () AS sxx2
        | FROM d2),
        |r2 AS (
        | SELECT day, x, mu,
        |  abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) AS z,
        |  row_number() OVER (ORDER BY
        |   abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) DESC, day)
        |   AS rn
        | FROM s2),
        |o2 AS (
        | SELECT 2 AS round, day, CAST(x AS BIGINT) AS n_events,
        |  round(z, 4) AS z, z > 3.0 AS is_outlier
        | FROM r2 WHERE rn = 1),
        |d3 AS (SELECT day, x FROM r2 WHERE rn <> 1),
        |s3 AS (
        | SELECT day, x, avg(x) OVER () AS mu,
        |  CAST(count(*) OVER () AS DOUBLE) AS n,
        |  sum(x * x) OVER () AS sxx2
        | FROM d3),
        |r3 AS (
        | SELECT day, x, mu,
        |  abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) AS z,
        |  row_number() OVER (ORDER BY
        |   abs(x - mu) / sqrt((sxx2 - n * mu * mu) / (n - 1)) DESC, day)
        |   AS rn
        | FROM s3),
        |o3 AS (
        | SELECT 3 AS round, day, CAST(x AS BIGINT) AS n_events,
        |  round(z, 4) AS z, z > 3.0 AS is_outlier
        | FROM r3 WHERE rn = 1)
        |SELECT * FROM o1 UNION ALL SELECT * FROM o2
        |UNION ALL SELECT * FROM o3 ORDER BY round""".stripMargin,
    // two-NN intrinsic dimension: sample x corpus squared distances
    // via the same inner-product identity, MLE over ln(d2/d1)
    "q265_twonn_dim" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM (
        |  SELECT vec_id, e,
        |   CAST(('0x' || substr(md5('idq:' || vec_id), 1, 8)) AS BIGINT) AS h
        |  FROM e) ORDER BY h, vec_id LIMIT 32),
        |sq AS (
        | SELECT q.qid, c.vec_id AS cid,
        |  list_inner_product(q.qe, q.qe) + list_inner_product(c.e, c.e)
        |   - 2 * list_inner_product(q.qe, c.e) AS sq
        | FROM q JOIN e c ON c.vec_id <> q.qid),
        |r AS (
        | SELECT qid, cid, sq,
        |  row_number() OVER (PARTITION BY qid ORDER BY sq, cid) AS rn
        | FROM sq),
        |m AS (
        | SELECT qid,
        |  sqrt(max(CASE WHEN rn = 2 THEN sq END) /
        |       max(CASE WHEN rn = 1 THEN sq END)) AS mu
        | FROM r WHERE rn <= 2 GROUP BY qid
        | HAVING max(CASE WHEN rn = 1 THEN sq END) > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_sample,
        | round(count(*) * 1.0 / sum(ln(mu)), 4) AS id_hat,
        | round(quantile_cont(mu, 0.5), 4) AS mu_p50,
        | round(quantile_cont(mu, 0.9), 4) AS mu_p90
        |FROM m""".stripMargin,
    // label-noise audit: nearest centroid vs own label per point
    "q266_label_noise" ->
      """WITH p AS (
        | SELECT vec_id, label,
        |  CAST(unnest(embedding) AS DOUBLE) AS v,
        |  unnest(range(len(embedding))) AS dim
        | FROM embeddings),
        |c AS (SELECT label AS lab, dim, avg(v) AS cv FROM p GROUP BY 1, 2),
        |d AS (
        | SELECT p.vec_id, p.label, c.lab, sum(pow(p.v - c.cv, 2)) AS sq
        | FROM p JOIN c ON c.dim = p.dim GROUP BY 1, 2, 3),
        |n AS (
        | SELECT vec_id, label, lab,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sq, lab) AS rn
        | FROM d),
        |s AS (
        | SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(CASE WHEN lab <> label THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_suspect
        | FROM n WHERE rn = 1 GROUP BY 1)
        |SELECT label, n_vecs, n_suspect,
        | round(n_suspect * 1.0 / n_vecs, 4) AS noise_rate
        |FROM s ORDER BY label""".stripMargin,
    // centroid-based silhouette: zipped unnest, per-(label,dim)
    // centroids, point->centroid distance fan-out by |labels| only
    "q263_embed_silhouette" ->
      """WITH p AS (
        | SELECT vec_id, label,
        |  CAST(unnest(embedding) AS DOUBLE) AS v,
        |  unnest(range(len(embedding))) AS dim
        | FROM embeddings),
        |c AS (SELECT label AS lab, dim, avg(v) AS cv FROM p GROUP BY 1, 2),
        |d AS (
        | SELECT p.vec_id, p.label, c.lab, sum(pow(p.v - c.cv, 2)) AS sq
        | FROM p JOIN c ON c.dim = p.dim GROUP BY 1, 2, 3),
        |ab AS (
        | SELECT vec_id, label,
        |  sqrt(max(CASE WHEN lab = label THEN sq END)) AS a,
        |  sqrt(min(CASE WHEN lab <> label THEN sq END)) AS b
        | FROM d GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        | round(avg(a), 4) AS avg_a, round(avg(b), 4) AS avg_b,
        | round(avg((b - a) / greatest(a, b)), 4) AS silhouette
        |FROM ab GROUP BY 1 ORDER BY 1""".stripMargin,
    // delete-one-group jackknife of the corpus mean doc length
    "q257_jackknife_mean" ->
      """WITH g AS (
        | SELECT source, CAST(count(*) AS DOUBLE) AS n_g,
        |  sum(CAST(n_chars AS DOUBLE)) AS s_g
        | FROM documents GROUP BY 1),
        |t AS (
        | SELECT source, n_g, s_g,
        |  sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
        |  CAST(count(*) OVER () AS DOUBLE) AS gcnt
        | FROM g),
        |j AS (
        | SELECT source, n_g, n, s, gcnt,
        |  (s - s_g) / (n - n_g) AS loo_mean
        | FROM t),
        |k AS (
        | SELECT source, n_g, n, s, loo_mean,
        |  avg(loo_mean) OVER () AS loo_bar, gcnt
        | FROM j)
        |SELECT source, CAST(n_g AS BIGINT) AS n_docs,
        | round(loo_mean, 4) AS loo_mean,
        | round(s / n, 4) AS full_mean,
        | round(sqrt((gcnt - 1) / gcnt *
        |  sum(pow(loo_mean - loo_bar, 2)) OVER ()), 4) AS jk_se
        |FROM k ORDER BY source""".stripMargin,
    // seasonal decomposition: centered MA-7 trend (full windows only),
    // arithmetic day-of-week, re-centered seasonal means
    "q241_seasonal_decompose" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |t AS (
        | SELECT day, x,
        |  CASE WHEN count(*) OVER w = 7
        |   THEN round(avg(x) OVER w, 4) END AS trend,
        |  CAST((day - DATE '2024-01-01') % 7 AS INTEGER) AS dow
        | FROM daily
        | WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT day, x, trend, dow, x - trend AS det FROM t),
        |sr AS (SELECT dow, avg(det) AS s_raw FROM d
        |       WHERE det IS NOT NULL GROUP BY 1),
        |sm AS (SELECT avg(s_raw) AS s_mean FROM sr),
        |se AS (SELECT dow, round(s_raw - sm.s_mean, 4) AS seasonal
        |       FROM sr, sm)
        |SELECT d.day, d.x, d.trend, se.seasonal,
        | round(d.x - d.trend - se.seasonal, 4) AS remainder
        |FROM d LEFT JOIN se ON d.dow = se.dow
        |ORDER BY d.day""".stripMargin,
    // mean imputation: survivors' 4-dp-pinned mean fills the planted
    // nulls
    "q242_mean_impute" ->
      """WITH p AS (
        | SELECT event_type,
        |  CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
        | FROM events),
        |m AS (SELECT event_type, round(avg(v), 4) AS fill
        |      FROM p GROUP BY 1)
        |SELECT p.event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_null,
        | max(m.fill) AS fill,
        | round(sum(coalesce(v, m.fill)), 4) AS sum_imputed
        |FROM p JOIN m USING (event_type)
        |GROUP BY p.event_type ORDER BY p.event_type""".stripMargin,
    // gap design: one delta pass, four conditional break counts
    "q243_gap_design" ->
      """WITH d AS (
        | SELECT user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS dt_us
        | FROM events),
        |a AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN dt_us > 300000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS b300,
        |  CAST(sum(CASE WHEN dt_us > 900000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS b900,
        |  CAST(sum(CASE WHEN dt_us > 1800000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS b1800,
        |  CAST(sum(CASE WHEN dt_us > 3600000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS b3600
        | FROM d),
        |u(gap_s, n_breaks) AS (
        | SELECT 300, b300 FROM a UNION ALL SELECT 900, b900 FROM a
        | UNION ALL SELECT 1800, b1800 FROM a
        | UNION ALL SELECT 3600, b3600 FROM a)
        |SELECT u.gap_s, a.n_events,
        | a.n_users + u.n_breaks AS n_sessions,
        | round(a.n_events * 1.0 / (a.n_users + u.n_breaks), 4)
        |   AS events_per_session
        |FROM u, a ORDER BY u.gap_s""".stripMargin,
    // range-sort audit: same 5% md5 sample, 4-dp-pinned sample
    // percentile boundaries, full-data range assignment
    "q240_range_sort_audit" ->
      """WITH li AS (
        | SELECT l_orderkey, l_linenumber, l_extendedprice AS v
        | FROM lineitem),
        |smp AS (
        | SELECT v FROM li
        | WHERE CAST(('0x' || substr(md5('rs:' || l_orderkey || ':' ||
        |   l_linenumber), 1, 8)) AS BIGINT) % 100 < 5),
        |b AS (
        | SELECT round(quantile_cont(v, 1.0 / 8), 4) AS b1,
        |  round(quantile_cont(v, 2.0 / 8), 4) AS b2,
        |  round(quantile_cont(v, 3.0 / 8), 4) AS b3,
        |  round(quantile_cont(v, 4.0 / 8), 4) AS b4,
        |  round(quantile_cont(v, 5.0 / 8), 4) AS b5,
        |  round(quantile_cont(v, 6.0 / 8), 4) AS b6,
        |  round(quantile_cont(v, 7.0 / 8), 4) AS b7
        | FROM smp),
        |asn AS (
        | SELECT CAST(CASE WHEN v > b.b1 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b2 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b3 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b4 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b5 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b6 THEN 1 ELSE 0 END
        |  + CASE WHEN v > b.b7 THEN 1 ELSE 0 END AS INTEGER) AS range_id
        | FROM li, b),
        |g AS (SELECT range_id, CAST(count(*) AS BIGINT) AS n
        |      FROM asn GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM g)
        |SELECT range_id, n,
        | round(n * 1e6 / t.total, 1) AS share_ppm
        |FROM g, t ORDER BY range_id""".stripMargin,
    // chi2: full R×C grid incl. zero-observed cells, marginal-derived
    // expectations
    "q237_chi2_independence" ->
      """WITH obs AS (
        | SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        | FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
        |c AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
        |n AS (
        | SELECT sum(o) AS n,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS r,
        |  CAST(count(DISTINCT source) AS BIGINT) AS c
        | FROM obs),
        |g AS (
        | SELECT coalesce(obs.o, 0) AS o,
        |  CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE)
        |    / CAST(n.n AS DOUBLE) AS e
        | FROM r CROSS JOIN c
        | LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source
        | CROSS JOIN n),
        |s AS (SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2 FROM g)
        |SELECT CAST(n.n AS BIGINT) AS n, n.r, n.c,
        | (n.r - 1) * (n.c - 1) AS dof, s.chi2,
        | round(sqrt(s.chi2 / CAST(n.n * least(n.r - 1, n.c - 1) AS DOUBLE)),
        |   4) AS cramers_v
        |FROM n, s""".stripMargin,
    // clustering coefficient: q92's triangle CTE + degrees off the
    // canonical edge set
    "q238_clustering_coeff" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |      WHERE l_orderkey % 10 = 0),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |      FROM pp x JOIN pp y
        |       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (
        | SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |  SELECT a AS node FROM e UNION ALL SELECT b FROM e) t
        | GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |  SELECT unnest([x, y, z]) AS node FROM tri) t GROUP BY 1)
        |SELECT d.node, d.deg, coalesce(tc.n_triangles, 0) AS n_triangles,
        | round(coalesce(tc.n_triangles, 0) * 2.0
        |   / (d.deg * (d.deg - 1)), 4) AS cc
        |FROM deg d LEFT JOIN tc USING (node)
        |WHERE d.deg >= 2 ORDER BY d.node""".stripMargin,
    // ACF: 6-dp-pinned mean, biased normalization, lags from the same
    // ordered day frame
    "q239_acf_daily" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
        | FROM events GROUP BY 1),
        |m AS (SELECT round(avg(x), 6) AS m FROM daily),
        |d AS (
        | SELECT day, x - m.m AS d,
        |  lag(x - m.m, 1) OVER (ORDER BY day) AS d1,
        |  lag(x - m.m, 2) OVER (ORDER BY day) AS d2,
        |  lag(x - m.m, 3) OVER (ORDER BY day) AS d3,
        |  lag(x - m.m, 4) OVER (ORDER BY day) AS d4,
        |  lag(x - m.m, 5) OVER (ORDER BY day) AS d5,
        |  lag(x - m.m, 6) OVER (ORDER BY day) AS d6,
        |  lag(x - m.m, 7) OVER (ORDER BY day) AS d7
        | FROM daily, m),
        |a AS (
        | SELECT sum(d * d) AS den,
        |  sum(d * d1) AS num1, sum(d * d2) AS num2, sum(d * d3) AS num3,
        |  sum(d * d4) AS num4, sum(d * d5) AS num5, sum(d * d6) AS num6,
        |  sum(d * d7) AS num7
        | FROM d),
        |u(lag_k, num) AS (
        | SELECT 1, num1 FROM a UNION ALL SELECT 2, num2 FROM a
        | UNION ALL SELECT 3, num3 FROM a UNION ALL SELECT 4, num4 FROM a
        | UNION ALL SELECT 5, num5 FROM a UNION ALL SELECT 6, num6 FROM a
        | UNION ALL SELECT 7, num7 FROM a)
        |SELECT u.lag_k, round(u.num / a.den, 4) AS acf
        |FROM u, a ORDER BY u.lag_k""".stripMargin,
    // salt planner: all-integer ceil divisions replayed with //
    "q234_salt_planner" ->
      """WITH c AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS total,
        |      CAST(max(n) AS BIGINT) AS before_max FROM c),
        |p AS (
        | SELECT c.user_id, c.n, (t.total + 31) // 32 AS target,
        |  t.before_max
        | FROM c, t),
        |p2 AS (
        | SELECT user_id, n, target, before_max,
        |  (n + target - 1) // target AS salt
        | FROM p)
        |SELECT user_id, n, CAST(target AS BIGINT) AS target,
        | CAST(salt AS BIGINT) AS salt,
        | CAST((n + salt - 1) // salt AS BIGINT) AS after_rows,
        | before_max
        |FROM p2 ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    // U-shaped attribution: running purchase count = segment id,
    // same window restatement
    "q235_attribution_credit" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |  coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
        | FROM events),
        |tch AS (
        | SELECT user_id, event_type, seg, us, event_id
        | FROM e WHERE event_type <> 'purchase'),
        |cv AS (SELECT user_id, seg FROM e WHERE event_type = 'purchase'),
        |j AS (
        | SELECT t.user_id, t.event_type, t.seg, t.us, t.event_id
        | FROM tch t JOIN cv USING (user_id, seg)),
        |r AS (
        | SELECT event_type,
        |  row_number() OVER (PARTITION BY user_id, seg
        |    ORDER BY us, event_id) AS p,
        |  count(*) OVER (PARTITION BY user_id, seg) AS n
        | FROM j),
        |cr AS (
        | SELECT event_type,
        |  CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
        |   WHEN p = 1 OR p = n THEN 0.4
        |   ELSE 0.2 / (n - 2) END AS credit
        | FROM r)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        | round(sum(credit), 4) AS total_credit
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,
    // AUC: exact Mann-Whitney with (min+max)/2 tied ranks over the
    // 4-dp score groups
    "q236_auc_separation" ->
      """WITH emb AS (
        | SELECT vec_id, embedding, label FROM embeddings
        | WHERE vec_id < 50),
        |p AS (
        | SELECT round(list_cosine_similarity(a.embedding, b.embedding), 4)
        |   AS score,
        |  a.label = b.label AS pos
        | FROM emb a JOIN emb b ON a.vec_id < b.vec_id),
        |g AS (
        | SELECT score, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        | FROM p GROUP BY 1),
        |r AS (
        | SELECT n, n_pos,
        |  sum(n) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS c
        | FROM g),
        |a2 AS (
        | SELECT CAST(sum(n_pos) AS BIGINT) AS np,
        |  CAST(sum(n) - sum(n_pos) AS BIGINT) AS nn,
        |  sum((2 * c - n + 1) / 2.0 * n_pos) AS rank_sum
        | FROM r)
        |SELECT np AS n_pos, nn AS n_neg,
        | round((rank_sum - np * (np + 1) / 2.0)
        |   / CAST(np * nn AS DOUBLE), 6) AS auc
        |FROM a2""".stripMargin,
    // watermark design: the integer delay plant replayed verbatim;
    // percentiles via the proven quantile_cont parity, 4-dp pinned
    "q231_watermark_design" ->
      """WITH d AS (
        | SELECT (CAST(('0x' || substr(md5('lag:' || event_id), 1, 8))
        |   AS BIGINT) % 4096) AS h
        | FROM events),
        |dl AS (SELECT (h * h * h) // 64 AS delay_us FROM d),
        |st AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  round(quantile_cont(delay_us, 0.5), 4) AS p50_us,
        |  round(quantile_cont(delay_us, 0.99), 4) AS p99_us,
        |  CAST(max(delay_us) AS BIGINT) AS max_us
        | FROM dl),
        |c(watermark_s) AS (VALUES (CAST(30 AS BIGINT)), (120), (600), (1200)),
        |dr AS (
        | SELECT c.watermark_s,
        |  CAST(sum(CASE WHEN dl.delay_us > c.watermark_s * 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        | FROM dl, c GROUP BY c.watermark_s)
        |SELECT dr.watermark_s, st.n_events, dr.n_dropped,
        | round(dr.n_dropped * 1e6 / st.n_events, 2) AS drop_ppm,
        | st.p50_us, st.p99_us, st.max_us
        |FROM dr, st ORDER BY dr.watermark_s""".stripMargin,
    // Neyman allocation: per-stratum sigma 4-dp-pinned, shares and
    // the variance ratio re-derived from the same pinned constants
    "q232_neyman_alloc" ->
      """WITH strata AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_h,
        |  round(stddev_samp(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |   AS DOUBLE)), 4) AS sigma
        | FROM documents GROUP BY source),
        |t AS (
        | SELECT sum(n_h) AS n_total, sum(n_h * sigma) AS mass,
        |  sum(n_h * sigma * sigma) AS m2
        | FROM strata)
        |SELECT source, n_h, sigma,
        | round(1000.0 * n_h * sigma / t.mass, 2) AS alloc_neyman,
        | round(1000.0 * n_h / t.n_total, 2) AS alloc_prop,
        | round((t.mass / t.n_total) * (t.mass / t.n_total)
        |   / (t.m2 / t.n_total), 4) AS var_ratio
        |FROM strata, t ORDER BY source""".stripMargin,
    // PSI: train-side decile edges 4-dp-pinned, both splits binned
    // against them, per-bin terms 6-dp-pinned before the sum
    "q233_psi_drift" ->
      """WITH w AS (
        | SELECT doc_id, n_chars,
        |  CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
        |    % 100 AS b
        | FROM documents),
        |sp AS (
        | SELECT n_chars, CASE WHEN b < 80 THEN 'train'
        |  WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        | FROM w),
        |f AS (SELECT * FROM sp WHERE split IN ('train', 'val')),
        |e AS (
        | SELECT round(quantile_cont(n_chars, 0.1), 4) AS e1,
        |  round(quantile_cont(n_chars, 0.2), 4) AS e2,
        |  round(quantile_cont(n_chars, 0.3), 4) AS e3,
        |  round(quantile_cont(n_chars, 0.4), 4) AS e4,
        |  round(quantile_cont(n_chars, 0.5), 4) AS e5,
        |  round(quantile_cont(n_chars, 0.6), 4) AS e6,
        |  round(quantile_cont(n_chars, 0.7), 4) AS e7,
        |  round(quantile_cont(n_chars, 0.8), 4) AS e8,
        |  round(quantile_cont(n_chars, 0.9), 4) AS e9
        | FROM f WHERE split = 'train'),
        |bn AS (
        | SELECT split,
        |  CAST(CASE WHEN n_chars > e.e1 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e2 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e3 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e4 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e5 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e6 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e7 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e8 THEN 1 ELSE 0 END
        |   + CASE WHEN n_chars > e.e9 THEN 1 ELSE 0 END AS INTEGER)
        |   AS bin
        | FROM f, e),
        |b AS (
        | SELECT bin,
        |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_t,
        |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_v
        | FROM bn GROUP BY 1),
        |t AS (SELECT sum(n_t) AS tt, sum(n_v) AS tv FROM b),
        |r AS (
        | SELECT bin, n_t, n_v,
        |  (n_t + 0.5) / (t.tt + 5.0) AS pt,
        |  (n_v + 0.5) / (t.tv + 5.0) AS pv
        | FROM b, t),
        |r2 AS (
        | SELECT bin, n_t, n_v,
        |  round((pv - pt) * ln(pv / pt), 6) AS term
        | FROM r),
        |i AS (SELECT round(sum(term), 6) AS psi FROM r2)
        |SELECT bin, n_t, n_v, term, psi FROM r2, i ORDER BY bin""".stripMargin,
    // data contract: every rule recounted in one SQL aggregate
    "q227_data_contract" ->
      """WITH a AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_checked,
        |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS quantity_range,
        |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS shipdate_not_null,
        |  CAST(sum(CASE WHEN l_returnflag NOT IN ('R', 'A', 'N')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
        |  CAST(sum(CASE WHEN l_orderkey <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS orderkey_positive,
        |  CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS price_positive,
        |  CAST(sum(CASE WHEN NOT (l_linenumber BETWEEN 1 AND 7)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS linenumber_range
        | FROM lineitem),
        |u AS (
        | SELECT n_checked, 'quantity_range' AS rule,
        |  quantity_range AS n_violations FROM a
        | UNION ALL SELECT n_checked, 'discount_range', discount_range FROM a
        | UNION ALL SELECT n_checked, 'shipdate_not_null', shipdate_not_null FROM a
        | UNION ALL SELECT n_checked, 'returnflag_domain', returnflag_domain FROM a
        | UNION ALL SELECT n_checked, 'orderkey_positive', orderkey_positive FROM a
        | UNION ALL SELECT n_checked, 'price_positive', price_positive FROM a
        | UNION ALL SELECT n_checked, 'linenumber_range', linenumber_range FROM a)
        |SELECT rule, n_checked, n_violations,
        | n_violations = 0 AS pass
        |FROM u ORDER BY rule""".stripMargin,
    // rollup merge: full recompute from the raw events — incremental
    // base+delta must land on it exactly
    "q228_rollup_merge" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // matched ATT: same per-user frame as q225, decile CEM bins,
    // treated-mass-weighted gap over two-armed bins only
    "q229_matched_att" ->
      """WITH per AS (
        | SELECT user_id,
        |  coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-15'
        |    THEN value END), 0.0) AS y,
        |  coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
        |    THEN value END), 0.0) AS x
        | FROM events GROUP BY user_id),
        |b0 AS (
        | SELECT user_id, y, x, CAST(user_id % 2 AS INTEGER) AS treated,
        |  ntile(10) OVER (ORDER BY x, user_id) AS bin
        | FROM per),
        |b AS (
        | SELECT bin,
        |  CAST(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_t,
        |  CAST(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_c,
        |  avg(CASE WHEN treated = 1 THEN y END) AS mt,
        |  avg(CASE WHEN treated = 0 THEN y END) AS mc
        | FROM b0 GROUP BY 1),
        |att AS (
        | SELECT round(sum(n_t * (mt - mc)) / sum(n_t), 4) AS att
        | FROM b WHERE n_t > 0 AND n_c > 0)
        |SELECT bin, n_t, n_c, round(mt, 4) AS mean_t,
        | round(mc, 4) AS mean_c, round(mt - mc, 4) AS gap, att.att
        |FROM b, att ORDER BY bin""".stripMargin,
    // bloom design: the closed form re-evaluated with DuckDB's own
    // ln/exp/pow — cross-checks the engine's math functions
    "q230_bloom_design" ->
      """WITH b(bits_per_key) AS (
        | VALUES (4), (8), (10), (12), (16), (20)),
        |k AS (
        | SELECT bits_per_key,
        |  CAST(round(ln(2.0) * bits_per_key) AS INTEGER) AS k
        | FROM b)
        |SELECT bits_per_key, k,
        | round(pow(1.0 - exp(-k / CAST(bits_per_key AS DOUBLE)), k), 6)
        |   AS fpp,
        | CAST(bits_per_key AS BIGINT) * 125000000 AS bytes_per_1e9_keys
        |FROM k ORDER BY bits_per_key""".stripMargin,
    // entity resolution: the oracle independently re-runs
    // block+match+components (q49's recursive-CTE reachability) and
    // the survivorship policy — identical golden records required,
    // incidental matches included
    "q223_golden_record" ->
      """WITH RECURSIVE recs AS (
        | SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
        |  c_acctbal AS bal, c_mktsegment AS seg FROM customer
        | UNION ALL
        | SELECT c_custkey + 1000000, c_name || 'X', c_nationkey,
        |  c_acctbal + 1.0, c_mktsegment
        | FROM customer WHERE c_custkey % 10 = 0),
        |pairs AS (
        | SELECT a.id AS ia, b.id AS ib FROM recs a JOIN recs b
        |   ON a.nat = b.nat AND a.seg = b.seg AND a.id < b.id
        |  AND levenshtein(a.name, b.name) <= 1
        |  AND abs(a.bal - b.bal) <= 2.0),
        |edges AS (
        | SELECT ia AS a, ib AS b FROM pairs
        | UNION ALL SELECT ib, ia FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS id, min(dst) AS cluster
        |         FROM reach GROUP BY src),
        |lab AS (
        | SELECT recs.*, coalesce(comp.cluster, recs.id) AS cluster
        | FROM recs LEFT JOIN comp ON recs.id = comp.id),
        |m AS (SELECT cluster, name, count(*) AS cnt
        |      FROM lab GROUP BY 1, 2),
        |best AS (
        | SELECT cluster, name FROM m
        | QUALIFY row_number() OVER (PARTITION BY cluster
        |   ORDER BY cnt DESC, name) = 1),
        |g AS (
        | SELECT cluster, CAST(min(id) AS BIGINT) AS rec_id,
        |  CAST(count(*) AS BIGINT) AS n_members, max(bal) AS acctbal
        | FROM lab GROUP BY 1)
        |SELECT g.rec_id, g.n_members, best.name AS name, g.acctbal
        |FROM g JOIN best ON g.cluster = best.cluster
        |ORDER BY g.rec_id""".stripMargin,
    // item-item CF: distinct interactions, user-keyed pair join,
    // cosine re-derived from the same counts
    "q224_item_cf" ->
      """WITH ui AS (
        | SELECT DISTINCT user_id,
        |  CAST(props->>'$.k' AS INTEGER) AS item
        | FROM events),
        |n AS (SELECT item, CAST(count(*) AS BIGINT) AS n_u
        |      FROM ui GROUP BY 1),
        |p AS (
        | SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS cooc
        | FROM ui a JOIN ui b
        |   ON a.user_id = b.user_id AND a.item < b.item
        | GROUP BY 1, 2)
        |SELECT item_a, item_b, cooc,
        | round(cooc / sqrt(CAST(na.n_u * nb.n_u AS DOUBLE)), 4) AS cos
        |FROM p JOIN n na ON p.item_a = na.item
        |       JOIN n nb ON p.item_b = nb.item
        |ORDER BY cos DESC, item_a, item_b LIMIT 20""".stripMargin,
    // A/B + CUPED: theta and xbar 6-dp-pinned, Welch t on raw and
    // adjusted user metrics
    "q225_ab_cuped" ->
      """WITH per AS (
        | SELECT user_id,
        |  coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-15'
        |    THEN value END), 0.0) AS y,
        |  coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
        |    THEN value END), 0.0) AS x,
        |  CAST(user_id % 2 AS INTEGER) AS variant
        | FROM events GROUP BY user_id),
        |f AS (
        | SELECT round(covar_samp(x, y) / var_samp(x), 6) AS theta,
        |  round(avg(x), 6) AS xbar FROM per),
        |adj AS (
        | SELECT variant, y, y - f.theta * (x - f.xbar) AS ya
        | FROM per, f),
        |v AS (
        | SELECT variant, CAST(count(*) AS BIGINT) AS n, avg(y) AS my,
        |  var_samp(y) AS vy, avg(ya) AS mya, var_samp(ya) AS vya
        | FROM adj GROUP BY 1),
        |a AS (SELECT * FROM v WHERE variant = 0),
        |b AS (SELECT * FROM v WHERE variant = 1)
        |SELECT a.n AS n_a, b.n AS n_b,
        | round(a.my, 4) AS mean_a, round(b.my, 4) AS mean_b,
        | round((a.my - b.my) / sqrt(a.vy / a.n + b.vy / b.n), 4) AS t_raw,
        | round((a.mya - b.mya) / sqrt(a.vya / a.n + b.vya / b.n), 4)
        |   AS t_cuped,
        | round((1.0 - (a.vya + b.vya) / (a.vy + b.vy)) * 100.0, 4)
        |   AS var_red_pct
        |FROM a, b""".stripMargin,
    // WOE/IV: ntile over the pinned (n_chars, doc_id) order, add-0.5
    // smoothing, IV from the 4-dp-pinned WOE values
    "q226_woe_iv" ->
      """WITH d AS (
        | SELECT n_chars, doc_id,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |  ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
        | FROM documents),
        |b AS (
        | SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
        | FROM d GROUP BY 1),
        |t AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM b),
        |r AS (
        | SELECT bin, n, n_pos, n_neg,
        |  (n_pos + 0.5) / (t.tp + 5.0) AS p,
        |  (n_neg + 0.5) / (t.tn + 5.0) AS q
        | FROM b, t),
        |r2 AS (SELECT bin, n, n_pos, n_neg, p, q,
        |       round(ln(p / q), 4) AS woe FROM r),
        |i AS (SELECT round(sum((p - q) * woe), 4) AS iv FROM r2)
        |SELECT bin, n, n_pos, n_neg, woe, iv FROM r2, i
        |ORDER BY bin""".stripMargin,
    // co-purchase: support-counted part pairs, total-order top-20
    "q213_copurchase_pairs" ->
      """WITH p AS (
        | SELECT l1.l_partkey AS p1, l2.l_partkey AS p2
        | FROM lineitem l1 JOIN lineitem l2
        |   ON l1.l_orderkey = l2.l_orderkey
        |  AND l1.l_partkey < l2.l_partkey)
        |SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_orders
        |FROM p GROUP BY p1, p2 HAVING count(*) >= 2
        |ORDER BY n_orders DESC, p1, p2 LIMIT 20""".stripMargin,
    // seasonal MASE: lag windows over PRESENT days only (both engines
    // window the same date-ordered rows, so gaps are handled alike)
    "q214_seasonal_mase" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |l AS (
        | SELECT event_type, n,
        |  lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1,
        |  lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7
        | FROM daily)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        | round(avg(abs(n - f1)), 4) AS mae1,
        | round(avg(abs(n - f7)), 4) AS mae7,
        | round(avg(abs(n - f7)) / avg(abs(n - f1)), 4) AS mase
        |FROM l WHERE f7 IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // hard negatives: q28's oracle with the different-label predicate
    "q215_hard_negatives" ->
      """SELECT query_id, neighbor_id, rnk FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |             c.vec_id) AS INTEGER) AS rnk
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 8 AND c.label <> q.label) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // schema merge: v1/v2 membership restated from the doc_id parity
    // that built the drops; null-filled n_chars contributes 0
    "q216_schema_merge" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_v2,
        | CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
        |   AS BIGINT) AS sum_chars_v2,
        | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // moment shards: the merged row's variance computed DIRECTLY from
    // the raw values — the engine's shard-merge algebra must land on it
    "q217_moment_shards" ->
      """WITH s AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(n_chars), 4) AS mean,
        |  round(var_pop(n_chars), 4) AS var
        | FROM documents GROUP BY source),
        |m AS (
        | SELECT '__merged' AS source, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(n_chars), 4) AS mean,
        |  round(var_pop(n_chars), 4) AS var
        | FROM documents)
        |SELECT * FROM s UNION ALL SELECT * FROM m
        |ORDER BY source""".stripMargin,
    // boilerplate: oracle re-plants the header/footer, recounts df by
    // (source, segment), and applies the same integer-cross-multiplied
    // threshold; segment splitting via literal string_split
    "q209_boilerplate_strip" ->
      """WITH p AS (
        | SELECT doc_id, source,
        |  CASE WHEN doc_id % 3 <> 0
        |   THEN 'always read ' || source || ' daily | ' || text
        |   ELSE text END
        |  || CASE WHEN doc_id % 4 = 0
        |   THEN ' | copyright ' || source ELSE '' END AS t
        | FROM documents),
        |seg AS (
        | SELECT doc_id, source, unnest(string_split(t, ' | ')) AS s
        | FROM p),
        |df AS (SELECT source, s, CAST(count(*) AS BIGINT) AS df
        |       FROM seg GROUP BY 1, 2),
        |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM documents GROUP BY 1),
        |j AS (
        | SELECT g.doc_id, g.source, g.s, d.df, n.n_docs,
        |  d.df * 2 > n.n_docs AS is_boiler
        | FROM seg g
        | JOIN df d ON g.source = d.source AND g.s = d.s
        | JOIN nd n ON g.source = n.source)
        |SELECT source, max(n_docs) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_segments,
        | CAST(count(DISTINCT CASE WHEN is_boiler THEN s END) AS BIGINT)
        |   AS n_boiler,
        | CAST(sum(CASE WHEN is_boiler THEN 0 ELSE 1 END) AS BIGINT)
        |   AS n_kept,
        | CAST(sum(CASE WHEN is_boiler THEN NULL ELSE
        |   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) END) AS BIGINT)
        |   AS kept_content_sum
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // rendezvous: argmax of md5(key:shard) replayed via QUALIFY with
    // the pinned (score DESC, shard DESC) tie order; mod-N inline
    "q210_rendezvous_shards" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |sc AS (
        | SELECT doc_id, s.sh,
        |  CAST(('0x' || substr(md5(doc_id || ':' || s.sh), 1, 8))
        |    AS BIGINT) AS score
        | FROM ids, (SELECT unnest(generate_series(0, 8)) AS sh) s),
        |a8 AS (
        | SELECT doc_id, sh FROM sc WHERE sh < 8
        | QUALIFY row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, sh DESC) = 1),
        |a9 AS (
        | SELECT doc_id, sh FROM sc
        | QUALIFY row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, sh DESC) = 1),
        |hrw AS (
        | SELECT 'rendezvous' AS scheme,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN a8.sh <> a9.sh THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved
        | FROM a8 JOIN a9 USING (doc_id)),
        |m AS (
        | SELECT 'mod' AS scheme, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN doc_id % 8 <> doc_id % 9 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved
        | FROM ids),
        |u AS (SELECT * FROM hrw UNION ALL SELECT * FROM m)
        |SELECT scheme, n_total, n_moved,
        | round(n_moved * 1.0 / n_total, 4) AS moved_pct
        |FROM u ORDER BY scheme""".stripMargin,
    // partition pruning: unpartitioned parquet truth with the same
    // predicate — hive layout must round-trip content exactly
    "q211_partition_prune" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM documents WHERE lang = 'en' AND n_chars >= 100
        |GROUP BY source ORDER BY source""".stripMargin,
    // codec audit: one row per codec from VALUES; content digests from
    // the parquet truth; size booleans asserted true (the engine
    // computed them from its own metadata listing)
    "q212_parquet_codec" ->
      """WITH c(codec) AS (VALUES ('none'), ('snappy'), ('zstd')),
        |t AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |    AS BIGINT) AS content_sum
        | FROM documents)
        |SELECT c.codec, t.n_docs, t.content_sum,
        | true AS smaller_than_none
        |FROM c, t ORDER BY c.codec""".stripMargin,
    // mojibake audit: oracle re-plants the damage with chr() code
    // points and recounts by the same replace-length arithmetic; the
    // digest of the REPAIRED text proves the cleanse byte-identical
    "q203_mojibake_audit" ->
      """WITH r AS (
        | SELECT lang, text || CASE CAST(doc_id % 5 AS INTEGER)
        |   WHEN 1 THEN ' caf' || chr(195) || chr(169)
        |   WHEN 2 THEN ' don' || chr(226) || chr(8364) || chr(8482) || 't'
        |   WHEN 3 THEN ' data' || chr(65533)
        |   ELSE '' END AS raw
        | FROM documents),
        |c AS (
        | SELECT lang, raw,
        |  CAST((length(raw) - length(replace(raw,
        |    chr(195) || chr(169), ''))) / 2 AS BIGINT) AS n_lat,
        |  CAST((length(raw) - length(replace(raw,
        |    chr(226) || chr(8364) || chr(8482), ''))) / 3 AS BIGINT) AS n_sm,
        |  CAST(length(raw) - length(replace(raw, chr(65533), ''))
        |    AS BIGINT) AS n_re,
        |  replace(replace(replace(raw, chr(195) || chr(169), ''),
        |    chr(226) || chr(8364) || chr(8482), ''), chr(65533), '') AS clean
        | FROM r)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN n_lat + n_sm + n_re > 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_flagged,
        | CAST(sum(n_lat) AS BIGINT) AS n_latin1,
        | CAST(sum(n_sm) AS BIGINT) AS n_smartquote,
        | CAST(sum(n_re) AS BIGINT) AS n_replacement,
        | CAST(sum(CAST(('0x' || substr(md5(clean), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum_clean
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    // XML round-trip: parquet-truth oracle, q196's shape — the gate's
    // value is that the Spark side went through entity escaping and
    // rowTag record splitting and must land on the same digests
    "q204_xml_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id,
        | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // CDC compaction: last-writer-wins restated declaratively via
    // QUALIFY over the same (us, event_id) total order; tombstone
    // survivors filtered AFTER picking the last row per key
    "q205_cdc_apply" ->
      """WITH log AS (
        | SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
        |  CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
        | FROM events),
        |last AS (
        | SELECT * FROM log
        | QUALIFY row_number() OVER (PARTITION BY user_id
        |   ORDER BY us DESC, event_id DESC) = 1)
        |SELECT user_id, event_id AS last_event_id,
        | event_type AS last_type, round(value, 4) AS last_value, us
        |FROM last WHERE op <> 'D' ORDER BY user_id""".stripMargin,
    // mutual kNN: full self-kNN both directions, reciprocal join —
    // the oracle's rankings come from DuckDB's own cosine
    "q206_mutual_knn" ->
      """WITH r AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |             c.vec_id) AS INTEGER) AS rnk
        | FROM embeddings q, embeddings c WHERE c.vec_id <> q.vec_id),
        |t AS (SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 5)
        |SELECT f.query_id AS id_a, f.neighbor_id AS id_b,
        | f.rnk AS rnk_ab, b.rnk AS rnk_ba
        |FROM t f JOIN t b
        |  ON f.query_id = b.neighbor_id AND f.neighbor_id = b.query_id
        |WHERE f.query_id < f.neighbor_id
        |ORDER BY id_a, id_b""".stripMargin,
    // feature hashing: md5-prefix bucket parity (the md5Int contract);
    // (n_tokens DESC, bucket) is a total order so LIMIT 20 is exact
    "q207_feature_hashing" ->
      """WITH tok AS (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents WHERE length(trim(text)) > 0),
        |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occ
        |       FROM tok GROUP BY token),
        |b AS (
        | SELECT CAST(('0x' || substr(md5(token), 1, 3)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_occ) AS BIGINT) AS n_occ
        | FROM tf GROUP BY 1)
        |SELECT bucket, n_tokens, n_occ FROM b
        |ORDER BY n_tokens DESC, bucket LIMIT 20""".stripMargin,
    // RBO: both rankings recomputed in DuckDB (full cosine vs 32-dim
    // prefix slice), shared pairs weighted by the SAME integer
    // nano-unit table the engine uses (interpolated below) — integer
    // sums, so the compare is FP-order-independent
    "q208_rbo_eval" ->
      (s"""WITH full_r AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |             c.vec_id) AS rnk_full
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |pre_r AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding[1:32],
        |                                    c.embedding[1:32]) DESC,
        |             c.vec_id) AS rnk_prefix
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |j AS (
        | SELECT f.query_id,
        |  CAST(greatest(f.rnk_full, p.rnk_prefix) AS INTEGER) AS m
        | FROM full_r f JOIN pre_r p
        |   USING (query_id, neighbor_id)
        | WHERE f.rnk_full <= ${graft.operators.PipelineQueries.rboK}
        |   AND p.rnk_prefix <= ${graft.operators.PipelineQueries.rboK}),
        |w(m, w_nano) AS (VALUES ${
          graft.operators.PipelineQueries.rboNanoWeights.zipWithIndex
            .map { case (wn, i) => s"(${i + 1}, CAST($wn AS BIGINT))" }
            .mkString(", ")})
        |SELECT j.query_id, CAST(count(*) AS BIGINT) AS n_shared,
        | CAST(sum(w.w_nano) AS BIGINT) AS rbo_nanos
        |FROM j JOIN w ON j.m = w.m
        |GROUP BY j.query_id ORDER BY query_id""".stripMargin),
    "q196_jsonl_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id,
        | CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |   AS BIGINT) AS content_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // burst detection: trailing-frame stats pinned to 4dp before the
    // 3-sigma compare
    "q195_burst_detect" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |s AS (SELECT event_type, day, n,
        |  CAST(count(n) OVER w AS BIGINT) AS n_base,
        |  round(avg(n) OVER w, 4) AS base_mean,
        |  round(coalesce(stddev_samp(n) OVER w, 0.0), 4) AS base_sd
        | FROM daily
        | WINDOW w AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, n_base, base_mean, base_sd,
        | (CAST(n AS DOUBLE) > base_mean + 3.0 * base_sd) AS burst
        |FROM s WHERE n_base >= 3
        |ORDER BY event_type, day""".stripMargin,
    // Poisson bootstrap: integer-threshold Poisson(1) weights, exact
    // integer replicate sums, order-statistic CI on rounded means
    "q194_bootstrap_ci" ->
      """WITH base AS (SELECT doc_id AS id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |   AS x
        | FROM documents),
        |rep AS (SELECT id, x, unnest(generate_series(0, 199)) AS b
        | FROM base),
        |u AS (SELECT b, x,
        |  CAST(('0x' || substr(md5('boot:' || b || ':' || id), 1, 8))
        |    AS BIGINT) % 1000000 AS u
        | FROM rep),
        |wgt AS (SELECT b, x,
        |  (CASE WHEN u >= 367879 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 735759 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 919699 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 981012 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 996340 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 999406 THEN 1 ELSE 0 END)
        |  + (CASE WHEN u >= 999917 THEN 1 ELSE 0 END) AS w
        | FROM u),
        |means AS (SELECT b,
        |  round(CAST(sum(w * x) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6) AS m
        | FROM wgt GROUP BY b HAVING sum(w) > 0),
        |rk AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS r
        | FROM means),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |   AS mean_all
        | FROM base)
        |SELECT ov.n_docs, CAST(200 AS INTEGER) AS n_reps, ov.mean_all,
        | (SELECT m FROM rk WHERE r = 5) AS ci_lo,
        | (SELECT m FROM rk WHERE r = 196) AS ci_hi
        |FROM ov""".stripMargin,
    // bucketed join: the layout changes the PLAN, never the answer
    "q193_bucketed_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'""".stripMargin,
    // bloom join: the runtime filter changes the PLAN, never the
    // answer — the oracle is the plain join semantics (q88 pattern)
    "q181_bloom_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND o_totalprice > 400000""".stripMargin,
    // grouped top-k: the mergeable aggregate must reproduce the plain
    // window's answer exactly (ties by doc_id)
    "q180_grouped_topk" ->
      """SELECT lang, CAST(rnk AS INTEGER) AS rnk, doc_id, n_chars FROM (
        | SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars DESC, doc_id) AS rnk
        | FROM documents) t
        |WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin,
    // LSH collision S-curve: variant generation, shingles, the q29
    // signature family and band-slice equality all replayed; p_theory
    // by the same repeated-squaring multiplication chain
    "q179_lsh_collision_audit" ->
      """WITH tk AS (SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM documents),
        |var AS (SELECT doc_id + 10000 AS doc_id,
        |  array_to_string(list_transform(list_filter(
        |    generate_series(1, len(t)),
        |    i -> (CAST(('0x' || substr(md5('keep:'
        |        || CAST(tk.doc_id AS VARCHAR) || ':'
        |        || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10)
        |      < 4 + tk.doc_id % 7),
        |    i -> t[CAST(i AS INTEGER)]), ' ') AS text
        | FROM tk),
        |corpus AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id, text FROM var),
        |tk2 AS (SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM corpus),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM tk2),
        |mh AS (SELECT doc_id, g.i AS i,
        |  list_min(list_transform(s, x ->
        |    (CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) * (2*g.i + 1)
        |     + g.i * 40503) % 2147483647)) AS mh
        | FROM sh, generate_series(0, 63) AS g(i)),
        |sg AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh
        | GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS id_a, a.s AS sa, b.s AS sb
        | FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 10000
        | WHERE a.doc_id < 10000),
        |ps AS (SELECT ga.doc_id AS id_a, ga.sig AS siga, gb.sig AS sigb
        | FROM sg ga JOIN sg gb ON gb.doc_id = ga.doc_id + 10000
        | WHERE ga.doc_id < 10000),
        |jj AS (SELECT p.id_a, CAST(4 + p.id_a % 7 AS BIGINT) AS keep_lvl,
        |  CAST(len(sa) AS BIGINT) AS n_sh_a, CAST(len(sb) AS BIGINT) AS n_sh_b,
        |  round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
        |    / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE),
        |    4) AS jaccard,
        |  CAST(len(list_filter(generate_series(0, 15), b ->
        |    siga[4*b + 1] = sigb[4*b + 1] AND siga[4*b + 2] = sigb[4*b + 2]
        |    AND siga[4*b + 3] = sigb[4*b + 3]
        |    AND siga[4*b + 4] = sigb[4*b + 4])) AS BIGINT) AS n_hit_bands
        | FROM p JOIN ps ON p.id_a = ps.id_a),
        |sq AS (SELECT *,
        |  (1.0 - (jaccard*jaccard)*(jaccard*jaccard)) AS y FROM jj),
        |sq2 AS (SELECT *, (y*y)*(y*y) AS y4 FROM sq),
        |sq3 AS (SELECT *, (y4*y4)*(y4*y4) AS y16 FROM sq2)
        |SELECT id_a, keep_lvl, n_sh_a, n_sh_b, jaccard, n_hit_bands,
        | (n_hit_bands > 0) AS collided, round(1.0 - y16, 6) AS p_theory
        |FROM sq3 ORDER BY id_a""".stripMargin,
    // retention cohorts: first-activity-day cohorting, distinct
    // (cohort, offset, user) activity, exact integer offsets
    "q177_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
        | WHERE user_id IS NOT NULL),
        |f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
        |sz AS (SELECT cohort_day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
        | FROM f GROUP BY cohort_day),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_day,
        |  date_diff('day', f.cohort_day, e.d) AS off
        | FROM e JOIN f USING (user_id)
        | WHERE date_diff('day', f.cohort_day, e.d) <= 14),
        |r AS (SELECT cohort_day, off,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        | FROM a GROUP BY cohort_day, off)
        |SELECT r.cohort_day, CAST(r.off AS INTEGER) AS day_offset, r.n_active,
        | sz.n_cohort,
        | round(CAST(r.n_active AS DOUBLE) / CAST(sz.n_cohort AS DOUBLE), 6)
        |  AS retention
        |FROM r JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,
    // attrition curve: q32's pair CTE at the 0.30 floor, ten integer
    // grid aggregates on floor(J*1e4+.5) longs
    "q189_dedup_attrition" ->
      s"""WITH pairs0 AS (
         |${jaccardPairOracle(0.3)}
         |),
         |pairs AS (SELECT id_a, id_b,
         |  CAST(floor(jaccard * 10000.0 + 0.5) AS BIGINT) AS jq FROM pairs0),
         |grid AS (SELECT CAST(g * 5 AS INTEGER) AS tau_pct
         | FROM (SELECT unnest(generate_series(10, 19)) AS g)),
         |np AS (SELECT grid.tau_pct, CAST(count(p.jq) AS BIGINT) AS n_pairs
         | FROM grid LEFT JOIN pairs p ON p.jq >= grid.tau_pct * 100
         | GROUP BY grid.tau_pct),
         |nd AS (SELECT tau_pct, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         | FROM (SELECT grid.tau_pct, p.id_a AS d FROM grid
         |    JOIN pairs p ON p.jq >= grid.tau_pct * 100
         |   UNION
         |   SELECT grid.tau_pct, p.id_b AS d FROM grid
         |    JOIN pairs p ON p.jq >= grid.tau_pct * 100) u
         | GROUP BY tau_pct)
         |SELECT np.tau_pct, np.n_pairs, coalesce(nd.n_docs, 0) AS n_docs
         |FROM np LEFT JOIN nd ON nd.tau_pct = np.tau_pct
         |ORDER BY np.tau_pct""".stripMargin,
    // HLL set algebra: per-source and pair-union registers (pointwise
    // max) through the same estimator, inclusion-exclusion on the
    // rounded estimates; exact counts as the recall check
    "q188_hll_pair_overlap" ->
      """WITH d0 AS (SELECT source,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |g AS (SELECT source, a, unnest(generate_series(1, len(a) - 1)) AS i
        | FROM d0 WHERE len(a) >= 2),
        |bgs AS (SELECT source,
        |  a[CAST(i AS INTEGER)] || ' ' || a[CAST(i AS INTEGER) + 1] AS bg
        | FROM g),
        |h AS (SELECT source, bg,
        |  CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) AS hv FROM bgs),
        |r AS (SELECT source, hv % 64 AS bucket, hv >> 6 AS w FROM h),
        |reg AS (SELECT source, bucket,
        |  max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS rho
        | FROM r GROUP BY source, bucket),
        |srcs AS (SELECT DISTINCT source FROM reg),
        |pr AS (SELECT x.source AS sa, y.source AS sb FROM srcs x
        | JOIN srcs y ON x.source < y.source),
        |ureg AS (SELECT sa, sb, bucket, max(rho) AS rho FROM (
        |  SELECT pr.sa, pr.sb, r2.bucket, r2.rho FROM pr
        |   JOIN reg r2 ON r2.source = pr.sa
        |  UNION ALL
        |  SELECT pr.sa, pr.sb, r2.bucket, r2.rho FROM pr
        |   JOIN reg r2 ON r2.source = pr.sb) u
        | GROUP BY sa, sb, bucket),
        |es AS (SELECT source, round(CASE WHEN er <= 160.0 AND vz > 0
        |    THEN 64.0 * ln(64.0 / CAST(vz AS DOUBLE)) ELSE er END, 4) AS est
        | FROM (SELECT source, CAST(64 - nb AS BIGINT) AS vz,
        |   CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |     * CAST(36028797018963968 AS DOUBLE)
        |     / CAST(z_regs + CAST(64 - nb AS BIGINT)
        |       * (CAST(1 AS BIGINT) << 55) AS DOUBLE) AS er
        |  FROM (SELECT source, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER))
        |      AS BIGINT) AS z_regs
        |   FROM reg GROUP BY source) z) t),
        |euu AS (SELECT sa, sb, round(CASE WHEN er <= 160.0 AND vz > 0
        |    THEN 64.0 * ln(64.0 / CAST(vz AS DOUBLE)) ELSE er END, 4) AS est
        | FROM (SELECT sa, sb, CAST(64 - nb AS BIGINT) AS vz,
        |   CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |     * CAST(36028797018963968 AS DOUBLE)
        |     / CAST(z_regs + CAST(64 - nb AS BIGINT)
        |       * (CAST(1 AS BIGINT) << 55) AS DOUBLE) AS er
        |  FROM (SELECT sa, sb, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER))
        |      AS BIGINT) AS z_regs
        |   FROM ureg GROUP BY sa, sb) z) t),
        |ex AS (SELECT DISTINCT source, bg FROM bgs),
        |en AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ex
        | GROUP BY source),
        |ei AS (SELECT a.source AS sa, b.source AS sb,
        |  CAST(count(*) AS BIGINT) AS n_inter
        | FROM ex a JOIN ex b ON a.bg = b.bg AND a.source < b.source
        | GROUP BY a.source, b.source)
        |SELECT pr.sa, pr.sb, ea.est AS est_a, eb.est AS est_b,
        | euu.est AS est_union,
        | round(ea.est + eb.est - euu.est, 4) AS est_inter,
        | na.n + nb2.n - ei.n_inter AS n_union, ei.n_inter,
        | round((round(ea.est + eb.est - euu.est, 4)
        |    - CAST(ei.n_inter AS DOUBLE)) / CAST(ei.n_inter AS DOUBLE), 6)
        |  AS rel_err
        |FROM pr JOIN es ea ON ea.source = pr.sa
        | JOIN es eb ON eb.source = pr.sb
        | JOIN euu ON euu.sa = pr.sa AND euu.sb = pr.sb
        | JOIN ei ON ei.sa = pr.sa AND ei.sb = pr.sb
        | JOIN en na ON na.source = pr.sa
        | JOIN en nb2 ON nb2.source = pr.sb
        |ORDER BY pr.sa, pr.sb""".stripMargin,
    // GroupKFold audit: fold = md5(group) mod k restates directly
    "q185_groupkfold" ->
      """WITH a AS (SELECT source,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
        |   AS nt
        | FROM documents),
        |b AS (SELECT source, nt,
        |  CAST(('0x' || substr(md5('fold:' || source), 1, 15)) AS BIGINT) % 5
        |    AS fold
        | FROM a),
        |pf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        | FROM b GROUP BY fold),
        |t AS (SELECT CAST(sum(nt) AS BIGINT) AS t_tokens FROM b)
        |SELECT pf.fold, pf.n_docs, pf.n_groups, pf.n_tokens,
        | round(CAST(pf.n_tokens AS DOUBLE) / CAST(t.t_tokens AS DOUBLE), 6)
        |  AS token_share
        |FROM pf, t ORDER BY pf.fold""".stripMargin,
    // LSH design table: 7 banding legs, powers by the same repeated-
    // squaring text, tau on the integer grid index — all-BIGINT output
    "q186_lsh_design" -> lshDesignOracle(64, 80),
    // waterfilling: source selection entirely on the integer side of
    // the divide (P_k + (n-k)*m_k <= B), one ratio for the cap level
    "q184_waterfill_caps" ->
      """WITH a AS (SELECT source,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
        |   AS nt
        | FROM documents),
        |m AS (SELECT source, CAST(sum(nt) AS BIGINT) AS mass FROM a
        | GROUP BY source),
        |rk AS (SELECT source, mass,
        |  CAST(row_number() OVER (ORDER BY mass, source) AS BIGINT) AS j,
        |  CAST(sum(mass) OVER (ORDER BY mass, source
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pk,
        |  CAST(count(*) OVER () AS BIGINT) AS n,
        |  CAST(sum(mass) OVER () AS BIGINT) AS total
        | FROM m),
        |rb AS (SELECT *, (total * 1) // 2 AS budget FROM rk),
        |kr AS (SELECT max(CASE WHEN pk + (n - j) * mass <= budget
        |    THEN j ELSE 0 END) AS k,
        |  max(n) AS n, max(budget) AS budget, max(total) AS total FROM rb),
        |sv AS (SELECT kr.k, kr.n, kr.budget, kr.total,
        |  coalesce(rb2.pk, 0) AS p_k,
        |  CASE WHEN kr.k = kr.n THEN CAST(kr.total AS DOUBLE)
        |   ELSE CAST(kr.budget - coalesce(rb2.pk, 0) AS DOUBLE)
        |     / CAST(kr.n - kr.k AS DOUBLE) END AS cap_raw
        | FROM kr LEFT JOIN rb rb2 ON rb2.j = kr.k)
        |SELECT rb.source, rb.mass, sv.budget,
        | round(sv.cap_raw, 6) AS cap,
        | (CAST(rb.mass AS DOUBLE) > sv.cap_raw) AS capped,
        | round(least(CAST(rb.mass AS DOUBLE), sv.cap_raw), 6) AS alloc
        |FROM rb, sv ORDER BY rb.source""".stripMargin,
    // source Gini: exact sorted-formula sums as BIGINTs, one ratio
    "q178_source_gini" ->
      """WITH a AS (SELECT source,
        |  CASE WHEN len(trim(lower(text))) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
        |   AS nt
        | FROM documents),
        |m AS (SELECT source, CAST(sum(nt) AS BIGINT) AS mass FROM a
        | GROUP BY source),
        |rk AS (SELECT source, mass,
        |  row_number() OVER (ORDER BY mass, source) AS i FROM m),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(mass) AS BIGINT) AS total_tokens,
        |  CAST(sum(i * mass) AS BIGINT) AS wsum,
        |  CAST(max(mass) AS BIGINT) AS max_mass FROM rk)
        |SELECT n_sources, total_tokens,
        | round(2.0 * CAST(wsum AS DOUBLE)
        |   / (CAST(n_sources AS DOUBLE) * CAST(total_tokens AS DOUBLE))
        |   - CAST(n_sources + 1 AS DOUBLE) / CAST(n_sources AS DOUBLE), 6)
        |  AS gini,
        | round(CAST(max_mass AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
        |  AS top_share
        |FROM s""".stripMargin,
    // shard-union HLL: the engine reads ONLY persisted registers; the
    // oracle recomputes per-shard AND merged estimates from raw text —
    // equality is the mergeability proof
    "q174_hll_shard_union" ->
      """WITH d0 AS (SELECT source,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |g AS (SELECT source, a, unnest(generate_series(1, len(a) - 1)) AS i
        | FROM d0 WHERE len(a) >= 2),
        |bgs AS (SELECT source,
        |  a[CAST(i AS INTEGER)] || ' ' || a[CAST(i AS INTEGER) + 1] AS bg
        | FROM g),
        |keyed AS (
        | SELECT source, bg FROM bgs
        | UNION ALL SELECT '__all__' AS source, bg FROM bgs),
        |h AS (SELECT source, CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT)
        |  AS hv FROM keyed),
        |r AS (SELECT source, hv % 64 AS bucket, hv >> 6 AS w FROM h),
        |reg AS (SELECT source, bucket,
        |  max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS rho
        | FROM r GROUP BY source, bucket),
        |z AS (SELECT source, CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER)) AS BIGINT)
        |    AS z_regs
        | FROM reg GROUP BY source),
        |f AS (SELECT source, CAST(64 - nb AS BIGINT) AS v_zero,
        |  z_regs + CAST(64 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 55)
        |    AS z_scaled
        | FROM z),
        |e1 AS (SELECT source, v_zero, z_scaled,
        |  CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |    * CAST(36028797018963968 AS DOUBLE)
        |    / CAST(z_scaled AS DOUBLE) AS est_raw
        | FROM f)
        |SELECT source, v_zero, z_scaled,
        | round(CASE WHEN est_raw <= 160.0 AND v_zero > 0
        |   THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
        |   ELSE est_raw END, 4) AS est
        |FROM e1 ORDER BY source""".stripMargin,
    // blocklist: corpus-derived top-8 df terms (len >= 4), tiered
    // drop/flag/keep policy; zero-hit docs reattach via left join
    "q168_blocklist_scan" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
        | WHERE length(term) >= 4 GROUP BY term),
        |bl AS MATERIALIZED (
        | SELECT term FROM dfq ORDER BY df DESC, term LIMIT 8),
        |h AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(count(DISTINCT t.term) AS BIGINT) AS n_hit_terms
        | FROM toks t JOIN bl ON t.term = bl.term GROUP BY t.doc_id)
        |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        | coalesce(h.n_hit_terms, 0) AS n_hit_terms,
        | CASE WHEN coalesce(h.n_hit_terms, 0) >= 3 THEN 'drop'
        |   WHEN coalesce(h.n_hit_terms, 0) >= 1 THEN 'flag'
        |   ELSE 'keep' END AS action
        |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // char entropy: 26 length-diff probes (map-only both sides), each
    // c*ln(c) term fixed-point quantized so the sum is an exact BIGINT
    "q169_char_entropy" -> {
      val cnts = ('a' to 'z').map(c =>
        s"length(t) - length(replace(t, '$c', ''))").mkString(", ")
      s"""WITH b AS (SELECT doc_id, lower(text) AS t FROM documents),
         |c AS (SELECT doc_id, [$cnts] AS cnts FROM b),
         |s AS (SELECT doc_id,
         |  CAST(list_sum(cnts) AS BIGINT) AS n_letters,
         |  CAST(len(list_filter(cnts, x -> x > 0)) AS BIGINT)
         |    AS n_distinct_letters,
         |  CAST(list_sum(list_transform(cnts, x -> CASE WHEN x > 0
         |    THEN CAST(floor(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT)
         |    ELSE 0 END)) AS BIGINT) AS s_fp,
         |  CAST(list_max(cnts) AS BIGINT) AS max_cnt
         | FROM c)
         |SELECT doc_id, n_letters, n_distinct_letters,
         | CASE WHEN n_letters = 0 THEN 0.0 ELSE round(
         |   (ln(CAST(n_letters AS DOUBLE)) - CAST(s_fp AS DOUBLE)
         |     / 1000000.0 / CAST(n_letters AS DOUBLE)) / ln(2.0), 6)
         |  END AS entropy_bits,
         | CASE WHEN n_letters = 0 THEN 0.0 ELSE round(
         |   CAST(max_cnt AS DOUBLE) / CAST(n_letters AS DOUBLE), 6)
         |  END AS max_letter_frac
         |FROM s ORDER BY doc_id""".stripMargin
    },
    // NDCG@5: exact + IVF leg CTEs recomposed (q106's construction);
    // every DCG term and the IDCG normalizer fixed-point quantized so
    // per-query sums are exact integers
    "q170_ndcg_eval" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), t AS (
         | SELECT i.query_id, i.rnk,
         |  CAST(coalesce(6 - e.rnk, 0) AS DOUBLE) AS rel
         | FROM ivf i LEFT JOIN exact e USING (query_id, neighbor_id)),
         |d AS (
         | SELECT query_id,
         |  CAST(sum(CAST(floor(rel / (ln(CAST(rnk AS DOUBLE) + 1.0)
         |    / ln(2.0)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS dcg_fp,
         |  CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rel_found
         | FROM t GROUP BY query_id),
         |i0 AS (
         | SELECT CAST(sum(CAST(floor(CAST(6 - p AS DOUBLE)
         |    / (ln(CAST(p AS DOUBLE) + 1.0) / ln(2.0)) * 1000000.0 + 0.5)
         |   AS BIGINT)) AS BIGINT) AS idcg_fp
         | FROM (SELECT unnest(generate_series(1, 5)) AS p))
         |SELECT query_id, n_rel_found, dcg_fp, idcg_fp,
         | round(CAST(dcg_fp AS DOUBLE) / CAST(idcg_fp AS DOUBLE), 6) AS ndcg
         |FROM d, i0 ORDER BY query_id""".stripMargin,
    // prefix-filter join: the rarest-first order restates as
    // list(term ORDER BY df, term), prefix length and the tau gate as
    // exact integer arithmetic; candidates then exact-verified
    "q171_prefix_filter_join" ->
      """WITH tk AS (SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        | FROM documents),
        |toks AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
        |       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |  ELSE [array_to_string(t, ' ')] END) AS term
        | FROM tk),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks
        | GROUP BY term),
        |tj AS (SELECT t.doc_id, t.term, d.df FROM toks t
        | JOIN dfreq d ON t.term = d.term),
        |sets AS (SELECT doc_id, list(term ORDER BY df, term) AS l,
        |  CAST(count(*) AS BIGINT) AS s FROM tj GROUP BY doc_id),
        |pref AS (SELECT doc_id, s,
        |  unnest(l[1 : CAST(s - ((8 * s + 9) // 10) + 1 AS INTEGER)]) AS term
        | FROM sets),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        | FROM pref a JOIN pref b
        |  ON a.term = b.term AND a.doc_id < b.doc_id
        |  AND a.s * 10 >= 8 * b.s AND b.s * 10 >= 8 * a.s),
        |inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
        | FROM cand c JOIN toks ta ON ta.doc_id = c.id_a
        | JOIN toks tb ON tb.doc_id = c.id_b AND tb.term = ta.term
        | GROUP BY c.id_a, c.id_b),
        |v AS (SELECT i.id_a, i.id_b, i.inter, sa.s + sb.s - i.inter AS uni
        | FROM inter i JOIN sets sa ON sa.doc_id = i.id_a
        | JOIN sets sb ON sb.doc_id = i.id_b)
        |SELECT id_a, id_b, inter, uni,
        | round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jac
        |FROM v WHERE inter * 10 >= 8 * uni
        |ORDER BY id_a, id_b""".stripMargin,
    // Gopher rules: every ratio threshold restated as integer
    // cross-multiplication, so all five predicates are exact
    "q172_gopher_rules" ->
      """WITH b AS (SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |    THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(a) AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(a, w -> length(w))), 0)
        |    AS BIGINT) AS sum_len,
        |  CAST(coalesce(list_max(list_transform(list_distinct(a),
        |    t -> len(list_filter(a, x -> x = t)))), 0) AS BIGINT)
        |    AS mode_cnt,
        |  CAST(len(list_filter(a, x -> regexp_matches(x, '^[a-z]+$')))
        |    AS BIGINT) AS n_alpha,
        |  list_contains(a, 'the') OR list_contains(a, 'a') AS r3_stopword
        | FROM b)
        |SELECT doc_id, n_words, sum_len, mode_cnt,
        | (n_words >= 20 AND n_words <= 400) AS r1_count,
        | (sum_len >= 3 * n_words AND sum_len <= 10 * n_words) AS r2_wordlen,
        | r3_stopword,
        | (mode_cnt * 4 <= n_words) AS r4_dominance,
        | (n_alpha * 5 >= n_words * 4) AS r5_alpha,
        | ((n_words >= 20 AND n_words <= 400)
        |   AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
        |   AND r3_stopword AND (mode_cnt * 4 <= n_words)
        |   AND (n_alpha * 5 >= n_words * 4)) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    // PCA by integer power iteration: exact fixed-point covariance +
    // L∞-renormalized rounds unroll to bit-identical CTEs
    "q162_pca_power" -> pcaOracle(64, 8, 10000L),
    // HTML boilerplate removal: generation and the RE2-safe extraction
    // regexes restate verbatim (DuckDB regexp_replace needs the 'g'
    // flag Spark applies implicitly)
    "q163_html_extract" ->
      """WITH w AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  '<body><div class="nav"><a href="/">home</a> <a href="/a">about</a></div>'
        |  || array_to_string(list_transform(
        |    generate_series(0, CAST(ceil(len(w) / 10.0) AS INTEGER) - 1),
        |    i -> CASE WHEN CAST(('0x' || substr(md5('blk:' || doc_id
        |        || ':' || i), 1, 8)) AS BIGINT) % 3 = 0
        |      THEN '<div class="m">' || array_to_string(list_transform(
        |        list_slice(w, i * 10 + 1, i * 10 + 10),
        |        x -> '<a href="#' || x || '">' || x || '</a>'), '')
        |        || '</div>'
        |      ELSE '<p>' || array_to_string(
        |        list_slice(w, i * 10 + 1, i * 10 + 10), ' ') || '</p>'
        |      END), '')
        |  || '</body>' AS html
        | FROM w),
        |spl AS (SELECT doc_id,
        |  string_split_regex(html, '</p>|</div>') AS l FROM h),
        |p0 AS (SELECT doc_id,
        |  unnest(generate_series(1, len(l))) AS pos, l FROM spl),
        |p AS (SELECT doc_id, pos, l[CAST(pos AS INTEGER)] AS raw,
        |  regexp_replace(l[CAST(pos AS INTEGER)], '<[^>]*>', '', 'g')
        |   AS vis FROM p0),
        |b AS (SELECT doc_id, pos, vis, strlen(vis) AS nv,
        |  coalesce(list_sum(list_transform(
        |    regexp_extract_all(raw, '<a [^>]*>([^<]*)</a>', 1),
        |    s -> strlen(s))), 0) AS lc
        | FROM p WHERE strlen(vis) > 0),
        |k AS (SELECT doc_id, pos, vis, nv,
        |  (CAST(lc AS DOUBLE) / CAST(nv AS DOUBLE)) <= 0.5 AS keep
        | FROM b)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_blocks,
        | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN keep THEN nv ELSE 0 END) AS BIGINT)
        |  AS kept_chars,
        | CAST(sum(nv) AS BIGINT) AS total_chars,
        | md5(coalesce(string_agg(vis, ' ' ORDER BY pos)
        |   FILTER (WHERE keep), '')) AS main_md5,
        | round(1.0 - CAST(sum(CASE WHEN keep THEN nv ELSE 0 END)
        |    AS DOUBLE) / CAST(sum(nv) AS DOUBLE), 6) AS boiler_frac
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // ε-DP Laplace release: inverse-CDF noise at an md5 uniform is a
    // closed form, so the whole release (noise, post-processing,
    // utility audit) restates in SQL across the ε ladder
    "q161_dp_release" ->
      """WITH counts AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_true
        | FROM documents GROUP BY source),
        |eps AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(1.0 AS DOUBLE),
        |  CAST(4.0 AS DOUBLE)]) AS eps),
        |x AS (
        | SELECT c.source, e.eps, c.n_true,
        |  (CAST(('0x' || substr(md5('dp:' || CAST(e.eps AS VARCHAR)
        |     || ':' || c.source), 1, 8)) AS BIGINT) + 0.5)
        |   / 4294967296.0 - 0.5 AS cen
        | FROM counts c CROSS JOIN eps e),
        |n AS (
        | SELECT source, eps, n_true,
        |  round((-1.0 / eps) * sign(cen) * ln(1 - 2 * abs(cen)), 10)
        |   AS noise
        | FROM x)
        |SELECT source, eps, n_true, noise,
        | round(n_true + noise, 10) AS n_noisy,
        | greatest(CAST(0 AS BIGINT),
        |   CAST(floor(round(n_true + noise, 10) + 0.5) AS BIGINT))
        |  AS n_released,
        | round(abs(noise), 10) AS abs_err
        |FROM n ORDER BY source, eps""".stripMargin,
    // CDC chunking: the stateless cut rule (every qualifying window
    // cuts) is the SQL-expressible contract — cuts, chunk digests and
    // the cross-doc dup profile all restate in plain CTEs
    "q159_cdc_chunks" ->
      """WITH docs AS (
        | SELECT doc_id, text, length(text) AS n FROM documents),
        |cuts AS (
        | SELECT doc_id, i + 7 AS cutpos
        | FROM (SELECT doc_id, text,
        |    unnest(generate_series(1, n - 7)) AS i
        |   FROM docs WHERE n >= 8) t
        | WHERE CAST(('0x' || substr(md5('cdc:' ||
        |    substr(text, CAST(i AS INTEGER), 8)), 1, 8)) AS BIGINT)
        |   % 64 = 0),
        |marks AS (
        | SELECT DISTINCT doc_id, cutpos FROM (
        |  SELECT doc_id, cutpos FROM cuts
        |  UNION ALL SELECT doc_id, n FROM docs WHERE n > 0) u),
        |chunks AS (
        | SELECT doc_id,
        |  coalesce(lag(cutpos) OVER (PARTITION BY doc_id ORDER BY cutpos), 0)
        |    + 1 AS off,
        |  cutpos AS chend
        | FROM marks),
        |withmd5 AS (
        | SELECT c.doc_id, c.chend - c.off + 1 AS len,
        |  md5(substr(d.text, CAST(c.off AS INTEGER),
        |    CAST(c.chend - c.off + 1 AS INTEGER))) AS h
        | FROM chunks c JOIN docs d USING (doc_id)),
        |mult AS (
        | SELECT h, count(DISTINCT doc_id) AS docs FROM withmd5 GROUP BY h),
        |per AS (
        | SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN m.docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(sum(CASE WHEN m.docs > 1 THEN w.len ELSE 0 END) AS BIGINT)
        |    AS dup_chars
        | FROM withmd5 w JOIN mult m USING (h) GROUP BY w.doc_id)
        |SELECT d.doc_id,
        | coalesce(per.n_chunks, 0) AS n_chunks,
        | coalesce(per.n_dup_chunks, 0) AS n_dup_chunks,
        | coalesce(per.dup_chars, 0) AS dup_chars
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // GZIP-member shards: only the CONTENT view is oracle-stable —
    // the walker's inflated digests restate md5(text)/strlen(text)
    "q158_targz_shards" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  doc_id || '.txt.gz' AS name,
        |  CAST(strlen(text) AS BIGINT) AS content_size,
        |  md5(text) AS content_md5
        | FROM documents),
        |o AS (
        | SELECT shard, doc_id, name, content_size, content_md5,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1
        |   AS INTEGER) AS idx
        | FROM m),
        |s AS (SELECT shard, CAST(count(*) AS INTEGER) AS n_entries
        | FROM o GROUP BY shard)
        |SELECT o.shard, s.n_entries, o.idx, o.name, o.content_size,
        | o.content_md5
        |FROM o JOIN s USING (shard) ORDER BY shard, idx""".stripMargin,
    // Efraimidis-Spirakis: the 10-dp-pinned ln(u)/w key makes the
    // whole sample (membership AND order) a SQL closed form
    "q156_weighted_reservoir" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |k AS (
        | SELECT doc_id, CAST(len(a) AS BIGINT) AS w,
        |  round(ln((CAST(('0x' || substr(md5('esample:' || doc_id), 1, 8))
        |     AS BIGINT) + 1) / 4294967296.0) / len(a), 10) AS es_key
        | FROM t WHERE len(a) >= 1)
        |SELECT doc_id, w, es_key,
        | CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INTEGER)
        |  AS rnk
        |FROM k ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin,
    // KMV windowed distinct: the Aggregator's k-min sketch restated as
    // a per-day rank over distinct hashes — estimate AND exact checked
    "q155_kmv_windows" ->
      """WITH e AS (
        | SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
        |  CAST(('0x' || substr(md5('kmvu:' || user_id), 1, 15)) AS BIGINT) AS h
        | FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT DISTINCT day, h FROM e),
        |rk AS (SELECT day, h,
        |  row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM d),
        |sk AS (SELECT day, count(*) AS c,
        |  max(h) / 1152921504606846976.0 AS xk
        | FROM rk WHERE rn <= 32 GROUP BY day),
        |ex AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM e GROUP BY day)
        |SELECT ex.day,
        | round(CASE WHEN sk.c < 32 THEN CAST(sk.c AS DOUBLE)
        |  ELSE 31.0 / sk.xk END, 4) AS est_users,
        | ex.n_users, ex.n_events
        |FROM ex JOIN sk USING (day) ORDER BY day""".stripMargin,
    // HLL windowed distinct: the Aggregator's registers restated as a
    // per-(day, bucket) max — q167's closed form, grouped by window;
    // estimate AND exact checked
    "q173_hll_windows" ->
      """WITH e AS (
        | SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
        |  CAST(('0x' || substr(md5('hllu:' || user_id), 1, 15)) AS BIGINT) AS h
        | FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT day, h % 64 AS bucket, h >> 6 AS w FROM e),
        |reg AS (SELECT day, bucket,
        |  max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS rho
        | FROM r GROUP BY day, bucket),
        |z AS (SELECT day, CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER)) AS BIGINT)
        |    AS z_regs
        | FROM reg GROUP BY day),
        |f AS (SELECT day, CAST(64 - nb AS BIGINT) AS v_zero,
        |  z_regs + CAST(64 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 55)
        |    AS z_scaled
        | FROM z),
        |e1 AS (SELECT day, v_zero,
        |  CAST(0.709 AS DOUBLE) * 64.0 * 64.0
        |    * CAST(36028797018963968 AS DOUBLE)
        |    / CAST(z_scaled AS DOUBLE) AS est_raw
        | FROM f),
        |e2 AS (SELECT day,
        |  CASE WHEN est_raw <= 160.0 AND v_zero > 0
        |    THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
        |    ELSE est_raw END AS eu
        | FROM e1),
        |ex AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM e GROUP BY day)
        |SELECT ex.day, round(e2.eu, 4) AS est_users, ex.n_users, ex.n_events
        |FROM ex JOIN e2 USING (day) ORDER BY day""".stripMargin,
    // Matryoshka truncation recall: both truncated legs are the exact
    // machinery on list slices — a rank disagreement is a prefix-norm
    // or tie-break bug, not index noise
    "q154_matryoshka_recall" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), m16 AS (
         |${truncTopKOracle(16)}
         |), m32 AS (
         |${truncTopKOracle(32)}
         |), hits AS (
         | SELECT (SELECT count(*) FROM exact) AS n_exact,
         |  (SELECT count(*) FROM exact JOIN m16 USING (query_id, neighbor_id)) AS m16_hits,
         |  (SELECT count(*) FROM exact JOIN m32 USING (query_id, neighbor_id)) AS m32_hits)
         |SELECT CAST(5 AS INTEGER) AS k, n_exact, m16_hits, m32_hits,
         | round(CAST(m16_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS m16_recall,
         | round(CAST(m32_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS m32_recall
         |FROM hits""".stripMargin,
    // Heaps'-law vocabulary growth: bucketed first-occurrence counts
    // with running totals; local exponent from the neighbor row only
    // (no cross-bucket float summation — bit-stable on both sides)
    "q152_vocab_growth" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |bkt AS (
        | SELECT doc_id // 50 AS bkt, CAST(sum(len(a)) AS BIGINT) AS n_tokens
        | FROM t GROUP BY 1),
        |fo AS (
        | SELECT min(doc_id) // 50 AS bkt
        | FROM (SELECT doc_id, unnest(a) AS w FROM t) tok GROUP BY w),
        |nt AS (SELECT bkt, CAST(count(*) AS BIGINT) AS new_terms
        | FROM fo GROUP BY 1),
        |j AS (
        | SELECT b.bkt, b.n_tokens,
        |  CAST(coalesce(nt.new_terms, 0) AS BIGINT) AS new_terms,
        |  CAST(sum(b.n_tokens) OVER (ORDER BY b.bkt) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nt.new_terms, 0)) OVER (ORDER BY b.bkt) AS BIGINT)
        |    AS cum_vocab
        | FROM bkt b LEFT JOIN nt USING (bkt))
        |SELECT bkt, n_tokens, new_terms, cum_tokens, cum_vocab,
        | round((log10(CAST(cum_vocab AS DOUBLE)) -
        |   log10(CAST(lag(cum_vocab) OVER (ORDER BY bkt) AS DOUBLE))) /
        |  (log10(CAST(cum_tokens AS DOUBLE)) -
        |   log10(CAST(lag(cum_tokens) OVER (ORDER BY bkt) AS DOUBLE))), 4)
        |  AS beta
        |FROM j ORDER BY bkt""".stripMargin,
    "q151_bigram_lm_persist" ->  // q118's persisted twin: integer counts round-trip parquet exactly
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |toks AS (SELECT unnest(a) AS w FROM t),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
        |bg AS (
        | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |p AS (
        | SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(log10((cab.c_ab + 0.5) / (u.c + 0.5 * v.v))), 4) AS avg_logp
        | FROM bg JOIN cab USING (w1, w2) JOIN uni u ON u.w = bg.w1, v
        | GROUP BY bg.doc_id)
        |SELECT d.doc_id, p.n_bigrams, p.avg_logp
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q118_bigram_lm" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |toks AS (SELECT unnest(a) AS w FROM t),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
        |bg AS (
        | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |p AS (
        | SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(log10((cab.c_ab + 0.5) / (u.c + 0.5 * v.v))), 4) AS avg_logp
        | FROM bg JOIN cab USING (w1, w2) JOIN uni u ON u.w = bg.w1, v
        | GROUP BY bg.doc_id)
        |SELECT d.doc_id, p.n_bigrams, p.avg_logp
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Diversity cap: the q53 coarse build's final assignment + a
    // per-cell md5-rank cap (two-level pruned in the engine — the
    // prune keeps a superset, the final rank is what the oracle states)
    "q119_cluster_cap" ->
      s"""WITH e AS (
         | SELECT vec_id,
         |  list_transform(CAST(embedding AS DOUBLE[]),
         |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
         |                                         y -> y*y)))) AS v
         | FROM embeddings),
         |${ivfBuildCtes(16, 3, 64, 42)},
         |h AS (
         | SELECT vec_id, cell,
         |  CAST(('0x' || substr(md5('divcap:' || vec_id), 1, 8)) AS BIGINT) AS hh
         | FROM af)
         |SELECT vec_id, cell, CAST(r AS INTEGER) AS r FROM (
         | SELECT vec_id, cell,
         |  row_number() OVER (PARTITION BY cell ORDER BY hh, vec_id) AS r
         | FROM h) t WHERE r <= 20 ORDER BY vec_id""".stripMargin,
    // JL audit: md5-parity ±1 signs × 1/√16 (= 0.25 exactly), squared-
    // distance ratios 4-dp-rounded, avg over the ROUNDED ratios
    "q120_jl_distortion" ->
      """WITH e AS (
        | SELECT vec_id,
        |  list_transform(CAST(embedding AS DOUBLE[]),
        |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                         y -> y*y)))) AS v
        | FROM embeddings),
        |s AS (SELECT vec_id, v FROM e WHERE vec_id < 32),
        |p AS (
        | SELECT vec_id,
        |  list_transform(range(0, 16), j ->
        |   list_sum(list_transform(range(1, 65), i -> v[i] *
        |    (CASE WHEN CAST(('0x' || substr(md5('jl:' || j || ':' || (i - 1)), 1, 8))
        |            AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END))) * 0.25) AS pv
        | FROM s),
        |pr AS (
        | SELECT round(
        |   list_sum(list_transform(range(1, 17),
        |     k -> (pa.pv[k] - pb.pv[k]) * (pa.pv[k] - pb.pv[k])))
        |   / list_sum(list_transform(range(1, 65),
        |     k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k]))), 4) AS ratio
        | FROM s a JOIN s b ON a.vec_id < b.vec_id
        |  JOIN p pa ON pa.vec_id = a.vec_id
        |  JOIN p pb ON pb.vec_id = b.vec_id)
        |SELECT count(*) AS n_pairs, round(avg(ratio), 4) AS avg_ratio,
        | min(ratio) AS min_ratio, max(ratio) AS max_ratio FROM pr""".stripMargin,
    // Half-life decay anchored at each user's latest event: weights in
    // (0,1], pow(2, exact-integer-delta / literal) on both sides
    "q121_time_decay" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |mx AS (SELECT user_id, max(us) AS mx FROM e GROUP BY 1),
        |w AS (
        | SELECT e.user_id, e.value,
        |  pow(2.0, CAST(e.us - mx.mx AS DOUBLE) / 604800000000.0) AS w
        | FROM e JOIN mx USING (user_id))
        |SELECT user_id, count(*) AS n_events,
        | round(sum(value * w), 4) AS decayed_sum,
        | round(sum(value * w) / sum(value), 4) AS freshness
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Markov transitions: lag pairs per user (time, event_id order),
    // integer counts, float division of exact integers — no pins
    "q122_event_transitions" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (
        | SELECT lag(event_type) OVER (PARTITION BY user_id
        |   ORDER BY us, event_id) AS from_type, event_type AS to_type
        | FROM e),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, round(c.n / t.tot, 4) AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    // Z-order audit: the Morton interleave restated bit-by-bit, then
    // the same min/max bucket arithmetic — exact integers throughout
    "q123_zorder_audit" -> {
      val zv = (0 until 16).flatMap(b => Seq(
        s"(((pq >> $b) & 1) << ${2 * b})",
        s"(((sq >> $b) & 1) << ${2 * b + 1})")).mkString(" | ")
      s"""WITH l AS (
         | SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk
         | FROM lineitem),
         |mx AS (SELECT max(ok) AS mx, max(pk) AS mxp, max(sk) AS mxs FROM l),
         |q AS (SELECT pk, sk,
         |       CAST(floor(pk * 65536.0 / (mx.mxp + 1)) AS BIGINT) AS pq,
         |       CAST(floor(sk * 65536.0 / (mx.mxs + 1)) AS BIGINT) AS sq
         |      FROM l, mx),
         |zb AS (SELECT pk, sk, ($zv) >> 24 AS bkt FROM q),
         |nb AS (SELECT pk, sk,
         |        CAST(floor(ok * 256.0 / (mx.mx + 1)) AS BIGINT) AS bkt
         |       FROM l, mx),
         |zs AS (SELECT bkt, min(pk) AS minp, max(pk) AS maxp,
         |        min(sk) AS mins, max(sk) AS maxs FROM zb GROUP BY 1),
         |ns AS (SELECT bkt, min(pk) AS minp, max(pk) AS maxp,
         |        min(sk) AS mins, max(sk) AS maxs FROM nb GROUP BY 1)
         |SELECT layout, n_buckets, buckets_hit_x, buckets_hit_y FROM (
         | SELECT 'natural' AS layout, count(*) AS n_buckets,
         |  count(*) FILTER (minp <= 500 AND maxp >= 500) AS buckets_hit_x,
         |  count(*) FILTER (mins <= 50 AND maxs >= 50) AS buckets_hit_y
         | FROM ns
         | UNION ALL
         | SELECT 'zorder', count(*),
         |  count(*) FILTER (minp <= 500 AND maxp >= 500),
         |  count(*) FILTER (mins <= 50 AND maxs >= 50)
         | FROM zs) t ORDER BY layout""".stripMargin
    },
    // k-core: one alive/filter CTE pair per peel round — all-integer
    "q124_kcore" -> {
      val peels = (1 to 4).map { i =>
        val j = i - 1
        s"""a$i AS (SELECT src AS node FROM e$j GROUP BY src HAVING count(*) >= 4),
           |e$i AS (SELECT e$j.src, e$j.dst FROM e$j
           |        JOIN a$i s ON s.node = e$j.src
           |        JOIN a$i t ON t.node = e$j.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
         | FROM lineitem WHERE l_orderkey % 10 = 0),
         |e0 AS (SELECT p AS src, sp AS dst FROM pairs
         |       UNION ALL SELECT sp, p FROM pairs),
         |$peels
         |SELECT src AS node, count(*) AS deg FROM e4
         |GROUP BY src ORDER BY node""".stripMargin
    },
    // Non-canonical WAV layouts: same parameter round-trip as q105 but
    // the writer splices a JUNK chunk (odd lengths exercise RIFF's
    // pad-to-even rule) before fmt or between fmt and data, and the
    // CHUNK-WALK parser recovers the fields. canonical_rejects = TRUE
    // pins that the fixed-offset parser really rejects every layout —
    // i.e. the walk is doing work, not riding the canonical path.
    "q113_wav_chunked" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'junk_first' ELSE 'junk_mid' END
        |   AS layout,
        | CAST(doc_id % 37 + 1 AS BIGINT) AS junk_len,
        | TRUE AS canonical_rejects,
        | CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        | CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
        | CAST(16 AS INTEGER) AS bits,
        | CAST(doc_id % 997 + 1 AS BIGINT) AS n_samples,
        | round((doc_id % 997 + 1) * 1000.0 /
        |   (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |    WHEN 2 THEN 22050 ELSE 44100 END), 4) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The whole curation recipe, verified end-to-end: per-stage
    // survivor docs+tokens through lang → quality → exact canonical →
    // near-dup canonical → decontamination → split. Recomposes the
    // constituent oracles' CTEs verbatim (q49's recursive components,
    // q23's keepers, q61's overlap scan, q26's lang scores, q25/q55's
    // quality, q59's bucket) — no pinned literals, so a drift in ANY
    // constituent shows up here too.
    "q115_curation_funnel" ->
      (s"""$funnelFlagCtes,
        |agg AS (SELECT
        |  count(*) AS d0,
        |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0,
        |  count(*) FILTER (WHERE p1) AS d1,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1), 0) AS BIGINT) AS t1,
        |  count(*) FILTER (WHERE p1 AND p2) AS d2,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2), 0) AS BIGINT) AS t2,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3) AS d3,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3), 0) AS BIGINT) AS t3,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4) AS d4,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3 AND p4), 0) AS BIGINT) AS t4,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5) AS d5,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5), 0) AS BIGINT) AS t5,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b < 80) AS d6,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b < 80), 0) AS BIGINT) AS t6,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b >= 80 AND b < 90) AS d7,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b >= 80 AND b < 90), 0) AS BIGINT) AS t7,
        |  count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b >= 90) AS d8,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5 AND b >= 90), 0) AS BIGINT) AS t8
        | FROM flags)
        |SELECT stage_id, stage, n_docs, n_tokens FROM (
        | SELECT 0 AS stage_id, 'corpus' AS stage, d0 AS n_docs, t0 AS n_tokens FROM agg
        | UNION ALL SELECT 1, 'lang_en', d1, t1 FROM agg
        | UNION ALL SELECT 2, 'quality', d2, t2 FROM agg
        | UNION ALL SELECT 3, 'exact_canonical', d3, t3 FROM agg
        | UNION ALL SELECT 4, 'near_dup_canonical', d4, t4 FROM agg
        | UNION ALL SELECT 5, 'decontaminated', d5, t5 FROM agg
        | UNION ALL SELECT 6, 'train', d6, t6 FROM agg
        | UNION ALL SELECT 7, 'val', d7, t7 FROM agg
        | UNION ALL SELECT 8, 'test', d8, t8 FROM agg) f
        |ORDER BY stage_id""".stripMargin),
    // Fluency quartile buckets over the q77 scores: bounds 4-dp-pinned
    // (quantile_cont ≡ percentile, the q50-proven pair; 0.25/0.75 are
    // exact binary fractions so the rank positions match to the bit).
    "q101_fluency_buckets" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END) AS term
        | FROM documents),
        |f AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |p AS (
        | SELECT doc_id, round(avg(log10(CAST(c AS DOUBLE) / n.n)), 4) AS fluency
        | FROM toks JOIN f USING (term), n GROUP BY doc_id),
        |b AS (SELECT round(quantile_cont(fluency, 0.25), 4) AS b1,
        |             round(quantile_cont(fluency, 0.75), 4) AS b2 FROM p)
        |SELECT d.doc_id, p.fluency,
        | CASE WHEN p.fluency IS NULL THEN 'empty'
        |      WHEN p.fluency <= b.b1 THEN 'tail'
        |      WHEN p.fluency <= b.b2 THEN 'middle'
        |      ELSE 'head' END AS bucket
        |FROM documents d LEFT JOIN p USING (doc_id), b
        |ORDER BY d.doc_id""".stripMargin,
    // Benjamini-Hochberg step-up over the q253 Welch t family; p-values
    // are the Chernoff bound exp(-t^2/2), 6-dp-pinned BEFORE the
    // step-up comparison (both engines compare identical rounded
    // doubles, so a reject decision can never flip on a ulp)
    "q273_fdr_bh" ->
      """WITH g AS (
        | SELECT source, CAST(count(*) AS DOUBLE) AS n_g,
        |  sum(CAST(n_chars AS DOUBLE)) AS s_g,
        |  sum(CAST(n_chars AS DOUBLE) * n_chars) AS ss_g
        | FROM documents GROUP BY 1),
        |t AS (
        | SELECT source, n_g, s_g, ss_g,
        |  sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
        |  sum(ss_g) OVER () AS ss,
        |  CAST(count(*) OVER () AS DOUBLE) AS m
        | FROM g),
        |d AS (
        | SELECT source, m,
        |  (s_g / n_g - (s - s_g) / (n - n_g)) /
        |   sqrt(((ss_g - s_g * s_g / n_g) / (n_g - 1)) / n_g +
        |    ((ss - ss_g - (s - s_g) * (s - s_g) / (n - n_g)) / (n - n_g - 1))
        |     / (n - n_g)) AS t_stat
        | FROM t),
        |r AS (
        | SELECT source, m, t_stat,
        |  round(exp(-t_stat * t_stat / 2), 6) AS p_bound
        | FROM d),
        |k AS (
        | SELECT source, t_stat, p_bound, m,
        |  CAST(row_number() OVER (ORDER BY p_bound, source) AS INTEGER)
        |   AS rnk
        | FROM r),
        |b AS (
        | SELECT source, t_stat, p_bound, rnk,
        |  round(rnk * 0.05 / m, 6) AS bh_thresh
        | FROM k),
        |c AS (
        | SELECT *, max(CASE WHEN p_bound <= bh_thresh THEN rnk END)
        |  OVER () AS cutoff
        | FROM b)
        |SELECT source, round(t_stat, 4) AS t_stat, p_bound, rnk,
        | bh_thresh, rnk <= coalesce(cutoff, 0) AS rejected
        |FROM c ORDER BY rnk""".stripMargin,
    // grid-join radius search restated as the brute-force cross join —
    // the oracle states WHAT (every supplier within 500 km), the engine
    // proves the 3x3-cell equi-join finds exactly that set; distances
    // 3-dp-pinned before both the radius gate and the min
    "q274_geo_near" ->
      """WITH c AS (
        | SELECT c_custkey,
        |  (CAST(('0x' || substr(md5('geo:c:lat:' || c_custkey), 1, 8))
        |    AS BIGINT) % 1200) / 10.0 - 60.0 AS clat,
        |  (CAST(('0x' || substr(md5('geo:c:lon:' || c_custkey), 1, 8))
        |    AS BIGINT) % 3600) / 10.0 - 180.0 AS clon
        | FROM customer),
        |s AS (
        | SELECT s_suppkey,
        |  (CAST(('0x' || substr(md5('geo:s:lat:' || s_suppkey), 1, 8))
        |    AS BIGINT) % 1200) / 10.0 - 60.0 AS slat,
        |  (CAST(('0x' || substr(md5('geo:s:lon:' || s_suppkey), 1, 8))
        |    AS BIGINT) % 3600) / 10.0 - 180.0 AS slon
        | FROM supplier),
        |p AS (
        | SELECT c_custkey,
        |  round(2 * 6371.0088 * asin(sqrt(
        |   pow(sin(radians(slat - clat) / 2), 2) +
        |   cos(radians(clat)) * cos(radians(slat)) *
        |    pow(sin(radians(slon - clon) / 2), 2))), 3) AS d
        | FROM c, s),
        |n AS (
        | SELECT c_custkey, count(*) AS n_near, min(d) AS min_km
        | FROM p WHERE d <= 500.0 GROUP BY 1)
        |SELECT c.c_custkey, coalesce(n.n_near, 0) AS n_near, n.min_km
        |FROM customer c LEFT JOIN n USING (c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // DSIR hashed-unigram importance weights: target = the 'en' slice,
    // raw = the whole corpus, 128 md5 buckets, add-1 smoothing; ranked
    // on the 4-dp-pinned per-token log-ratio
    "q275_dsir_weights" ->
      """WITH t AS (
        | SELECT doc_id, lang, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |tb AS (
        | SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5('dsir:' || w), 1, 8)) AS BIGINT) % 128
        |   AS b
        | FROM (SELECT doc_id, lang, unnest(a) AS w FROM t) x),
        |bk AS (
        | SELECT b, CAST(count(*) AS DOUBLE) AS c_raw,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |   AS c_tgt
        | FROM tb GROUP BY 1),
        |tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM bk),
        |lr AS (
        | SELECT b, ln((c_tgt + 1) / (n_tgt + 128)) -
        |  ln((c_raw + 1) / (n_raw + 128)) AS lr
        | FROM bk, tot),
        |pd AS (SELECT doc_id, lang, b, count(*) AS c FROM tb GROUP BY 1, 2, 3),
        |dw AS (
        | SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_toks,
        |  round(sum(c * lr.lr) / sum(c), 4) AS avg_lw
        | FROM pd JOIN lr USING (b) GROUP BY 1, 2),
        |r AS (
        | SELECT doc_id, lang, n_toks, avg_lw,
        |  CAST(row_number() OVER (ORDER BY avg_lw DESC, doc_id)
        |   AS INTEGER) AS rnk
        | FROM dw)
        |SELECT doc_id, lang, n_toks, avg_lw, rnk FROM r
        |WHERE rnk <= 50 ORDER BY rnk""".stripMargin,
    // interpolated Kneser-Ney bigram LM: discounted observed mass plus
    // continuation-weighted backoff, all counts integer-exact, 4-dp pin
    "q276_kn_bigram" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |bg AS (
        | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1,
        |  a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |hd AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS cw1,
        |        count(*) AS n1h FROM cab GROUP BY 1),
        |ct AS (SELECT w2, count(*) AS n1c FROM cab GROUP BY 1),
        |dt AS (SELECT CAST(count(*) AS DOUBLE) AS dtot FROM cab),
        |p AS (
        | SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(log10((cab.c_ab - 0.75) / hd.cw1 +
        |   0.75 * hd.n1h / hd.cw1 * (ct.n1c / dt.dtot))), 4) AS avg_logp
        | FROM bg JOIN cab USING (w1, w2) JOIN hd USING (w1)
        |  JOIN ct USING (w2), dt
        | GROUP BY bg.doc_id)
        |SELECT d.doc_id, p.n_bigrams, p.avg_logp
        |FROM documents d LEFT JOIN p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // round-robin curriculum: per-source easy-first rank, position by
    // arithmetic (rank-1)*|sources| + src_idx — no global window
    "q277_curriculum" ->
      """WITH s AS (
        | SELECT source,
        |  CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT)
        |   AS src_idx,
        |  CAST(count(*) OVER () AS BIGINT) AS n_src
        | FROM (SELECT DISTINCT source FROM documents) x),
        |r AS (
        | SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS INTEGER) AS src_rank
        | FROM documents)
        |SELECT r.doc_id, r.source, r.src_rank,
        | (r.src_rank - 1) * s.n_src + s.src_idx AS pos
        |FROM r JOIN s USING (source) ORDER BY pos""".stripMargin,
    // l-diversity per (lang, 500-char band) QI cell, sensitive = source
    "q278_l_diversity" ->
      """WITH c AS (
        | SELECT lang, CAST(floor(n_chars / 500.0) AS BIGINT) AS len_band,
        |  source, count(*) AS c
        | FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, len_band, CAST(sum(c) AS BIGINT) AS n_docs,
        | count(*) AS l_div,
        | round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_share,
        | count(*) >= 2 AS diverse
        |FROM c GROUP BY 1, 2 ORDER BY lang, len_band""".stripMargin,
    // 64-seed hash-relabeling permutation null for the click-vs-
    // purchase mean gap; both sides of the >= are 4-dp-pinned
    "q279_permutation_test" ->
      """WITH ev AS (
        | SELECT event_id, event_type, value FROM events
        | WHERE event_type IN ('click', 'purchase')),
        |o AS (
        | SELECT
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |   AS DOUBLE) AS n_a,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS DOUBLE) AS n_b,
        |  sum(CASE WHEN event_type = 'click' THEN value END) AS s_a,
        |  sum(CASE WHEN event_type = 'purchase' THEN value END) AS s_b
        | FROM ev),
        |ob AS (SELECT n_a, n_b,
        |  round(abs(s_a / n_a - s_b / n_b), 4) AS obs_diff FROM o),
        |pm AS (
        | SELECT seed,
        |  round(abs(sum(CASE WHEN arm_a THEN value END) /
        |    sum(CASE WHEN arm_a THEN 1.0 ELSE 0.0 END) -
        |   sum(CASE WHEN NOT arm_a THEN value END) /
        |    sum(CASE WHEN NOT arm_a THEN 1.0 ELSE 0.0 END)), 4) AS d
        | FROM (
        |  SELECT g.seed, ev.value,
        |   CAST(('0x' || substr(md5('perm:' || g.seed || ':' || ev.event_id),
        |     1, 8)) AS BIGINT) % (ob.n_a + ob.n_b) < ob.n_a AS arm_a
        |  FROM ev, ob, (SELECT unnest(generate_series(0, 63)) AS seed) g) t
        | GROUP BY seed)
        |SELECT CAST(ob.n_a AS BIGINT) AS n_click,
        | CAST(ob.n_b AS BIGINT) AS n_purchase, ob.obs_diff,
        | count(*) AS n_perms,
        | CAST(sum(CASE WHEN pm.d >= ob.obs_diff THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_ge,
        | round((sum(CASE WHEN pm.d >= ob.obs_diff THEN 1 ELSE 0 END) + 1)
        |  / CAST(count(*) + 1 AS DOUBLE), 4) AS p_value
        |FROM pm, ob GROUP BY ob.n_a, ob.n_b, ob.obs_diff""".stripMargin,
    // day-by-day cumulative z of the even/odd-user click-value gap vs
    // the OBF-shaped boundary 1.96*sqrt(T/t); monitor starts once both
    // arms hold >= 2 observations
    "q280_group_sequential" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, user_id % 2 AS variant,
        |  CAST(count(*) AS DOUBLE) AS n, sum(value) AS sv,
        |  sum(value * value) AS ssv
        | FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        | SELECT day,
        |  sum(CASE WHEN variant = 1 THEN n END) AS nt_d,
        |  sum(CASE WHEN variant = 1 THEN sv END) AS st_d,
        |  sum(CASE WHEN variant = 1 THEN ssv END) AS sst_d,
        |  sum(CASE WHEN variant = 0 THEN n END) AS nc_d,
        |  sum(CASE WHEN variant = 0 THEN sv END) AS sc_d,
        |  sum(CASE WHEN variant = 0 THEN ssv END) AS ssc_d
        | FROM d GROUP BY 1),
        |c AS (
        | SELECT day,
        |  sum(nt_d) OVER w AS nt, sum(st_d) OVER w AS st,
        |  sum(sst_d) OVER w AS sst,
        |  sum(nc_d) OVER w AS nc, sum(sc_d) OVER w AS sc,
        |  sum(ssc_d) OVER w AS ssc
        | FROM p WINDOW w AS (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT * FROM c WHERE nt >= 2 AND nc >= 2),
        |g AS (
        | SELECT day, nt, nc,
        |  CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS t_idx,
        |  CAST(count(*) OVER () AS DOUBLE) AS t_max,
        |  (st / nt - sc / nc) /
        |   sqrt((((sst - st * st / nt) + (ssc - sc * sc / nc)) /
        |     (nt + nc - 2)) * (1.0 / nt + 1.0 / nc)) AS z
        | FROM f)
        |SELECT day, CAST(nt AS BIGINT) AS n_treat,
        | CAST(nc AS BIGINT) AS n_ctrl, round(z, 4) AS z_stat,
        | round(1.96 * sqrt(t_max / t_idx), 4) AS boundary,
        | round(abs(z), 4) > round(1.96 * sqrt(t_max / t_idx), 4) AS crossed
        |FROM g ORDER BY day""".stripMargin,
    // per-decile quantile treatment effect on purchase value,
    // even/odd-user arms; exact interpolated quantiles
    "q281_qte_deciles" ->
      """WITH e AS (
        | SELECT user_id % 2 AS variant, value FROM events
        | WHERE event_type = 'purchase'),
        |q AS (
        | SELECT variant,
        |  quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
        |   0.6, 0.7, 0.8, 0.9]) AS qs
        | FROM e GROUP BY 1),
        |u AS (
        | SELECT variant, i, qs[CAST(i AS INTEGER)] AS q
        | FROM q, (SELECT unnest(generate_series(1, 9)) AS i) g)
        |SELECT round(i / 10.0, 1) AS p,
        | round(sum(CASE WHEN variant = 1 THEN q END), 4) AS q_treat,
        | round(sum(CASE WHEN variant = 0 THEN q END), 4) AS q_ctrl,
        | round(sum(CASE WHEN variant = 1 THEN q END) -
        |  sum(CASE WHEN variant = 0 THEN q END), 4) AS qte
        |FROM u GROUP BY i ORDER BY p""".stripMargin,
    // inverse-frequency and effective-number-of-samples (beta=0.999)
    // class weights per language, each normalized over the K classes
    "q282_class_weights" ->
      """WITH g AS (SELECT lang, count(*) AS n_docs FROM documents
        |  GROUP BY 1),
        |t AS (
        | SELECT lang, n_docs,
        |  CAST(sum(n_docs) OVER () AS DOUBLE) AS n,
        |  CAST(count(*) OVER () AS DOUBLE) AS k,
        |  1.0 / ((1 - pow(0.999, n_docs)) / (1 - 0.999)) AS eff_raw
        | FROM g)
        |SELECT lang, n_docs,
        | round(n / (k * n_docs), 6) AS w_invfreq,
        | round(eff_raw * k / sum(eff_raw) OVER (), 6) AS w_effnum
        |FROM t ORDER BY lang""".stripMargin,
    // padding-waste design table: smallest power-of-two cap >= token
    // count (CASE ladder, 16..4096), per-bucket real vs padded tokens
    "q283_pad_waste" ->
      """WITH t AS (
        | SELECT CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |   AS BIGINT) AS n_tok
        | FROM documents),
        |b AS (
        | SELECT n_tok,
        |  CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
        |   WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
        |   WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
        |   WHEN n_tok <= 1024 THEN 1024 WHEN n_tok <= 2048 THEN 2048
        |   ELSE 4096 END AS cap
        | FROM t)
        |SELECT CAST(cap AS BIGINT) AS cap, count(*) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS real_tokens,
        | CAST(cap * count(*) AS BIGINT) AS padded_tokens,
        | round(1.0 - sum(n_tok) / CAST(cap * count(*) AS DOUBLE), 4)
        |  AS waste
        |FROM b GROUP BY cap ORDER BY cap""".stripMargin,
    // c-TF-IDF: tf(t, source) * ln(1 + A/f(t)), A = mean class mass;
    // per-source top-10 ranked on the 4-dp-rounded weight
    "q284_ctfidf_keywords" ->
      """WITH t AS (
        | SELECT doc_id, source, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |toks AS (SELECT source, unnest(a) AS term FROM t),
        |tfc AS (SELECT source, term, count(*) AS tf FROM toks
        |  GROUP BY 1, 2),
        |ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS f_t FROM tfc
        |  GROUP BY 1),
        |am AS (SELECT avg(CAST(mass AS DOUBLE)) AS a_mean FROM
        |  (SELECT source, sum(tf) AS mass FROM tfc GROUP BY 1) x),
        |sc AS (
        | SELECT source, term, tf,
        |  round(tf * ln(1.0 + a_mean / f_t), 4) AS w
        | FROM tfc JOIN ft USING (term), am),
        |r AS (
        | SELECT source, term, tf, w,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY w DESC, term) AS INTEGER) AS rnk
        | FROM sc)
        |SELECT source, rnk, term, tf, w FROM r
        |WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin,
    // Church-Gale dispersion of the 30 highest-mass terms: variance/
    // mean of per-doc counts with zero docs entering analytically
    "q285_term_burstiness" ->
      """WITH t AS (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |pd AS (
        | SELECT doc_id, term, count(*) AS c
        | FROM (SELECT doc_id, unnest(a) AS term FROM t) x GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |tm AS (
        | SELECT term, CAST(sum(c) AS BIGINT) AS total, count(*) AS df,
        |  CAST(sum(c * c) AS DOUBLE) AS ss
        | FROM pd GROUP BY 1),
        |top AS (
        | SELECT term, total, df, ss,
        |  CAST(row_number() OVER (ORDER BY total DESC, term) AS INTEGER)
        |   AS rnk
        | FROM tm),
        |s AS (
        | SELECT rnk, term, total, df,
        |  round(total / n_docs, 6) AS mean,
        |  round(((ss - total * total / n_docs) / (n_docs - 1)) /
        |   (total / n_docs), 4) AS dispersion
        | FROM top, n WHERE rnk <= 30)
        |SELECT rnk, term, total, df, mean, dispersion,
        | dispersion > 1.5 AS bursty
        |FROM s ORDER BY rnk""".stripMargin,
    // diagonal Frechet distance between even/odd-label cohorts:
    // per-dim population moments, mean and variance terms 6-dp-pinned
    "q286_diag_frechet" ->
      """WITH e AS (
        | SELECT label % 2 AS g, i AS d,
        |  CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
        | FROM embeddings,
        |  (SELECT unnest(generate_series(1, 64)) AS i) ix),
        |m AS (
        | SELECT g, d, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |  sum(x * x) AS sxx
        | FROM e GROUP BY 1, 2),
        |v AS (
        | SELECT g, d, n, sx / n AS mu, sxx / n - (sx / n) * (sx / n) AS v
        | FROM m),
        |j AS (
        | SELECT a.n AS n_a, b.n AS n_b, a.mu AS mu_a, b.mu AS mu_b,
        |  a.v AS v_a, b.v AS v_b
        | FROM v a JOIN v b ON a.d = b.d AND a.g = 0 AND b.g = 1)
        |SELECT CAST(min(n_a) AS BIGINT) AS n_even,
        | CAST(min(n_b) AS BIGINT) AS n_odd,
        | count(*) AS dim,
        | round(sum((mu_a - mu_b) * (mu_a - mu_b)), 6) AS mean_term,
        | round(sum(v_a + v_b - 2 * sqrt(v_a) * sqrt(v_b)), 6) AS var_term,
        | round(sum((mu_a - mu_b) * (mu_a - mu_b)) +
        |  sum(v_a + v_b - 2 * sqrt(v_a) * sqrt(v_b)), 6) AS fid_diag
        |FROM j""".stripMargin,
    // per-slice vs pooled Pearson r of value on hour-of-day; slices
    // whose 4-dp-pinned sign opposes the pooled sign are flagged
    "q287_simpson_audit" ->
      """WITH g AS (
        | SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |  sum(CAST(extract(hour FROM ts) AS DOUBLE)) AS sx,
        |  sum(value) AS sy,
        |  sum(CAST(extract(hour FROM ts) AS DOUBLE) *
        |      CAST(extract(hour FROM ts) AS DOUBLE)) AS sxx,
        |  sum(value * value) AS syy,
        |  sum(CAST(extract(hour FROM ts) AS DOUBLE) * value) AS sxy
        | FROM events GROUP BY 1),
        |t AS (
        | SELECT event_type, n, sx, sy, sxx, syy, sxy,
        |  sum(n) OVER () AS tn, sum(sx) OVER () AS tsx,
        |  sum(sy) OVER () AS tsy, sum(sxx) OVER () AS tsxx,
        |  sum(syy) OVER () AS tsyy, sum(sxy) OVER () AS tsxy
        | FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        | round((n * sxy - sx * sy) /
        |  sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r_slice,
        | round((tn * tsxy - tsx * tsy) /
        |  sqrt((tn * tsxx - tsx * tsx) * (tn * tsyy - tsy * tsy)), 4)
        |  AS r_global,
        | round((n * sxy - sx * sy) /
        |   sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) *
        |  round((tn * tsxy - tsx * tsy) /
        |   sqrt((tn * tsxx - tsx * tsx) * (tn * tsyy - tsy * tsy)), 4)
        |  < 0 AS sign_flip
        |FROM t ORDER BY event_type""".stripMargin,
    // RLE8 AVI: 4 equal runs per row, md5('rle:doc:f:y:r') % 256
    // indices, palette i → (r=i, g=255−i, b=7i%256); per-frame sums
    // restate the decoder's exact integer arithmetic (pal-sum × run
    // length / w·h) so the IEEE division matches bit for bit;
    // enc_bytes = 8h runs + 2(h−1) EOLs + 2 EOB = 10h
    "q288_avi_rle8" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CAST(20 * (1 + doc_id % 3) AS BIGINT) AS w,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS h,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS nf
        | FROM documents),
        |fr AS (
        | SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1)) AS f
        | FROM p),
        |rn AS (
        | SELECT doc_id, w, h, nf, f,
        |  unnest(generate_series(0, h * 4 - 1)) AS q
        | FROM fr),
        |v AS (
        | SELECT doc_id, w, h, nf, f,
        |  CAST(('0x' || substr(md5('rle:' || doc_id || ':' || f || ':' ||
        |    (q // 4) || ':' || (q % 4)), 1, 8)) AS BIGINT) % 256 AS idx
        | FROM rn)
        |SELECT doc_id,
        | CAST(max(w) AS INTEGER) AS width,
        | CAST(max(h) AS INTEGER) AS height,
        | CAST(max(nf) AS BIGINT) AS n_frames,
        | round(1000000.0 / 40000.0, 4) AS fps,
        | CAST(f AS INTEGER) AS frame,
        | CAST(max(10 * h) AS INTEGER) AS enc_bytes,
        | round(CAST(max(10 * h) AS DOUBLE) / max(w * h), 4) AS ratio,
        | round(CAST(sum((idx * 7) % 256) * max(w // 4) AS DOUBLE)
        |   / max(w * h), 4) AS mean_b,
        | round(CAST(sum(255 - idx) * max(w // 4) AS DOUBLE)
        |   / max(w * h), 4) AS mean_g,
        | round(CAST(sum(idx) * max(w // 4) AS DOUBLE)
        |   / max(w * h), 4) AS mean_r
        |FROM v GROUP BY doc_id, f ORDER BY doc_id, frame""".stripMargin,
    // Mann–Whitney U with midrank tie handling: 2·midrank = 2·cumBefore
    // + cnt + 1 stays integer through the rank sum; z = normal approx
    // with the Σ(t³−t) tie correction — identical integer inputs to
    // the final double arithmetic on both engines
    "q289_mann_whitney" ->
      """WITH h AS (
        | SELECT value AS v, count(*) AS cnt,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cnt_a
        | FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |c AS (
        | SELECT cnt, cnt_a, sum(cnt) OVER (ORDER BY v) AS cum FROM h),
        |t AS (
        | SELECT sum(cnt_a) AS n1, sum(cnt - cnt_a) AS n2,
        |  sum(cnt_a * (2 * (cum - cnt) + cnt + 1)) AS two_r1,
        |  sum(cnt * cnt * cnt - cnt) AS ties
        | FROM c)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        | round(CAST(two_r1 AS DOUBLE) / 2
        |   - CAST(n1 AS DOUBLE) * (n1 + 1) / 2, 4) AS u1,
        | round((CAST(two_r1 AS DOUBLE) / 2
        |    - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
        |    - CAST(n1 AS DOUBLE) * n2 / 2)
        |  / sqrt(CAST(n1 AS DOUBLE) * n2 / 12 *
        |     ((n1 + n2 + 1) - CAST(ties AS DOUBLE)
        |       / ((n1 + n2) * (n1 + n2 - 1.0)))), 4) AS z
        |FROM t""".stripMargin,
    // Two-sample Cramér–von Mises: S = Σ cnt·(cumA·n2−cumB·n1)²
    // exact in HUGEINT, T single-value double arithmetic from it
    "q290_cvm_test" ->
      """WITH h AS (
        | SELECT value AS v,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        | FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |c AS (
        | SELECT v, ca + cb AS cnt,
        |  sum(ca) OVER (ORDER BY v) AS cum_a,
        |  sum(cb) OVER (ORDER BY v) AS cum_b,
        |  sum(ca) OVER () AS n1, sum(cb) OVER () AS n2
        | FROM h),
        |t AS (
        | SELECT max(n1) AS n1, max(n2) AS n2,
        |  sum(CAST(cum_a * n2 - cum_b * n1 AS HUGEINT)
        |    * (cum_a * n2 - cum_b * n1) * cnt) AS s
        | FROM c)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        | round(CAST(s AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
        |   / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)), 4) AS cvm_t,
        | round((CAST(s AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
        |    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)))
        |  / ((1.0 + 1.0 / (n1 + n2)) / 6.0), 4) AS t_ratio
        |FROM t""".stripMargin,
    // Kruskal–Wallis H over all five event types: integer midranks,
    // Σ R²/n as exact integer div + bounded remainders, tie-corrected
    "q291_kruskal_wallis" ->
      """WITH tc AS (
        | SELECT event_type AS et, value AS v, count(*) AS tcnt
        | FROM events GROUP BY 1, 2),
        |h AS (SELECT v, sum(tcnt) AS cnt FROM tc GROUP BY 1),
        |c AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM h),
        |g AS (
        | SELECT et, sum(tcnt) AS ng,
        |  sum(tcnt * (2 * (cum - cnt) + cnt + 1)) AS two_r
        | FROM tc JOIN c USING (v) GROUP BY 1),
        |p AS (
        | SELECT sum(cnt) AS n, sum(cnt * cnt * cnt - cnt) AS ties FROM h),
        |s AS (
        | SELECT count(*) AS k,
        |  sum((CAST(two_r AS HUGEINT) * two_r) // (4 * ng)) AS sum_q,
        |  sum(CAST((CAST(two_r AS HUGEINT) * two_r) % (4 * ng) AS DOUBLE)
        |    / (4 * CAST(ng AS DOUBLE))) AS sum_r
        | FROM g)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        | round(12.0 / (CAST(n AS DOUBLE) * (n + 1))
        |   * (CAST(sum_q AS DOUBLE) + sum_r)
        |  - 3.0 * (CAST(n AS DOUBLE) + 1), 4) AS h,
        | round((12.0 / (CAST(n AS DOUBLE) * (n + 1))
        |    * (CAST(sum_q AS DOUBLE) + sum_r)
        |   - 3.0 * (CAST(n AS DOUBLE) + 1))
        |  / (1.0 - CAST(ties AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n * n - n)), 4) AS h_adj
        |FROM s, p""".stripMargin,
    // CUSUM level-shift scan on daily counts, maximized in integers
    // (|n·S_k − k·S_n|), change day pinned to the earliest argmax
    "q292_cusum_changepoint" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, count(*) AS x
        | FROM events GROUP BY 1),
        |s AS (
        | SELECT day, x, row_number() OVER (ORDER BY day) AS k,
        |  sum(x) OVER (ORDER BY day) AS sk,
        |  count(*) OVER () AS n, sum(x) OVER () AS sn
        | FROM d),
        |g AS (SELECT day, n, sn, abs(n * sk - k * sn) AS igap FROM s),
        |b AS (SELECT max(igap) AS mg FROM g)
        |SELECT CAST(max(n) AS BIGINT) AS n_days,
        | CAST(max(sn) AS BIGINT) AS n_events,
        | min(CASE WHEN igap = mg THEN day END) AS change_day,
        | round(CAST(max(mg) AS DOUBLE) / max(n), 4) AS cusum_max
        |FROM g, b""".stripMargin,
    // vocabulary coverage curve at V ∈ {100,500,1000,2000}: terms
    // ranked (count desc, term), coverage = covered/total occurrences
    "q293_vocab_coverage" ->
      """WITH toks AS (
        | SELECT unnest(CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END)
        |   AS term
        | FROM documents),
        |vc AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |r AS (
        | SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk,
        |  sum(cnt) OVER () AS total
        | FROM vc),
        |v AS (SELECT unnest([100, 500, 1000, 2000]) AS vocab_size)
        |SELECT v.vocab_size,
        | CAST(max(r.total) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN r.rnk <= v.vocab_size THEN r.cnt ELSE 0 END)
        |   AS BIGINT) AS covered,
        | round(CAST(sum(CASE WHEN r.rnk <= v.vocab_size THEN r.cnt
        |     ELSE 0 END) AS DOUBLE) / max(r.total), 4) AS coverage
        |FROM r, v GROUP BY 1 ORDER BY 1""".stripMargin,
    // 4-gram novelty per ingestion batch (batch = doc_id % 5): the
    // q149 shingle CTEs at n=4, first appearance = min batch
    "q294_ngram_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, doc_id % 5 AS batch,
        |  regexp_split_to_array(trim(text), '\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, batch, CASE WHEN len(t) >= 4
        |  THEN list_distinct(list_transform(generate_series(1, len(t)-3),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |             t[i+3]))
        |  ELSE [array_to_string(t, ' ')] END AS s
        | FROM toks),
        |ex AS (SELECT doc_id, batch, unnest(s) AS sh1 FROM sh),
        |fb AS (SELECT sh1, min(batch) AS first_batch FROM ex GROUP BY 1)
        |SELECT e.batch,
        | CAST(count(*) AS BIGINT) AS n_shingles,
        | CAST(count(*) FILTER (WHERE f.first_batch = e.batch) AS BIGINT)
        |   AS n_novel,
        | round(CAST(count(*) FILTER (WHERE f.first_batch = e.batch)
        |     AS DOUBLE) / count(*), 4) AS novelty
        |FROM ex e JOIN fb f ON e.sh1 = f.sh1
        |GROUP BY e.batch ORDER BY e.batch""".stripMargin,
    // template-spam screen: per-doc max char-trigram multiplicity
    // ratio, per-source spam rate at the 0.05 threshold
    "q295_template_spam" ->
      """WITH tri AS (
        | SELECT doc_id, source,
        |  substring(text, CAST(i AS INTEGER), 3) AS tri
        | FROM (SELECT doc_id, source, text,
        |        unnest(generate_series(1, length(text) - 2)) AS i
        |       FROM documents WHERE length(text) >= 3)),
        |pd AS (
        | SELECT doc_id, source, max(c) AS max_mult, sum(c) AS n_tri
        | FROM (SELECT doc_id, source, tri, count(*) AS c
        |       FROM tri GROUP BY 1, 2, 3)
        | GROUP BY 1, 2),
        |r AS (
        | SELECT doc_id, source,
        |  CAST(max_mult AS DOUBLE) / n_tri AS ratio
        | FROM pd)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(*) FILTER (WHERE ratio > 0.05) AS BIGINT) AS n_spam,
        | round(CAST(count(*) FILTER (WHERE ratio > 0.05) AS DOUBLE)
        |   / count(*), 4) AS spam_rate,
        | round(avg(ratio), 4) AS mean_ratio
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // per-label centroid vs global centroid: cosine + L2 drift; the
    // global centroid derives from the label centroids' weighted sums
    "q296_label_drift" ->
      """WITH p AS (
        | SELECT vec_id, label, generate_subscripts(embedding, 1) - 1
        |   AS dim, unnest(CAST(embedding AS DOUBLE[])) AS v
        | FROM embeddings),
        |lc AS (
        | SELECT label, dim, sum(v) AS sv, count(*) AS nv,
        |  sum(v) / count(*) AS c
        | FROM p GROUP BY 1, 2),
        |gc AS (
        | SELECT dim, sum(sv) / sum(nv) AS gcv FROM lc GROUP BY 1)
        |SELECT lc.label, CAST(max(lc.nv) AS BIGINT) AS n_vecs,
        | round(sum(lc.c * gc.gcv) /
        |   (sqrt(sum(lc.c * lc.c)) * sqrt(sum(gc.gcv * gc.gcv))), 4)
        |   AS cos_global,
        | round(sqrt(sum((lc.c - gc.gcv) * (lc.c - gc.gcv))), 4)
        |   AS l2_drift
        |FROM lc JOIN gc USING (dim)
        |GROUP BY lc.label ORDER BY lc.label""".stripMargin,
    // block-level dedup: first occurrence = lexicographic (doc,pos)
    // min done in two steps (min doc, then min pos within that doc)
    "q297_block_dedup" ->
      """WITH toks AS (
        | SELECT doc_id, source,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents WHERE len(trim(lower(text))) > 0),
        |b AS (
        | SELECT doc_id, source, i AS pos,
        |  array_to_string(list_slice(a, i*10+1, i*10+10), ' ') AS blk,
        |  least(10, len(a) - i*10) AS btoks
        | FROM (SELECT doc_id, source, a, unnest(generate_series(0,
        |        CAST(ceil(len(a)/10.0) AS INTEGER) - 1)) AS i
        |       FROM toks) t),
        |fd AS (SELECT blk, min(doc_id) AS f_doc FROM b GROUP BY 1),
        |fp AS (
        | SELECT b.blk, min(b.pos) AS f_pos
        | FROM b JOIN fd ON b.blk = fd.blk AND b.doc_id = fd.f_doc
        | GROUP BY 1),
        |m AS (
        | SELECT b.source, b.doc_id, b.btoks,
        |  (b.doc_id <> fd.f_doc OR b.pos <> fp.f_pos) AS dup
        | FROM b JOIN fd ON b.blk = fd.blk JOIN fp ON b.blk = fp.blk)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_blocks,
        | CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dup,
        | round(CAST(count(*) FILTER (WHERE dup) AS DOUBLE) / count(*), 4)
        |   AS dup_rate,
        | CAST(sum(btoks) AS BIGINT) AS toks_total,
        | CAST(coalesce(sum(btoks) FILTER (WHERE dup), 0) AS BIGINT)
        |   AS toks_dropped,
        | round(1.0 - CAST(coalesce(sum(btoks) FILTER (WHERE dup), 0)
        |     AS DOUBLE) / sum(btoks), 4) AS keep_rate,
        | CAST(count(DISTINCT CASE WHEN dup THEN doc_id END) AS BIGINT)
        |   AS n_docs_hit
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // t-closeness as total variation distance vs the global sensitive
    // distribution, integer numerators, division-free policy gate
    "q298_t_closeness" ->
      """WITH cells AS (
        | SELECT lang, CAST(floor(n_chars / 500.0) AS BIGINT) AS len_band,
        |  source, count(*) AS c
        | FROM documents GROUP BY 1, 2, 3),
        |g AS (SELECT lang, len_band, sum(c) AS ng FROM cells GROUP BY 1, 2),
        |m AS (SELECT source, sum(c) AS cs FROM cells GROUP BY 1),
        |t AS (SELECT sum(c) AS nn FROM cells),
        |grid AS (
        | SELECT g.lang, g.len_band, g.ng, m.source, m.cs, t.nn,
        |  coalesce(cells.c, 0) AS c
        | FROM g CROSS JOIN m CROSS JOIN t
        | LEFT JOIN cells ON cells.lang = g.lang
        |  AND cells.len_band = g.len_band AND cells.source = m.source)
        |SELECT lang, len_band, CAST(max(ng) AS BIGINT) AS n_docs,
        | round(CAST(sum(abs(c * nn - cs * ng)) AS DOUBLE)
        |   / (2.0 * max(ng) * max(nn)), 4) AS t_dist,
        | (sum(abs(c * nn - cs * ng)) * 10 <= max(ng) * max(nn) * 6)
        |   AS meets_t
        |FROM grid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Wilcoxon signed-rank on paired daily click/view cents sums:
    // integer diffs, midranks over the |d| histogram, tie-corrected z
    "q299_wilcoxon_signed" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  sum(CASE WHEN event_type = 'click'
        |       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS ca,
        |  sum(CASE WHEN event_type = 'view'
        |       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS cb
        | FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |nz AS (SELECT ca - cb AS d FROM daily WHERE ca - cb <> 0),
        |h AS (SELECT abs(d) AS v, count(*) AS cnt,
        |       sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cpos
        |      FROM nz GROUP BY 1),
        |c AS (SELECT v, cnt, cpos, sum(cnt) OVER (ORDER BY v) AS cum
        |      FROM h),
        |t AS (SELECT sum(cnt) AS n,
        |       sum(cpos * (2 * (cum - cnt) + cnt + 1)) AS two_wp,
        |       sum(cnt * cnt * cnt - cnt) AS ties FROM c),
        |nd AS (SELECT count(*) AS n_days FROM daily)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        | CAST(n AS BIGINT) AS n_nonzero,
        | round(CAST(two_wp AS DOUBLE) / 2, 4) AS w_plus,
        | round((CAST(two_wp AS DOUBLE) / 2
        |    - CAST(n AS DOUBLE) * (n + 1) / 4)
        |  / sqrt(CAST(n AS DOUBLE) * (n + 1) * (n * 2 + 1) / 24
        |    - CAST(ties AS DOUBLE) / 48), 4) AS z
        |FROM t, nd""".stripMargin,
    // Brown-Forsythe: exact per-group doubled medians off the value
    // histogram, integer centered scores, div+remainder SSB/SSW
    "q300_levene_bf" ->
      """WITH ev AS (
        | SELECT event_type AS et,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |h AS (SELECT et, cents AS v, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |c AS (SELECT et, v, cnt,
        |       sum(cnt) OVER (PARTITION BY et ORDER BY v) AS cum,
        |       sum(cnt) OVER (PARTITION BY et) AS n
        |      FROM h),
        |m AS (SELECT et, max(n) AS ng,
        |       min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
        |        + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS med2
        |      FROM c GROUP BY 1),
        |z AS (SELECT ev.et, m.ng, abs(ev.cents * 2 - m.med2) AS z
        |      FROM ev JOIN m ON ev.et = m.et),
        |g AS (SELECT et, max(ng) AS ng, sum(z) AS sz, sum(z * z) AS szz
        |      FROM z GROUP BY 1),
        |s AS (SELECT count(*) AS k, sum(ng) AS n, sum(sz) AS t,
        |       sum(szz) AS szz_all,
        |       sum((CAST(sz AS HUGEINT) * sz) // ng) AS sum_q,
        |       sum(CAST((CAST(sz AS HUGEINT) * sz) % ng AS DOUBLE)
        |         / CAST(ng AS DOUBLE)) AS sum_r
        |      FROM g)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        | CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
        | round((((CAST(sum_q AS DOUBLE) + sum_r)
        |     - (CAST((CAST(t AS HUGEINT) * t) // n AS DOUBLE)
        |        + CAST((CAST(t AS HUGEINT) * t) % n AS DOUBLE)
        |          / CAST(n AS DOUBLE)))
        |    / CAST(k - 1 AS DOUBLE))
        |  / ((CAST(szz_all AS DOUBLE)
        |      - (CAST(sum_q AS DOUBLE) + sum_r))
        |    / CAST(n - k AS DOUBLE)), 4) AS f_bf
        |FROM s""".stripMargin,
    // EWMA control chart: exact dyadic 40-lag integer smoothing,
    // division-free 25%-deviation alert vs the previous observed day
    "q301_ewma_chart" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, count(*) AS x
        | FROM events GROUP BY 1),
        |c AS (
        | SELECT day + CAST(j AS INTEGER) AS day,
        |  x * (CAST(1 AS BIGINT) << (39 - j)) AS w
        | FROM daily, (SELECT unnest(generate_series(0, 39)) AS j) js),
        |sc AS (SELECT day, sum(w) AS sc FROM c GROUP BY 1),
        |j AS (SELECT d.day, d.x, s.sc,
        |       lag(s.sc) OVER (ORDER BY d.day) AS s_prev
        |      FROM daily d JOIN sc s ON d.day = s.day)
        |SELECT day, CAST(x AS BIGINT) AS x,
        | round(CAST(sc AS DOUBLE) / 1099511627776.0, 4) AS ewma,
        | CASE WHEN s_prev IS NULL THEN false
        |  ELSE abs(x * 1099511627776 - s_prev) * 4 > s_prev END AS alert
        |FROM j ORDER BY day""".stripMargin,
    // Shot-boundary detection: the scene generator's md5 closed form
    // re-derives pixels -> 4-dp frame means -> L1 distances -> the
    // same threshold detections AND planted truth, entirely in SQL
    "q302_shot_boundary" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |  CAST(4 + doc_id % 4 AS BIGINT) AS h,
        |  CAST(12 + doc_id % 9 AS BIGINT) AS nf,
        |  CAST(4 + doc_id % 3 AS BIGINT) AS sl
        | FROM documents),
        |g AS (SELECT doc_id, w, h, nf, sl,
        |       w*3 + (4 - (w*3) % 4) % 4 AS stride FROM p),
        |fr AS (SELECT doc_id, w, h, nf, sl, stride,
        |        unnest(generate_series(0, nf - 1)) AS f FROM g),
        |px0 AS (SELECT doc_id, w, h, nf, sl, stride, f,
        |         unnest(generate_series(0, w*h - 1)) AS pix FROM fr),
        |ch AS (SELECT doc_id, w, h, nf, sl, stride, f, pix,
        |        unnest([0, 1, 2]) AS c FROM px0),
        |px AS (
        | SELECT doc_id, w, h, nf, sl, f, c,
        |  CAST(('0x' || substr(md5('scene:' || doc_id || ':' ||
        |    (f // sl) || ':' || c), 1, 8)) AS BIGINT) % 200
        |  + CAST(('0x' || substr(md5('avin:' || doc_id || ':' || f || ':' ||
        |      ((pix // w) * stride + (pix % w) * 3 + c)), 1, 8)) AS BIGINT)
        |    % 24 AS v
        | FROM ch),
        |fm AS (
        | SELECT doc_id, nf, sl, f,
        |  round(CAST(sum(CASE WHEN c = 0 THEN v END) AS DOUBLE)
        |    / (max(w) * max(h)), 4) AS mb,
        |  round(CAST(sum(CASE WHEN c = 1 THEN v END) AS DOUBLE)
        |    / (max(w) * max(h)), 4) AS mg,
        |  round(CAST(sum(CASE WHEN c = 2 THEN v END) AS DOUBLE)
        |    / (max(w) * max(h)), 4) AS mr
        | FROM px GROUP BY 1, 2, 3, 4),
        |d AS (
        | SELECT doc_id, nf, sl, f, mb, mg, mr,
        |  lag(mb) OVER (PARTITION BY doc_id ORDER BY f) AS pb,
        |  lag(mg) OVER (PARTITION BY doc_id ORDER BY f) AS pg,
        |  lag(mr) OVER (PARTITION BY doc_id ORDER BY f) AS pr
        | FROM fm),
        |fl AS (
        | SELECT doc_id, nf, sl, f,
        |  (round(abs(mb - pb) + abs(mg - pg) + abs(mr - pr), 4) > 30.0)
        |    AS det,
        |  (f > 0 AND f % sl = 0) AS truth
        | FROM d)
        |SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
        | CAST(max(sl) AS BIGINT) AS shot_len,
        | CAST(count(*) FILTER (WHERE truth) AS BIGINT) AS n_true,
        | CAST(count(*) FILTER (WHERE det) AS BIGINT) AS n_det,
        | CAST(count(*) FILTER (WHERE det AND truth) AS BIGINT) AS n_hit,
        | CASE WHEN count(*) FILTER (WHERE det) > 0 THEN
        |  round(CAST(count(*) FILTER (WHERE det AND truth) AS DOUBLE)
        |    / count(*) FILTER (WHERE det), 4) END AS prec,
        | round(CAST(count(*) FILTER (WHERE det AND truth) AS DOUBLE)
        |   / count(*) FILTER (WHERE truth), 4) AS recall
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,
    // Audio onset: the loudness-segment generator's closed form
    // (noise bits x md5 amp, floor-divided) -> integer frame loudness
    // -> the same division-free jump detections AND planted truth
    "q303_audio_onset" ->
      """WITH p AS (
        | SELECT doc_id, CAST((4 + doc_id % 5) * 1024 AS BIGINT) AS ns
        | FROM documents),
        |sj AS (
        | SELECT doc_id, unnest(generate_series(0, ns - 1)) AS j FROM p),
        |v AS (
        | SELECT doc_id, j // 256 AS f,
        |  abs((CAST(('0x' || substr(md5('pcm:' || doc_id || ':' || j),
        |       1, 8)) AS BIGINT) % 65536)
        |    * (8 + CAST(('0x' || substr(md5('amp:' || doc_id || ':' ||
        |        (j // 1024)), 1, 8)) AS BIGINT) % 57) // 64
        |   - 512 * (8 + CAST(('0x' || substr(md5('amp:' || doc_id || ':' ||
        |        (j // 1024)), 1, 8)) AS BIGINT) % 57)) AS av
        | FROM sj),
        |e AS (SELECT doc_id, f, sum(av) AS e FROM v GROUP BY 1, 2),
        |l AS (SELECT doc_id, f, e,
        |       lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS ep
        |      FROM e),
        |fl AS (
        | SELECT doc_id, f,
        |  CASE WHEN ep IS NULL THEN false ELSE e * 2 > ep * 3 END AS det,
        |  (f > 0 AND f % 4 = 0 AND
        |   (8 + CAST(('0x' || substr(md5('amp:' || doc_id || ':' ||
        |      (f // 4)), 1, 8)) AS BIGINT) % 57) * 2 >
        |   (8 + CAST(('0x' || substr(md5('amp:' || doc_id || ':' ||
        |      (f // 4 - 1)), 1, 8)) AS BIGINT) % 57) * 3) AS truth
        | FROM l)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        | CAST(count(*) FILTER (WHERE truth) AS BIGINT) AS n_true,
        | CAST(count(*) FILTER (WHERE det) AS BIGINT) AS n_det,
        | CAST(count(*) FILTER (WHERE det AND truth) AS BIGINT) AS n_hit,
        | CASE WHEN count(*) FILTER (WHERE det) > 0 THEN
        |  round(CAST(count(*) FILTER (WHERE det AND truth) AS DOUBLE)
        |    / count(*) FILTER (WHERE det), 4) END AS prec,
        | CASE WHEN count(*) FILTER (WHERE truth) > 0 THEN
        |  round(CAST(count(*) FILTER (WHERE det AND truth) AS DOUBLE)
        |    / count(*) FILTER (WHERE truth), 4) END AS recall
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,
    // MMR diversified top-5: pinned-cosine candidates, four unrolled
    // greedy rounds (argmax rel - maxsim, vec_id tiebreak)
    "q304_mmr_select" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM (
        |  SELECT vec_id, e,
        |   CAST(('0x' || substr(md5('mmrq:' || vec_id), 1, 8)) AS BIGINT) AS h
        |  FROM e) ORDER BY h, vec_id LIMIT 24),
        |sc AS (
        | SELECT q.qid, c.vec_id AS cid, c.e AS ce,
        |  round(list_inner_product(q.qe, c.e) /
        |   (sqrt(list_inner_product(q.qe, q.qe)) *
        |    sqrt(list_inner_product(c.e, c.e))), 4) AS rel
        | FROM q JOIN e c ON c.vec_id <> q.qid),
        |cand AS (
        | SELECT * FROM (
        |  SELECT qid, cid, ce, rel,
        |   row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid)
        |    AS rnk
        |  FROM sc) t WHERE rnk <= 12),
        |sims AS (
        | SELECT a.qid, a.cid AS a, b.cid AS b,
        |  round(list_inner_product(a.ce, b.ce) /
        |   (sqrt(list_inner_product(a.ce, a.ce)) *
        |    sqrt(list_inner_product(b.ce, b.ce))), 4) AS sim
        | FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid),
        |s1 AS (SELECT qid, cid, 1 AS pick, rel AS gain FROM cand
        |       WHERE rnk = 1),
        |m2 AS (
        | SELECT s.qid, s.a AS cid, max(s.sim) AS maxsim
        | FROM sims s JOIN s1 p ON p.qid = s.qid AND p.cid = s.b
        | GROUP BY 1, 2),
        |p2 AS (
        | SELECT qid, cid, 2 AS pick, gain FROM (
        |  SELECT m.qid, m.cid, c.rel - m.maxsim AS gain,
        |   row_number() OVER (PARTITION BY m.qid
        |     ORDER BY c.rel - m.maxsim DESC, m.cid) AS rn
        |  FROM m2 m
        |  JOIN cand c ON c.qid = m.qid AND c.cid = m.cid
        |  LEFT JOIN s1 x ON x.qid = m.qid AND x.cid = m.cid
        |  WHERE x.cid IS NULL) t WHERE rn = 1),
        |s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM p2),
        |m3 AS (
        | SELECT s.qid, s.a AS cid, max(s.sim) AS maxsim
        | FROM sims s JOIN s2 p ON p.qid = s.qid AND p.cid = s.b
        | GROUP BY 1, 2),
        |p3 AS (
        | SELECT qid, cid, 3 AS pick, gain FROM (
        |  SELECT m.qid, m.cid, c.rel - m.maxsim AS gain,
        |   row_number() OVER (PARTITION BY m.qid
        |     ORDER BY c.rel - m.maxsim DESC, m.cid) AS rn
        |  FROM m3 m
        |  JOIN cand c ON c.qid = m.qid AND c.cid = m.cid
        |  LEFT JOIN s2 x ON x.qid = m.qid AND x.cid = m.cid
        |  WHERE x.cid IS NULL) t WHERE rn = 1),
        |s3 AS (SELECT * FROM s2 UNION ALL SELECT * FROM p3),
        |m4 AS (
        | SELECT s.qid, s.a AS cid, max(s.sim) AS maxsim
        | FROM sims s JOIN s3 p ON p.qid = s.qid AND p.cid = s.b
        | GROUP BY 1, 2),
        |p4 AS (
        | SELECT qid, cid, 4 AS pick, gain FROM (
        |  SELECT m.qid, m.cid, c.rel - m.maxsim AS gain,
        |   row_number() OVER (PARTITION BY m.qid
        |     ORDER BY c.rel - m.maxsim DESC, m.cid) AS rn
        |  FROM m4 m
        |  JOIN cand c ON c.qid = m.qid AND c.cid = m.cid
        |  LEFT JOIN s3 x ON x.qid = m.qid AND x.cid = m.cid
        |  WHERE x.cid IS NULL) t WHERE rn = 1),
        |s4 AS (SELECT * FROM s3 UNION ALL SELECT * FROM p4),
        |m5 AS (
        | SELECT s.qid, s.a AS cid, max(s.sim) AS maxsim
        | FROM sims s JOIN s4 p ON p.qid = s.qid AND p.cid = s.b
        | GROUP BY 1, 2),
        |p5 AS (
        | SELECT qid, cid, 5 AS pick, gain FROM (
        |  SELECT m.qid, m.cid, c.rel - m.maxsim AS gain,
        |   row_number() OVER (PARTITION BY m.qid
        |     ORDER BY c.rel - m.maxsim DESC, m.cid) AS rn
        |  FROM m5 m
        |  JOIN cand c ON c.qid = m.qid AND c.cid = m.cid
        |  LEFT JOIN s4 x ON x.qid = m.qid AND x.cid = m.cid
        |  WHERE x.cid IS NULL) t WHERE rn = 1),
        |s5 AS (SELECT * FROM s4 UNION ALL SELECT * FROM p5),
        |f AS (SELECT * FROM s5)
        |SELECT f.qid, f.pick, f.cid, c.rel, round(f.gain, 4) AS gain
        |FROM f JOIN cand c ON c.qid = f.qid AND c.cid = f.cid
        |ORDER BY f.qid, f.pick""".stripMargin,
    // q410: the four max-normalized HITS rounds unrolled (the
    // prIterCtes convention; max normalizers are order-free)
    "q410_hits" -> hitsOracle(iters = 4),
    // q411: q125's leg recomposition with the integer Borda schedule
    // (6 − rnk points per leg, absent 0) — the fused score is exact
    "q411_borda_fusion" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ann AS (
         |$signLshTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), u AS (
         | SELECT query_id, neighbor_id FROM exact
         | UNION SELECT query_id, neighbor_id FROM ann
         | UNION SELECT query_id, neighbor_id FROM ivf),
         |sc AS (
         | SELECT u.query_id, u.neighbor_id,
         |  CAST(coalesce(6 - e.rnk, 0) + coalesce(6 - a.rnk, 0)
         |      + coalesce(6 - i.rnk, 0) AS BIGINT) AS score
         | FROM u LEFT JOIN exact e USING (query_id, neighbor_id)
         |  LEFT JOIN ann a USING (query_id, neighbor_id)
         |  LEFT JOIN ivf i USING (query_id, neighbor_id))
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INTEGER) AS rnk FROM (
         | SELECT query_id, neighbor_id, score,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, neighbor_id) AS rnk
         | FROM sc) t WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // q412: SPRT walk in exact micro units — the LLR literals are
    // Scala-computed once and interpolated verbatim, so neither
    // engine evaluates a log at query time
    "q412_sprt_audit" ->
      s"""WITH d AS (
         | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS k
         | FROM events GROUP BY 1),
         |w AS (
         | SELECT day, n, k,
         |  CAST(sum(k * ${operators.CoreQueries.SprtLaMicro}
         |    + (n - k) * (${operators.CoreQueries.SprtLbMicro}))
         |   OVER (ORDER BY day) AS BIGINT) AS llr_micro
         | FROM d)
         |SELECT day, n, k, llr_micro,
         | CASE WHEN llr_micro >= ${operators.CoreQueries.SprtAMicro}
         |   THEN 'accept_h1'
         |  WHEN llr_micro <= -${operators.CoreQueries.SprtAMicro}
         |   THEN 'accept_h0'
         |  ELSE 'continue' END AS verdict,
         | max(CASE WHEN abs(llr_micro) >= ${operators.CoreQueries.SprtAMicro}
         |   THEN 1 ELSE 0 END) OVER (ORDER BY day) = 1 AS stopped
         |FROM w ORDER BY day""".stripMargin,
    // q413: the 25 deterministic Huffman merges as chained CTEs over
    // the exact letter-frequency frame (generator below)
    "q413_huffman_lengths" -> huffmanOracle(26),
    // q414: the q157 closed forms through the PKZIP container —
    // zip_len = Σ(30+|name|+size) + Σ(46+|name|) + 22; crc_ok is the
    // walker's recomputed-CRC fact, pinned true (the q52 convention)
    "q414_zip_shards" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  doc_id || '.txt' AS name,
        |  CAST(strlen(text) AS BIGINT) AS sz, md5(text) AS payload_md5,
        |  CAST(strlen(doc_id || '.txt') AS BIGINT) AS nl
        | FROM documents),
        |o AS (
        | SELECT shard, doc_id, name, sz, nl, payload_md5,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1
        |   AS INTEGER) AS idx
        | FROM m),
        |s AS (
        | SELECT shard, CAST(count(*) AS INTEGER) AS n_entries,
        |  CAST(sum(30 + nl + sz) + sum(46 + nl) + 22 AS BIGINT) AS zip_len
        | FROM o GROUP BY shard)
        |SELECT o.shard, s.n_entries, s.zip_len, o.idx, o.name,
        | o.sz AS size, true AS crc_ok, o.payload_md5
        |FROM o JOIN s USING (shard) ORDER BY shard, idx""".stripMargin,
    // q415: argmax-transition model fit on the pre-Jan-21 prefix
    // (tie-break alphabetical), top-1 accuracy on the held-out tail
    "q415_markov_eval" ->
      """WITH t AS (
        | SELECT user_id, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev,
        |  CAST(ts AS DATE) AS day
        | FROM events),
        |tr AS (
        | SELECT prev, event_type AS next, count(*) AS n
        | FROM t WHERE prev IS NOT NULL AND day < DATE '2024-01-21'
        | GROUP BY 1, 2),
        |pred AS (
        | SELECT prev, next AS predicted_next FROM (
        |  SELECT prev, next,
        |   row_number() OVER (PARTITION BY prev ORDER BY n DESC, next)
        |    AS r
        |  FROM tr) x WHERE r = 1),
        |te AS (
        | SELECT prev, event_type FROM t
        | WHERE prev IS NOT NULL AND day >= DATE '2024-01-21')
        |SELECT te.prev AS prev_type, max(p.predicted_next) AS predicted_next,
        | CAST(count(*) AS BIGINT) AS n_test,
        | CAST(sum(CASE WHEN te.event_type = p.predicted_next
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        | round(sum(CASE WHEN te.event_type = p.predicted_next
        |   THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS acc
        |FROM te LEFT JOIN pred p ON p.prev = te.prev
        |GROUP BY te.prev ORDER BY prev_type""".stripMargin,
    // q416: covariance-numerator signs at dollar grain, per nation vs
    // pooled — all BIGINT-exact, so the flip flags are hash-exact
    "q416_simpsons_flip" ->
      """WITH spend AS (
        | SELECT o_custkey,
        |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
        | FROM orders GROUP BY 1),
        |b AS (
        | SELECT n.n_name, CAST(floor(c.c_acctbal) AS BIGINT) AS x,
        |  coalesce(s.y, 0) AS y
        | FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        | LEFT JOIN spend s ON s.o_custkey = c.c_custkey),
        |pn AS (
        | SELECT 'nation:' || n_name AS scope,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CASE WHEN count(*) * sum(x*y) - sum(x) * sum(y) > 0 THEN 1
        |   WHEN count(*) * sum(x*y) - sum(x) * sum(y) < 0 THEN -1
        |   ELSE 0 END AS cov_sign
        | FROM b GROUP BY n_name),
        |pl AS (
        | SELECT 'pooled' AS scope, CAST(count(*) AS BIGINT) AS n_customers,
        |  CASE WHEN count(*) * sum(x*y) - sum(x) * sum(y) > 0 THEN 1
        |   WHEN count(*) * sum(x*y) - sum(x) * sum(y) < 0 THEN -1
        |   ELSE 0 END AS cov_sign
        | FROM b)
        |SELECT pn.scope, pn.n_customers, CAST(pn.cov_sign AS INTEGER)
        |  AS cov_sign,
        | pn.cov_sign <> 0 AND pl.cov_sign <> 0
        |  AND pn.cov_sign <> pl.cov_sign AS flipped
        |FROM pn, pl
        |UNION ALL
        |SELECT scope, n_customers, CAST(cov_sign AS INTEGER), false
        |FROM pl
        |ORDER BY scope""".stripMargin,
    // q417: the three 4-truss peels unrolled (generator below)
    "q417_ktruss" -> ktrussOracle(k = 4, iters = 3),
    // q418: the personalized-PageRank rounds unrolled (generator below)
    "q418_ppr" -> pprOracle(iters = 3),
    // q419: Chow break — conditional exact sums, closed-form SSEs,
    // F in doubles of exact integers, 4-dp pins; flag vs literal 5.0
    "q419_chow_break" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (
        | SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn, y,
        |  CAST(count(*) OVER () AS BIGINT) AS ntot
        | FROM d),
        |a AS (
        | SELECT
        |  CAST(count(*) AS BIGINT) AS np,
        |  CAST(sum(rn) AS BIGINT) AS sxp, CAST(sum(y) AS BIGINT) AS syp,
        |  CAST(sum(rn*y) AS BIGINT) AS sxyp,
        |  CAST(sum(rn*rn) AS BIGINT) AS sxxp,
        |  CAST(sum(y*y) AS BIGINT) AS syyp,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN rn ELSE 0 END) AS BIGINT) AS sx1,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN y ELSE 0 END) AS BIGINT) AS sy1,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN rn*y ELSE 0 END) AS BIGINT) AS sxy1,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN rn*rn ELSE 0 END) AS BIGINT) AS sxx1,
        |  CAST(sum(CASE WHEN rn <= ntot // 2 THEN y*y ELSE 0 END) AS BIGINT) AS syy1,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN rn ELSE 0 END) AS BIGINT) AS sx2,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN y ELSE 0 END) AS BIGINT) AS sy2,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN rn*y ELSE 0 END) AS BIGINT) AS sxy2,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN rn*rn ELSE 0 END) AS BIGINT) AS sxx2,
        |  CAST(sum(CASE WHEN rn > ntot // 2 THEN y*y ELSE 0 END) AS BIGINT) AS syy2
        | FROM r),
        |f AS (
        | SELECT np,
        |  (CAST(np*sxxp - sxp*sxp AS DOUBLE) * CAST(np*syyp - syp*syp AS DOUBLE)
        |    - CAST(np*sxyp - sxp*syp AS DOUBLE) * CAST(np*sxyp - sxp*syp AS DOUBLE))
        |   / (CAST(np AS DOUBLE) * CAST(np*sxxp - sxp*sxp AS DOUBLE)) AS ssep,
        |  (CAST(n1*sxx1 - sx1*sx1 AS DOUBLE) * CAST(n1*syy1 - sy1*sy1 AS DOUBLE)
        |    - CAST(n1*sxy1 - sx1*sy1 AS DOUBLE) * CAST(n1*sxy1 - sx1*sy1 AS DOUBLE))
        |   / (CAST(n1 AS DOUBLE) * CAST(n1*sxx1 - sx1*sx1 AS DOUBLE)) AS sse1,
        |  (CAST(n2*sxx2 - sx2*sx2 AS DOUBLE) * CAST(n2*syy2 - sy2*sy2 AS DOUBLE)
        |    - CAST(n2*sxy2 - sx2*sy2 AS DOUBLE) * CAST(n2*sxy2 - sx2*sy2 AS DOUBLE))
        |   / (CAST(n2 AS DOUBLE) * CAST(n2*sxx2 - sx2*sx2 AS DOUBLE)) AS sse2
        | FROM a)
        |SELECT np AS n_days, np // 2 AS break_rn,
        | round(ssep, 4) AS sse_pooled, round(sse1, 4) AS sse_left,
        | round(sse2, 4) AS sse_right,
        | round(((ssep - sse1 - sse2) / 2.0)
        |   / ((sse1 + sse2) / CAST(np - 4 AS DOUBLE)), 4) AS f_stat,
        | ((ssep - sse1 - sse2) / 2.0)
        |   / ((sse1 + sse2) / CAST(np - 4 AS DOUBLE)) > 5.0 AS break_flag
        |FROM f""".stripMargin,
    // q420: Dunning G² over the exact bigram contingency counts —
    // empty cells contribute 0, 4-dp pin, top-20 by (g2, w1, w2)
    "q420_g2_collocations" ->
      """WITH toks AS (
        | SELECT CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |bg AS (
        | SELECT a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM toks WHERE len(a) >= 2) x),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
        |fa AS (SELECT w1, CAST(count(*) AS BIGINT) AS ca FROM bg GROUP BY 1),
        |sb AS (SELECT w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1),
        |c AS (
        | SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
        | FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (
        | SELECT c.w1, c.w2, c.c_ab,
        |  round(2.0 * (
        |   (CASE WHEN c.c_ab > 0 THEN CAST(c.c_ab AS DOUBLE)
        |     * ln(CAST(c.c_ab AS DOUBLE)
        |        / (CAST(fa.ca AS DOUBLE) * sb.cb / CAST(n.n AS DOUBLE)))
        |    ELSE 0.0 END)
        |   + (CASE WHEN fa.ca - c.c_ab > 0 THEN CAST(fa.ca - c.c_ab AS DOUBLE)
        |     * ln(CAST(fa.ca - c.c_ab AS DOUBLE)
        |        / (CAST(fa.ca AS DOUBLE) * (n.n - sb.cb) / CAST(n.n AS DOUBLE)))
        |    ELSE 0.0 END)
        |   + (CASE WHEN sb.cb - c.c_ab > 0 THEN CAST(sb.cb - c.c_ab AS DOUBLE)
        |     * ln(CAST(sb.cb - c.c_ab AS DOUBLE)
        |        / (CAST(n.n - fa.ca AS DOUBLE) * sb.cb / CAST(n.n AS DOUBLE)))
        |    ELSE 0.0 END)
        |   + (CASE WHEN n.n - fa.ca - sb.cb + c.c_ab > 0
        |     THEN CAST(n.n - fa.ca - sb.cb + c.c_ab AS DOUBLE)
        |     * ln(CAST(n.n - fa.ca - sb.cb + c.c_ab AS DOUBLE)
        |        / (CAST(n.n - fa.ca AS DOUBLE) * (n.n - sb.cb) / CAST(n.n AS DOUBLE)))
        |    ELSE 0.0 END)), 4) AS g2
        | FROM c JOIN fa USING (w1) JOIN sb USING (w2), n)
        |SELECT w1, w2, c_ab, g2,
        | CAST(row_number() OVER (ORDER BY g2 DESC, w1, w2) AS INTEGER) AS rnk
        |FROM sc ORDER BY g2 DESC, w1, w2 LIMIT 20""".stripMargin,
    // q421: descending cumulative TP/N over the distinct-score grid;
    // precision/recall/F1 are divisions of exact integers, best row
    // by unrounded F1 with ties to the lower threshold
    "q421_f1_sweep" ->
      """WITH s AS (
        | SELECT CAST(('0x' || substr(md5('cal:' || vec_id), 1, 4))
        |   AS BIGINT) / 65536.0 AS score,
        |  CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
        | FROM embeddings),
        |g AS (
        | SELECT score, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS npos
        | FROM s GROUP BY score),
        |c AS (
        | SELECT score,
        |  CAST(sum(n) OVER (ORDER BY score DESC) AS BIGINT) AS n_pred_pos,
        |  CAST(sum(npos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
        |  CAST(sum(npos) OVER () AS BIGINT) AS p_all
        | FROM g),
        |f AS (
        | SELECT score, n_pred_pos, tp, p_all,
        |  2.0 * tp / (n_pred_pos + p_all) AS f1raw
        | FROM c),
        |b AS (
        | SELECT score, row_number() OVER (ORDER BY f1raw DESC, score)
        |   AS brnk
        | FROM f)
        |SELECT f.score AS threshold, f.n_pred_pos, f.tp,
        | round(CAST(f.tp AS DOUBLE) / f.n_pred_pos, 4) AS precision,
        | round(CAST(f.tp AS DOUBLE) / f.p_all, 4) AS recall,
        | round(f.f1raw, 4) AS f1,
        | b.brnk = 1 AS is_best
        |FROM f JOIN b ON b.score = f.score
        |ORDER BY threshold""".stripMargin,
    // q422: exact order statistic from the sorted 7-day window array
    "q422_sliding_p95" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        | FROM events WHERE event_type = 'click' GROUP BY 1),
        |w AS (
        | SELECT day, x,
        |  list_sort(array_agg(x) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        | FROM d)
        |SELECT day, x, CAST(len(arr) AS INTEGER) AS n_window,
        | arr[CAST(ceil(len(arr) * 0.95) AS INTEGER)] AS p95
        |FROM w ORDER BY day""".stripMargin,
    // q423: four group means of exact BIGINT sums, the DiD contrast
    // 4-dp pinned at the end; users with no purchases count 0
    "q423_did" ->
      """WITH u AS (
        | SELECT DISTINCT user_id,
        |  CAST(('0x' || substr(md5('did:' || user_id), 1, 8)) AS BIGINT)
        |   % 2 = 0 AS treat
        | FROM events),
        |p AS (
        | SELECT user_id,
        |  CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS y_pre,
        |  CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS y_post
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (
        | SELECT u.treat, coalesce(p.y_pre, 0) AS y_pre,
        |  coalesce(p.y_post, 0) AS y_post
        | FROM u LEFT JOIN p USING (user_id)),
        |a AS (
        | SELECT
        |  CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |  CAST(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |  CAST(sum(CASE WHEN treat THEN y_pre ELSE 0 END) AS BIGINT) AS st_pre,
        |  CAST(sum(CASE WHEN treat THEN y_post ELSE 0 END) AS BIGINT) AS st_post,
        |  CAST(sum(CASE WHEN NOT treat THEN y_pre ELSE 0 END) AS BIGINT) AS sc_pre,
        |  CAST(sum(CASE WHEN NOT treat THEN y_post ELSE 0 END) AS BIGINT) AS sc_post
        | FROM j)
        |SELECT n_treat, n_ctrl,
        | round(CAST(st_pre AS DOUBLE) / n_treat, 4) AS y_treat_pre,
        | round(CAST(st_post AS DOUBLE) / n_treat, 4) AS y_treat_post,
        | round(CAST(sc_pre AS DOUBLE) / n_ctrl, 4) AS y_ctrl_pre,
        | round(CAST(sc_post AS DOUBLE) / n_ctrl, 4) AS y_ctrl_post,
        | round((CAST(st_post AS DOUBLE) / n_treat
        |      - CAST(st_pre AS DOUBLE) / n_treat)
        |   - (CAST(sc_post AS DOUBLE) / n_ctrl
        |      - CAST(sc_pre AS DOUBLE) / n_ctrl), 4) AS did
        |FROM a""".stripMargin,
    // q424: the Scala-computed x1e8 rank weights interpolated; the
    // per-query score is an order-free BIGINT sum (generator-free —
    // the leg CTEs are the q411 recomposition)
    "q424_rbp" ->
      s"""WITH exact AS (
         |$exactTopKOracle
         |), ivf AS (
         |${ivfOracle(nlist = 16, nprobe = 4, iters = 3, dim = 64, k = 5,
               seed = 42, queryMax = 8)}
         |), j AS (
         | SELECT i.query_id,
         |  CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
         |  CASE WHEN e.neighbor_id IS NOT NULL THEN
         |   CASE i.rnk WHEN 1 THEN ${operators.PipelineQueries.RbpWeightsMicro(0)}
         |    WHEN 2 THEN ${operators.PipelineQueries.RbpWeightsMicro(1)}
         |    WHEN 3 THEN ${operators.PipelineQueries.RbpWeightsMicro(2)}
         |    WHEN 4 THEN ${operators.PipelineQueries.RbpWeightsMicro(3)}
         |    WHEN 5 THEN ${operators.PipelineQueries.RbpWeightsMicro(4)}
         |    ELSE 0 END
         |   ELSE 0 END AS wm
         | FROM ivf i LEFT JOIN exact e USING (query_id, neighbor_id))
         |SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_hits,
         | round(CAST(sum(wm) AS DOUBLE) / 1e8, 4) AS rbp
         |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin,
    // q425: cumulative Qini per decile — exact integers until the
    // final control-baseline scaling
    "q425_qini" ->
      """WITH u AS (
        | SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS y,
        |  CAST(('0x' || substr(md5('did:' || user_id), 1, 8)) AS BIGINT)
        |   % 2 = 0 AS treat,
        |  CAST(('0x' || substr(md5('qini:' || user_id), 1, 4)) AS BIGINT)
        |   / 65536.0 AS score
        | FROM events GROUP BY user_id),
        |r AS (
        | SELECT y, treat,
        |  ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        | FROM u),
        |d AS (
        | SELECT decile,
        |  CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS dn_t,
        |  CAST(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS dn_c,
        |  CAST(sum(CASE WHEN treat THEN y ELSE 0 END) AS BIGINT) AS dy_t,
        |  CAST(sum(CASE WHEN NOT treat THEN y ELSE 0 END) AS BIGINT) AS dy_c
        | FROM r GROUP BY decile),
        |c AS (
        | SELECT decile,
        |  CAST(sum(dn_t) OVER w AS BIGINT) AS n_t,
        |  CAST(sum(dn_c) OVER w AS BIGINT) AS n_c,
        |  CAST(sum(dy_t) OVER w AS BIGINT) AS y_t,
        |  CAST(sum(dy_c) OVER w AS BIGINT) AS y_c
        | FROM d WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        |SELECT CAST(decile AS INTEGER) AS decile, n_t, n_c, y_t, y_c,
        | round(CAST(y_t AS DOUBLE) - CAST(y_c AS DOUBLE)
        |   * CAST(n_t AS DOUBLE) / CAST(n_c AS DOUBLE), 4) AS qini
        |FROM c ORDER BY decile""".stripMargin,
    // q427: variance/mean from exact moments; the flag by exact
    // integer cross-multiplication (never a float boundary)
    "q427_dispersion" ->
      """WITH d AS (
        | SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |a AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x*x) AS BIGINT) AS s2
        | FROM d GROUP BY 1)
        |SELECT event_type, n_days, s1 AS total,
        | round(CAST(s1 AS DOUBLE) / n_days, 4) AS mean_daily,
        | round(CAST(n_days*s2 - s1*s1 AS DOUBLE)
        |   / (CAST(n_days - 1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 4)
        |  AS dispersion,
        | (n_days*s2 - s1*s1) * 2 > (n_days - 1) * s1 * 3 AS overdispersed
        |FROM a ORDER BY event_type""".stripMargin,
    // q428: q384's closed-form manifest, through the zip reader
    "q428_dsv2_zip" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  doc_id || '.txt' AS name,
        |  CAST(strlen(text) AS BIGINT) AS size, md5(text) AS payload_md5
        | FROM documents)
        |SELECT shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1
        |  AS INTEGER) AS idx,
        | name, size, payload_md5
        |FROM m ORDER BY shard, idx""".stripMargin,
    // q429: HHI from exact integer moments, one division at the end
    "q429_mixture_hhi" ->
      """WITH s AS (
        | SELECT source,
        |  CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |   AS BIGINT) AS toks
        | FROM documents GROUP BY source),
        |g AS (
        | SELECT CAST(sum(toks) AS BIGINT) AS T,
        |  round(CAST(sum(toks*toks) AS DOUBLE)
        |    / (CAST(sum(toks) AS DOUBLE) * CAST(sum(toks) AS DOUBLE)), 6)
        |   AS hhi
        | FROM s)
        |SELECT s.source, s.toks,
        | round(CAST(s.toks AS DOUBLE) / g.T, 6) AS share,
        | g.hhi, round(1.0 / g.hhi, 4) AS n_effective
        |FROM s, g ORDER BY source""".stripMargin,
    // q430: the WebDataset pairing audit is a pure function of the
    // documents table — every doc has a .txt member, docs with
    // doc_id % 7 != 0 AND a non-NULL lang also have a .cls member
    // (the writer skips NULL payloads, so those samples are incomplete)
    "q430_wds_pairs" ->
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 7 <> 0 AND lang IS NOT NULL
        |   THEN 2 ELSE 1 END AS BIGINT) AS n_members,
        | true AS has_txt,
        | doc_id % 7 <> 0 AND lang IS NOT NULL AS has_cls,
        | CAST(strlen(text) AS BIGINT) AS txt_size,
        | CASE WHEN doc_id % 7 <> 0 AND lang IS NOT NULL
        |   THEN lang ELSE NULL END AS cls_label,
        | doc_id % 7 <> 0 AND lang IS NOT NULL AS complete
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q431: the 3-round MM fit unrolls into chained CTEs — per-round
    // strengths re-rounded to 6 dp, per-opponent terms rounded then
    // summed as DECIMAL so the reduction is exact and order-free
    "q431_bradley_terry" -> {
      def mmRound(prev: String, out: String): String =
        s"""$out AS (
           | SELECT s.i, round(CAST(w.wi AS DOUBLE) /
           |   CAST(sum(CAST(round(s.n / greatest(pa.p + pb.p,
           |     0.000000001), 6) AS DECIMAL(28,6))) AS DOUBLE), 6) AS p
           | FROM sym s
           | JOIN $prev pa ON pa.i = s.i
           | JOIN $prev pb ON pb.i = s.j
           | JOIN wins w ON w.i = s.i
           | GROUP BY s.i, w.wi)""".stripMargin
      s"""WITH c AS (
        | SELECT user_id, event_type, count(*) AS cnt
        | FROM events GROUP BY 1, 2),
        |duels AS (
        | SELECT a.event_type AS i, b.event_type AS j,
        |  CASE WHEN a.cnt > b.cnt THEN 1 ELSE 0 END AS wi
        | FROM c a JOIN c b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        | WHERE a.cnt <> b.cnt),
        |pm AS (
        | SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(wi) AS BIGINT) AS w
        | FROM duels GROUP BY i, j),
        |sym AS (
        | SELECT i, j, n, w FROM pm
        | UNION ALL
        | SELECT j AS i, i AS j, n, n - w AS w FROM pm),
        |wins AS (
        | SELECT i, CAST(sum(w) AS BIGINT) AS wi,
        |  CAST(sum(n) AS BIGINT) AS gi
        | FROM sym GROUP BY i),
        |p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM wins),
        |${mmRound("p0", "p1")},
        |${mmRound("p1", "p2")},
        |${mmRound("p2", "p3")},
        |tot AS (
        | SELECT CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS t
        | FROM p3)
        |SELECT w.i AS event_type, w.gi AS games, w.wi AS wins,
        | p3.p AS strength, round(p3.p / tot.t, 6) AS share
        |FROM wins w JOIN p3 ON p3.i = w.i CROSS JOIN tot
        |ORDER BY share DESC, event_type""".stripMargin
    },
    // q432: component = min reachable id over the md5-gated chain
    // edges, the q49 recursive-CTE convention; isolated docs are
    // their own component
    "q432_cc_star" -> ccStarOracle,
    // q436: the incremental merge must equal the full recompute —
    // q432's oracle VERBATIM is the contract
    "q436_cc_incremental" -> ccStarOracle,
    // q433: the q60 quality formula, two mirrored rank windows, and
    // the margin gate restated verbatim
    "q433_dpo_pairs" ->
      """WITH t AS (
        | SELECT doc_id, source, text,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        | FROM documents),
        |q AS (SELECT doc_id, source,
        | round((CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
        |  + (CASE WHEN length(text) BETWEEN 20 AND 20000
        |     THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS q
        | FROM t),
        |hi AS (SELECT source, doc_id AS chosen_id, q AS chosen_q,
        | row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
        |  AS k FROM q),
        |lo AS (SELECT source, doc_id AS rejected_id, q AS rejected_q,
        | row_number() OVER (PARTITION BY source
        |   ORDER BY q ASC, doc_id DESC) AS k FROM q),
        |n AS (SELECT source, count(*) AS n_docs FROM q GROUP BY source)
        |SELECT hi.source, CAST(hi.k AS INTEGER) AS pair_rank,
        | chosen_id, rejected_id, chosen_q, rejected_q,
        | round(chosen_q - rejected_q, 4) AS margin
        |FROM hi JOIN lo ON hi.source = lo.source AND hi.k = lo.k
        |JOIN n ON n.source = hi.source
        |WHERE hi.k <= 3 AND hi.k * 2 <= n.n_docs
        | AND round(chosen_q - rejected_q, 4) >= 0.05
        |ORDER BY hi.source, pair_rank""".stripMargin,
    // q434: pure integer arithmetic — ⌊x/y + 0.5⌋ as (2x+y)//(2y)
    "q434_span_corruption" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |   AS BIGINT) AS n_tokens
        | FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        | (n_tokens * 3 + 10) // 20 AS n_noise FROM t),
        |sp AS (SELECT doc_id, n_tokens, n_noise,
        | CASE WHEN n_noise = 0 THEN 0
        |  ELSE greatest((n_noise * 2 + 3) // 6, 1) END AS n_spans
        | FROM b)
        |SELECT doc_id, n_tokens, n_noise, n_spans,
        | n_tokens - n_noise + n_spans AS inputs_len,
        | CASE WHEN n_noise = 0 THEN 0
        |  ELSE n_noise + n_spans + 1 END AS targets_len,
        | CASE WHEN n_tokens = 0 THEN NULL
        |  ELSE round(CAST(n_tokens - n_noise + n_spans AS DOUBLE)
        |    / n_tokens, 4) END AS keep_ratio
        |FROM sp ORDER BY doc_id""".stripMargin,
    // q435: the exact J >= 0.7 pair set against hash-assigned batches
    // of three target sizes; leak counts are integer sums
    "q435_batch_leakage" ->
      (s"""WITH pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |nd AS (SELECT count(*) AS n FROM documents),
        |sizes(bsz) AS (VALUES (16), (64), (256)),
        |cfg AS (SELECT bsz, (n + bsz - 1) // bsz AS nb FROM sizes, nd),
        |lk AS (
        | SELECT c.bsz, c.nb,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN
        |    CAST(('0x' || substr(md5('batch' || c.bsz || ':' || p.id_a),
        |      1, 8)) AS BIGINT) % c.nb
        |    = CAST(('0x' || substr(md5('batch' || c.bsz || ':' || p.id_b),
        |      1, 8)) AS BIGINT) % c.nb
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        | FROM cfg c CROSS JOIN pairs p GROUP BY c.bsz, c.nb)
        |SELECT CAST(bsz AS INTEGER) AS batch_size,
        | CAST(nb AS BIGINT) AS n_batches, n_pairs, n_leaked,
        | CASE WHEN n_pairs = 0 THEN NULL
        |  ELSE round(CAST(n_leaked AS DOUBLE) / n_pairs, 6) END AS leak_rate,
        | round(1.0 / nb, 6) AS expected_rate
        |FROM lk ORDER BY batch_size""".stripMargin),
    // q437: ln points rounded to 6 dp, every OLS moment a DECIMAL
    // term-sum, residuals from the ROUNDED published fit
    "q437_heaps_fit" ->
      """WITH toks AS (
        | SELECT source,
        |  unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        | FROM documents WHERE len(trim(text)) > 0),
        |pt AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |pts AS (
        | SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  round(ln(CAST(sum(cnt) AS DOUBLE)), 6) AS x,
        |  round(ln(CAST(count(*) AS DOUBLE)), 6) AS y
        | FROM pt GROUP BY source),
        |mom AS (
        | SELECT CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(round(x*x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(round(x*y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(round(y*y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy
        | FROM pts),
        |fit0 AS (SELECT n, sx, sy, sxx, sxy, syy,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS beta FROM mom),
        |fit AS (SELECT beta,
        |  round((sy - beta*sx) / n, 6) AS ln_k,
        |  round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
        |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        | FROM fit0)
        |SELECT p.source, p.n_tokens, p.vocab, f.beta, f.ln_k, f.r2,
        | round(p.y - f.ln_k - f.beta * p.x, 4) AS ln_resid
        |FROM pts p CROSS JOIN fit f ORDER BY p.source""".stripMargin,
    // q438: centered-MA trend is an exact windowed integer sum / 7;
    // the seasonal means are rounded-term DECIMAL sums; dow from
    // epoch-day mod 7
    "q438_seasonal_decomp" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1),
        |t AS (
        | SELECT day, y,
        |  CAST((day - DATE '1970-01-01') % 7 AS INTEGER) AS dow,
        |  row_number() OVER (ORDER BY day) AS rn,
        |  count(*) OVER () AS n,
        |  sum(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |    AND 3 FOLLOWING) AS s7
        | FROM d),
        |tr AS (
        | SELECT day, dow, y,
        |  CASE WHEN rn >= 4 AND rn <= n - 3
        |   THEN round(CAST(s7 AS DOUBLE) / 7, 6) END AS trend
        | FROM t),
        |det AS (
        | SELECT day, dow, y, trend,
        |  CASE WHEN trend IS NOT NULL THEN round(y - trend, 6) END AS det
        | FROM tr),
        |sd AS (
        | SELECT dow,
        |  round(CAST(sum(CAST(det AS DECIMAL(20,6))) AS DOUBLE)
        |    / count(*), 6) AS s_raw
        | FROM det WHERE det IS NOT NULL GROUP BY 1),
        |sm AS (
        | SELECT round(CAST(sum(CAST(s_raw AS DECIMAL(20,6))) AS DOUBLE)
        |   / 7, 6) AS sbar FROM sd),
        |se AS (SELECT dow, round(s_raw - sm.sbar, 6) AS seasonal
        |       FROM sd CROSS JOIN sm)
        |SELECT det.day, det.dow, det.y, det.trend, se.seasonal,
        | CASE WHEN det.trend IS NOT NULL
        |  THEN round(det.y - det.trend - se.seasonal, 4) END AS remainder
        |FROM det JOIN se ON det.dow = se.dow
        |ORDER BY det.day""".stripMargin,
    // q439: both numbers from per-side aggregates — the exact size via
    // a degree-histogram join, never the wide join itself
    "q439_join_synopsis" -> {
      def leg(name: String, ta: String, ka: String, kb: String): String =
        s"""SELECT '$name' AS join_key,
           | sa.rows_a, sb.rows_b, sa.ndv_a, sb.ndv_b,
           | round(CAST(sa.rows_a AS DOUBLE) * sb.rows_b
           |   / greatest(sa.ndv_a, sb.ndv_b), 4) AS est_sysr,
           | ac.actual,
           | round(round(CAST(sa.rows_a AS DOUBLE) * sb.rows_b
           |   / greatest(sa.ndv_a, sb.ndv_b), 4)
           |   / ac.actual, 4) AS err_ratio
           |FROM
           | (SELECT CAST(count(*) AS BIGINT) AS rows_a,
           |   CAST(count(DISTINCT $ka) AS BIGINT) AS ndv_a FROM $ta) sa,
           | (SELECT CAST(count(*) AS BIGINT) AS rows_b,
           |   CAST(count(DISTINCT $kb) AS BIGINT) AS ndv_b FROM lineitem) sb,
           | (SELECT CAST(sum(d * d2) AS BIGINT) AS actual FROM
           |   (SELECT $ka AS k, count(*) AS d FROM $ta GROUP BY 1) da
           |   JOIN (SELECT $kb AS k, CAST(count(*) AS BIGINT) AS d2
           |         FROM lineitem GROUP BY 1) db USING (k)) ac""".stripMargin
      s"""${leg("orderkey", "orders", "o_orderkey", "l_orderkey")}
         |UNION ALL
         |${leg("partkey", "part", "p_partkey", "l_partkey")}
         |UNION ALL
         |${leg("suppkey", "supplier", "s_suppkey", "l_suppkey")}
         |ORDER BY join_key""".stripMargin
    },
    // q440: plain-syntax band join through the optimizer rewrite —
    // q323's oracle verbatim (the two plans must be row-identical)
    "q440_band_rewrite" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        | c.us - v.us AS gap_us
        |FROM (SELECT * FROM e WHERE event_type = 'click') c
        |JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND abs(c.us - v.us) <= 1800000000
        |ORDER BY click_id, view_id""".stripMargin,
    // q444: q440's LEFT OUTER twin — the rewrite must decline (inner
    // only), unmatched clicks keep NULL view columns
    "q444_band_left_outer" ->
      """WITH e AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
        |SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        | c.us - v.us AS gap_us
        |FROM (SELECT * FROM e WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND abs(c.us - v.us) <= 1800000000
        |ORDER BY click_id, view_id""".stripMargin,
    // q441: the q49 components, one join to byte lengths, canonical =
    // component min (the q55 keep rule)
    "q441_dedup_survivorship" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |lab AS (SELECT src AS doc_id, min(dst) AS comp
        | FROM reach GROUP BY src),
        |m AS (
        | SELECT l.comp, l.doc_id, CAST(strlen(d.text) AS BIGINT) AS b
        | FROM lab l JOIN documents d USING (doc_id)),
        |g AS (
        | SELECT comp AS group_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(b) AS BIGINT) AS bytes_total,
        |  CAST(sum(CASE WHEN doc_id = comp THEN b ELSE 0 END) AS BIGINT)
        |   AS bytes_kept
        | FROM m GROUP BY comp HAVING count(*) >= 2)
        |SELECT group_id, n_docs, bytes_total, bytes_kept,
        | bytes_total - bytes_kept AS bytes_saved
        |FROM g ORDER BY n_docs DESC, group_id""".stripMargin),
    // q442: loser flag from the q49 components, q25 quality, exact
    // DECIMAL moment sums, population sd (the point-biserial form)
    "q442_dup_quality_bias" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |lab AS (SELECT src AS doc_id, min(dst) AS comp
        | FROM reach GROUP BY src),
        |losers AS (SELECT doc_id FROM lab WHERE comp <> doc_id),
        |t AS (
        | SELECT doc_id, text,
        |  CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        | FROM documents),
        |q AS (SELECT doc_id,
        | round((CAST(len(list_distinct(toks)) AS DOUBLE)
        |   / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
        |  + (CASE WHEN length(text) BETWEEN 20 AND 20000
        |     THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS q
        | FROM t),
        |s AS (
        | SELECT q.doc_id, q.q, (l.doc_id IS NOT NULL) AS is_loser
        | FROM q LEFT JOIN losers l USING (doc_id)),
        |m AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN is_loser THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_losers,
        |  CAST(sum(CAST(q AS DECIMAL(20,4))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(round(q*q, 8) AS DECIMAL(24,8))) AS DOUBLE) AS s2,
        |  CAST(sum(CASE WHEN is_loser THEN CAST(q AS DECIMAL(20,4))
        |    ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) AS sl
        | FROM s),
        |f AS (
        | SELECT n_docs, n_losers,
        |  CAST(n_losers AS DOUBLE) / n_docs AS p,
        |  sl / n_losers AS mu_l,
        |  (s1 - sl) / (n_docs - n_losers) AS mu_k,
        |  sqrt(greatest(s2 / n_docs - (s1 / n_docs) * (s1 / n_docs), 0.0))
        |   AS sd
        | FROM m)
        |SELECT n_docs, n_losers,
        | round(mu_l, 4) AS mean_q_loser,
        | round(mu_k, 4) AS mean_q_keeper,
        | round((mu_l - mu_k) / sd * sqrt(p * (1 - p)), 4) AS r_pb
        |FROM f""".stripMargin),
    // q443: the funnel's flag frame (the q115 chain verbatim) grouped
    // per domain, joined with the q83 md5-derived target plan —
    // shipped = every funnel predicate AND the train bucket
    "q443_shipped_mixture" ->
      (s"""$funnelFlagCtes,
        |pd AS (
        | SELECT domain,
        |  CAST(count(*) AS BIGINT) AS corpus_docs,
        |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS corpus_tokens,
        |  CAST(count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4 AND p5
        |    AND b < 80) AS BIGINT) AS shipped_docs,
        |  CAST(coalesce(sum(n_tokens) FILTER (WHERE p1 AND p2 AND p3
        |    AND p4 AND p5 AND b < 80), 0) AS BIGINT) AS shipped_tokens
        | FROM flags GROUP BY domain),
        |tt AS (
        | SELECT domain,
        |  CAST(CAST(('0x' || substr(md5('mix:' || domain), 1, 8)) AS BIGINT) % 9 + 1
        |   AS INTEGER) AS target_pct
        | FROM (SELECT DISTINCT source AS domain FROM documents)),
        |tot AS (SELECT CAST(sum(shipped_tokens) AS DOUBLE) AS tot FROM pd),
        |r AS (
        | SELECT pd.domain, corpus_docs, corpus_tokens, shipped_docs,
        |  shipped_tokens,
        |  round(100.0 * CAST(shipped_tokens AS DOUBLE) / tot.tot, 4)
        |   AS shipped_pct,
        |  target_pct
        | FROM pd JOIN tt USING (domain), tot)
        |SELECT domain, corpus_docs, corpus_tokens, shipped_docs,
        | shipped_tokens, shipped_pct, target_pct,
        | round(shipped_pct - CAST(target_pct AS DOUBLE), 4) AS delta_pct
        |FROM r ORDER BY domain""".stripMargin),
    // q445: interpolated Kneser-Ney bigram LM beside q118's add-k —
    // all model quantities integer counts; P_KN's double expression
    // mirrors the engine's shape op-for-op; per-bigram log10 pinned to
    // 6dp and summed as DECIMAL(28,6) (q336-class rule) before the
    // final 4-dp round. cab/bg/t are multiply-referenced →
    // MATERIALIZED (the r13 oracle-cost lesson).
    "q445_kneser_ney_lm" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |bg AS MATERIALIZED (
        | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS MATERIALIZED (
        | SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |hist AS MATERIALIZED (
        | SELECT w1, sum(c_ab) AS c1, count(*) AS nf FROM cab GROUP BY 1),
        |cont AS MATERIALIZED (
        | SELECT w2, count(*) AS nb FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM cab),
        |p AS (
        | SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(round(log10(
        |    greatest(CAST(cab.c_ab AS DOUBLE) - 0.75, 0.0) / CAST(h.c1 AS DOUBLE)
        |    + (0.75 * CAST(h.nf AS DOUBLE) / CAST(h.c1 AS DOUBLE))
        |      * (CAST(ct.nb AS DOUBLE) / nt.nt)), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |   / count(*), 4) AS avg_logp
        | FROM bg JOIN cab USING (w1, w2) JOIN hist h ON h.w1 = bg.w1
        |  JOIN cont ct ON ct.w2 = bg.w2, nt
        | GROUP BY bg.doc_id)
        |SELECT d.doc_id, p.n_bigrams, p.avg_logp
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q446/q447: the in-engine trained logistic filter — 3 unrolled GD
    // rounds with micro-unit (exact long) weights; every float op is a
    // fixed-shape scalar chain mirrored op-for-op from TrainedFilter
    "q446_lr_filter_scores" ->
      (s"""WITH ${lrTrainCtes(32, 3)},
         |sc AS (
         | SELECT lab.doc_id, lab.y,
         |  1.0 / (1.0 + exp(-(CAST(b.bu + coalesce(s.su, 0) AS DOUBLE)
         |    / 1000000.0))) AS p
         | FROM lab
         | LEFT JOIN (SELECT f.doc_id, sum(w.wu) AS su
         |            FROM feats f JOIN w3 w USING (j) GROUP BY 1) s
         |  USING (doc_id), b3 b)
         |SELECT doc_id, y AS label, round(p, 4) AS score,
         | CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred
         |FROM sc ORDER BY doc_id""".stripMargin),
    "q447_lr_filter_weights" ->
      (s"""WITH ${lrTrainCtes(32, 3)}
         |SELECT j, CAST(wu AS DOUBLE) / 1000000.0 AS w FROM (
         | SELECT CAST(-1 AS INTEGER) AS j, bu AS wu FROM b3
         | UNION ALL SELECT j, wu FROM w3) t ORDER BY j""".stripMargin),
    // q448: the q445 KN-LM CTE chain extended by per-LANG 4-dp quartile
    // cut points (quantile_cont ≡ percentile, the q50-proven pair) and
    // the per-(lang, bucket) doc/token report. MATERIALIZED: the LM
    // chain is the q445 fixpoint-free shape but `p` is referenced by
    // both scored and (via scored) the bounds + bucket legs.
    "q448_perplexity_filter" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |bg AS MATERIALIZED (
        | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS MATERIALIZED (
        | SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |hist AS MATERIALIZED (
        | SELECT w1, sum(c_ab) AS c1, count(*) AS nf FROM cab GROUP BY 1),
        |cont AS MATERIALIZED (
        | SELECT w2, count(*) AS nb FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM cab),
        |p AS MATERIALIZED (
        | SELECT bg.doc_id,
        |  round(CAST(sum(CAST(round(log10(
        |    greatest(CAST(cab.c_ab AS DOUBLE) - 0.75, 0.0) / CAST(h.c1 AS DOUBLE)
        |    + (0.75 * CAST(h.nf AS DOUBLE) / CAST(h.c1 AS DOUBLE))
        |      * (CAST(ct.nb AS DOUBLE) / nt.nt)), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |   / count(*), 4) AS avg_logp
        | FROM bg JOIN cab USING (w1, w2) JOIN hist h ON h.w1 = bg.w1
        |  JOIN cont ct ON ct.w2 = bg.w2, nt
        | GROUP BY bg.doc_id),
        |scored AS MATERIALIZED (
        | SELECT d.doc_id, d.lang,
        |  CAST(CASE WHEN len(trim(d.text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END AS BIGINT)
        |   AS toks,
        |  p.avg_logp
        | FROM documents d LEFT JOIN p USING (doc_id)),
        |b AS (
        | SELECT lang, round(quantile_cont(avg_logp, 0.25), 4) AS b1,
        |        round(quantile_cont(avg_logp, 0.75), 4) AS b2
        | FROM scored WHERE avg_logp IS NOT NULL GROUP BY lang),
        |bk AS (
        | SELECT s.lang,
        |  CASE WHEN s.avg_logp IS NULL THEN 'unscored'
        |       WHEN s.avg_logp <= b.b1 THEN 'tail'
        |       WHEN s.avg_logp <= b.b2 THEN 'middle'
        |       ELSE 'head' END AS bucket,
        |  s.toks, s.avg_logp
        | FROM scored s LEFT JOIN b USING (lang))
        |SELECT lang, bucket, count(*) AS n_docs,
        | CAST(sum(toks) AS BIGINT) AS n_tokens,
        | round(CAST(sum(CAST(avg_logp AS DECIMAL(20,4))) AS DOUBLE)
        |   / count(avg_logp), 4) AS mean_logp,
        | bucket IN ('head', 'middle') AS kept
        |FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    // q449: the q49 recursive-CTE components extended by component
    // sizes and the per-source effective-token report (toks · 1/|comp|
    // terms 6-dp-pinned and DECIMAL-summed, one rounded cast at the end).
    "q449_soft_dedup" ->
      (s"""WITH RECURSIVE pairs AS (
        |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
        |edges AS (
        | SELECT id_a AS a, id_b AS b FROM pairs
        | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
        |reach(src, dst) AS (
        | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY src),
        |csz AS (SELECT comp, count(*) AS csz FROM comp GROUP BY comp),
        |m AS (
        | SELECT d.doc_id, d.source,
        |  CAST(CASE WHEN len(trim(d.text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS BIGINT)
        |   AS toks,
        |  cz.csz
        | FROM documents d
        | LEFT JOIN comp c USING (doc_id) LEFT JOIN csz cz ON cz.comp = c.comp)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN csz IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_dup_docs,
        | CAST(sum(toks) AS BIGINT) AS raw_tokens,
        | round(CAST(sum(CAST(round(CAST(toks AS DOUBLE) *
        |   (CASE WHEN csz IS NULL THEN 1.0 ELSE 1.0 / CAST(csz AS DOUBLE) END),
        |   6) AS DECIMAL(24,6))) AS DOUBLE), 4) AS effective_tokens
        |FROM m GROUP BY source ORDER BY source""".stripMargin),
    // q450: Simple Good-Turing over word-trigram counts — Z_r neighbor
    // smoothing, the raw Turing r*, and the log-log-fit r*_LGT; the
    // regression is 6/8-dp-pinned DECIMAL-summed (order-free), so both
    // engines fit the identical rounded points.
    "q450_good_turing" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |tri AS MATERIALIZED (
        | SELECT a[CAST(i AS INTEGER)] || ' ' || a[CAST(i AS INTEGER) + 1] ||
        |  ' ' || a[CAST(i AS INTEGER) + 2] AS w
        | FROM (SELECT a, unnest(generate_series(1, len(a) - 2)) AS i
        |       FROM t WHERE len(a) >= 3) x),
        |c AS MATERIALIZED (SELECT w, count(*) AS r FROM tri GROUP BY w),
        |nr AS MATERIALIZED (SELECT r, count(*) AS n_r FROM c GROUP BY r),
        |zr AS MATERIALIZED (
        | SELECT r, n_r,
        |  lag(r, 1, CAST(0 AS BIGINT)) OVER (ORDER BY r) AS q,
        |  coalesce(lead(r) OVER (ORDER BY r),
        |    2 * r - lag(r, 1, CAST(0 AS BIGINT)) OVER (ORDER BY r)) AS tt
        | FROM nr),
        |xy AS MATERIALIZED (
        | SELECT r, n_r,
        |  round(2.0 * CAST(n_r AS DOUBLE) / CAST(tt - q AS DOUBLE), 6) AS z_r,
        |  round(log10(CAST(r AS DOUBLE)), 6) AS x,
        |  round(log10(round(2.0 * CAST(n_r AS DOUBLE)
        |    / CAST(tt - q AS DOUBLE), 6)), 6) AS y
        | FROM zr),
        |fit AS (
        | SELECT round((CAST(count(*) AS DOUBLE) *
        |    CAST(sum(CAST(round(x * y, 8) AS DECIMAL(24,8))) AS DOUBLE) -
        |    CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE) *
        |    CAST(sum(CAST(y AS DECIMAL(20,6))) AS DOUBLE)) /
        |   (CAST(count(*) AS DOUBLE) *
        |    CAST(sum(CAST(round(x * x, 8) AS DECIMAL(24,8))) AS DOUBLE) -
        |    CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE) *
        |    CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE)), 6) AS b
        | FROM xy),
        |tot AS (
        | SELECT round(CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS DOUBLE) /
        |   CAST(sum(r * n_r) AS DOUBLE), 6) AS p0
        | FROM nr)
        |SELECT x.r, x.n_r, x.z_r,
        | round(CAST(x.r + 1 AS DOUBLE) * CAST(n2.n_r AS DOUBLE)
        |   / CAST(x.n_r AS DOUBLE), 4) AS r_turing,
        | round(CAST(x.r AS DOUBLE) *
        |   pow(CAST(x.r + 1 AS DOUBLE) / CAST(x.r AS DOUBLE), f.b + 1.0), 4)
        |  AS r_lgt,
        | f.b, t2.p0
        |FROM xy x LEFT JOIN nr n2 ON n2.r = x.r + 1, fit f, tot t2
        |WHERE x.r <= 10 ORDER BY x.r""".stripMargin,
    // q451: LZ76 via the f-walk decomposition — f(pos) = the shortest
    // phrase length starting at pos (computable position-parallel from
    // strpos over the prefix), then the sequential parse is a
    // functional-graph walk pos → pos + f(pos) as a recursive CTE
    // (depth = phrase count). f is MATERIALIZED: the recursion
    // references it once per iteration.
    "q451_lz_complexity" ->
      """WITH RECURSIVE s AS MATERIALIZED (
        | SELECT doc_id, substr(text, 1, 120) AS s,
        |  len(substr(text, 1, 120)) AS n
        | FROM documents),
        |f AS MATERIALIZED (
        | SELECT doc_id, pos,
        |  coalesce(min(CASE WHEN strpos(substr(s, 1, pos + l - 2),
        |    substr(s, pos, l)) = 0 THEN l END), n - pos + 1) AS flen
        | FROM (SELECT doc_id, s, n, pos,
        |        unnest(generate_series(1, n - pos + 1)) AS l
        |       FROM (SELECT doc_id, s, n, unnest(generate_series(1, n)) AS pos
        |             FROM s WHERE n >= 1) p) x
        | GROUP BY doc_id, pos, n),
        |walk(doc_id, pos, c) AS (
        | SELECT doc_id, CAST(1 AS BIGINT), 0 FROM s WHERE n >= 1
        | UNION ALL
        | SELECT w.doc_id, w.pos + f.flen, w.c + 1
        | FROM walk w JOIN f ON f.doc_id = w.doc_id AND f.pos = w.pos),
        |cx AS (SELECT doc_id, max(c) AS lz_c FROM walk GROUP BY doc_id)
        |SELECT s.doc_id, s.n AS n_used,
        | CASE WHEN s.s IS NULL THEN NULL ELSE coalesce(cx.lz_c, 0) END AS lz_c,
        | CASE WHEN s.n > 0 THEN round(CAST(coalesce(cx.lz_c, 0) AS DOUBLE) *
        |   log2(CAST(s.n AS DOUBLE)) / CAST(s.n AS DOUBLE), 4) END AS c_norm
        |FROM s LEFT JOIN cx USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    // q452/q453: the unrolled in-engine AdaBoost (see adaTrainCtes)
    "q452_adaboost_stumps" ->
      (s"""WITH ${adaTrainCtes(3)}
         |SELECT 1 AS t, feat, thr, pol, err, a AS alpha FROM a1
         |UNION ALL SELECT 2, feat, thr, pol, err, a FROM a2
         |UNION ALL SELECT 3, feat, thr, pol, err, a FROM a3
         |ORDER BY t""".stripMargin),
    "q453_adaboost_scores" ->
      (s"""WITH ${adaTrainCtes(3)}
         |SELECT f.doc_id, f.y AS label,
         | round(a1.a * (CASE WHEN (CASE a1.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a1.thr THEN a1.pol ELSE -a1.pol END)
         |  + a2.a * (CASE WHEN (CASE a2.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a2.thr THEN a2.pol ELSE -a2.pol END)
         |  + a3.a * (CASE WHEN (CASE a3.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a3.thr THEN a3.pol ELSE -a3.pol END),
         |  4) AS score,
         | CASE WHEN a1.a * (CASE WHEN (CASE a1.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a1.thr THEN a1.pol ELSE -a1.pol END)
         |  + a2.a * (CASE WHEN (CASE a2.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a2.thr THEN a2.pol ELSE -a2.pol END)
         |  + a3.a * (CASE WHEN (CASE a3.feat WHEN 1 THEN f.f1 WHEN 2
         |     THEN f.f2 ELSE f.f3 END) <= a3.thr THEN a3.pol ELSE -a3.pol END)
         |  >= 0 THEN 1 ELSE -1 END AS pred
         |FROM fw f, a1, a2, a3 ORDER BY f.doc_id""".stripMargin),
    // q454: Hájek IPW with the trained-propensity chain (see
    // ipwTrainCtes); weight terms 6-dp-pinned and DECIMAL-summed
    "q454_ipw_ate" ->
      (s"""WITH ${ipwTrainCtes(3)},
         |sc AS MATERIALIZED (
         | SELECT lab.doc_id,
         |  CAST(floor(1.0 / (1.0 + exp(-(CAST(b.bu + coalesce(s.su, 0)
         |      AS DOUBLE) / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT) AS pu
         | FROM lab
         | LEFT JOIN (SELECT f.doc_id, sum(w.wu) AS su
         |            FROM feats f JOIN w3 w USING (j) GROUP BY 1) s
         |  USING (doc_id), b3 b),
         |m AS MATERIALIZED (
         | SELECT ob.doc_id, ob.y, ob.yc,
         |  least(greatest(sc.pu, 1), 999999) AS eu
         | FROM ob JOIN sc USING (doc_id)),
         |g AS (
         | SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_t,
         |  sum(CASE WHEN y = 1 THEN CAST(round((CAST(yc AS DOUBLE) / 100)
         |    / (CAST(eu AS DOUBLE) / 1000000.0), 6) AS DECIMAL(28,6))
         |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS syt,
         |  sum(CASE WHEN y = 1 THEN CAST(round(1.0
         |    / (CAST(eu AS DOUBLE) / 1000000.0), 6) AS DECIMAL(28,6))
         |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS swt,
         |  sum(CASE WHEN y = 0 THEN CAST(round((CAST(yc AS DOUBLE) / 100)
         |    / (CAST(1000000 - eu AS DOUBLE) / 1000000.0), 6) AS DECIMAL(28,6))
         |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS syc,
         |  sum(CASE WHEN y = 0 THEN CAST(round(1.0
         |    / (CAST(1000000 - eu AS DOUBLE) / 1000000.0), 6) AS DECIMAL(28,6))
         |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS swc,
         |  CAST(sum(CASE WHEN y = 1 THEN yc ELSE 0 END) AS BIGINT) AS syn,
         |  CAST(sum(CASE WHEN y = 0 THEN yc ELSE 0 END) AS BIGINT) AS scn,
         |  round(min(CAST(eu AS DOUBLE) / 1000000.0), 6) AS e_min,
         |  round(max(CAST(eu AS DOUBLE) / 1000000.0), 6) AS e_max
         | FROM m)
         |SELECT n, n_t,
         | round(CAST(syt AS DOUBLE) / CAST(swt AS DOUBLE), 4) AS mu_ipw_treat,
         | round(CAST(syc AS DOUBLE) / CAST(swc AS DOUBLE), 4) AS mu_ipw_ctrl,
         | round(CAST(syt AS DOUBLE) / CAST(swt AS DOUBLE)
         |   - CAST(syc AS DOUBLE) / CAST(swc AS DOUBLE), 4) AS ate_ipw,
         | round(CAST(syn AS DOUBLE) / CAST(n_t AS DOUBLE) / 100
         |   - CAST(scn AS DOUBLE) / CAST(n - n_t AS DOUBLE) / 100, 4)
         |  AS ate_naive,
         | e_min, e_max
         |FROM g""".stripMargin),
    // q455: BOTH Lloyd builds in one WITH — the shared q53 coarse
    // build (ivfBuildCtes defaults) plus a second, r-prefixed build
    // over the residual frame (the src/prefix parameterization);
    // distortions 8-dp-pinned and DECIMAL-summed per coarse cell.
    "q455_rq_distortion" ->
      (s"""WITH e AS (
         | SELECT vec_id,
         |  list_transform(CAST(embedding AS DOUBLE[]),
         |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
         |                                         y -> y*y)))) AS v
         | FROM embeddings),
         |${ivfBuildCtes(16, 3, 64, 42)},
         |res AS MATERIALIZED (
         | SELECT e.vec_id, a.cell AS cell1,
         |  list_transform(range(1, 65), i -> e.v[i] - c.ctr[i]) AS v
         | FROM e JOIN af a USING (vec_id) JOIN c3 c ON c.cell = a.cell),
         |${ivfBuildCtes(16, 3, 64, 777, src = "res", p = "r")}
         |SELECT r.cell1 AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
         | round(CAST(sum(CAST(round(list_sum(list_transform(r.v,
         |     x -> x * x)), 8) AS DECIMAL(28,8))) AS DOUBLE)
         |   / count(*), 6) AS mse_c1,
         | round(CAST(sum(CAST(round(list_sum(list_transform(range(1, 65),
         |     i -> (r.v[i] - c.ctr[i]) * (r.v[i] - c.ctr[i]))), 8)
         |     AS DECIMAL(28,8))) AS DOUBLE) / count(*), 6) AS mse_rq
         |FROM res r JOIN raf a USING (vec_id) JOIN rc3 c ON c.cell = a.cell
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    // q456: the three quality signals recomputed in one WITH (q445 LM
    // chain + q25 composite + q451 LZ walk), then pairwise Pearson
    // over rows where both signals exist — moments DECIMAL-pinned.
    "q456_signal_agreement" -> {
      def corrSel(name: String, xc: String, yc: String): String =
        s"""SELECT '$name' AS pair, CAST(count(*) AS BIGINT) AS n,
           | round((count(*) * CAST(sum(CAST(round($xc * $yc, 8)
           |     AS DECIMAL(24,8))) AS DOUBLE)
           |   - CAST(sum(CAST($xc AS DECIMAL(20,4))) AS DOUBLE)
           |     * CAST(sum(CAST($yc AS DECIMAL(20,4))) AS DOUBLE))
           |  / (sqrt(count(*) * CAST(sum(CAST(round($xc * $xc, 8)
           |       AS DECIMAL(24,8))) AS DOUBLE)
           |     - CAST(sum(CAST($xc AS DECIMAL(20,4))) AS DOUBLE)
           |       * CAST(sum(CAST($xc AS DECIMAL(20,4))) AS DOUBLE))
           |   * sqrt(count(*) * CAST(sum(CAST(round($yc * $yc, 8)
           |       AS DECIMAL(24,8))) AS DOUBLE)
           |     - CAST(sum(CAST($yc AS DECIMAL(20,4))) AS DOUBLE)
           |       * CAST(sum(CAST($yc AS DECIMAL(20,4))) AS DOUBLE))), 4)
           |  AS r
           |FROM m WHERE $xc IS NOT NULL AND $yc IS NOT NULL""".stripMargin
      s"""WITH RECURSIVE t AS MATERIALIZED (
         | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
         |   THEN CAST([] AS VARCHAR[])
         |   ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS a
         | FROM documents),
         |bg AS MATERIALIZED (
         | SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
         | FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
         |       FROM t WHERE len(a) >= 2) x),
         |cab AS MATERIALIZED (
         | SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
         |hist AS MATERIALIZED (
         | SELECT w1, sum(c_ab) AS c1, count(*) AS nf FROM cab GROUP BY 1),
         |cont AS MATERIALIZED (
         | SELECT w2, count(*) AS nb FROM cab GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM cab),
         |p AS MATERIALIZED (
         | SELECT bg.doc_id,
         |  round(CAST(sum(CAST(round(log10(
         |    greatest(CAST(cab.c_ab AS DOUBLE) - 0.75, 0.0) / CAST(h.c1 AS DOUBLE)
         |    + (0.75 * CAST(h.nf AS DOUBLE) / CAST(h.c1 AS DOUBLE))
         |      * (CAST(ct.nb AS DOUBLE) / nt.nt)), 6) AS DECIMAL(28,6))) AS DOUBLE)
         |   / count(*), 4) AS avg_logp
         | FROM bg JOIN cab USING (w1, w2) JOIN hist h ON h.w1 = bg.w1
         |  JOIN cont ct ON ct.w2 = bg.w2, nt
         | GROUP BY bg.doc_id),
         |qual AS MATERIALIZED (
         | SELECT doc_id,
         |  round((CAST(len(list_distinct(toks)) AS DOUBLE)
         |    / CAST(greatest(len(toks), 1) AS DOUBLE)) * 0.7
         |   + (CASE WHEN length(text) BETWEEN 20 AND 20000
         |      THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS q
         | FROM (SELECT doc_id, text,
         |        CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
         |       FROM documents) x),
         |s AS MATERIALIZED (
         | SELECT doc_id, substr(text, 1, 120) AS s,
         |  len(substr(text, 1, 120)) AS n
         | FROM documents),
         |f AS MATERIALIZED (
         | SELECT doc_id, pos,
         |  coalesce(min(CASE WHEN strpos(substr(s, 1, pos + l - 2),
         |    substr(s, pos, l)) = 0 THEN l END), n - pos + 1) AS flen
         | FROM (SELECT doc_id, s, n, pos,
         |        unnest(generate_series(1, n - pos + 1)) AS l
         |       FROM (SELECT doc_id, s, n, unnest(generate_series(1, n)) AS pos
         |             FROM s WHERE n >= 1) pp) x
         | GROUP BY doc_id, pos, n),
         |walk(doc_id, pos, c) AS (
         | SELECT doc_id, CAST(1 AS BIGINT), 0 FROM s WHERE n >= 1
         | UNION ALL
         | SELECT w.doc_id, w.pos + f.flen, w.c + 1
         | FROM walk w JOIN f ON f.doc_id = w.doc_id AND f.pos = w.pos),
         |cx AS (SELECT doc_id, max(c) AS lz_c FROM walk GROUP BY doc_id),
         |lzt AS (
         | SELECT s.doc_id,
         |  CASE WHEN s.n > 0 THEN round(CAST(coalesce(cx.lz_c, 0) AS DOUBLE) *
         |    log2(CAST(s.n AS DOUBLE)) / CAST(s.n AS DOUBLE), 4) END AS lz
         | FROM s LEFT JOIN cx USING (doc_id)),
         |m AS MATERIALIZED (
         | SELECT d.doc_id, qual.q, p.avg_logp AS lm, lzt.lz
         | FROM documents d JOIN qual USING (doc_id)
         | LEFT JOIN p USING (doc_id) LEFT JOIN lzt USING (doc_id))
         |${corrSel("lm_vs_lz", "lm", "lz")}
         |UNION ALL
         |${corrSel("lm_vs_quality", "lm", "q")}
         |UNION ALL
         |${corrSel("quality_vs_lz", "q", "lz")}
         |ORDER BY pair""".stripMargin
    },
    // q457: the q32 exact-pair oracle bucketed by a CASE ladder on the
    // 4-dp score; cumulative over the 5-row bin frame.
    "q457_jaccard_sweep" ->
      (s"""WITH pr AS MATERIALIZED (
         |${jaccardPairOracle(0.5).replace("ORDER BY id_a, id_b", "")}),
         |b AS (
         | SELECT CASE WHEN jaccard < 0.6 THEN 0.5
         |   WHEN jaccard < 0.7 THEN 0.6
         |   WHEN jaccard < 0.8 THEN 0.7
         |   WHEN jaccard < 0.9 THEN 0.8
         |   ELSE 0.9 END AS bin_lo, id_a, id_b
         | FROM pr),
         |g AS (SELECT bin_lo, CAST(count(*) AS BIGINT) AS n_pairs
         |      FROM b GROUP BY 1),
         |d AS (SELECT bin_lo, CAST(count(DISTINCT dd) AS BIGINT) AS n_docs
         |      FROM (SELECT bin_lo, unnest([id_a, id_b]) AS dd FROM b) x
         |      GROUP BY 1)
         |SELECT g.bin_lo, g.n_pairs, d.n_docs,
         | CAST(sum(g.n_pairs) OVER (ORDER BY g.bin_lo DESC
         |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pairs
         |FROM g JOIN d USING (bin_lo) ORDER BY bin_lo""".stripMargin),
    // q458: WARC record lengths restated arithmetically — response
    // header constants total 183 chars + the doc-id rendered twice
    // (record id + target URI) + the Content-Length digits; record =
    // header + payload octets + the 4-byte record terminator; the
    // fixed warcinfo record is 183 bytes (163-char header + 16-byte
    // payload + terminator). Offsets are the per-shard exclusive
    // prefix sum — the engine's MEASURED offsets must land on them.
    "q458_warc_shards" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n, md5(text) AS pm,
        |  'https://example.org/doc/' || doc_id AS uri
        | FROM documents),
        |r AS (
        | SELECT shard, doc_id, uri, n, pm,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id)
        |   AS INTEGER) AS idx,
        |  183 + 2 * strlen(CAST(doc_id AS VARCHAR))
        |   + strlen(CAST(n AS VARCHAR)) + n + 4 AS rlen
        | FROM m),
        |o AS (
        | SELECT shard, uri, n, pm, idx, rlen,
        |  183 + CAST(coalesce(sum(rlen) OVER (PARTITION BY shard
        |    ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS off
        | FROM r),
        |s AS (
        | SELECT shard, CAST(count(*) + 1 AS INTEGER) AS n_records,
        |  CAST(183 + sum(rlen) AS BIGINT) AS warc_len
        | FROM r GROUP BY shard)
        |SELECT o.shard, s.n_records, s.warc_len, o.idx,
        | 'response' AS rec_type, o.uri, o.off,
        | o.n AS content_length, o.pm AS payload_md5
        |FROM o JOIN s USING (shard)
        |UNION ALL
        |SELECT s.shard, s.n_records, s.warc_len, 0, 'warcinfo', NULL,
        | CAST(0 AS BIGINT), CAST(16 AS BIGINT),
        | md5('software: graft' || chr(10))
        |FROM s
        |ORDER BY shard, idx""".stripMargin,
    // q459: q458's closed-form response branch — what the DSv2 reader
    // must measure after skipping the warcinfo framing record.
    "q459_dsv2_warc" ->
      """WITH m AS (
        | SELECT doc_id // 50 AS shard, doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n, md5(text) AS pm,
        |  'https://example.org/doc/' || doc_id AS uri
        | FROM documents),
        |r AS (
        | SELECT shard, doc_id, uri, n, pm,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id)
        |   AS INTEGER) AS idx,
        |  183 + 2 * strlen(CAST(doc_id AS VARCHAR))
        |   + strlen(CAST(n AS VARCHAR)) + n + 4 AS rlen
        | FROM m)
        |SELECT shard, idx, 'response' AS rec_type, uri,
        | 183 + CAST(coalesce(sum(rlen) OVER (PARTITION BY shard
        |   ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) AS BIGINT) AS off,
        | n AS content_length, pm AS payload_md5
        |FROM r ORDER BY shard, idx""".stripMargin,
    // q460: the unrolled 3-round EM (see gmmCtes)
    "q460_gmm_em" ->
      (s"""WITH ${gmmCtes(3)}
         |SELECT 1 AS k, p.pi1 AS pi, p.mu1 AS mu, p.sg1 AS sigma,
         | round(CAST(g.n1 AS DOUBLE), 2) AS n_eff
         |FROM pars3 p, g3 g
         |UNION ALL
         |SELECT 2, round(1.0 - p.pi1, 6), p.mu2, p.sg2,
         | round(n - CAST(g.n1 AS DOUBLE), 2)
         |FROM pars3 p, g3 g, mom
         |ORDER BY k""".stripMargin),
    // q461: the q28 exact-rank construction over ALL queries, then a
    // (count DESC, label ASC) majority vote and the per-class report.
    "q461_knn_eval" ->
      """WITH tk AS MATERIALIZED (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
        |              c.vec_id) AS rnk
        |  FROM embeddings q, embeddings c
        |  WHERE c.vec_id <> q.vec_id) t
        | WHERE rnk <= 5),
        |v AS (
        | SELECT query_id, nl AS pred FROM (
        |  SELECT tk.query_id, e.label AS nl, count(*) AS c,
        |   row_number() OVER (PARTITION BY tk.query_id
        |     ORDER BY count(*) DESC, e.label) AS rn
        |  FROM tk JOIN embeddings e ON e.vec_id = tk.neighbor_id
        |  GROUP BY tk.query_id, e.label) x
        | WHERE rn = 1),
        |ev AS (
        | SELECT e.label, CASE WHEN v.pred = e.label THEN 1 ELSE 0 END AS ok
        | FROM v JOIN embeddings e ON e.vec_id = v.query_id)
        |SELECT CAST(label AS INTEGER) AS label, FALSE AS is_overall,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(ok) AS BIGINT) AS n_correct,
        | round(CAST(sum(ok) AS DOUBLE) / count(*), 4) AS acc
        |FROM ev GROUP BY label
        |UNION ALL
        |SELECT CAST(NULL AS INTEGER), TRUE, CAST(count(*) AS BIGINT),
        | CAST(sum(ok) AS BIGINT),
        | round(CAST(sum(ok) AS DOUBLE) / count(*), 4)
        |FROM ev
        |ORDER BY is_overall, label""".stripMargin,
    // q462: both folds' unrolled GD + full-corpus scoring (lrCvCtes),
    // then the per-fold train/held-out accuracy report
    "q462_lr_cv" -> {
      def row(p: String, trainCond: String): String =
        s"""SELECT '$p' AS fold, n_train, n_test, acc_train, acc_test,
           | round(acc_train - acc_test, 4) AS gap
           |FROM (
           | SELECT
           |  CAST(sum(CASE WHEN $trainCond THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_train,
           |  CAST(sum(CASE WHEN NOT ($trainCond) THEN 1 ELSE 0 END)
           |   AS BIGINT) AS n_test,
           |  round(CAST(sum(CASE WHEN ($trainCond) AND pred = y
           |      THEN 1 ELSE 0 END) AS DOUBLE)
           |    / sum(CASE WHEN $trainCond THEN 1 ELSE 0 END), 4)
           |   AS acc_train,
           |  round(CAST(sum(CASE WHEN NOT ($trainCond) AND pred = y
           |      THEN 1 ELSE 0 END) AS DOUBLE)
           |    / sum(CASE WHEN NOT ($trainCond) THEN 1 ELSE 0 END), 4)
           |   AS acc_test
           | FROM ${p}scr) x""".stripMargin
      s"""WITH $lrCvCtes
         |${row("a", "ina")}
         |UNION ALL
         |${row("b", "NOT ina")}
         |ORDER BY fold""".stripMargin
    },
    // q463: the q460 chain + a density-scored tail (the E-step kernel
    // with the ROUND-3 parameters, 6-dp-pinned, ties by event_id)
    "q463_gmm_anomaly" ->
      (s"""WITH ${gmmCtes(3)},
         |ev2 AS (
         | SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
         | FROM events WHERE value IS NOT NULL),
         |scd AS (
         | SELECT event_id, CAST(c AS DOUBLE) / 100 AS x,
         |  round(p.pi1 * exp(-0.5 * ((CAST(c AS DOUBLE) / 100 - p.mu1) / p.sg1)
         |     * ((CAST(c AS DOUBLE) / 100 - p.mu1) / p.sg1)) / p.sg1
         |   + (1.0 - p.pi1) * exp(-0.5 * ((CAST(c AS DOUBLE) / 100 - p.mu2)
         |      / p.sg2) * ((CAST(c AS DOUBLE) / 100 - p.mu2) / p.sg2)) / p.sg2,
         |   6) AS density
         | FROM ev2, pars3 p)
         |SELECT event_id, x, density FROM scd
         |ORDER BY density, event_id LIMIT 20""".stripMargin),
    // q464: the q118 global chain + the same chain with `source` added
    // to every model key, then the per-doc own-vs-global delta
    "q464_domain_lm_fit" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, source, CASE WHEN len(trim(lower(text))) = 0
        |   THEN CAST([] AS VARCHAR[])
        |   ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS a
        | FROM documents),
        |toks AS (SELECT unnest(a) AS w FROM t),
        |uni AS MATERIALIZED (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
        |bg AS MATERIALIZED (
        | SELECT doc_id, source, a[CAST(i AS INTEGER)] AS w1,
        |  a[CAST(i AS INTEGER) + 1] AS w2
        | FROM (SELECT doc_id, source, a,
        |        unnest(generate_series(1, len(a) - 1)) AS i
        |       FROM t WHERE len(a) >= 2) x),
        |cab AS MATERIALIZED (
        | SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |g AS MATERIALIZED (
        | SELECT bg.doc_id,
        |  round(avg(log10((cab.c_ab + 0.5) / (u.c + 0.5 * v.v))), 4)
        |   AS lp_global
        | FROM bg JOIN cab USING (w1, w2) JOIN uni u ON u.w = bg.w1, v
        | GROUP BY bg.doc_id),
        |tokss AS (SELECT source, unnest(a) AS w FROM t),
        |unis AS MATERIALIZED (
        | SELECT source, w, count(*) AS c FROM tokss GROUP BY 1, 2),
        |vs AS MATERIALIZED (
        | SELECT source, CAST(count(DISTINCT w) AS DOUBLE) AS v
        | FROM tokss GROUP BY 1),
        |cabs AS MATERIALIZED (
        | SELECT source, w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2, 3),
        |o AS MATERIALIZED (
        | SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(log10((cs.c_ab + 0.5) / (us.c + 0.5 * vs.v))), 4)
        |   AS lp_own
        | FROM bg JOIN cabs cs USING (source, w1, w2)
        |  JOIN unis us ON us.source = bg.source AND us.w = bg.w1
        |  JOIN vs ON vs.source = bg.source
        | GROUP BY bg.doc_id)
        |SELECT d.doc_id, d.source, o.n_bigrams, o.lp_own, g.lp_global,
        | round(o.lp_own - g.lp_global, 4) AS delta
        |FROM documents d LEFT JOIN o USING (doc_id) LEFT JOIN g USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // q465: the q61 n-gram leg and the q82 semantic leg (their CTEs
    // verbatim) full-outer-joined into the per-document verdict with
    // method attribution; only contaminated docs appear
    "q465_decon_verdict" ->
      s"""WITH toks AS (
         | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         | FROM documents),
         |sh AS (
         | SELECT doc_id, CASE WHEN len(t) >= 3
         |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         |  ELSE [array_to_string(t, ' ')] END AS s
         | FROM toks),
         |bench AS (SELECT DISTINCT unnest(s) AS sh1 FROM sh WHERE doc_id < 20),
         |corp AS (SELECT doc_id, unnest(s) AS sh1 FROM sh WHERE doc_id >= 20),
         |ng AS (
         | SELECT c.doc_id, count(*) AS n_overlap
         | FROM corp c JOIN bench b USING (sh1) GROUP BY c.doc_id),
         |${plantedCorpusCtes(64)},
         |c AS (SELECT * FROM e WHERE vec_id >= 20),
         |b AS (SELECT * FROM e WHERE vec_id < 20),
         |s AS (
         | SELECT c.vec_id, b.vec_id AS bench_id,
         |  list_sum(list_transform(range(1, 65), i -> c.v[i] * b.v[i])) AS sim
         | FROM c, b),
         |r AS (
         | SELECT vec_id, bench_id, sim,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
         | FROM s),
         |sem AS (
         | SELECT vec_id AS doc_id, bench_id, round(sim, 4) AS best_cos
         | FROM r WHERE rn = 1 AND round(sim, 4) >= 0.8)
         |SELECT coalesce(ng.doc_id, sem.doc_id) AS doc_id,
         | coalesce(ng.n_overlap, 0) AS n_overlap,
         | sem.bench_id, sem.best_cos,
         | ng.doc_id IS NOT NULL AS ngram_hit,
         | sem.doc_id IS NOT NULL AS semantic_hit,
         | CASE WHEN ng.doc_id IS NOT NULL AND sem.doc_id IS NOT NULL
         |   THEN 'ngram+semantic'
         |  WHEN ng.doc_id IS NOT NULL THEN 'ngram'
         |  ELSE 'semantic' END AS method
         |FROM ng FULL OUTER JOIN sem ON ng.doc_id = sem.doc_id
         |ORDER BY doc_id""".stripMargin,
    // q466: the same 1e4 quantization + per-(label, dim) exact integer
    // sums, restated via positional unnest; mean is the identical
    // two-division double formula
    "q466_label_centroids" ->
      """WITH q AS (
        | SELECT label, list_transform(embedding, x ->
        |   CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qa
        | FROM embeddings),
        |u AS (
        | SELECT label, CAST(i AS INTEGER) - 1 AS dim,
        |  qa[CAST(i AS INTEGER)] AS qv
        | FROM (SELECT label, qa, unnest(generate_series(1, len(qa))) AS i
        |       FROM q) x)
        |SELECT CAST(label AS INTEGER) AS label, dim,
        | CAST(count(*) AS BIGINT) AS n_vecs,
        | CAST(sum(qv) AS BIGINT) AS qsum,
        | round(CAST(sum(qv) AS DOUBLE) / count(*) / 10000.0, 6) AS mean
        |FROM u GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // q467: the q206 mutual join verbatim, but over the INDEX-BACKED
    // self-IVF candidate leg (ivfSelfCtes — q53's Lloyd build with
    // corpus-as-queries probes). Gate-scale parameters (nlist=16,
    // full-corpus fit) are what Similarity.nlistForCount/fitSampleMax
    // resolve to for any corpus up to 2000 vectors, so the pinned
    // literals stay valid under testdata regeneration up to that size.
    "q467_mutual_knn_ivf" ->
      s"""WITH ${ivfSelfCtes(nlist = 16, nprobe = 4, iters = 3, dim = 64,
             k = 5, seed = 42)}
         |SELECT f.query_id AS id_a, f.neighbor_id AS id_b,
         | f.rnk AS rnk_ab, b.rnk AS rnk_ba
         |FROM ivt f JOIN ivt b
         |  ON f.query_id = b.neighbor_id AND f.neighbor_id = b.query_id
         |WHERE f.query_id < f.neighbor_id
         |ORDER BY id_a, id_b""".stripMargin,
    // q468: the q461 vote/report verbatim over the same self-IVF leg,
    // plus recall@5 vs the exact top-5 on the fixed 64-query md5 panel
    // (overall row only — the per-class rows carry NULL)
    "q468_knn_eval_ivf" ->
      s"""WITH ${ivfSelfCtes(nlist = 16, nprobe = 4, iters = 3, dim = 64,
             k = 5, seed = 42)},
         |v AS (
         | SELECT query_id, nl AS pred FROM (
         |  SELECT tk.query_id, emb.label AS nl, count(*) AS c,
         |   row_number() OVER (PARTITION BY tk.query_id
         |     ORDER BY count(*) DESC, emb.label) AS rn
         |  FROM ivt tk JOIN embeddings emb ON emb.vec_id = tk.neighbor_id
         |  GROUP BY tk.query_id, emb.label) x
         | WHERE rn = 1),
         |ev AS (
         | SELECT emb.label, CASE WHEN v.pred = emb.label THEN 1 ELSE 0 END AS ok
         | FROM v JOIN embeddings emb ON emb.vec_id = v.query_id),
         |panel AS (
         | SELECT vec_id FROM e
         | ORDER BY CAST(('0x' || substr(md5('panel461:' || vec_id), 1, 8))
         |   AS BIGINT), vec_id LIMIT 64),
         |px AS (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |    list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) DESC,
         |    c.vec_id) AS rnk
         |  FROM e q JOIN panel USING (vec_id), e c
         |  WHERE c.vec_id <> q.vec_id) t WHERE rnk <= 5),
         |rec AS (
         | SELECT round(
         |  CAST((SELECT count(*) FROM px JOIN ivt USING (query_id, neighbor_id))
         |    AS DOUBLE) / (SELECT count(*) FROM px), 4) AS r)
         |SELECT CAST(label AS INTEGER) AS label, FALSE AS is_overall,
         | CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(ok) AS BIGINT) AS n_correct,
         | round(CAST(sum(ok) AS DOUBLE) / count(*), 4) AS acc,
         | CAST(NULL AS DOUBLE) AS ivf_recall_at5
         |FROM ev GROUP BY label
         |UNION ALL
         |SELECT CAST(NULL AS INTEGER), TRUE, CAST(count(*) AS BIGINT),
         | CAST(sum(ok) AS BIGINT),
         | round(CAST(sum(ok) AS DOUBLE) / count(*), 4),
         | (SELECT r FROM rec)
         |FROM ev
         |ORDER BY is_overall, label""".stripMargin,
    // q469: at ORACLE-COMPARE scale (sf0.01, 540 planted vectors) the
    // corpus-keyed variant resolves to exactly q75's parameters
    // (nlist floor = 16, fit = full planted corpus), so the oracle IS
    // q75's construction. Validity bound — stated by the BASE corpus,
    // not the planted total (r15 advisor): the planted corpus is base
    // embeddings + ~2% copies, so the pinned nlist=16 holds for any
    // regenerated BASE corpus ≤ 1960 embeddings (≤ 2000 planted;
    // fitSampleMax similarly ≥ planted count). At sf0.1 the planted
    // corpus is 2040 and Similarity.nlistForCount returns 17 — the
    // INTENDED scaled behavior, gated by the sf0.1→sf1 slope row;
    // this oracle must not be compared there (the driver's value gate
    // runs at sf0.01). An in-query assert can't distinguish an
    // oracle-compare run from a bench run at sf0.1, so the bound
    // lives here, on the oracle itself.
    "q469_semantic_dedup_scaled" -> semDedupOracle(nlist = 16, iters = 3,
      dim = 64, seed = 42, threshold = 0.8),
  )

  private val q45OracleSql: String =
    """WITH m AS (
      | SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |  md5(text) AS h
      | FROM documents)
      |SELECT doc_id, nb AS n_bytes,
      | CAST(ceil(nb / 1024.0) AS INTEGER) AS n_frames,
      | CAST(CASE WHEN nb > 0
      |   THEN floor((ceil(nb / 1024.0) - 1) / 4) + 1 ELSE 0 END AS INTEGER)
      |  AS n_sampled,
      | CAST(CASE WHEN nb > 0
      |   THEN CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 1920 + 16 END AS INTEGER)
      |  AS width,
      | CAST(CASE WHEN nb > 0
      |   THEN CAST(('0x' || substr(h, 5, 4)) AS BIGINT) % 1080 + 16 END AS INTEGER)
      |  AS height
      |FROM m ORDER BY doc_id""".stripMargin

  /** DuckDB brute-force n-gram-Jaccard pair oracle (3-token shingles,
    * candidates = pairs sharing any shingle — complete for J > 0). */
  /** One q375 edge: distinct-key full outer between child counts and
    * parent keys, aggregated to the panel row. */
  private def fkEdgeOracle(name: String, child: String, ck: String,
      parent: String, pk: String): String =
    s"""SELECT '$name' AS edge,
       | CAST(sum(COALESCE(nc, 0)) AS BIGINT) AS n_child,
       | CAST(sum(CASE WHEN isp IS NULL THEN nc ELSE 0 END) AS BIGINT)
       |  AS n_orphan_rows,
       | CAST(sum(CASE WHEN isp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_parents,
       | CAST(sum(CASE WHEN isp IS NOT NULL AND nc IS NULL
       |  THEN 1 ELSE 0 END) AS BIGINT) AS n_unreferenced
       |FROM (SELECT $ck AS k, CAST(count(*) AS BIGINT) AS nc
       |      FROM $child GROUP BY 1) c
       |FULL OUTER JOIN (SELECT DISTINCT $pk AS k, 1 AS isp
       |                 FROM $parent) p USING (k)""".stripMargin

  /** q432/q436's shared oracle: component = min reachable id over the
    * md5-gated chain edges (the q49 recursive-CTE convention);
    * isolated docs are their own component. */
  private val ccStarOracle: String =
    """WITH RECURSIVE e0 AS (
      | SELECT d.doc_id AS a, d.doc_id + 1 AS b
      | FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 1
      | WHERE CAST(('0x' || substr(md5('ccstar:' || d.doc_id), 1, 8))
      |   AS BIGINT) % 4 <> 0),
      |edges AS (
      | SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      |reach(src, dst) AS (
      | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
      | UNION
      | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |lab AS (SELECT src AS doc_id, min(dst) AS comp
      | FROM reach GROUP BY src)
      |SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS comp_id
      |FROM documents d LEFT JOIN lab l USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  private def jaccardPairOracle(threshold: Double): String =
    s"""WITH toks AS (
       | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       | FROM documents),
       |sh AS (
       | SELECT doc_id, CASE WHEN len(t) >= 3
       |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |  ELSE [array_to_string(t, ' ')] END AS s
       | FROM toks),
       |ex AS (SELECT doc_id, unnest(s) AS sh1 FROM sh),
       |cand AS (
       | SELECT a.doc_id AS ia, b.doc_id AS ib FROM ex a
       | JOIN ex b ON a.sh1 = b.sh1 AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b, jaccard FROM (
       | SELECT ia AS id_a, ib AS id_b,
       |  round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
       |   / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE),
       |   4) AS jaccard
       | FROM cand JOIN sh x ON x.doc_id = ia JOIN sh y ON y.doc_id = ib) t
       |WHERE jaccard >= $threshold ORDER BY id_a, id_b""".stripMargin

  /** q73's oracle: GraphOps.pageRank over the bidirectional
    * part<->supplier graph, one contribution/update CTE pair per
    * iteration. */
  /** The winnowing fingerprint CTE block (selected-window `fp` table),
    * shared by the q85 pair report and q102's component keepers —
    * emitted WITHOUT the leading WITH so callers can prepend RECURSIVE. */
  private val winnowPairCtes: String =
    """d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 50),
      |w AS (
      | SELECT doc_id, i, substr(text, i, 50) AS win,
      |  CAST(('0x' || substr(md5(substr(text, i, 50)), 1, 10)) AS BIGINT)
      |    * 8388608 + i AS enc
      | FROM (SELECT doc_id, text, unnest(generate_series(1, len(text) - 49)) AS i
      |       FROM d) t),
      |m AS (
      | SELECT doc_id, min(enc) OVER (PARTITION BY doc_id ORDER BY i
      |   ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS sel
      | FROM w),
      |selpos AS (SELECT DISTINCT doc_id, sel FROM m),
      |fp AS (
      | SELECT DISTINCT w.doc_id, w.win
      | FROM selpos s JOIN w ON w.doc_id = s.doc_id AND w.enc = s.sel)""".stripMargin

  /** The unrolled PageRank iteration CTE chain over caller-provided
    * `e(src, dst)` / `nodes(node)` / `n(n)` / `od(src, od)` /
    * `p0(node, pr)` blocks — one contribution/update pair per round,
    * 6-dp re-pinned (GraphOps.pageRank's exact arithmetic). Shared by
    * the q73 part–supplier graph and the q404 TextRank word graph.
    * NB: comma BETWEEN blocks, never trailing — the final SELECT
    * follows the last block directly (r4's q73 bug: a trailing comma
    * here is a DuckDB parse error). */
  /** The q115 funnel's flag frame as a CTE chain (leads with WITH
    * RECURSIVE, ends at `flags(doc_id, domain, n_tokens, p1..p5, b)`) —
    * shared by q115 (stage totals) and q443 (per-domain shipped
    * mixture) exactly like the engine's shared funnelFlags helper, so
    * the two oracles can never drift. Callers append their own CTEs
    * after a comma. */
  private def funnelFlagCtes: String =
    s"""WITH RECURSIVE pairs AS (
       |${jaccardPairOracle(0.7).replace("ORDER BY id_a, id_b", "")}),
       |edges AS (
       | SELECT id_a AS a, id_b AS b FROM pairs
       | UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
       |reach(src, dst) AS (
       | SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
       | UNION
       | SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |losers AS (
       | SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) <> src),
       |keepers AS (
       | SELECT min(doc_id) AS doc_id FROM documents
       | GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
       |toks AS (
       | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       | FROM documents),
       |sh AS (
       | SELECT doc_id, CASE WHEN len(t) >= 3
       |  THEN list_distinct(list_transform(generate_series(1, len(t)-2),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |  ELSE [array_to_string(t, ' ')] END AS s
       | FROM toks),
       |bench AS (SELECT DISTINCT unnest(s) AS sh1 FROM sh WHERE doc_id < 20),
       |corp AS (SELECT doc_id, unnest(s) AS sh1 FROM sh WHERE doc_id >= 20),
       |contam AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b USING (sh1)),
       |lt AS (
       | SELECT doc_id,
       |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
       |    ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ltoks
       | FROM documents),
       |ls AS (SELECT doc_id,
       | len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
       | len(list_filter(ltoks, x -> x IN ('the','and','of','to','is'))) AS s_en,
       | len(list_filter(ltoks, x -> x IN ('el','la','de','que','y'))) AS s_es,
       | len(list_filter(ltoks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
       | len(list_filter(ltoks, x -> x IN ('o','a','de','que','e'))) AS s_pt
       | FROM lt),
       |langp AS (SELECT doc_id, CASE
       | WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
       | WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
       | WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
       | WHEN s_fr >= s_pt THEN 'fr'
       | ELSE 'pt' END AS lang_pred FROM ls),
       |scored AS (
       | SELECT doc_id,
       |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
       |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
       |   AS n_tokens,
       |  round((CAST(len(list_distinct(CASE WHEN len(trim(text)) = 0
       |      THEN CAST([] AS VARCHAR[])
       |      ELSE regexp_split_to_array(trim(text), '\\s+') END)) AS DOUBLE)
       |    / CAST(greatest(CASE WHEN len(trim(text)) = 0 THEN 0
       |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1) AS DOUBLE)) * 0.7
       |   + (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.5 END) * 0.3,
       |   4) AS quality
       | FROM documents),
       |flags AS (
       | SELECT d.doc_id, d.source AS domain, s2.n_tokens,
       |  (l.lang_pred = 'en') AS p1,
       |  (s2.quality >= 0.5) AS p2,
       |  (k.doc_id IS NOT NULL) AS p3,
       |  (lo.doc_id IS NULL) AS p4,
       |  (ct.doc_id IS NULL) AS p5,
       |  CAST(('0x' || substr(md5('split:' || d.doc_id), 1, 8)) AS BIGINT) % 100 AS b
       | FROM documents d
       | JOIN scored s2 USING (doc_id)
       | JOIN langp l USING (doc_id)
       | LEFT JOIN keepers k ON k.doc_id = d.doc_id
       | LEFT JOIN losers lo ON lo.doc_id = d.doc_id
       | LEFT JOIN contam ct ON ct.doc_id = d.doc_id
       | WHERE d.doc_id >= 20)""".stripMargin

  // Every unrolled-fixpoint CTE below is MATERIALIZED: each round's CTE is
  // referenced by the next round (often more than once), and DuckDB's
  // default inlining re-expands the whole chain per reference —
  // exponential planning/execution cost (q201 measured 178 s plain vs
  // 0.5 s materialized at sf0.01). The hint is semantically neutral; it
  // only pins the obvious evaluate-once plan. This is the q413 lesson
  // applied to the whole tail (the r12 verdict's top ask).
  /** q446/q447's trained logistic filter: `iters` unrolled full-batch
    * GD rounds over `buckets` hashed presence features, weights in
    * integer micro-units so every reduction is exact long arithmetic;
    * the sigmoid/update float chains mirror
    * `TrainedFilter.trainLogistic` op-for-op. Yields CTEs `feats`,
    * `lab`, `n`, and `w{iters}`/`b{iters}` as the final model. */
  private def lrTrainCtes(buckets: Int, iters: Int): String = {
    val base =
      s"""t AS MATERIALIZED (
         | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
         |   THEN CAST([] AS VARCHAR[])
         |   ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS a
         | FROM documents),
         |feats AS MATERIALIZED (
         | SELECT DISTINCT doc_id,
         |  CAST(CAST(('0x' || substr(md5('lrf:' || w), 1, 8)) AS BIGINT)
         |    % $buckets AS INTEGER) AS j
         | FROM (SELECT doc_id, unnest(a) AS w FROM t) x),
         |lab AS MATERIALIZED (
         | SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |   ELSE CAST(0 AS BIGINT) END AS y
         | FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w0 AS (SELECT CAST(j AS INTEGER) AS j, CAST(0 AS BIGINT) AS wu
         |       FROM range($buckets) r(j)),
         |b0 AS (SELECT CAST(0 AS BIGINT) AS bu)""".stripMargin
    (base +: Seq(lrRoundCtes(iters))).mkString(",\n")
  }

  /** The unrolled micro-unit GD rounds shared by every in-engine
    * logistic fit (q446/q447 over documents, q454's propensity over
    * orders): references only the generic `feats`/`lab`/`n`/`w$p`/
    * `b$p` CTE names the caller's base block defines. lr = 0.5. */
  private def lrRoundCtes(iters: Int, p: String = ""): String = {
    val rounds = (1 to iters).map { k =>
      val pv = k - 1
      s"""${p}e$k AS MATERIALIZED (
         | SELECT ${p}lab.doc_id,
         |  CAST(floor(1.0 / (1.0 + exp(-(CAST(b.bu + coalesce(s.su, 0)
         |      AS DOUBLE) / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT)
         |   - ${p}lab.y * 1000000 AS e
         | FROM ${p}lab
         | LEFT JOIN (SELECT f.doc_id, sum(w.wu) AS su
         |            FROM ${p}feats f JOIN ${p}w$pv w USING (j) GROUP BY 1) s
         |  USING (doc_id), ${p}b$pv b),
         |${p}w$k AS MATERIALIZED (
         | SELECT j, wu - CASE WHEN d < 0 THEN -CAST(floor(-d + 0.5) AS BIGINT)
         |                     ELSE CAST(floor(d + 0.5) AS BIGINT) END AS wu
         | FROM (SELECT w.j, w.wu,
         |        0.5 * CAST(coalesce(g.gu, 0) AS DOUBLE) / n_.n AS d
         |       FROM ${p}w$pv w LEFT JOIN (SELECT f.j, sum(e.e) AS gu
         |                             FROM ${p}feats f JOIN ${p}e$k e USING (doc_id)
         |                             GROUP BY 1) g USING (j), ${p}n n_) x),
         |${p}b$k AS MATERIALIZED (
         | SELECT bu - CASE WHEN d < 0 THEN -CAST(floor(-d + 0.5) AS BIGINT)
         |                  ELSE CAST(floor(d + 0.5) AS BIGINT) END AS bu
         | FROM (SELECT b.bu, 0.5 * CAST(g.gu AS DOUBLE) / n_.n AS d
         |       FROM ${p}b$pv b, (SELECT sum(e) AS gu FROM ${p}e$k) g, ${p}n n_) x)""".stripMargin
    }
    rounds.mkString(",\n")
  }

  /** q460's unrolled EM: init = pinned quartiles + exact-integer-
    * moment std, then per round the 6-dp E-step responsibilities
    * (MATERIALIZED — read by five DECIMAL moment sums) and the 6-dp
    * parameter update with the 1e-4 variance floor — op-for-op the
    * CoreQueries.gmmEm driver chain. */
  private def gmmCtes(iters: Int): String = {
    val sgInit =
      """round(sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
        |    * (CAST(s1 AS DOUBLE) / n)) / 100, 4)""".stripMargin
    val base =
      s"""ev AS MATERIALIZED (
         | SELECT CAST(round(value * 100) AS BIGINT) AS c
         | FROM events WHERE value IS NOT NULL),
         |xs AS MATERIALIZED (SELECT CAST(c AS DOUBLE) / 100 AS x FROM ev),
         |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(c) AS BIGINT) AS s1,
         |        CAST(sum(c * c) AS BIGINT) AS s2 FROM ev),
         |qs AS (SELECT round(quantile_cont(x, 0.25), 4) AS mu1,
         |       round(quantile_cont(x, 0.75), 4) AS mu2 FROM xs),
         |pars0 AS (
         | SELECT qs.mu1 AS mu1, $sgInit AS sg1, 0.5 AS pi1,
         |  qs.mu2 AS mu2, $sgInit AS sg2
         | FROM qs, mom)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""r$k AS MATERIALIZED (
         | SELECT x, CASE WHEN w1 + w2 > 0
         |   THEN round(w1 / (w1 + w2), 6) ELSE 0.5 END AS r1
         | FROM (SELECT x,
         |   p.pi1 * exp(-0.5 * ((x - p.mu1) / p.sg1)
         |     * ((x - p.mu1) / p.sg1)) / p.sg1 AS w1,
         |   (1.0 - p.pi1) * exp(-0.5 * ((x - p.mu2) / p.sg2)
         |     * ((x - p.mu2) / p.sg2)) / p.sg2 AS w2
         |  FROM xs, pars$p p) t),
         |g$k AS (SELECT
         |  sum(CAST(r1 AS DECIMAL(24,6))) AS n1,
         |  sum(CAST(round(r1 * x, 6) AS DECIMAL(28,6))) AS sx1,
         |  sum(CAST(round(r1 * x * x, 4) AS DECIMAL(28,4))) AS sxx1,
         |  sum(CAST(round((1.0 - r1) * x, 6) AS DECIMAL(28,6))) AS sx2,
         |  sum(CAST(round((1.0 - r1) * x * x, 4) AS DECIMAL(28,4))) AS sxx2
         | FROM r$k),
         |pars$k AS (SELECT
         |  round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mu1,
         |  round(sqrt(greatest(CAST(sxx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         |    - round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
         |      * round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6),
         |    0.0001)), 6) AS sg1,
         |  round(CAST(n1 AS DOUBLE) / n, 6) AS pi1,
         |  round(CAST(sx2 AS DOUBLE) / (n - CAST(n1 AS DOUBLE)), 6) AS mu2,
         |  round(sqrt(greatest(CAST(sxx2 AS DOUBLE) / (n - CAST(n1 AS DOUBLE))
         |    - round(CAST(sx2 AS DOUBLE) / (n - CAST(n1 AS DOUBLE)), 6)
         |      * round(CAST(sx2 AS DOUBLE) / (n - CAST(n1 AS DOUBLE)), 6),
         |    0.0001)), 6) AS sg2
         | FROM g$k, mom)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** q462's 2-fold CV: one shared feature/label base with the q59
    * md5-split flag, then the prefix-parameterized GD rounds
    * ([[lrRoundCtes]] "a"/"b") per fold and a fold-a/fold-b scoring +
    * report tail. */
  private def lrCvCtes: String = {
    val base =
      s"""t AS MATERIALIZED (
         | SELECT doc_id, CASE WHEN len(trim(lower(text))) = 0
         |   THEN CAST([] AS VARCHAR[])
         |   ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS a
         | FROM documents),
         |feats AS MATERIALIZED (
         | SELECT DISTINCT doc_id,
         |  CAST(CAST(('0x' || substr(md5('lrf:' || w), 1, 8)) AS BIGINT)
         |    % 32 AS INTEGER) AS j
         | FROM (SELECT doc_id, unnest(a) AS w FROM t) x),
         |lab AS MATERIALIZED (
         | SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |   ELSE CAST(0 AS BIGINT) END AS y,
         |  CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
         |    % 100 < 50 AS ina
         | FROM documents)""".stripMargin
    def fold(p: String, cond: String): String =
      s"""${p}lab AS MATERIALIZED (
         | SELECT doc_id, y FROM lab WHERE $cond),
         |${p}feats AS MATERIALIZED (
         | SELECT f.doc_id, f.j FROM feats f JOIN ${p}lab USING (doc_id)),
         |${p}n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ${p}lab),
         |${p}w0 AS (SELECT CAST(j AS INTEGER) AS j, CAST(0 AS BIGINT) AS wu
         |       FROM range(32) r(j)),
         |${p}b0 AS (SELECT CAST(0 AS BIGINT) AS bu),
         |${lrRoundCtes(3, p)},
         |${p}scr AS MATERIALIZED (
         | SELECT lab.doc_id, lab.y, lab.ina,
         |  CASE WHEN 1.0 / (1.0 + exp(-(CAST(b.bu + coalesce(s.su, 0)
         |    AS DOUBLE) / 1000000.0))) >= 0.5 THEN 1 ELSE 0 END AS pred
         | FROM lab
         | LEFT JOIN (SELECT f.doc_id, sum(w.wu) AS su
         |            FROM feats f JOIN ${p}w3 w USING (j) GROUP BY 1) s
         |  USING (doc_id), ${p}b3 b)""".stripMargin
    Seq(base, fold("a", "ina"), fold("b", "NOT ina")).mkString(",\n")
  }

  /** q454's base + trained-propensity blocks: orders⋈customer units,
    * 8 account-balance-bin presence features, then the SAME unrolled
    * GD rounds as q446 ([[lrRoundCtes]]). */
  private def ipwTrainCtes(iters: Int): String = {
    val base =
      s"""ob AS MATERIALIZED (
         | SELECT o.o_orderkey AS doc_id,
         |  CASE WHEN c.c_mktsegment = 'BUILDING' THEN CAST(1 AS BIGINT)
         |   ELSE CAST(0 AS BIGINT) END AS y,
         |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS yc,
         |  least(7, greatest(0, CAST(floor(
         |    CAST(CAST(round(c.c_acctbal * 100) AS BIGINT) + 100000 AS DOUBLE)
         |    / 137500.0) AS INTEGER))) AS j
         | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |feats AS MATERIALIZED (SELECT DISTINCT doc_id, j FROM ob),
         |lab AS MATERIALIZED (SELECT doc_id, y FROM ob),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ob),
         |w0 AS (SELECT CAST(j AS INTEGER) AS j, CAST(0 AS BIGINT) AS wu
         |       FROM range(8) r(j)),
         |b0 AS (SELECT CAST(0 AS BIGINT) AS bu)""".stripMargin
    base + ",\n" + lrRoundCtes(iters)
  }

  /** q452/q453's unrolled AdaBoost: k/16 4-dp-pinned quantile
    * thresholds × both polarities, then per round the 6-dp weighted
    * error per hypothesis (DECIMAL sums of 6-dp weights), the
    * (err, feat, thr, pol)-argmin stump, 6-dp α, and the 6-dp
    * multiplicative weight update — op-for-op the [[graft.operators
    * .Boosting]] chain. */
  private def adaTrainCtes(iters: Int): String = {
    val ps = (1 to 15).map(k => (k / 16.0).toString).mkString(", ")
    val base =
      s"""fw AS MATERIALIZED (
         | SELECT doc_id,
         |  CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE)
         |   AS f1,
         |  CAST(n_chars AS DOUBLE) AS f2,
         |  CAST(len(list_distinct(CASE WHEN len(trim(lower(text))) = 0
         |    THEN CAST([] AS VARCHAR[])
         |    ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END))
         |   AS DOUBLE) AS f3
         | FROM documents),
         |fv AS MATERIALIZED (
         | SELECT doc_id, y, 1 AS feat, f1 AS fv FROM fw
         | UNION ALL SELECT doc_id, y, 2, f2 FROM fw
         | UNION ALL SELECT doc_id, y, 3, f3 FROM fw),
         |thr AS MATERIALIZED (
         | SELECT DISTINCT feat, round(q, 4) AS thr
         | FROM (SELECT feat, unnest(qs) AS q
         |       FROM (SELECT feat, quantile_cont(fv, [$ps]) AS qs
         |             FROM fv GROUP BY feat) a) b),
         |hyp AS MATERIALIZED (
         | SELECT feat, thr, pol
         | FROM thr, (SELECT 1 AS pol UNION ALL SELECT -1) p),
         |w0 AS (SELECT doc_id, 1.0 AS w FROM fw)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""err$k AS MATERIALIZED (
         | SELECT h.feat, h.thr, h.pol,
         |  round(CAST(sum(CASE WHEN (CASE WHEN f.fv <= h.thr THEN h.pol
         |      ELSE -h.pol END) <> f.y THEN CAST(w.w AS DECIMAL(24,6))
         |      ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
         |   / CAST(sum(CAST(w.w AS DECIMAL(24,6))) AS DOUBLE), 6) AS err
         | FROM fv f JOIN w$p w USING (doc_id) JOIN hyp h USING (feat)
         | GROUP BY 1, 2, 3),
         |a$k AS MATERIALIZED (
         | SELECT feat, thr, pol, err,
         |  round(0.5 * ln((1.0 - greatest(least(err, 0.999999), 0.000001)) /
         |    greatest(least(err, 0.999999), 0.000001)), 6) AS a
         | FROM (SELECT feat, thr, pol, err,
         |        row_number() OVER (ORDER BY err, feat, thr, pol) AS rn
         |       FROM err$k) r WHERE rn = 1),
         |w$k AS MATERIALIZED (
         | SELECT w.doc_id,
         |  round(w.w * exp(CASE WHEN (CASE WHEN f.fv <= a.thr THEN a.pol
         |    ELSE -a.pol END) <> f.y THEN a.a ELSE -a.a END), 6) AS w
         | FROM a$k a, w$p w, fv f
         | WHERE f.doc_id = w.doc_id AND f.feat = a.feat)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private def prIterCtes(iters: Int): String =
    (1 to iters).map { k =>
      val j = k - 1
      s"""c$k AS MATERIALIZED (
         | SELECT e.dst AS node, sum(p.pr / o.od) AS m
         | FROM e JOIN p$j p ON p.node = e.src JOIN od o ON o.src = e.src
         | GROUP BY e.dst),
         |p$k AS MATERIALIZED (
         | SELECT nodes.node,
         |  round((1.0 - 0.85) / n.n + 0.85 * coalesce(c.m, 0.0), 6) AS pr
         | FROM nodes LEFT JOIN c$k c USING (node), n)""".stripMargin
    }.mkString(",\n")

  /** q405's oracle: the 2-state min-sum Viterbi forward recursion
    * unrolled to `steps` CTE blocks over the rn-indexed daily frame —
    * the prIterCtes convention applied to a DP (one block per decoded
    * day, costs ×14-scaled BIGINTs). */
  private def viterbiOracle(steps: Int): String = {
    val blocks = (2 to steps).map { t =>
      val p = t - 1
      s"""v$t AS (
         | SELECT r.day, r.x,
         |  abs(14*r.x - a.burn) + least(p.vb, p.ve + a.burn) AS vb,
         |  abs(14*r.x - 2*a.burn) + least(p.ve, p.vb + a.burn) AS ve
         | FROM r, a, v$p p WHERE r.rn = ${14 + t})""".stripMargin
    }.mkString(",\n")
    val union = (1 to steps)
      .map(t => s"SELECT day, x, vb, ve FROM v$t")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
       | FROM events WHERE event_type = 'click' GROUP BY 1),
       |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
       |a AS (SELECT CAST(sum(x) AS BIGINT) AS burn FROM r WHERE rn <= 14),
       |v1 AS (
       | SELECT r.day, r.x, abs(14*r.x - a.burn) AS vb,
       |  abs(14*r.x - 2*a.burn) AS ve
       | FROM r, a WHERE r.rn = 15),
       |$blocks,
       |u AS ($union)
       |SELECT day, x, CAST(vb AS BIGINT) AS v_base,
       | CAST(ve AS BIGINT) AS v_elev,
       | CASE WHEN vb <= ve THEN 'base' ELSE 'elevated' END AS state
       |FROM u ORDER BY day""".stripMargin
  }

  /** q408's oracle: Holt linear smoothing (α = β = ½) unrolled to
    * `steps` CTE blocks carrying exact integer numerators over 4^t
    * (the q405 unrolled-DP convention; `//` keeps the exactly-even
    * halving integer). */
  private def holtOracle(steps: Int): String = {
    val blocks = (1 to steps).map { t =>
      val p = t - 1
      val c = 2L * (1L << (2 * (t - 1))) // 2·4^(t−1)
      val pow = math.pow(4.0, t)
      s"""h$t AS (
         | SELECT r.day, r.x,
         |  CAST($c AS BIGINT)*r.x + 2*p.l + 2*p.b AS l,
         |  (CAST($c AS BIGINT)*r.x + 2*p.l + 2*p.b - 4*p.l) // 2
         |    + 2*p.b AS b
         | FROM r, h$p p WHERE r.rn = ${t + 2})""".stripMargin
    }.mkString(",\n")
    val union = (1 to steps).map { t =>
      val pow = math.pow(4.0, t)
      s"""SELECT day, x, round(CAST(l AS DOUBLE)/$pow, 4) AS level,
         | round(CAST(b AS DOUBLE)/$pow, 4) AS trend,
         | round(CAST(l + b AS DOUBLE)/$pow, 4) AS forecast_next
         |FROM h$t""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH d AS (
       | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
       | FROM events WHERE event_type = 'click' GROUP BY 1),
       |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
       |h0 AS (
       | SELECT a.x AS l, b.x - a.x AS b
       | FROM (SELECT x FROM r WHERE rn = 1) a,
       |      (SELECT x FROM r WHERE rn = 2) b),
       |$blocks
       |$union ORDER BY day""".stripMargin
  }

  private def pageRankOracle(iters: Int): String = {
    val iterCtes = prIterCtes(iters)
    s"""WITH pairs AS MATERIALIZED (
       | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
       | FROM lineitem),
       |e AS MATERIALIZED (SELECT p AS src, sp AS dst FROM pairs
       |      UNION SELECT sp, p FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       | (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
       |n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |od AS MATERIALIZED (SELECT src, count(*) AS od FROM e GROUP BY src),
       |p0 AS MATERIALIZED (SELECT node, round(1.0 / n.n, 6) AS pr FROM nodes, n),
       |$iterCtes
       |SELECT node, pr FROM p$iters ORDER BY node""".stripMargin
  }

  /** q418's oracle: the personalized-PageRank rounds unrolled — the
    * prIterCtes shape with the uniform teleport replaced by the
    * seed-restart distribution (0.15/|seeds| on seeds, 0 elsewhere;
    * the SAME decimal literal the engine uses — see
    * GraphOps.personalizedPageRank's restart note). */
  private def pprOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      val j = k - 1
      s"""c$k AS MATERIALIZED (
         | SELECT e.dst AS node, sum(p.pr / o.od) AS m
         | FROM e JOIN p$j p ON p.node = e.src JOIN od o ON o.src = e.src
         | GROUP BY e.dst),
         |p$k AS MATERIALIZED (
         | SELECT nodes.node,
         |  round(CASE WHEN sd.node IS NOT NULL THEN 0.15 / s.ns
         |    ELSE 0.0 END + 0.85 * coalesce(c.m, 0.0), 6) AS pr
         | FROM nodes LEFT JOIN c$k c USING (node)
         |  LEFT JOIN seeds sd USING (node), s)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
       | FROM lineitem),
       |e AS MATERIALIZED (SELECT p AS src, sp AS dst FROM pairs
       |      UNION SELECT sp, p FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       | (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
       |seeds AS MATERIALIZED (SELECT DISTINCT p AS node FROM pairs WHERE p % 100 = 0),
       |s AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM seeds),
       |od AS MATERIALIZED (SELECT src, count(*) AS od FROM e GROUP BY src),
       |p0 AS MATERIALIZED (
       | SELECT nodes.node,
       |  round(CASE WHEN sd.node IS NOT NULL THEN 1.0 / s.ns
       |    ELSE 0.0 END, 6) AS pr
       | FROM nodes LEFT JOIN seeds sd USING (node), s),
       |$iterCtes
       |SELECT node, pr FROM p$iters ORDER BY node""".stripMargin
  }

  /** q417's oracle: the k-truss peels unrolled — a (triangles,
    * support, surviving-edges) CTE triple per round over the canonical
    * q92 co-occurrence edges, plus a final support pass LEFT-joined so
    * zero-support survivors report 0 (the engine's coalesce). All
    * CTEs MATERIALIZED: each round references its predecessor several
    * times and DuckDB would otherwise inline the chain exponentially
    * (the q413 lesson). */
  private def ktrussOracle(k: Int, iters: Int): String = {
    def round(r: Int, src: String): String =
      s"""tri$r AS MATERIALIZED (
         | SELECT e1.a AS x, e1.b AS y, e2.b AS z
         | FROM $src e1 JOIN $src e2 ON e2.a = e1.b
         | JOIN $src e3 ON e3.a = e1.a AND e3.b = e2.b),
         |sup$r AS MATERIALIZED (
         | SELECT a, b, count(*) AS sup FROM (
         |  SELECT x AS a, y AS b FROM tri$r
         |  UNION ALL SELECT x, z FROM tri$r
         |  UNION ALL SELECT y, z FROM tri$r) t GROUP BY a, b),
         |e$r AS MATERIALIZED (
         | SELECT e.a, e.b FROM $src e JOIN sup$r s
         |  ON s.a = e.a AND s.b = e.b
         | WHERE s.sup >= ${k - 2})""".stripMargin
    val blocks = (1 to iters)
      .map(r => round(r, if (r == 1) "e0" else s"e${r - 1}"))
      .mkString(",\n")
    s"""WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |      WHERE l_orderkey % 10 = 0),
       |e0 AS MATERIALIZED (
       | SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
       | FROM pp x JOIN pp y
       |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |$blocks,
       |trif AS MATERIALIZED (
       | SELECT e1.a AS x, e1.b AS y, e2.b AS z
       | FROM e$iters e1 JOIN e$iters e2 ON e2.a = e1.b
       | JOIN e$iters e3 ON e3.a = e1.a AND e3.b = e2.b),
       |supf AS MATERIALIZED (
       | SELECT a, b, count(*) AS sup FROM (
       |  SELECT x AS a, y AS b FROM trif
       |  UNION ALL SELECT x, z FROM trif
       |  UNION ALL SELECT y, z FROM trif) t GROUP BY a, b)
       |SELECT e.a, e.b, CAST(coalesce(s.sup, 0) AS BIGINT) AS support
       |FROM e$iters e LEFT JOIN supf s ON s.a = e.a AND s.b = e.b
       |ORDER BY e.a, e.b""".stripMargin
  }

  /** q413's oracle: the 25 deterministic Huffman merges unrolled — a
    * (pick, nodes, membership) CTE triple per merge over the exact
    * per-letter frequency frame. pick ranks live nodes by (freq, id);
    * the two smallest fuse into node id 25+k; membership tracks each
    * leaf's current cluster and increments its depth when its cluster
    * fuses — after the last merge, depth IS the Huffman code length.
    * Exactly the engine's tie-break (PipelineQueries.huffmanLengths),
    * so lengths match per symbol, not just as a multiset. */
  private def huffmanOracle(nSyms: Int): String = {
    val blocks = (1 to nSyms - 1).map { k =>
      val j = k - 1
      val newId = nSyms - 1 + k
      s"""p$k AS MATERIALIZED (
         | SELECT id, freq, row_number() OVER (ORDER BY freq, id) AS r
         | FROM n$j),
         |n$k AS MATERIALIZED (
         | SELECT id, freq FROM p$k WHERE r > 2
         | UNION ALL
         | SELECT CAST($newId AS BIGINT) AS id,
         |  (SELECT sum(freq) FROM p$k WHERE r <= 2) AS freq),
         |m$k AS MATERIALIZED (
         | SELECT sym_id,
         |  CASE WHEN cluster IN (SELECT id FROM p$k WHERE r <= 2)
         |   THEN CAST($newId AS BIGINT) ELSE cluster END AS cluster,
         |  depth + CASE WHEN cluster IN (SELECT id FROM p$k WHERE r <= 2)
         |   THEN 1 ELSE 0 END AS depth
         | FROM m$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS MATERIALIZED (
       | SELECT s.i AS id, chr(97 + CAST(s.i AS INTEGER)) AS sym,
       |  CAST(coalesce(sum(len(text) -
       |    len(replace(text, chr(97 + CAST(s.i AS INTEGER)), ''))), 0)
       |   AS BIGINT) AS freq
       | FROM documents, generate_series(0, ${nSyms - 1}) AS s(i)
       | GROUP BY s.i),
       |n0 AS (SELECT id, freq FROM f),
       |m0 AS (SELECT id AS sym_id, id AS cluster, 0 AS depth FROM f),
       |$blocks
       |SELECT f.sym AS symbol, f.freq,
       | CAST(m.depth AS INTEGER) AS code_len
       |FROM f JOIN m${nSyms - 1} m ON m.sym_id = f.id
       |ORDER BY symbol""".stripMargin
  }

  /** q410's oracle: the max-normalized HITS rounds unrolled — one
    * (auth-sum, auth-norm, hub-sum, hub-norm) CTE quadruple per round
    * over the directed part→supplier pairs, 6-dp-pinned after each max
    * normalization exactly like GraphOps.hits. */
  private def hitsOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      val j = k - 1
      s"""ar$k AS MATERIALIZED (
         | SELECT e.dst AS node, sum(h.h) AS m
         | FROM pairs e JOIN h$j h ON h.node = e.src GROUP BY e.dst),
         |an$k AS MATERIALIZED (
         | SELECT node, round(m / (SELECT max(m) FROM ar$k), 6) AS a
         | FROM ar$k),
         |hr$k AS MATERIALIZED (
         | SELECT e.src AS node, sum(a.a) AS m
         | FROM pairs e JOIN an$k a ON a.node = e.dst GROUP BY e.src),
         |h$k AS MATERIALIZED (
         | SELECT node, round(m / (SELECT max(m) FROM hr$k), 6) AS h
         | FROM hr$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       | SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       | FROM lineitem),
       |h0 AS MATERIALIZED (SELECT DISTINCT src AS node, 1.0 AS h FROM pairs),
       |$iterCtes
       |SELECT node, 'hub' AS kind, h AS score FROM h$iters
       |UNION ALL SELECT node, 'auth' AS kind, a AS score FROM an$iters
       |ORDER BY kind, node""".stripMargin
  }

  /** Squared L2 distance between a vector expression and a centroid
    * table's `ctr`, as an index-order list fold. */
  private def sqdExpr(vec: String, tbl: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($vec[i]-$tbl.ctr[i])*($vec[i]-$tbl.ctr[i])))"

  /** Shared Lloyd-build CTE chain — `init`/`c0`/`c1..cN`/`af`(final
    * assignment) over a caller-provided normalized-corpus CTE
    * `e(vec_id, v)` — one assign(d)/argmin(a)/mean(m)/centroid(c)
    * quadruple per round; `c0` holds the md5-ranked init vectors; each
    * `c{k}` carries forward the previous center for cells that lost
    * every member (Spark keeps them too). Used by q53 (ivfOracle) and
    * q75 (semantic dedup). Callers append their own CTEs/tail after a
    * comma. */
  private def ivfBuildCtes(nlist: Int, iters: Int, dim: Int, seed: Int,
      src: String = "e", p: String = ""): String = {
    val iterCtes = (1 to iters).map { kk =>
      val j = kk - 1
      s"""${p}d$kk AS MATERIALIZED (
         | SELECT e.vec_id, c.cell,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |   ${sqdExpr("e.v", "c", dim)}, c.cell) AS r
         | FROM $src e, ${p}c$j c),
         |${p}a$kk AS MATERIALIZED (SELECT vec_id, cell FROM ${p}d$kk WHERE r = 1),
         |${p}m$kk AS MATERIALIZED (
         | SELECT a.cell, d.i AS di, round(avg(e.v[d.i]), 6) AS w
         | FROM ${p}a$kk a JOIN $src e USING (vec_id), generate_series(1, $dim) AS d(i)
         | GROUP BY a.cell, d.i),
         |${p}c$kk AS MATERIALIZED (
         | SELECT ${p}c$j.cell, coalesce(m.ctr, ${p}c$j.ctr) AS ctr
         | FROM ${p}c$j LEFT JOIN (SELECT cell, list(w ORDER BY di) AS ctr
         |   FROM ${p}m$kk GROUP BY cell) m USING (cell)),""".stripMargin
    }.mkString("\n")
    s"""${p}init AS MATERIALIZED (
       | SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS cell, v
       | FROM (SELECT vec_id, v,
       |        CAST(('0x' || substr(md5('$seed:' || vec_id), 1, 8)) AS BIGINT) AS h
       |       FROM $src)
       | ORDER BY h, vec_id LIMIT $nlist),
       |${p}c0 AS MATERIALIZED (SELECT cell, v AS ctr FROM ${p}init),
       |$iterCtes
       |${p}af AS MATERIALIZED (
       | SELECT vec_id, cell FROM (
       |  SELECT e.vec_id, c.cell,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${sqdExpr("e.v", "c", dim)}, c.cell) AS r
       |  FROM $src e, ${p}c$iters c) t WHERE r = 1)""".stripMargin
  }

  /** q54/q94 shared session CTEs: 30-min-gap sessionization down to
    * one `sess(user_id, session_id, n_events, session_value, start_us,
    * end_us)` row per session. */
  /** The q26 langid classifier as doc-level (lang, pred) rows — the
    * CTE block q322/q344 inline, shared by the q348/q350 eval oracles.
    * Emitted WITHOUT the leading WITH. */
  private val langidPredCtes: String =
    """lt AS (
      | SELECT doc_id, lang,
      |  CASE WHEN len(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
      |    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
      | FROM documents),
      |ls AS (SELECT doc_id, lang,
      | len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
      | len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
      | len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
      | len(list_filter(toks, x -> x IN ('le','la','de','et','les'))) AS s_fr,
      | len(list_filter(toks, x -> x IN ('o','a','de','que','e'))) AS s_pt
      | FROM lt),
      |lp AS (
      | SELECT lang, CASE
      |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_pt THEN 'de'
      |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
      |  WHEN s_es >= s_fr AND s_es >= s_pt THEN 'es'
      |  WHEN s_fr >= s_pt THEN 'fr'
      |  ELSE 'pt' END AS pred
      | FROM ls)""".stripMargin

  private val sessionCtes: String =
    """e AS (
      | SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |b AS (
      | SELECT user_id, event_id, us, value,
      |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |        > 1800000000 THEN 1 ELSE 0 END AS brk
      | FROM e),
      |s AS (
      | SELECT user_id, us, value,
      |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      | FROM b),
      |sess AS (
      | SELECT user_id, session_id, count(*) AS n_events,
      |  round(sum(value), 2) AS session_value,
      |  min(us) AS start_us, max(us) AS end_us
      | FROM s GROUP BY user_id, session_id)""".stripMargin

  /** q93's oracle: GraphOps.labelPropagation unrolled — one
    * count/top-1/relabel CTE triple per iteration over the q92-sampled
    * symmetrized part<->supplier graph. Pure integer labels: no
    * rounding pins anywhere (unlike q73's rank re-rounding). */
  private def lpaOracle(iters: Int): String =
    lpaOracleWithTail(iters, s"SELECT node, label FROM l$iters ORDER BY node")

  /** The q93 LPA CTE chain with a caller-supplied final clause — lets
    * q305's modularity oracle reuse the exact label fixpoint. */
  private def lpaOracleWithTail(iters: Int, tail: String): String = {
    val iterCtes = (1 to iters).map { k =>
      val j = k - 1
      s"""c$k AS MATERIALIZED (
         | SELECT e.src AS n, l.label, count(*) AS c
         | FROM e JOIN l$j l ON l.node = e.dst GROUP BY 1, 2),
         |s$k AS MATERIALIZED (
         | SELECT n, label, row_number() OVER (PARTITION BY n
         |   ORDER BY c DESC, label) AS rn
         | FROM c$k),
         |l$k AS MATERIALIZED (
         | SELECT l$j.node, coalesce(s.label, l$j.label) AS label
         | FROM l$j LEFT JOIN (SELECT n, label FROM s$k WHERE rn = 1) s
         |  ON s.n = l$j.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       | SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
       | FROM lineitem WHERE l_orderkey % 10 = 0),
       |e AS MATERIALIZED (SELECT p AS src, sp AS dst FROM pairs
       |      UNION SELECT sp, p FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       | (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
       |l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
       |$iterCtes
       |$tail""".stripMargin
  }

  /** q201's oracle: greedy k-center unrolled into chained CTEs — p_t
    * picks the argmin-max-similarity candidate (ties by vec_id), d_t
    * updates the running max incrementally; the exact mirror of the
    * engine's per-round incremental scan. */
  private def kcenterOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e AS MATERIALIZED (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p1 AS MATERIALIZED (SELECT vec_id AS id, v FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS MATERIALIZED (
        | SELECT e.vec_id, e.v,
        |  list_cosine_similarity(e.v, (SELECT v FROM p1)) AS ms
        | FROM e WHERE e.vec_id <> (SELECT id FROM p1)),
        |""".stripMargin)
    for (t <- 2 to k) {
      sb.append(s"p$t AS MATERIALIZED (SELECT vec_id AS id, v FROM d${t - 1}" +
        " ORDER BY ms ASC, vec_id LIMIT 1)")
      if (t < k)
        sb.append(",\n" +
          s"""d$t AS MATERIALIZED (
             | SELECT c.vec_id, c.v,
             |  greatest(c.ms,
             |   list_cosine_similarity(c.v, (SELECT v FROM p$t))) AS ms
             | FROM d${t - 1} c WHERE c.vec_id <> (SELECT id FROM p$t)),
             |""".stripMargin)
      else sb.append("\n")
    }
    sb.append((1 to k).map(t =>
      s"SELECT $t AS rnd, (SELECT id FROM p$t) AS vec_id")
      .mkString(" UNION ALL "))
    sb.append(" ORDER BY rnd")
    sb.toString
  }

  /** q53's oracle: Similarity.ivfTopK unrolled into chained CTEs (see
    * [[ivfBuildCtes]]). `e.v` is the L2-normalized corpus (index-order
    * fold, bit-identical to Spark's zip_with/aggregate
    * normalization). */
  /** q467/q468's shared legs: the q53 Lloyd build with CORPUS-AS-
    * QUERIES probes — Similarity.ivfSelfTopK unrolled. Emits (without
    * the leading WITH) the chain `e` (normalized corpus) → ivfBuildCtes
    * → `iprobes` (nprobe nearest cells for EVERY vector; no queryMax
    * filter — that is the whole point of the self variant) → `iscored`
    * → `ivt` (the per-query top-k). Callers append their own tail
    * (q467: the mutual join; q468: the vote + recall panel). */
  private def ivfSelfCtes(nlist: Int, nprobe: Int, iters: Int, dim: Int,
      k: Int, seed: Int): String =
    s"""e AS (
       | SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]),
       |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                         y -> y*y)))) AS v
       | FROM embeddings),
       |${ivfBuildCtes(nlist, iters, dim, seed)},
       |iprobes AS MATERIALIZED (
       | SELECT query_id, qv, cell FROM (
       |  SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${sqdExpr("e.v", "c", dim)}, c.cell) AS r
       |  FROM e, c$iters c) t WHERE r <= $nprobe),
       |iscored AS MATERIALIZED (
       | SELECT p.query_id, a.vec_id AS neighbor_id,
       |  list_sum(list_transform(range(1, ${dim + 1}), i -> p.qv[i] * ce.v[i])) AS sim
       | FROM iprobes p JOIN af a USING (cell) JOIN e ce ON ce.vec_id = a.vec_id
       | WHERE a.vec_id <> p.query_id),
       |ivt AS MATERIALIZED (
       | SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk FROM (
       |  SELECT query_id, neighbor_id,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY sim DESC, neighbor_id) AS rnk
       |  FROM iscored) t WHERE rnk <= $k)""".stripMargin

  private def ivfOracle(nlist: Int, nprobe: Int, iters: Int, dim: Int,
      k: Int, seed: Int, queryMax: Int): String = {
    s"""WITH e AS (
       | SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]),
       |   x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                         y -> y*y)))) AS v
       | FROM embeddings),
       |${ivfBuildCtes(nlist, iters, dim, seed)},
       |probes AS (
       | SELECT query_id, qv, cell FROM (
       |  SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${sqdExpr("e.v", "c", dim)}, c.cell) AS r
       |  FROM e, c$iters c WHERE e.vec_id < $queryMax) t WHERE r <= $nprobe),
       |scored AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id,
       |  list_sum(list_transform(range(1, ${dim + 1}), i -> p.qv[i] * ce.v[i])) AS sim
       | FROM probes p JOIN af a USING (cell) JOIN e ce ON ce.vec_id = a.vec_id
       | WHERE a.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk FROM (
       | SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       | FROM scored) t
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** q110's oracle — the q106 recall construction transplanted onto
    * the planted near-dup corpus: planted CTEs, the Lloyd build, the
    * nprobe probe/scan (q53's machinery with queryMax=40), the exact
    * top-5, and the 6-plane hamming<=1 sign-LSH leg (q33's machinery,
    * dots on the NORMALIZED corpus — Spark's annTopK(preNormalized)
    * hashes the same normalized vectors, so the sign computations see
    * identical values). No pinned recall literals. */
  private def plantedRecallOracle: String =
    s"""WITH ${plantedCorpusCtes(64)},
       |${ivfBuildCtes(16, 3, 64, 42)},
       |probes AS (
       | SELECT query_id, qv, cell FROM (
       |  SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${sqdExpr("e.v", "c", 64)}, c.cell) AS r
       |  FROM e, c3 c WHERE e.vec_id < 40) t WHERE r <= 4),
       |ivf_s AS (
       | SELECT p.query_id, a.vec_id AS neighbor_id,
       |  list_sum(list_transform(range(1, 65), i -> p.qv[i] * ce.v[i])) AS sim
       | FROM probes p JOIN af a USING (cell) JOIN e ce ON ce.vec_id = a.vec_id
       | WHERE a.vec_id <> p.query_id),
       |ivf AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       | FROM ivf_s) t WHERE rnk <= 5),
       |exact AS (SELECT query_id, neighbor_id, rnk FROM (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |   list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) DESC,
       |   c.vec_id) AS rnk
       | FROM e q, e c WHERE q.vec_id < 40 AND c.vec_id <> q.vec_id) t
       | WHERE rnk <= 5),
       |w AS (SELECT pp.p AS p, dd.d AS d,
       |  CAST(('0x' || substr(md5('42:' || pp.p || ':' || dd.d), 1, 8)) AS BIGINT)
       |    / 4294967296.0 - 0.5 AS wt
       | FROM generate_series(0, 5) AS pp(p), generate_series(0, 63) AS dd(d)),
       |dots AS (SELECT e.vec_id, w.p, SUM(e.v[w.d + 1] * w.wt) AS s
       | FROM e, w GROUP BY e.vec_id, w.p),
       |buck AS (SELECT vec_id,
       |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
       |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
       | FROM dots GROUP BY vec_id),
       |qp AS (SELECT b.vec_id AS query_id,
       |  xor(b.bucket, CASE WHEN g.i = 0 THEN CAST(0 AS BIGINT)
       |    ELSE (CAST(1 AS BIGINT) << CAST(g.i - 1 AS INTEGER)) END) AS bucket
       | FROM buck b, generate_series(0, 6) AS g(i) WHERE b.vec_id < 40),
       |cand AS (SELECT DISTINCT qp.query_id, cb.vec_id AS neighbor_id
       | FROM qp JOIN buck cb ON cb.bucket = qp.bucket
       | WHERE cb.vec_id <> qp.query_id),
       |ann AS (SELECT query_id, neighbor_id FROM (
       | SELECT c.query_id, c.neighbor_id,
       |  row_number() OVER (PARTITION BY c.query_id ORDER BY
       |   list_sum(list_transform(range(1, 65), i -> qe.v[i] * ne.v[i])) DESC,
       |   c.neighbor_id) AS rnk
       | FROM cand c JOIN e qe ON qe.vec_id = c.query_id
       | JOIN e ne ON ne.vec_id = c.neighbor_id) t WHERE rnk <= 5),
       |e1 AS (SELECT query_id, neighbor_id FROM exact WHERE rnk = 1),
       |hits AS (
       | SELECT (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM exact JOIN ann USING (query_id, neighbor_id)) AS ann_hits,
       |  (SELECT count(*) FROM exact JOIN ivf USING (query_id, neighbor_id)) AS ivf_hits,
       |  (SELECT count(DISTINCT query_id) FROM exact) AS n_queries,
       |  (SELECT count(*) FROM e1 JOIN ann USING (query_id, neighbor_id)) AS ann_hits1,
       |  (SELECT count(*) FROM e1 JOIN ivf USING (query_id, neighbor_id)) AS ivf_hits1)
       |SELECT CAST(5 AS INTEGER) AS k, n_exact, ann_hits, ivf_hits,
       | round(CAST(ann_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS ann_recall,
       | round(CAST(ivf_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 4) AS ivf_recall,
       | n_queries, ann_hits1, ivf_hits1,
       | round(CAST(ann_hits1 AS DOUBLE) / CAST(n_queries AS DOUBLE), 4) AS ann_recall_top1,
       | round(CAST(ivf_hits1 AS DOUBLE) / CAST(n_queries AS DOUBLE), 4) AS ivf_recall_top1
       |FROM hits""".stripMargin

  /** The q51/q75/q82 planted near-dup corpus as CTEs `base`/`plant`/
    * `eraw` (raw doubles) + `e` (L2-normalized) — the md5-derived
    * perturbed copies PipelineQueries.plantedNormEmb builds. */
  private def plantedCorpusCtes(dim: Int): String =
    s"""base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |plant AS (
       | SELECT vec_id + 100000 AS vec_id, nv AS v FROM (
       |  SELECT vec_id,
       |   list_transform(range(1, ${dim + 1}), i -> v[i] * (1.0 +
       |     (0.5 + CAST(vec_id % 8 AS DOUBLE) * 0.3) *
       |     (CAST(('0x' || substr(md5('plant:' || CAST(vec_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 8)) AS BIGINT)
       |       / 4294967296.0 - 0.5))) AS nv
       |  FROM base WHERE vec_id < 40) t),
       |eraw AS (SELECT * FROM base UNION ALL SELECT * FROM plant),
       |e AS (
       | SELECT vec_id,
       |  list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))) AS v
       | FROM eraw)""".stripMargin

  /** q75's oracle: Similarity.semanticNearDupPairs — the SemDeDup
    * recipe over the q51 planted near-dup corpus ([[plantedCorpusCtes]]
    * provides the normalized `e(vec_id, v)`); [[ivfBuildCtes]]
    * reproduces the quantizer fit + final assignment; the tail joins
    * in-cell pairs and verifies exact cosine ≥ threshold. */
  private def semDedupOracle(nlist: Int, iters: Int, dim: Int, seed: Int,
      threshold: Double): String = {
    s"""WITH ${plantedCorpusCtes(dim)},
       |${ivfBuildCtes(nlist, iters, dim, seed)}
       |SELECT id_a, id_b, cos FROM (
       | SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       |  round(list_sum(list_transform(range(1, ${dim + 1}),
       |    i -> ex.v[i] * ey.v[i])), 4) AS cos
       | FROM af x JOIN af y ON x.cell = y.cell AND x.vec_id < y.vec_id
       | JOIN e ex ON ex.vec_id = x.vec_id
       | JOIN e ey ON ey.vec_id = y.vec_id) t
       |WHERE cos >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** q82's oracle: Similarity.semanticDecontaminate over the planted
    * corpus — bench = originals with vec_id < 20, corpus = everything
    * else (including their planted copies); per corpus vector the max
    * cosine to any bench vector, ties pinned to the smallest bench id
    * (the Spark side's first-array-position contract). */
  private def semDeconOracle(dim: Int, threshold: Double): String = {
    s"""WITH ${plantedCorpusCtes(dim)},
       |c AS (SELECT * FROM e WHERE vec_id >= 20),
       |b AS (SELECT * FROM e WHERE vec_id < 20),
       |s AS (
       | SELECT c.vec_id, b.vec_id AS bench_id,
       |  list_sum(list_transform(range(1, ${dim + 1}), i -> c.v[i] * b.v[i])) AS sim
       | FROM c, b),
       |r AS (
       | SELECT vec_id, bench_id, sim,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
       | FROM s)
       |SELECT vec_id, bench_id, round(sim, 4) AS best_cos
       |FROM r WHERE rn = 1 AND round(sim, 4) >= $threshold
       |ORDER BY vec_id""".stripMargin
  }
}
