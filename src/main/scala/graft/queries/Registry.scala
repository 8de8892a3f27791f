package graft.queries

/** The gated-query registry: single source of truth for `SparkEntry.queries`,
  * `SparkEntry.oracleSql`, and the Bench headline set.
  */
object Registry {

  import Relational._

  val all: Seq[Gated] = Seq(
    Gated("q1_agg",            q1Agg,           Some(q1AggSql)),
    Gated("q2_topk_revenue",   q2TopkRevenue,   Some(q2TopkRevenueSql)),
    Gated("q3_nation_revenue", q3NationRevenue, Some(q3NationRevenueSql)),
    Gated("q4_latest_global",  q4LatestGlobal,  Some(q4LatestGlobalSql)),
    Gated("q5_anti_join",      q5AntiJoin,      Some(q5AntiJoinSql)),
    Gated("q6_semi_join",      q6SemiJoin,      Some(q6SemiJoinSql)),
    Gated("q7_window_latest",  q7WindowLatest,  Some(q7WindowLatestSql)),
    Gated("q8_rolling_mean",   q8RollingMean,   Some(q8RollingMeanSql)),
    Gated("q9_date_funcs",     q9DateFuncs,     Some(q9DateFuncsSql)),
    Gated("q10_filter_project", q10FilterProject, Some(q10FilterProjectSql)),
    Gated("q11_setops",        q11SetOps,       Some(q11SetOpsSql)),
    Gated("q12_rollup",        q12Rollup,       Some(q12RollupSql)),
    Gated("q13_events_tumbling", Events.q13Tumbling, Some(Events.q13TumblingSql)),
    Gated("q14_events_json",   Events.q14JsonProps, Some(Events.q14JsonPropsSql)),
    Gated("q15_sessionize",    Events.q15Sessionize, Some(Events.q15SessionizeSql)),
    Gated("q16_dedup_exact",   TextQueries.q16DedupExact, Some(TextQueries.q16DedupExactSql)),
    Gated("q17_token_jaccard", TextQueries.q17TokenJaccard, Some(TextQueries.q17TokenJaccardSql)),
    Gated("q18_token_stats",   TextQueries.q18TokenStats, Some(TextQueries.q18TokenStatsSql)),
    Gated("q19_lang_profile",  TextQueries.q19LangProfile, Some(TextQueries.q19LangProfileSql)),
    Gated("q20_embed_topk",    Embeddings.q20EmbedTopK, Some(Embeddings.q20EmbedTopKSql)),
    Gated("q21_embed_neardup", Embeddings.q21EmbedNearDup, Some(Embeddings.q21EmbedNearDupSql)),
    Gated("q22_label_centroids", Embeddings.q22LabelCentroids, Some(Embeddings.q22LabelCentroidsSql)),
    Gated("q23_ann_lsh",       Embeddings.q23AnnLsh, Some(Embeddings.q23AnnLshSql)),
    Gated("q24_minhash_lsh",   DedupQueries.q24MinhashLsh, Some(DedupQueries.q24MinhashLshSql)),
    Gated("q25_simhash",       DedupQueries.q25Simhash, Some(DedupQueries.q25SimhashSql)),
    Gated("q26_fingerprint",   DedupQueries.q26Fingerprint, Some(DedupQueries.q26FingerprintSql)),
    Gated("q27_lang_quality",  DedupQueries.q27LangQuality, Some(DedupQueries.q27LangQualitySql)),
    Gated("q28_cube",          Stats.q28Cube, Some(Stats.q28CubeSql)),
    Gated("q29_distinct_agg",  Stats.q29DistinctAgg, Some(Stats.q29DistinctAggSql)),
    Gated("q30_moments",       Stats.q30Moments, Some(Stats.q30MomentsSql)),
    Gated("q31_asof_join",     AsOfQueries.q31AsofJoin, Some(AsOfQueries.q31AsofJoinSql)),
    Gated("q32_percentiles",   Stats.q32Percentiles, Some(Stats.q32PercentilesSql)),
    Gated("q33_correlated_agg", Q17.q33SmallQtyRevenue, Some(Q17.q33SmallQtyRevenueSql)),
    Gated("q34_token_counts",  Q17.q34TokenCounts, Some(Q17.q34TokenCountsSql)),
    Gated("q35_ann_ivf",       Embeddings.q35AnnIvf, Some(Embeddings.q35AnnIvfSql)),
    Gated("q36_string_funcs",  Breadth.q36StringFuncs, Some(Breadth.q36StringFuncsSql)),
    Gated("q37_custdist",      Breadth.q37Custdist, Some(Breadth.q37CustdistSql)),
    Gated("q38_disjunctive",   Breadth.q38Disjunctive, Some(Breadth.q38DisjunctiveSql)),
    Gated("q39_null_semantics", Breadth.q39NullSemantics, Some(Breadth.q39NullSemanticsSql)),
    Gated("q40_range_join",    AsOfQueries.q40RangeJoin, Some(AsOfQueries.q40RangeJoinSql)),
    Gated("q41_array_agg",     Breadth.q41ArrayAgg, Some(Breadth.q41ArrayAggSql)),
    Gated("q42_date_arith",    Breadth.q42DateArith, Some(Breadth.q42DateArithSql)),
    Gated("q43_pivot",         Breadth.q43Pivot, Some(Breadth.q43PivotSql)),
    Gated("q44_window_breadth", Breadth.q44WindowBreadth, Some(Breadth.q44WindowBreadthSql)),
    Gated("q45_bag_setops",    Breadth.q45BagSetOps, Some(Breadth.q45BagSetOpsSql)),
    Gated("q46_pagination",    Breadth.q46Pagination, Some(Breadth.q46PaginationSql)),
    Gated("q47_curation",      CurationQuery.q47Curation, Some(CurationQuery.q47CurationSql)),
    Gated("q48_embed_curation", Embeddings.q48EmbedCuration, Some(Embeddings.q48EmbedCurationSql)),
    Gated("q49_ann_recall",    Embeddings.q49AnnRecall, Some(Embeddings.q49AnnRecallSql)),
    Gated("q50_media_features", MediaQuery.q50MediaFeatures, Some(MediaQuery.q50MediaFeaturesSql)),
    Gated("q51_stratified_sample", MixQueries.q51StratifiedSample, Some(MixQueries.q51StratifiedSampleSql)),
    Gated("q52_pack_sequences", MixQueries.q52PackSequences, Some(MixQueries.q52PackSequencesSql)),
    Gated("q53_contamination", MixQueries.q53Contamination, Some(MixQueries.q53ContaminationSql)),
    Gated("q54_quantized_topk", Embeddings.q54QuantizedTopK, Some(Embeddings.q54QuantizedTopKSql)),
    Gated("q55_grouping_sets", Stats.q55GroupingSets, Some(Stats.q55GroupingSetsSql)),
  )

  def byName(name: String): Gated = all.find(_.name == name).get
}
