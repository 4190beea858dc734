"""Reducer-order determinism: the DECIMAL-sum recipe's actual promise.

Every float-producing query in this repo claims its aggregations are
"reducer-order-proof" — per-row scalar IEEE expressions rounded to
DECIMAL, summed exactly, floats only in the epilogue. This suite tests
the promise directly: run the same query under DIFFERENT shuffle
partition counts (different partial-aggregate grouping and merge
order) and assert bit-identical results. A query summing raw doubles
across partitions would flicker here.
"""

from __future__ import annotations

import pytest

from hw_kafka_streams_spark.queries import queries

SF = "/root/testdata/sf0.001"

# Queries whose outputs lean on the DECIMAL / integer-exact recipes —
# one per family (LM scoring, OLS, drift, importance, robust stats,
# rank stats, entropy, contingency, ECDF, ACF, attribution).
DECIMAL_RECIPE_QUERIES = [
    "q_unigram_lm_score",
    "q_regression_stats",
    "q_dsir_weights",
    "q_zipf_heaps",
    "q_winsorized_stats",
    "q_auc_rank",
    "q_source_lang_entropy",
    "q_chi2_independence",
    "q_ks_test",
    "q_acf",
    "q_touch_attribution",
    "q_vocab_concentration",
    "q_collocations_llr",
    # round 7: iterative BPE training (integer counts + argmax per
    # round — a partial-agg regrouping that flipped ANY round's winner
    # would cascade through every later merge), the Gopher rule
    # battery, and the substring-dedup diagonal run-merge
    "q_bpe_train",
    "q_gopher_rules",
    "q_substring_dedup",
    # round 6: stupid-backoff LM (LEFT-join seen/unseen branches +
    # decimal-summed ln terms) and grid-quantized winsorized stats
    "q_bigram_backoff_score",
    "q_time_travel",
    # round 9: Kneser-Ney (three LEFT-join count tables + decimal ln
    # sums), Durbin-Levinson PACF (9dp-rounded recursion on decimal
    # ACF), SAX (integer-moment z-norm + decimal PAA means), and the
    # rank-arithmetic quantile calibration
    "q_kn_lm_score",
    "q_pacf",
    "q_sax_symbols",
    "q_quantile_normalize",
    "q_brown_forsythe",
    "q_transition_entropy",
    # round-9d: decimal-moment Grubbs and decimal-residual
    # Durbin-Watson. q_friedman_test stays out: it is exact-integer
    # until one final division (nothing to drift) and legitimately
    # returns ZERO rows at sf0.001 (no complete hour blocks), which
    # this battery's non-empty guard rejects.
    "q_grubbs_test",
    "q_durbin_watson",
    "q_forecast_skill",
    "q_hurst_exponent",
    # round-9e: exact-integer ACF portmanteau / Yule-Walker, the
    # Granger Cramer solve over exact centered moments, the integer-
    # pivot JB moments, Bartlett's round-to-DECIMAL rollup, decimal
    # AP terms, Dirichlet-LM decimal ln sums, the Laplace-DP seeded
    # release, the MM/power-iteration trajectories, the SPRT integer
    # LLR path, NPMI decimal term means, and the AMS signed sums
    "q_ljung_box",
    "q_yule_walker_ar2",
    "q_granger_lag1",
    "q_jarque_bera",
    "q_bartlett_test",
    "q_map_mrr_eval",
    "q_ql_dirichlet",
    "q_calibration_brier",
    "q_bradley_terry",
    "q_dp_noisy_counts",
    "q_ams_f2",
    "q_sprt_audit",
    "q_wilson_ci",
    "q_bleu_pairs",
    "q_topic_coherence",
    "q_entropy_rate",
    "q_isotonic_calibration",
    "q_shapley_attribution",
    "q_neyman_allocation",
    "q_lilliefors",
    # round 10: tail-weighted EDF normality — DECIMAL(38,9) per-term
    # rank-coefficient x ln(phi) sums over distinct lengths; the
    # regression-diagnostic battery (Chow SSRs from DECIMAL moments,
    # BP's quantized residual-moment sums, Cook's rounded-D ranking);
    # TE's 9-dp ln-ratio sums; RBO's literal-weight DECIMAL terms
    "q_anderson_darling",
    "q_chow_test",
    "q_breusch_pagan",
    "q_cooks_distance",
    "q_transfer_entropy",
    "q_rbo_rankers",
    "q_err_eval",
    "q_sign_test",
    # matrix profile: exact integer window moments, 6-dp-rounded d^2
    # before the min/rank
    "q_matrix_profile",
    "q_cdc_chunk_dedup",
    "q_speculative_acceptance",
    "q_pettitt_test",
    "q_abc_analysis",
    "q_poisson_glm",
    "q_hmm_viterbi",
    "q_gumbel_return_levels",
    "q_dataset_card",
    "q_collation_fold",
    "q_ppmi_power_iteration",
    "q_cochran_q",
    "q_fleiss_kappa",
    "q_kendall_w",
    "q_icc",
    "q_sobel_mediation",
    "q_iv_wald",
    "q_simpson_audit",
    # q_fellegi_sunter stays out for the q_friedman_test reason: it
    # legitimately returns ZERO rows at sf0.001 (all blocks are
    # singletons), which the non-empty guard rejects; its trajectory
    # determinism is covered by the sf0.01 oracle hash.
    # round 11: DECIMAL-per-term survival increments (NA hazard,
    # log-rank E/V), doubled-rank DECIMAL sums + BH ordering (Dunn),
    # per-term entropy (l-diversity), z-score grids (Burrows Delta),
    # decimal ln sums (JM), the Bowker chi2 terms, and PRESS's
    # 6dp-DECIMAL LOO residual sums. kendall_tau / good_turing /
    # cochran_armitage / rouge_pairs stay out for the friedman
    # reason's sibling: exact-integer until one final division,
    # nothing to drift.
    "q_nelson_aalen",
    "q_log_rank_test",
    "q_dunn_posthoc",
    "q_l_diversity",
    "q_burrows_delta",
    "q_ql_jelinek_mercer",
    "q_bowker_symmetry",
    "q_press_loocv",
    # round 11: decimal-summed EDF terms (CvM), per-item decimal
    # variances (Cronbach), and the md5-ordered KMV/HLL sketches
    # (TakeOrdered / register maxes must be partitioning-proof)
    "q_cramer_von_mises",
    "q_cronbach_alpha",
    "q_kmv_distinct",
    "q_hll_det_twin",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", DECIMAL_RECIPE_QUERIES)
def test_identical_across_shuffle_partitionings(spark, name):
    qmap = queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(qmap[name](spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(qmap[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} drifted across shuffle partitionings"
    assert len(a) > 0, f"{name} returned no rows at {SF}"
