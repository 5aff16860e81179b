"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full correctness suite defined
in ``renoir_spark/suite.py`` (one entry per operator family from
SURVEY.md §2, each with a DuckDB-equivalent oracle).

The driver's correctness harness hashes only the FIRST 50 keys of
``sorted(queries())``.  The suite declares 124 queries, so a plain
alphabetical listing would leave whole operator families (NEXMark, as-of
join, rollup/quantiles/count-distinct, the prep/multimodal layer, cluster
dedup) without a driver row.  ``DRIVER_SET`` below is therefore a curated
50-slot set — one representative per family — exposed under ``dNN_``
keys so it sorts BEFORE the remaining ``q``-keyed entries; the driver
hashes exactly these 50, while all 124 queries stay exposed here and are
bit-exactly verified against DuckDB in ``tests/test_oracle.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from renoir_spark import suite

# One representative per SURVEY.md §2 family (order = driver slot):
#   core folds/scans: q01 q10 q95 · joins: q03 q22 q52 q86 · plumbing:
#   q05 · element-wise: q09 q42 · windows: q11 q13 q16 q23 q36 qa25 ·
#   iteration: q26 q89 · NEXMark: q61 q68 · dedup: qa16 qa17 q69 q83
#   q94 q96 qa08 qa21 qa23 · index persistence: qa06 qa11 qa12 ·
#   decontamination: qa04 q96 · data selection: qa09 qa19 qa20 ·
#   classifier filter: qa10 · text/prep: q30 q71 q78 q80 q81 q98 ·
#   mixing: qa05 · ANN: q50 · multimodal: q51 · agg extensions: q87
#   q91 q97 · argmax: q08
# (round-5 rotation, per the round-4 verdict's ask #3 — ten
#  never-driver-hashed queries in, ten redundant core shapes out, each
#  outgoing family keeping at least one driver row and every rotated-out
#  query staying bit-exact in tests/test_oracle.py:
#    q12_zip → qa11_dedup_index_exact (positional zip redundant next to
#      q09/q10; exact-mode persisted index gains its first driver row)
#    q14_count_window → qa12_ann_index_append (windows keep
#      q13/q16/q23/q36/qa25; frozen-grid ANN append now driver-hashed)
#    q19_route → qa19_token_budget (route stays oracle-green;
#      token-budget fill = the chunked-running-sum selection shape)
#    q24_global_fold_scan → qa20_quantile_band (global scan redundant
#      next to q10 + incoming q95; quantile-band selection in)
#    q40_window_map_pandas → qa21_dedup_cluster_exact (window family
#      still 5 rows; exact PPJoin cluster dedup in)
#    q48_fingerprint_winnow → q94_longest_dup_span (both fingerprint/
#      span text shapes; the suffix-automaton span dedup is the
#      harder/newer one)
#    q49_kmeans → qa23_sentence_dedup (iteration keeps q26 iterate +
#      q89 delta_iterate; replay stays oracle-green)
#    q65_nexmark_winning_bids → qa25_long_doc_windows (NEXMark keeps
#      q61/q68)
#    q88_dedup_embedding_ivf → q95_running_sum (ANN keeps q50,
#      dedup family is 8 rows; skew-proof prefix scan in)
#    q90_count_distinct → q96_dedup_against_bloom (agg extensions keep
#      q87/q91/q97; broadcast-bloom decontamination in)
#  Earlier rotations (rounds 3–4) are in git history of this file.)
DRIVER_SET = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "qa16_url_dedup",
    "q05_broadcast_chain",
    "q08_argmax_per_nation",
    "q09_wordcount",
    "q10_line_share",
    "q11_interval_join",
    "qa11_dedup_index_exact",
    "q13_sessions",
    "qa12_ann_index_append",
    "q16_event_time_tumbling",
    "qa19_token_budget",
    "q22_outer_join",
    "q23_window_join",
    "qa20_quantile_band",
    "q26_pagerank",
    "qa08_dedup_index_incremental",
    "q30_lang_id",
    "qa17_ssjoin_exact",
    "q36_transaction_window",
    "qa21_dedup_cluster_exact",
    "q42_keyed_rich_map",
    "q94_longest_dup_span",
    "qa23_sentence_dedup",
    "q50_ann_ivf",
    "q51_multimodal_decode",
    "q52_salted_join",
    "q61_nexmark_hot_items",
    "qa04_decontaminate_embedding",
    "q97_heavy_hitters",
    "qa25_long_doc_windows",
    "qa10_nb_classifier",
    "q68_nexmark_item_suggestion",
    "q69_dedup_against",
    "qa05_upsample_epochs",
    "q71_quality_gopher",
    "q78_bm25",
    "q80_prep_pipeline",
    "q81_train_val_test_split",
    "q83_dedup_cluster",
    "qa09_dsir_select",
    "qa06_ann_index_roundtrip",
    "q86_asof_join",
    "q87_group_quantiles",
    "q95_running_sum",
    "q89_sssp",
    "q96_dedup_against_bloom",
    "q91_rollup",
    "q98_unigram_logprob",
]

assert len(DRIVER_SET) == 50 and len(set(DRIVER_SET)) == 50


def _driver_key(slot: int, name: str) -> str:
    return f"d{slot:02d}_{name}"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for i, name in enumerate(DRIVER_SET, start=1):
        out[_driver_key(i, name)] = suite.QUERIES[name]
    for name, fn in suite.QUERIES.items():
        if name not in DRIVER_SET:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for i, name in enumerate(DRIVER_SET, start=1):
        if name in suite.ORACLE:
            out[_driver_key(i, name)] = suite.ORACLE[name]
    for name, sql in suite.ORACLE.items():
        if name not in DRIVER_SET:
            out[name] = sql
    return out
