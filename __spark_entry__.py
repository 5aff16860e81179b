"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full correctness suite defined
in ``renoir_spark/suite.py`` (one entry per operator family from
SURVEY.md §2, each with a DuckDB-equivalent oracle).

The driver's correctness harness hashes only the FIRST 50 keys of
``sorted(queries())``.  The suite declares 130+ queries, so a plain
alphabetical listing would leave whole operator families (NEXMark, as-of
join, rollup/quantiles/count-distinct, the prep/multimodal layer, cluster
dedup) without a driver row.  ``DRIVER_SET`` below is therefore a curated
50-slot set — one representative per family — exposed under ``dNN_``
keys so it sorts BEFORE the remaining ``q``-keyed entries; the driver
hashes exactly these 50, while every suite query stays exposed here and
is bit-exactly verified against DuckDB in ``tests/test_oracle.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from renoir_spark import suite

# One representative per SURVEY.md §2 family (order = driver slot):
#   core folds/scans: q01 q95 · joins: q03 q52 q86 qa26 · plumbing:
#   q05 · element-wise: q09 q42 · windows: q11 q13 q23 q36 qa25 ·
#   iteration: q26 q89 · NEXMark: q61 · dedup: qa16 qa17 q94 q96 qa08
#   qa21 qa28 qa30 · chunk/sentence prep: qa22 · index persistence:
#   qa06 qa07 qa11 qa12 · decontamination: qa04 q96 · data selection:
#   qa09 qa19 qa20 qa27 · classifier filter: qa10 · text/prep: q30 q71
#   q80 q98 qa13 qa18 qa29 · mixing: qa05 qa24 · ANN: q50 · multimodal:
#   q51 · agg extensions: q91 q97 · argmax: q08
# (round-6 rotation, per the round-5 verdict's ask #1 — the five
#  round-5 operators plus five more never-driver-hashed queries in, ten
#  redundant already-hashed shapes out, each outgoing family keeping at
#  least one driver row and every rotated-out query staying bit-exact in
#  tests/test_oracle.py:
#    q10_line_share → qa26_containment_pairs (keyed prefix-scan family
#      keeps q95 running_sum; exact directed containment join in)
#    q16_event_time_tumbling → qa27_diversity_sample (windows keep
#      q11/q13/q23/q36/qa25; cluster-balanced diversity sampling in)
#    q22_outer_join → qa28_ann_index_dedup (joins keep q03/q52/q86 +
#      incoming qa26; persisted-ANN incremental semantic dedup in)
#    q69_dedup_against → qa29_fim_transform (decontamination keeps q96
#      bloom + qa04 embedding; FIM/PSM transform in)
#    q83_dedup_cluster → qa30_chunk_dedup_cdc (cluster dedup keeps qa21
#      exact + qa08 persisted-minhash; CDC chunk dedup in)
#    qa23_sentence_dedup → qa22_split_sentences (chunk/sentence family
#      keeps incoming qa22 + qa30; reassembly stays oracle-green)
#    q78_bm25 → qa13_boilerplate_strip (text/prep keeps q30/q71/q80/q98)
#    q81_train_val_test_split → qa18_url_blocklist (mixing keeps qa05 +
#      incoming qa24)
#    q87_group_quantiles → qa24_temperature_mix (agg extensions keep
#      q91 rollup + q97 heavy hitters; qa20 quantile-band stays)
#    q68_nexmark_item_suggestion → qa07_dedup_index_batch (NEXMark keeps
#      q61 hot items; one-shot persisted-index dedup gains its row)
#  Earlier rotations (rounds 3–5) are in git history of this file.)
DRIVER_SET = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "qa16_url_dedup",
    "q05_broadcast_chain",
    "q08_argmax_per_nation",
    "q09_wordcount",
    "qa26_containment_pairs",
    "q11_interval_join",
    "qa11_dedup_index_exact",
    "q13_sessions",
    "qa12_ann_index_append",
    "qa27_diversity_sample",
    "qa19_token_budget",
    "qa28_ann_index_dedup",
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
    "qa22_split_sentences",
    "q50_ann_ivf",
    "q51_multimodal_decode",
    "q52_salted_join",
    "q61_nexmark_hot_items",
    "qa04_decontaminate_embedding",
    "q97_heavy_hitters",
    "qa25_long_doc_windows",
    "qa10_nb_classifier",
    "qa07_dedup_index_batch",
    "qa29_fim_transform",
    "qa05_upsample_epochs",
    "q71_quality_gopher",
    "qa13_boilerplate_strip",
    "q80_prep_pipeline",
    "qa18_url_blocklist",
    "qa30_chunk_dedup_cdc",
    "qa09_dsir_select",
    "qa06_ann_index_roundtrip",
    "q86_asof_join",
    "qa24_temperature_mix",
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
