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
#   core folds/scans: q01 q10 q24 · joins: q03 q22 q52 q86 · plumbing:
#   q05 q12 q19 · element-wise: q09 q42 · windows: q11 q13 q14 q16 q23 q36
#   q40 · iteration: q26 q49 q89 · NEXMark: q61 q65 q68 ·
#   dedup: qa16 qa17 q69 q83 q88 qa08 · decontamination: qa04 · data
#   selection: qa09 · classifier filter: qa10 · text/prep:
#   q30 q48 q71 q78 q80 q81 q98 · mixing: qa05 · ANN: q50 · index
#   persistence: qa06 · multimodal: q51 · agg extensions: q87 q90 q91
#   q97 · argmax: q08
# (round-4 rotations: q62/q63/q92 out for q96/q97/q98, then q96/q70/q85
#  out for the embedding-decontamination, epoch-upsampling, and
#  ANN-index-roundtrip families qa04/qa05/qa06, then q28 out for the
#  incremental dedup-index round trip qa08 — its MinHash-LSH banding
#  machinery stays driver-covered via q83's cluster dedup AND qa08's
#  build path — q84 out for DSIR importance resampling qa09, and q66
#  out for the in-engine NB classifier filter qa10 (NEXMark keeps
#  q61/q65/q68); q04 out for canonical-URL dedup qa16 (the join family
#  keeps q03/q22/q52/q86) and q34 out for the EXACT prefix-filtered
#  set-similarity join qa17 (the similarity-join family's driver row is
#  now the lossless variant; the inverted-index one stays
#  oracle-verified); every rotated-out query stays oracle-verified in
#  tests/test_oracle.py.)
DRIVER_SET = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "qa16_url_dedup",
    "q05_broadcast_chain",
    "q08_argmax_per_nation",
    "q09_wordcount",
    "q10_line_share",
    "q11_interval_join",
    "q12_zip",
    "q13_sessions",
    "q14_count_window",
    "q16_event_time_tumbling",
    "q19_route",
    "q22_outer_join",
    "q23_window_join",
    "q24_global_fold_scan",
    "q26_pagerank",
    "qa08_dedup_index_incremental",
    "q30_lang_id",
    "qa17_ssjoin_exact",
    "q36_transaction_window",
    "q40_window_map_pandas",
    "q42_keyed_rich_map",
    "q48_fingerprint_winnow",
    "q49_kmeans",
    "q50_ann_ivf",
    "q51_multimodal_decode",
    "q52_salted_join",
    "q61_nexmark_hot_items",
    "qa04_decontaminate_embedding",
    "q97_heavy_hitters",
    "q65_nexmark_winning_bids",
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
    "q88_dedup_embedding_ivf",
    "q89_sssp",
    "q90_count_distinct",
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
