"""Parallelism sweep — the reference runs every test under a local AND a
simulated-remote runtime (tests/utils.rs:189-211) to catch partitioning/
serialization bugs. Analog here: a representative query subset must give
oracle-identical results under shuffle.partitions ∈ {1, 8} in-session, and
under a separate local[1] session (subprocess — master is fixed per JVM)."""

import math
import subprocess
import sys

import pytest

# Round-11 test-budget tier (see pytest.ini): this module is the
# slow tier — excluded from the default (driver-budgeted) run,
# executed with `pytest -m "" tests/` before every baseline refresh.
pytestmark = pytest.mark.slow

from renoir_spark import suite
from tests.conftest import SF_DIR

# queries whose plans cover the shuffle-sensitive operator families:
# aggregation, join, window frames, count windows, zip, scans
SWEEP = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q08_argmax_per_nation",
    "q12_zip",
    "q14_count_window",
    "q22_outer_join",
    # round-2 partition-sensitive machinery: bucketed dedup/similarity
    # (persist + band joins), the sorted-partition Arrow pass with its
    # cross-batch key carry, IVF's mapInPandas assignment, and the
    # partition-local KMV sketch fold
    "q28_dedup_minhash",
    "q34_ngram_jaccard",
    "q36_transaction_window",
    "q50_ann_ivf",
    "q54_kmv_distinct",
    # round-3: the Arrow-batched multi-table LSH signature pass (per-
    # partition numpy blocks must agree with the oracle regardless of
    # partitioning) and the broadcast winning-bids argmax
    "q64_ann_lsh_multi",
    "q65_nexmark_winning_bids",
    # round-4: prep-layer partition-sensitive shapes — the (id, gram)
    # repetition shuffle, the per-bucket packing window, and the fully
    # composed hygiene pipeline
    "q72_repetition_stats",
    "q76_pack_sequences",
    "q80_prep_pipeline",
    # round-5: the union+window as-of join (partition-by-key ordering
    # must agree under any layout), the IVF cell self-join dedup, and
    # the delta-iterate relaxation loop (frontier joins under layouts)
    "q86_asof_join",
    "q88_dedup_embedding_ivf",
    "q89_sssp",
    # float-sum rounding must not depend on partition-order association
    "q93_word_entropy",
    # the per-group suffix-automaton pass: group co-location and the
    # sorted-partition carry must give identical spans under any layout
    "q94_longest_dup_span",
    # the chunked prefix scan: chunk boundaries move with the layout but
    # the carries must reconstruct the identical prefix sums
    "q95_running_sum",
    # the composed IVF+SQ8 stack: Arrow-block cell assignment + the
    # order-independent quantization grid under any layout
    "qa01_ann_ivf_sq8",
    # A-Res top-k: per-partition partial top-k merges must pick the
    # identical sample under any layout (rounded-key + id tie-break)
    "qa02_sample_weighted_k",
    # per-partition Misra-Gries candidates change with the layout
    # (1 partition sees the whole stream, 8 see slices) but the exact
    # recount + exactness check must return the identical top-k
    "q97_heavy_hitters",
    # canonical-order float sums (the q93 discipline) for the LM terms
    "q98_unigram_logprob",
    # late-round-4: the persisted-index probe (partition-pruned posting
    # reads + clustered writes must survive any producer layout), the
    # Gumbel top-k selection (rounded log-space keys + id tie-break),
    # and the NB argmax window (canonical-order sums + class tie-break)
    "qa08_dedup_index_incremental",
    "qa09_dsir_select",
    "qa10_nb_classifier",
    # session additions: the EXACT prefix-filtered ssjoin (rare-first
    # order + prefix postings must emit identical pairs under any
    # layout) and the budget fill (range-chunk boundaries move with the
    # layout but carries must rebuild identical inclusive prefixes)
    "qa17_ssjoin_exact",
    "qa19_token_budget",
    # first-occurrence-wins ordering on the sentence hash must pick the
    # same survivor under any layout
    "qa23_sentence_dedup",
    # round-5: the containment join's probe-prefix postings + the
    # container-side full index must emit identical directed pairs
    # under any layout; the diversity quota's per-cell window must pick
    # the identical sample; the persisted-ANN dedup loop composes the
    # Arrow cell assignment with the rank-1 verdict anti-join
    "qa26_containment_pairs",
    "qa27_diversity_sample",
    "qa28_ann_index_dedup",
    # round-6: the composed curation pipelines (every seam above, in
    # sequence — a layout-dependent survivor set would cascade into
    # every downstream stage) and the distributed zipWithIndex (range
    # partition boundaries move with the layout but offsets must
    # rebuild the identical global permutation)
    "qa31_semantic_curation",
    "qa32_semantic_ingest",
    "qa33_epoch_shuffle",
    # round-7: the composed OUTPUT side (pack windows -> pack-level agg
    # -> zipWithIndex -> partitioned write + read-back: pack ids, the
    # epoch permutation, and the hive shard layout must all be layout-
    # independent) and the auto-dialed diversity quota (the dial is a
    # count — identical under any layout — and the per-cell window must
    # still pick the identical sample at the dialed width)
    "qa34_training_order",
    "qa35_diversity_autodial",
    # round-7 versioning/retrieval layer: the full-outer snapshot join
    # (status must not depend on which side a partition holds), the
    # distinct-shingle counts meeting in 1-row cross joins, the cluster
    # -> group-hash split with both leakage audits, and the dual
    # TakeOrdered legs + rank fusion (candidate ranks are global
    # properties a layout must not perturb)
    "qa36_corpus_diff",
    "qa37_corpus_overlap",
    "qa38_leakage_safe_split",
    "qa39_hybrid_search",
    # the incremental path unions previous-output rows with freshly
    # transformed delta rows — the partition of ids between those two
    # sources must be layout-independent
    "qa40_incremental_rebuild",
    # bigram-LM float terms fold in canonical sorted order — the q93
    # association discipline, now with a two-key model join upstream
    "qa41_bigram_logprob",
    # the dataset card: count-distinct of the content hash, the exact
    # median, and the language-share window must agree under any layout
    "qa42_corpus_report",
    # round-8: the KMV overlap sketch — per-partition bottom-k minima
    # then merge IS the associative combine, so the estimate must be
    # IDENTICAL under any partition layout (order statistics compose)
    "qa43_corpus_overlap_kmv",
    # round-8: perceptual-hash media dedup — the Arrow decode stage is
    # per-row pure and the band self-join must find the same candidate
    # pairs under any layout
    "qa44_dedup_phash",
    # round-8: bucket-pooled bigram LM — hashed-bucket counts and the
    # canonical sorted float fold must agree under any layout
    "qa45_bigram_bucketed",
    # round-8: broadcast-reference phash decontamination — the 1-row
    # signature array and per-row EXISTS verdict are layout-free
    "qa46_phash_decontaminate",
    # round-8: the persisted phash index round trip — pruned posting
    # probes + clustered appends must survive any producer layout
    "qa47_phash_index_incremental",
    # round-8: the aligned-frame majority vote — frame explode, band
    # self-join and the pair-grouped count must agree under any layout
    "qa48_video_phash_dedup",
    # round-8: contrastive mining — Arrow cell assignment, the in-cell
    # pair join and the per-anchor (cos desc, id) window must pick the
    # identical positives and hard negatives under any layout
    "qa49_contrastive_pairs",
    # round-9: cross-cell mining adds the broadcast centroid-adjacency
    # join — the adjacency is driver-built (layout-free by
    # construction) but the pooled negative window now ranks rows from
    # TWO joins, and the union's layout must not perturb the per-anchor
    # (cos desc, id) pick
    "qa50_contrastive_cross_cell",
    # round-10: the alignment gate — both towers are per-row Arrow
    # stages and the cosine is an element-wise expression, so the kept
    # set and every score must be identical under any layout
    "qa51_align_filter",
    # round-10: tombstoned probes — the cell-pruned (ann) / id-hash-
    # pruned (minhash) tombstone anti-join must remove the same ids
    # from the candidate set under any producer layout
    "qa52_ann_index_delete",
    "qa53_dedup_index_delete",
    # round-10: the composed diff -> delete -> probe loop on the media
    # index — diff status, tombstone write, and the banded probe must
    # all be layout-independent
    "qa54_phash_takedown_sync",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r.asDict(recursive=True)[c]) for c in cols) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def _duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in res.fetchall()),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("partitions", ["1", "8"])
@pytest.mark.parametrize("name", SWEEP)
def test_shuffle_partition_sweep(name, partitions, spark, duck, sf_dir):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try:
        got = _spark_rows(suite.QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    exp = _duck_rows(duck, suite.ORACLE[name])
    assert got == exp, f"{name} diverges at shuffle.partitions={partitions}"


_LOCAL1_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[1]")
         .config("spark.sql.shuffle.partitions", "1")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import duckdb, math
from renoir_spark import suite
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('%(sf)s/{t}.parquet')")
def norm(v):
    if isinstance(v, float): return "nan" if math.isnan(v) else round(v, 9)
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v
for name in %(queries)s:
    df = suite.QUERIES[name](spark, "%(sf)s")
    cols = sorted(df.columns)
    got = sorted((tuple(norm(r.asDict(recursive=True)[c]) for c in cols)
                  for r in df.collect()), key=lambda t: tuple(str(x) for x in t))
    res = con.execute(suite.ORACLE[name])
    dc = [d[0] for d in res.description]
    idx = sorted(range(len(dc)), key=lambda i: dc[i])
    exp = sorted((tuple(norm(r[i]) for i in idx) for r in res.fetchall()),
                 key=lambda t: tuple(str(x) for x in t))
    assert got == exp, name
    print(name, "OK")
"""


def test_local1_runtime_subprocess():
    """A separate single-core runtime (master is fixed per JVM): the
    operator semantics must not depend on parallelism at all."""
    script = _LOCAL1_SCRIPT % {"sf": SF_DIR, "queries": SWEEP[:3]}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.count("OK") == 3
