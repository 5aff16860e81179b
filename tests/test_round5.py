"""Round-5 operator tests: exact containment join (sub-document
duplication) and cluster-balanced diversity sampling."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# containment_pairs_exact: planted excerpt / directionality / bounds
# ------------------------------------------------------------------ #

def test_containment_planted_excerpt(ctx):
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    rows = [
        (1, base),                                   # the long original
        (2, " ".join(base.split()[:10])),            # excerpt ⊂ original
        (3, "totally different words here nothing shared at all kept"),
    ]
    out = ctx.stream_iter(rows, "doc_id long, text string") \
        .containment_pairs_exact("text", "doc_id", shingle_n=3,
                                 threshold=0.9).collect_vec()
    pairs = {(r.inner_id, r.outer_id): r.containment for r in out}
    # the excerpt is fully contained in the original, not vice versa
    assert pairs.get((2, 1)) == 1.0
    assert (1, 2) not in pairs
    assert all(3 not in p for p in pairs)


def test_containment_equals_bruteforce_random(ctx):
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(40)
    ]
    t, n = 0.6, 2
    out = ctx.stream_iter(rows, "doc_id long, text string") \
        .containment_pairs_exact("text", "doc_id", shingle_n=n,
                                 threshold=t).collect_vec()
    got = {(r.inner_id, r.outer_id): r.containment for r in out}

    def shingles(text):
        toks = " ".join(text.lower().split()).split(" ")
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sh = {i: shingles(txt) for i, txt in rows}
    want = {}
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            c = round(len(sh[a] & sh[b]) / len(sh[a]), 6)
            if c >= t:
                want[(a, b)] = c
    assert got == want and len(want) > 0


def test_containment_low_jaccard_high_containment(ctx):
    """The operator's reason to exist: a pair Jaccard-dedup misses."""
    long_doc = " ".join(f"tok{i}" for i in range(200))
    excerpt = " ".join(f"tok{i}" for i in range(12))
    s = ctx.stream_iter(
        [(1, long_doc), (2, excerpt)], "doc_id long, text string"
    )
    jac = s.similar_pairs_exact(
        "text", "doc_id", shingle_n=3, threshold=0.5
    ).collect_vec()
    cont = s.containment_pairs_exact(
        "text", "doc_id", shingle_n=3, threshold=0.9
    ).collect_vec()
    assert jac == []  # ~10/198 shared shingles: invisible to Jaccard
    assert [(r.inner_id, r.outer_id) for r in cont] == [(2, 1)]


# ------------------------------------------------------------------ #
# diversity_sample: quota, determinism, assignment parity
# ------------------------------------------------------------------ #

def test_diversity_sample_quota_and_determinism(ctx, sf_dir):
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.diversity_sample(n_cells=8, per_cell=5).collect_vec()
    b = emb.diversity_sample(n_cells=8, per_cell=5).collect_vec()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per[r.cell] = per.get(r.cell, 0) + 1
    assert all(v <= 5 for v in per.values())
    assert len(per) > 1  # multiple cells actually populated
    # ids are unique (a row lands in exactly one cell)
    assert len({r.vec_id for r in a}) == len(a)


def test_diversity_sample_matches_ivf_assignment(ctx, sf_dir):
    """Sampled rows must carry the SAME cell the ANN IVF operator
    assigns (shared seeded centroids + argmax-dot rule)."""
    from renoir_spark.datapipe import _ivf_assign, _ivf_seed_units

    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    units = _ivf_seed_units(emb.df, "embedding", "vec_id", 8)
    full = {
        r.vec_id: r["__cell"]
        for r in _ivf_assign(
            emb.df.select("vec_id", F.col("embedding").alias("cvec")),
            units, id_schema="vec_id long",
        ).collect()
    }
    out = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet") \
        .diversity_sample(n_cells=8, per_cell=5).collect_vec()
    assert all(full[r.vec_id] == r.cell for r in out)


def test_diversity_sample_empty_corpus(ctx):
    s = ctx.stream_iter([], "vec_id long, embedding array<float>")
    out = s.diversity_sample(n_cells=4, per_cell=3)
    assert out.df.count() == 0
    assert out.df.columns == ["vec_id", "cell"]


# ------------------------------------------------------------------ #
# fim_transform: PSM reorder invariants
# ------------------------------------------------------------------ #

def test_fim_token_multiset_preserved_and_deterministic(ctx):
    rows = [(i, f"line{i} " + " ".join(f"tok{j}" for j in range(i % 7 + 1)))
            for i in range(60)] + [(999, None)]
    s = ctx.stream_iter(rows, "doc_id long, text string")
    a = {r.doc_id: r.fim_text
         for r in s.fim_transform("doc_id", "text", rate=1.0).collect_vec()}
    b = {r.doc_id: r.fim_text
         for r in s.fim_transform("doc_id", "text", rate=1.0).collect_vec()}
    assert a == b  # deterministic (no rand())
    assert a[999] is None  # NULL passes through
    for i, text in rows[:-1]:
        fim = a[i]
        assert fim.startswith("<PRE>") and "<SUF>" in fim and "<MID>" in fim
        body = fim[len("<PRE>"):]
        prefix, rest = body.split("<SUF>", 1)
        suffix, middle = rest.split("<MID>", 1)
        rebuilt = [t for part in (prefix, middle, suffix)
                   for t in part.split(" ") if part]
        assert sorted(rebuilt) == sorted(text.split(" ")), (i, fim)


def test_fim_rate_gate_untouched_rows_pass_through(ctx):
    rows = [(i, f"alpha beta gamma {i}") for i in range(200)]
    s = ctx.stream_iter(rows, "doc_id long, text string")
    out = {r.doc_id: r.fim_text
           for r in s.fim_transform("doc_id", "text", rate=0.4).collect_vec()}
    changed = [i for i, t in rows if out[i] != t]
    untouched = [i for i, t in rows if out[i] == t]
    assert untouched and changed
    assert 0.25 < len(changed) / len(rows) < 0.55  # ~rate, hash-gated
    # rate=0 leaves everything alone
    zero = {r.doc_id: r.fim_text
            for r in s.fim_transform("doc_id", "text", rate=0.0).collect_vec()}
    assert all(zero[i] == t for i, t in rows)


# ------------------------------------------------------------------ #
# chunk_dedup_cdc: insertion robustness fixed-size chunking lacks
# ------------------------------------------------------------------ #

def test_cdc_resynchronizes_after_insertion(ctx):
    """One word prepended to a duplicated long document: fixed chunks
    all shift (zero drops), CDC chunks re-anchor and dedup the body."""
    import random

    rng = random.Random(5)
    body = " ".join(rng.choice("abcdefghij") + str(rng.randint(0, 99))
                    for _ in range(400))
    rows = [(1, body), (2, "zzzinserted " + body)]
    s = ctx.stream_iter(rows, "doc_id long, text string")

    fixed = {r.doc_id: r for r in s.chunk_dedup(
        "doc_id", "text", chunk_words=16).collect_vec()}
    cdc = {r.doc_id: r for r in s.chunk_dedup_cdc(
        "doc_id", "text", divisor=16).collect_vec()}
    # fixed-size: the shifted copy shares (almost) no chunk
    assert fixed[2].n_dropped <= 1
    # CDC: the copy loses most of its chunks to the original
    assert cdc[2].n_dropped >= 0.8 * cdc[2].n_chunks
    assert cdc[1].n_dropped == 0


def test_cdc_roundtrip_without_duplicates(ctx):
    """Unique docs: nothing drops and reassembly is the identity (on
    normalized text) — boundaries must not lose or reorder tokens."""
    # every token carries its doc id: no chunk can repeat across docs
    rows = [(i, " ".join(f"TOK{j}_{i}" for j in range(17)))
            for i in range(30)]
    out = {r.doc_id: r for r in ctx.stream_iter(
        rows, "doc_id long, text string"
    ).chunk_dedup_cdc("doc_id", "text", divisor=4).collect_vec()}
    for i, t in rows:
        assert out[i].n_dropped == 0
        assert out[i].clean_text == " ".join(t.split()).lower()
