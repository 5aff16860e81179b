"""BPE tokenizer training/application tests: the Spark-aggregation
trainer must agree merge-for-merge with an INDEPENDENT pure-Python
reference implementation of word-level BPE (Sennrich et al. 2016), and
segmentation must round-trip (concatenated tokens reconstruct the
normalized words)."""

import collections

import pytest


# ------------------------------------------------------------------ #
# independent reference implementation (dict-based, no Spark)
# ------------------------------------------------------------------ #

def _ref_bpe_train(texts, num_merges, min_pair_count=2):
    wc = collections.Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wc.items()}
    merges = []
    for rank in range(num_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        pairs = {p: c for p, c in pairs.items() if c >= min_pair_count}
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            new_vocab[tuple(ns)] = new_vocab.get(tuple(ns), 0) + f
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low new wide lower newer",
]


def test_bpe_train_matches_reference(ctx):
    s = ctx.stream_iter([(t,) for t in TEXTS], "text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in s.bpe_train("text", num_merges=12).df
        .orderBy("rank").collect()
    ]
    exp = _ref_bpe_train(TEXTS, 12)
    assert got == exp
    assert len(got) > 0


def test_bpe_train_stops_below_min_count(ctx):
    s = ctx.stream_iter([("ab",)], "text string")
    out = s.bpe_train("text", num_merges=10, min_pair_count=2).df.collect()
    assert out == []  # every pair occurs once


def test_bpe_segment_roundtrip_and_uses_merges(ctx):
    s = ctx.stream_iter(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    merges = s.bpe_train("text", num_merges=12).df.collect()
    seg = s.bpe_segment("text", merges).df.orderBy("id").collect()
    for row in seg:
        rebuilt = "".join(row.bpe_tokens).replace("</w>", " ").strip()
        norm = " ".join(row.text.lower().split())
        assert rebuilt == norm
    # at least one multi-char token was produced by the merges
    assert any(
        len(tok.replace("</w>", "")) > 1 for r in seg for tok in r.bpe_tokens
    )


def test_bpe_segment_null_and_empty_text(ctx):
    s = ctx.stream_iter(
        [(1, None), (2, ""), (3, "low low low")], "id long, text string"
    )
    merges = s.bpe_train("text", num_merges=4).df.collect()
    out = {r.id: r.bpe_tokens for r in s.bpe_segment("text", merges).collect_vec()}
    assert out[1] == [] and out[2] == []
    assert out[3] != []


def test_bpe_train_non_bmp_characters(ctx):
    """Astral (non-BMP) characters must be single symbols: a
    UTF-16-naive split would cut them into lone surrogates serialized
    as '?', corrupting the learned merges and never matching
    bpe_segment's code-point symbols."""
    texts = ["\U0001F600\U0001F600x \U0001F600\U0001F600x \U0001F600\U0001F600x"]
    s = ctx.stream_iter([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in s.bpe_train("text", num_merges=4).df.orderBy("rank").collect()
    ]
    exp = _ref_bpe_train(texts, 4)
    assert got == exp
    # the emoji participates in merges as a SINGLE code-point symbol —
    # never as a lone surrogate / '?'
    syms = {s for _, a, b, _ in got for s in (a, b)}
    assert any("\U0001F600" in s for s in syms), syms
    assert not any("?" in s for s in syms), syms
    merges = s.bpe_train("text", num_merges=4).df.collect()
    seg = s.bpe_segment("text", merges).df.collect()
    rebuilt = "".join(seg[0].bpe_tokens).replace("</w>", " ").strip()
    assert rebuilt == " ".join(texts[0].lower().split())
