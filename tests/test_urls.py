"""URL canonicalization + URL-keyed dedup (prep.canonical_url family).

The suite oracle (qa16) covers corpus-scale parity; these tests pin the
per-rule semantics on hostile URLs AND the cross-engine contract: the
Spark expression and the DuckDB mirror must agree byte-for-byte on
every case (scheme default, port stripping, www, tracking params,
param sort, fragment, NULL propagation, registrable ccTLD domains)."""

import duckdb
import pytest

from renoir_spark import prep

URLS = [
    "HTTPS://WWW.Example.COM:443/Docs/Page/?utm_source=feed&b=2&a=1&fbclid=xyz#frag",
    "http://example.com:80/",
    "http://example.com",
    "https://blog.foo.co.uk/a//b///?z=1&y=2",
    "example.com/path?ref=hp",
    "https://example.com/path?",
    "https://example.com/?utm_campaign=x&utm_medium=y",
    "ftp://Files.Example.org:80/data",
    "https://example.com/Case/Sensitive?Key=Val",
    "  https://pad.example.com/x  ",
    "https://example.com/a?dup=1&dup=1&c",
    "http://www.example.com:8080/x",
    None,
    "",
    "weird",
    "https://example.com/p#a/b?c=1",   # '?' INSIDE the fragment
]

EXPECT_CANON = {
    URLS[0]: "https://example.com/Docs/Page?a=1&b=2",
    URLS[1]: "http://example.com",
    URLS[3]: "https://blog.foo.co.uk/a//b?y=2&z=1",
    URLS[4]: "http://example.com/path",
    URLS[6]: "https://example.com",
    URLS[7]: "ftp://files.example.org:80/data",   # non-http keeps :80
    URLS[8]: "https://example.com/Case/Sensitive?Key=Val",
    URLS[10]: "https://example.com/a?c&dup=1&dup=1",
    URLS[11]: "http://example.com:8080/x",        # non-default port kept
    # fragment discarded ENTIRELY — its '?c=1' must not become a query
    URLS[15]: "https://example.com/p",
}


@pytest.fixture(scope="module")
def both(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "i long, u string"
    )
    sdf = df.select(
        "i",
        prep.canonical_url("u").alias("c"),
        prep.url_host("u").alias("h"),
        prep.url_registered_domain("u").alias("d"),
    )
    srows = {r.i: (r.c, r.h, r.d) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, u) for i, u in enumerate(URLS)])
    drows = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT i, {prep.sql_canonical_url('u')}, "
            f"{prep.sql_url_host('u')}, "
            f"{prep.sql_url_registered_domain('u')} FROM t"
        ).fetchall()
    }
    return srows, drows


def test_engines_agree_on_every_case(both):
    srows, drows = both
    for i, u in enumerate(URLS):
        assert srows[i] == drows[i], (u, srows[i], drows[i])


def test_canonical_rules(both):
    srows, _ = both
    for i, u in enumerate(URLS):
        if u in EXPECT_CANON:
            assert srows[i][0] == EXPECT_CANON[u], u


def test_null_propagates(both):
    srows, _ = both
    i = URLS.index(None)
    assert srows[i] == (None, None, None)


def test_registered_domain_cctld(both):
    srows, _ = both
    assert srows[3][2] == "foo.co.uk"      # 3-label ccTLD suffix
    assert srows[0][2] == "example.com"    # plain 2-label


def test_dedup_url_collapses_variants(ctx):
    rows = [
        (1, "HTTPS://WWW.Site.com/a/?utm_source=x"),
        (2, "https://site.com:443/a#frag"),
        (3, "https://site.com/a"),
        (4, "https://site.com/b"),
    ]
    df = ctx.spark.createDataFrame(rows, "id long, url string")
    out = prep.dedup_url(ctx.from_df(df), "id", "url").df.collect()
    got = {r.canon_url: (r.id, r.n_dupes) for r in out}
    assert got == {
        "https://site.com/a": (1, 3),
        "https://site.com/b": (4, 1),
    }


BLOCK_ROWS = [
    (1, "https://good.example.org/a"),
    (2, "https://TRACKER.web.example.com/p/1"),     # blocked host (cased)
    (3, "http://sub.spam-mirror.net/x"),            # blocked domain, subdomain
    (4, "https://ok.example.org/v?session_id=9"),   # blocked pattern
    (5, "https://ok.example.org/ads/banner/2"),     # blocked pattern
    (6, None),                                      # NULL → always dropped
    (7, "https://spam-mirror.net.evil.org/x"),      # NOT the blocked domain
]
BLOCK_KW = dict(
    block_hosts=["tracker.web.example.com"],
    block_domains=["spam-mirror.net"],
    block_patterns=[r"[?&]session_id=", r"/ad(s|server)?/"],
)


def test_filter_urls_rules(ctx):
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    kept = sorted(
        r.id for r in prep.filter_urls(ctx.from_df(df), "url", **BLOCK_KW)
        .df.collect()
    )
    assert kept == [1, 7]
    audit = sorted(
        r.id for r in prep.filter_urls(
            ctx.from_df(df), "url", invert=True, **BLOCK_KW
        ).df.collect()
    )
    assert audit == [2, 3, 4, 5]  # NULL is dropped in BOTH modes


def test_filter_urls_matches_duckdb(ctx):
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    got = sorted(
        (r.id, r.url)
        for r in prep.filter_urls(ctx.from_df(df), "url", **BLOCK_KW)
        .df.collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", BLOCK_ROWS)
    want = sorted(
        tuple(r) for r in con.execute(
            prep.sql_filter_urls("t", "url", "id, url", **BLOCK_KW)
        ).fetchall()
    )
    assert got == want


def test_filter_urls_against_broadcast_anti(ctx):
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    bl = ctx.spark.createDataFrame(
        [("spam-mirror.net",), ("example.com",)], "domain string"
    )
    out = prep.filter_urls_against(ctx.from_df(df), bl, "url", by="domain")
    kept = sorted(r.id for r in out.df.collect())
    assert kept == [1, 4, 5, 7]   # 2 (example.com), 3, and NULL drop
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffles


def test_filter_urls_against_rejects_bad_key(ctx):
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    bl = ctx.spark.createDataFrame([("x",)], "host string")
    with pytest.raises(ValueError):
        prep.filter_urls_against(ctx.from_df(df), bl, "url", by="path")


def test_filter_urls_against_rejects_mismatched_column(ctx):
    # by='domain' against a relation whose key column is named 'host'
    # (or worse, a multi-column UT1 dump with 'category' first) must
    # raise, not silently anti-join on the wrong column
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    bl = ctx.spark.createDataFrame([("x",)], "host string")
    with pytest.raises(ValueError, match="no 'domain' column"):
        prep.filter_urls_against(ctx.from_df(df), bl, "url", by="domain")


def test_filter_urls_normalizes_literal_entries(ctx):
    # raw-list spellings (case, www., port) must still block
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    kept = sorted(
        r.id for r in prep.filter_urls(
            ctx.from_df(df), "url",
            block_hosts=["WWW.Tracker.Web.Example.COM:443"],
        ).df.collect()
    )
    assert 2 not in kept and 1 in kept
    # DuckDB mirror normalizes identically
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", BLOCK_ROWS)
    want = sorted(r[0] for r in con.execute(prep.sql_filter_urls(
        "t", "url", "id",
        block_hosts=["WWW.Tracker.Web.Example.COM:443"],
    )).fetchall())
    assert kept == want


def test_filter_urls_against_normalizes_blocklist_side(ctx):
    df = ctx.spark.createDataFrame(BLOCK_ROWS, "id long, url string")
    bl = ctx.spark.createDataFrame(
        [("WWW.Spam-Mirror.NET",)], "domain string"
    )
    kept = sorted(
        r.id for r in prep.filter_urls_against(
            ctx.from_df(df), bl, "url", by="domain"
        ).df.collect()
    )
    assert 3 not in kept and 1 in kept


try:
    from hypothesis import given, settings, strategies as st

    HYP = True
except ImportError:  # pragma: no cover
    HYP = False

if HYP:
    SLOW = settings(max_examples=8, deadline=None, derandomize=True)

    _label = st.text(
        alphabet="abXY01-", min_size=1, max_size=5
    ).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
    _pkey = st.sampled_from(
        ["a", "B", "q", "utm_source", "utm_x", "fbclid", "gclid", "ref",
         "refx", "xref"]
    )

    @st.composite
    def _url(draw):
        scheme = draw(st.sampled_from(
            ["http://", "https://", "HTTP://", "HtTpS://", "ftp://", ""]
        ))
        www = draw(st.sampled_from(["", "www.", "WWW."]))
        host = ".".join(draw(st.lists(_label, min_size=1, max_size=2)))
        tld = draw(st.sampled_from([".com", ".ORG", ".co.uk", ".net"]))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        segs = draw(st.lists(_label, min_size=0, max_size=3))
        path = ("/" + "/".join(segs)) if segs else ""
        path += draw(st.sampled_from(["", "/", "//"]))
        params = draw(st.lists(
            st.tuples(_pkey, st.sampled_from(["", "=1", "=V v"])),
            min_size=0, max_size=4,
        ))
        query = "&".join(k + v.replace(" ", "%20") for k, v in params)
        frag = draw(st.sampled_from(["", "#f", "#a/b?c=1"]))
        return f"{scheme}{www}{host}{tld}{port}{path}" + (
            f"?{query}" if query else ""
        ) + frag

    @SLOW
    @given(urls=st.lists(_url(), min_size=1, max_size=12))
    def test_canonical_url_property_cross_engine(ctx, urls):
        """Randomized URL shapes: Spark and DuckDB canonicalize
        byte-identically, and canonicalization is IDEMPOTENT (a
        canonical URL is its own fixed point)."""
        df = ctx.spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "i long, u string"
        )
        out = df.select(
            "i",
            prep.canonical_url("u").alias("c"),
            prep.canonical_url(prep.canonical_url("u")).alias("cc"),
        ).collect()
        got = {r.i: r.c for r in out}
        for r in out:
            assert r.cc == r.c, f"not idempotent: {urls[r.i]!r} -> {r.c!r} -> {r.cc!r}"
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i BIGINT, u VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(i, u) for i, u in enumerate(urls)])
        want = dict(con.execute(
            f"SELECT i, {prep.sql_canonical_url('u')} FROM t"
        ).fetchall())
        assert got == want


def test_canonical_url_is_shuffle_free(ctx):
    df = ctx.stream_parquet("/root/testdata/sf0.001/documents.parquet").df
    plan = (
        df.select(prep.canonical_url("source").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()
