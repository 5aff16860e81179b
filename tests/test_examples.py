"""Examples are executable documentation — the reference ships its
examples as runnable programs (examples/pagerank.rs:42-70 etc.), so ours
are pinned runnable too: each script is executed via ``runpy`` as
``__main__`` against sf0.001 (iteration counts trimmed via argv where the
script takes them). The session fixture keeps one JVM for the whole
sweep; the scripts' own ``StreamContext(...)`` reuses it via
getOrCreate."""

import os
import runpy
import sys

import pytest

# Round-11 test-budget tier (see pytest.ini): this module is the
# slow tier — excluded from the default (driver-budgeted) run,
# executed with `pytest -m "" tests/` before every baseline refresh.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")
SF = "/root/testdata/sf0.001"

# script -> argv tail (kept small so the sweep stays a smoke test)
CASES = {
    "wordcount.py": [f"{SF}/documents.parquet"],
    "pagerank.py": [SF, "2"],
    "pagerank_stateful.py": [SF, "5"],
    "connected_components.py": [SF],
    "kmeans.py": [SF, "4", "2"],
    "transitive_closure.py": [],
    "logistic_regression.py": [SF, "2"],
    "rolling_top_words.py": [SF, "2"],
    "collatz.py": ["1000"],
    "triangles.py": [SF],
    "car_accidents.py": [],
    "nexmark.py": [f"{SF}/events.parquet", "all"],
    "data_prep_pipeline.py": [f"{SF}/documents.parquet"],
    "corpus_analytics.py": [SF, "4"],
    "similarity_search.py": [SF, "3"],
    "incremental_ingest.py": [SF, "2"],
    "crawl_hygiene.py": [f"{SF}/documents.parquet"],
    "semantic_curation.py": [SF],
    "corpus_release.py": [SF],
    "media_dedup.py": [SF],
}


def test_every_example_is_covered():
    on_disk = {f for f in os.listdir(EX) if f.endswith(".py")}
    assert on_disk == set(CASES), (
        "examples/ and the smoke-test matrix drifted apart"
    )


@pytest.mark.parametrize("script", sorted(CASES))
def test_example_runs(script, spark, capsys):
    path = os.path.join(EX, script)
    old_argv = sys.argv
    sys.argv = [path, *CASES[script]]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old_argv
    # every example prints its result; an empty run is a regression
    assert capsys.readouterr().out.strip()
