"""The non-importing golden twins (tools/independent_twins.py) must agree
with the pipeline's own functions — run on a tiny planted corpus so a
transcription bug in EITHER implementation trips here (this is how the
round-3 FNV offset-basis typo was caught). The twin module imports only
stdlib + numpy/pandas; importing html_parser_ray in this TEST is fine —
independence is a property of the twin module, which is asserted too."""

from __future__ import annotations

import importlib.util
import sys

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def twins():
    spec = importlib.util.spec_from_file_location(
        "independent_twins", "/root/repo/tools/independent_twins.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_twin_module_is_independent(twins):
    """No import of the package anywhere in the twin source (mentions in
    docstrings/assertions are expected — the import statement is what would
    break independence)."""
    import ast

    tree = ast.parse(open("/root/repo/tools/independent_twins.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            assert not any("html_parser_ray" in a.name for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            assert "html_parser_ray" not in (node.module or "")


@pytest.fixture(scope="module")
def corpus():
    base = "the quick brown fox jumps over the lazy dog near the river bank "
    texts = [
        base * 3,
        base * 3 + "extra tail words here",          # near-dup of 0
        "completely different content about engines and turbines " * 4,
        "short",
        base.upper() * 3,                             # case differs -> distinct
    ]
    return pd.DataFrame({"doc_id": range(5), "text": texts})


def test_minhash_twin_matches_pipeline_functions(twins, corpus):
    from html_parser_ray.functions import textfns

    got = twins.minhash_lsh_pairs(corpus, threshold=0.3)
    # expected via the pipeline's own primitives (all-pairs at this size)
    sh = {int(d): textfns.word_shingles(t) for d, t in zip(corpus["doc_id"], corpus["text"])}
    expect = [
        (a, b)
        for a in sh
        for b in sh
        if a < b and textfns.jaccard(sh[a], sh[b]) >= 0.3
    ]
    # twin output must be a subset of true pairs (LSH recall) and must
    # contain the planted heavy-overlap pair
    got_pairs = set(map(tuple, got.itertuples(index=False)))
    assert got_pairs <= set(expect)
    assert (0, 1) in got_pairs


def test_minhash_signature_parity(twins, corpus):
    """The twin's affine minhash must equal textfns.minhash_signature
    hash-for-hash (not just pair-level agreement)."""
    import numpy as np
    import zlib

    from html_parser_ray.functions import textfns

    text = corpus["text"][0]
    sh = textfns.word_shingles(text)
    ours = textfns.minhash_signature(sh, num_hashes=128).astype(np.uint64)
    rng = np.random.RandomState(1)
    a = rng.randint(1, 2**31 - 1, size=128).astype(np.uint64)
    b = rng.randint(0, 2**31 - 1, size=128).astype(np.uint64)
    base = np.fromiter(
        (zlib.crc32(s.encode()) & 0xFFFFFFFF for s in sh),
        dtype=np.uint64,
        count=len(sh),
    )
    theirs = ((a[:, None] * base[None, :] + b[:, None]) % np.uint64(4294967311)).min(axis=1)
    assert (ours == theirs).all()


def test_simhash_twin_matches_pipeline_functions(twins, corpus):
    from html_parser_ray.functions import textfns

    got = twins.simhash_pairs(corpus, max_hamming=10)
    sigs = {int(d): textfns.simhash64(t) for d, t in zip(corpus["doc_id"], corpus["text"])}
    # every reported pair must satisfy the pipeline's own hamming rule
    for a, b in got.itertuples(index=False):
        assert textfns.hamming64(sigs[a], sigs[b]) <= 10
    assert (0, 1) in set(map(tuple, got.itertuples(index=False)))


def test_hll_twin_matches_pipeline(twins):
    from html_parser_ray.functions.sketches import hll_build, hll_estimate

    ev = pd.DataFrame(
        {"event_type": ["a"] * 300 + ["b"] * 100,
         "user_id": list(range(150)) * 2 + list(range(50)) * 2}
    )
    got = twins.hll_estimate_users(ev).set_index("event_type")
    assert got.loc["a", "approx_users"] == hll_estimate(hll_build(range(150)))
    assert got.loc["b", "approx_users"] == hll_estimate(hll_build(range(50)))


def test_cms_merge_linearity_and_bounds():
    """CMS partials are LINEAR: sum-of-batch-sketches equals the sketch of
    total counts (why the distributed merge is order-free), and estimates
    never undercount."""
    import numpy as np

    from html_parser_ray.functions import sketches as s

    rng = np.random.RandomState(2)
    terms = [f"term-{i}" for i in range(300)]
    counts_a = {t: int(rng.randint(1, 50)) for t in terms[:200]}
    counts_b = {t: int(rng.randint(1, 50)) for t in terms[100:]}

    sk_a, sk_b, sk_all = s.cms_new(), s.cms_new(), s.cms_new()
    for t, c in counts_a.items():
        s.cms_add(sk_a, t, c)
    for t, c in counts_b.items():
        s.cms_add(sk_b, t, c)
    total = {t: counts_a.get(t, 0) + counts_b.get(t, 0) for t in terms}
    for t, c in total.items():
        s.cms_add(sk_all, t, c)
    assert (s.cms_merge(sk_a, sk_b) == sk_all).all()
    merged = s.cms_merge(sk_a, sk_b)
    for t in terms:
        assert s.cms_query(merged, t) >= total[t]


def test_cms_golden_matches_nonimporting_twin():
    """The committed golden regenerates byte-equal from the paper-spec twin
    (tools/independent_twins.py does not import html_parser_ray)."""
    import sys

    import pandas as pd
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/tools")
    import importlib

    tw = importlib.import_module("independent_twins")
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    twin = tw.cms_topk_estimates(docs)
    golden = pq.read_table("/root/repo/golden/ngram_topk_cms_sf001.parquet").to_pandas()
    pd.testing.assert_frame_equal(twin, golden)
