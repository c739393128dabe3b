"""Sharded layout-decode cache (stages/layout_cache.py): parity with local
decode, the decodes-equal-distinct-refs invariant, fallback on dead shards,
and deterministic shard routing."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


def _corpus(tmp_path, n=400):
    from html_parser_ray.sources.corpus import write_corpus_parquet

    path = str(tmp_path / "corpus")
    write_corpus_parquet(path, n, seed=7, rows_per_file=100)
    return path


def _run(path, shards):
    import ray.data

    from html_parser_ray.pipelines.extraction import build_extraction_pipeline

    ds = ray.data.read_parquet(path, override_num_blocks=4)
    kwargs = {"layout_cache_shards": shards} if shards else None
    out = build_extraction_pipeline(ds, concurrency=2, extractor_kwargs=kwargs)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_shared_cache_parity_and_single_decode(tmp_path):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray

    from html_parser_ray.stages.layout_cache import create_layout_cache

    path = _corpus(tmp_path)
    baseline = _run(path, None)
    shards = create_layout_cache(3)
    cached = _run(path, shards)
    # the layout JSON is a pure function of the ref: byte-identical output
    assert baseline.equals(cached)

    # decodes-equal-distinct-refs invariant (the whole point: once
    # cluster-wide, not once per extract actor)
    tbl = pads.dataset(path, format="parquet").to_table(columns=["spans"])
    flat = tbl.column("spans").combine_chunks().flatten()
    refs = pc.filter(flat.field("media_ref"), pc.equal(flat.field("kind"), "media"))
    distinct = len(pc.unique(refs))
    stats = [ray.get(s.stats.remote()) for s in shards]
    assert sum(s["decodes"] for s in stats) == distinct
    assert sum(s["size"] for s in stats) == distinct
    for s in shards:
        ray.kill(s)


@pytest.mark.usefixtures("ray_session")
def test_dead_shards_fall_back_to_local_decode(tmp_path):
    import ray

    from html_parser_ray.stages.layout_cache import create_layout_cache

    path = _corpus(tmp_path, n=200)
    baseline = _run(path, None)
    shards = create_layout_cache(2)
    for s in shards:
        ray.kill(s)
    # extract actors must survive the dead handles: first RPC raises, the
    # actor flips to local decode, output stays identical
    cached = _run(path, shards)
    assert baseline.equals(cached)


def test_shard_routing_deterministic():
    from html_parser_ray.stages.layout_cache import shard_of

    refs = [f"media://pdf/{i:06d}" for i in range(500)] + ["", "x"]
    for k in (1, 2, 3, 8):
        a = [shard_of(r, k) for r in refs]
        b = [shard_of(r, k) for r in refs]
        assert a == b
        assert all(0 <= s < k for s in a)
    # spread: no shard owns everything for k >= 2
    counts = [0, 0]
    for r in refs:
        counts[shard_of(r, 2)] += 1
    assert min(counts) > 0
