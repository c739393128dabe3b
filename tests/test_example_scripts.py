"""Pipeline example scripts must run (analog of the reference's
examples-check step, ref: build.zig:56,81-82 over examples/*.zig)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from examples import (
    curation_pipeline,
    joins_and_sampling,
    profiling_and_skew,
    streaming_and_packing,
    warc_ingest,
    dedup_pipeline,
    extraction_pipeline,
    hygiene_pipeline,
    media_features,
    resumable_job,
    similarity_search,
    windows_and_setops,
)

SCRIPTS = [
    extraction_pipeline,
    warc_ingest,
    dedup_pipeline,
    similarity_search,
    media_features,
    resumable_job,
    curation_pipeline,
    hygiene_pipeline,
    streaming_and_packing,
    profiling_and_skew,
    windows_and_setops,
    joins_and_sampling,
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mod", SCRIPTS, ids=lambda m: m.__name__.split(".")[-1])
def test_example_script_runs(mod):
    mod.run(smoke=True)
