"""Single-core perf regression tripwire (the in-suite half of the bench gate).

``python bench.py --gate`` is the full distributed gate (mirrors the
reference's stable-profile hard fail, tools/scripts.zig:1433-1448). This test
is its cheap pytest twin: serial extraction of the seeded 2k-doc corpus must
clear a floor set ~3x below the measured median (7.7k docs/s at round 2) so
host-load noise cannot flake the suite while a real regression (e.g. a
quadratic slip in the tokenizer) still fails the build.
"""

from __future__ import annotations

import time

import pyarrow as pa

FLOOR_DOCS_PER_S = 2500.0


def test_single_core_extraction_floor():
    from html_parser_ray.extract.extractor import SpanExtractor
    from html_parser_ray.sources.corpus import generate_documents

    tbl = generate_documents(2000, seed=42)
    spans_col = tbl.column("spans").combine_chunks()
    flat = spans_col.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").cast(pa.binary()).to_pylist()
    media = flat.field("media_ref").to_pylist()
    offs = spans_col.offsets.to_pylist()

    ex = SpanExtractor()

    def run():
        for ri in range(len(offs) - 1):
            lo, hi = offs[ri], offs[ri + 1]
            ex.extract_columns(kinds[lo:hi], texts[lo:hi], media[lo:hi])

    run()  # warm (memo, allocator)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    docs_per_s = 2000 / best
    assert docs_per_s >= FLOOR_DOCS_PER_S, (
        f"single-core extraction regressed: {docs_per_s:.0f} docs/s "
        f"< floor {FLOOR_DOCS_PER_S}"
    )
    # with the native C path active the bar is much higher (measured ~27k;
    # floor at ~1/3). Python-only environments (no compiler) skip this part.
    from html_parser_ray.native import get_native_extractor

    if get_native_extractor() is not None:
        assert docs_per_s >= 9_000, (
            f"native extraction regressed: {docs_per_s:.0f} docs/s < 9000"
        )


def test_calibration_probe_holds_pin_floor():
    """VERDICT r4 item 4 / ADVICE (medium): the bench gate divides by the
    probe, so a native-kernel regression cancels out of the calibrated
    number — the probe itself must therefore be pinned. Wide tolerance:
    the committed quiet-window pin is 105k docs/s and the worst host-load
    probe ever observed was 0.61x of it (BASELINE.md round-4 drift band);
    the floor at 0.2x means only a >=3x kernel regression (or apocalyptic
    load) trips — and a kernel regression is exactly what must not pass
    silently."""
    from bench import _PINNED_CAL_REF, run_calibration_probe
    from html_parser_ray.native import get_native_extractor

    import pytest

    if get_native_extractor() is None:
        pytest.skip("no native kernel on this host — probe not applicable")
    probe = run_calibration_probe(min_seconds=0.3)
    assert probe >= 0.2 * _PINNED_CAL_REF, (
        f"calibration probe {probe:.0f} docs/s fell below 20% of the pinned "
        f"quiet-window reference {_PINNED_CAL_REF:.0f} — native kernel "
        "regression (the gate's ratio would hide this; see bench.py "
        "GATE_PROBE_FLOOR_FRACTION)"
    )
