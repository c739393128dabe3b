"""CLI end-to-end smoke (the ray job submit entry path) in a subprocess with
its own Ray session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_generate_and_extract(tmp_path):
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")

    gen = subprocess.run(
        [sys.executable, "-m", "html_parser_ray.cli", "generate-corpus",
         "--output", corpus, "--num-docs", "40"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]
    assert json.loads(gen.stdout.splitlines()[-1])["written"] == 40

    ext = subprocess.run(
        [sys.executable, "-m", "html_parser_ray.cli", "extract",
         "--input", corpus, "--output", out,
         "--num-partitions", "4", "--wave-size", "4", "--batch-size", "16"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert ext.returncode == 0, ext.stderr[-2000:]
    summary = json.loads(ext.stdout.splitlines()[-1])
    assert summary["rows"] == 40
    assert summary["partitions_done"] == 4
    assert os.path.isdir(os.path.join(out, "_manifest"))


@pytest.mark.slow
def test_cli_verify(tmp_path):
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    corpus = str(tmp_path / "c")
    out = str(tmp_path / "o")
    for args in (
        ["generate-corpus", "--output", corpus, "--num-docs", "20"],
        ["extract", "--input", corpus, "--output", out,
         "--num-partitions", "2", "--wave-size", "2", "--batch-size", "8"],
        ["verify", "--input", corpus, "--output", out, "--sample-docs", "10"],
    ):
        p = subprocess.run(
            [sys.executable, "-m", "html_parser_ray.cli", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert p.returncode == 0, (args[0], p.stderr[-1500:])
    assert json.loads(p.stdout.splitlines()[-1]) == {"checked": 10, "mismatches": 0}


def test_cli_conformance(tmp_path):
    """`conformance` subcommand runs the .dat suites and writes a report
    (the reference's `zig build conformance` analog)."""
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    report = str(tmp_path / "report.json")
    p = subprocess.run(
        [sys.executable, "-m", "html_parser_ray.cli", "conformance",
         "--report", report],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert p.returncode == 0, p.stderr[-1500:]
    summary = json.loads(p.stdout.splitlines()[-1])
    assert summary["passed"] >= 575 and summary["total"] >= 660
    rep = json.loads(open(report).read())
    assert {"tree_construction.dat", "whatwg_extra.dat",
            "html5lib_reconstructed3.dat", "wpt_reconstructed3.dat"} <= set(
        rep["suites"]
    )
    for s in rep["suites"].values():
        assert s["failures"]  # honest failures recorded with expected/actual
