"""Example-parity tests: every example runs (analog of the reference's
examples-check build step, ref: tools/tests/examples_tests.zig)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from examples.basic_usage import EXAMPLES


@pytest.mark.parametrize("fn", EXAMPLES, ids=lambda f: f.__name__)
def test_example_runs(fn):
    fn()
