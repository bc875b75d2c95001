"""Docs-vs-code consistency: COVERAGE.md must mention every declared
query, and bench.py's headline set must reference real queries. Keeps
the parity map honest as the inventory grows."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_mentions_every_query():
    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    missing = sorted(n for n in entrymod.queries() if n not in cov)
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_bench_headline_names_are_real():
    import bench
    qs = entrymod.queries()
    unknown = sorted(n for n in bench.HEADLINE if n not in qs)
    assert not unknown, f"bench names not in queries(): {unknown}"
