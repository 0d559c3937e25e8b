"""Headline-performance regression gate.

Compares the most recent TPU run of benchmarks/bench_all.py
(benchmarks/results.json) against the committed floors in
benchmarks/expected_floor.json; a >10% slide below a floor fails.  Skipped
when results.json is missing or was produced on a non-TPU backend (CPU CI
runs don't gate perf).
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "..", "benchmarks", "results.json")
FLOORS = os.path.join(HERE, "..", "benchmarks", "expected_floor.json")


def test_headline_perf_floor():
    if not (os.path.exists(RESULTS) and os.path.exists(FLOORS)):
        pytest.skip("no benchmark results to gate")
    with open(RESULTS) as f:
        results = json.load(f)
    if results.get("backend") != "tpu":
        pytest.skip("results.json not from a TPU run")
    with open(FLOORS) as f:
        floors = json.load(f)
    failures = []
    for key, floor in floors.items():
        if key.endswith("_max"):  # latency ceilings: lower is better
            got = results.get(key[: -len("_max")])
            if got is None:
                failures.append(f"{key}: missing from results.json")
            elif got > floor:
                failures.append(f"{key}: {got} > ceiling {floor}")
            continue
        got = results.get(key)
        if got is None:
            failures.append(f"{key}: missing from results.json")
        elif got < floor:
            failures.append(f"{key}: {got} < floor {floor}")
    assert not failures, "performance regression: " + "; ".join(failures)
