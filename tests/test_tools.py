"""Tooling smoke tests: the retune sweep harness must run a miniature
sweep in-suite so first contact with real silicon is one command."""

import sys

import pytest
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_bench_multiscale_eval_smoke():
    """The batched-eval bench tool runs its full sweep on tiny shapes and
    emits one valid record per batch size."""
    import bench_multiscale_eval

    results = bench_multiscale_eval.main(
        ["--batches", "1,2", "--images", "2", "--res", "64",
         "--base-size", "48", "--crop-size", "32"])
    assert [r["batch"] for r in results] == [1, 2]
    assert all(r["img_per_sec"] > 0 and r["images"] == 2 for r in results)


@pytest.mark.slow
def test_retune_quick_sweep(capsys):
    """--quick smokes the sweep harness: both s2d tail depths, the s2d-off
    baseline, and the int8 quant config (4 programs at res 32). int8-full
    is excluded from --quick on purpose — its XLA CPU compile costs minutes
    and is already exercised by test_quant_int8_full_pipeline + the export
    bundle roundtrip; the full sweep (no --quick) still includes it."""
    import retune

    results = retune.main(["--quick"])
    ok = [r for r in results if r["ok"]]
    assert len(results) == 4 and len(ok) == 4, results
    assert all(r["samples_per_sec"] > 0 for r in ok)
    assert sorted(r["n_block_stages"] for r in results
                  if r["s2d"] and not r["quant"]) == [2, 3]
    assert sum(not r["s2d"] for r in results) == 1
    assert sum(r["quant"] == "int8" for r in results) == 1
    out = capsys.readouterr().out
    assert "samples/sec/chip" in out and "| batch |" in out
    # every emitted line before the table is valid JSON
    import json
    json_lines = [l for l in out.splitlines() if l.startswith("{")]
    assert len(json_lines) == 4
    for l in json_lines:
        json.loads(l)
