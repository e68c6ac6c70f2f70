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


# ---------------------------------------------------------------------------
# xplane wire decoder + prof_table roofline attribution (round-5 fixes:
# exact line-name matching and duration_ps -> ms). These encode a synthetic
# XSpace protobuf by hand so the decoder is pinned against the real wire
# format without needing a TPU trace.

def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(fnum, payload):
    """Length-delimited field (wire type 2)."""
    return _varint((fnum << 3) | 2) + _varint(len(payload)) + payload


def _vfield(fnum, value):
    """Varint field (wire type 0)."""
    return _varint(fnum << 3) + _varint(value)


def _xevent(mid, dur_ps):
    return _field(4, _vfield(1, mid) + _vfield(3, dur_ps))


def _xline(name, events):
    return _field(3, _field(2, name.encode()) + b"".join(events))


def _meta(mid, name):
    entry = _vfield(1, mid) + _field(2, _vfield(1, mid)
                                     + _field(2, name.encode()))
    return _field(4, entry)


def _xplane(name, lines, metas):
    return _field(1, _field(2, name.encode()) + b"".join(metas)
                  + b"".join(lines))


def _synthetic_xspace():
    """One TPU plane: 'XLA Ops' has op events (fusion.1 twice, copy.2 once);
    'XLA Modules' encloses them; 'Async XLA Ops' overlaps them. The decoder
    must not mix the three."""
    metas = [_meta(1, "fusion.1"), _meta(2, "copy.2"),
             _meta(3, "jit_main"), _meta(4, "async-copy")]
    ops = _xline("XLA Ops", [_xevent(1, 2_000_000_000),   # 2 ms
                             _xevent(1, 4_000_000_000),   # 4 ms
                             _xevent(2, 1_000_000_000)])  # 1 ms
    mods = _xline("XLA Modules", [_xevent(3, 7_000_000_000)])
    asyn = _xline("Async XLA Ops", [_xevent(4, 50_000_000_000)])
    return _xplane("/device:TPU:0", [mods, ops, asyn], metas)


def test_xplane_exact_line_selection(tmp_path):
    """line_name='XLA Ops' must take ONLY that line — 'Async XLA Ops'
    contains the substring and previously polluted the roofline totals."""
    from xplane import load_xspace_planes, plane_op_times

    pb = tmp_path / "t.xplane.pb"
    pb.write_bytes(_synthetic_xspace())
    planes = load_xspace_planes(str(pb))
    assert len(planes) == 1
    name, ops = plane_op_times(planes[0], line_name="XLA Ops")
    assert name == "/device:TPU:0"
    assert ops == {"fusion.1": (6_000_000_000, 2),
                   "copy.2": (1_000_000_000, 1)}
    # without a line filter every line is summed (legacy behavior)
    _, all_ops = plane_op_times(planes[0])
    assert all_ops["jit_main"] == (7_000_000_000, 1)
    assert all_ops["async-copy"] == (50_000_000_000, 1)


def test_prof_table_ms_and_roofline(tmp_path, capsys, monkeypatch):
    """End-to-end prof_table on the synthetic trace + a matching HLO:
    ms/exec must be duration_ps/1e9/count (the first cut divided by 1e6)
    and the conv op must get bytes/MACs attributed from the def table."""
    import prof_table

    pb = tmp_path / "t.xplane.pb"
    pb.write_bytes(_synthetic_xspace())
    hlo = tmp_path / "hlo.txt"
    hlo.write_text(
        "ENTRY %main {\n"
        "  %p0 = bf16[1,8,8,4]{3,2,1,0} parameter(0)\n"
        "  %k0 = bf16[3,3,4,8]{3,2,1,0} parameter(1)\n"
        "  %fusion.1 = bf16[1,8,8,8]{3,2,1,0} convolution(%p0, %k0),"
        " dim_labels=b01f_01io->b01f\n"
        "  %copy.2 = bf16[1,8,8,8]{3,2,1,0} copy(%fusion.1)\n"
        "}\n")
    monkeypatch.setattr(sys, "argv",
                        ["prof_table", "--trace", str(pb),
                         "--hlo", str(hlo), "--top", "2"])
    prof_table.main()
    out = capsys.readouterr().out
    assert "line 'XLA Ops'" in out
    assert "total device time 7.0 ms" in out  # 6 + 1, ops line only
    lines = [l for l in out.splitlines() if l.startswith("fusion.1")]
    assert len(lines) == 1
    # 6e9 ps over 2 execs -> 3.00 ms/exec
    assert " 3.00 ms" in lines[0]
    # MACs: out 1*8*8*8 elems * 3*3 taps * ci 4 = 18432
    macs = 2 * 18432 / (3.0e-3) / 1e12  # TFLOP/s at 3 ms
    assert f"{macs:6.1f} TF" in lines[0]


@pytest.mark.slow
def test_bench_quant_ab_smoke():
    """The interleaved bf16-vs-int8 A/B protocol runs end to end on tiny
    shapes: every mode gets built, warmed, and timed round-robin, and the
    record carries the frozen form policy the measurement is attributable
    to (ADVICE r4: measurements must record their int8 form)."""
    import bench_quant_ab

    out = bench_quant_ab.main(
        ["--batch", "2", "--iters", "1", "--repeat", "2",
         "--max-res-log2", "5", "--warmup", "1", "--modes", "bf16,int8"])
    assert set(out["modes"]) == {"bf16", "int8"}
    for rec in out["modes"].values():
        assert rec["median"] > 0
        assert rec["captures"]["repeat"] == 2
    assert out["int8_form"] in ("im2col", "conv")
    assert out["metric"] == "quant_ab_32px"
