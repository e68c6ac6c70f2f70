#!/usr/bin/env python3
"""Per-op roofline attribution for the fused bench program (VERDICT r4 #3).

Joins an xplane device-time profile (read with the tools/xplane.py
wire-format decoder) against the program's optimized HLO text
(tools/dump_hlo.py) and emits, for each of the top-N device-time ops:

  - device time per execution (the trace divided by its execution count),
  - result + operand bytes (shapes resolved through a whole-module def
    table, including fusion operands),
  - conv MACs where the op is, or fuses, convolutions (kernel shapes
    resolved through the fused computation bodies),
  - achieved GB/s and TFLOP/s, and the fraction of the measured chip
    envelope they reach.

The default envelope is BASELINE.md's round-1 measured one (~157 GB/s
stream, ~39.6 TFLOP/s bf16 matmul probe) — but the round-5 profile
showed real fused kernels sustaining 535-685 GB/s and up to ~190 TF/s,
i.e. those micro-probes were dispatch-bound and UNDERSTATE the chip.
For per-op roofline judgments pass the nominal v5e envelope instead:
``--bw-gbs 819 --tf-probe 197`` (the flags BASELINE.md's published
table used). TF is naive dense-MAC arithmetic over time; >100% means
the emitter algebraically beats dense MACs (e.g. subpixel deconv).

Usage:
  B=128 S2D=1 NBLK=3 python tools/prof_fused.py          # writes trace
  B=128 S2D=1 NBLK=3 OUT=/tmp/fused_hlo.txt python tools/dump_hlo.py
  python tools/prof_table.py --trace /tmp/fused_trace \
      --hlo /tmp/fused_hlo.txt --top 10 [--md]
"""

import argparse
import re
import sys
from os.path import dirname

sys.path.insert(0, dirname(__file__))

from xplane import (load_xspace_planes, plane_op_times,
                    resolve_trace_path)  # noqa: E402

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"\b(pred|[sfu]\d+|bf16)\[([0-9,]*)\]")
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(.*)$")


def shape_bytes(text):
    """Sum the byte sizes of every `dtype[dims]` shape literal in ``text``
    (a tuple shape contributes each element)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_defs(hlo_text):
    """-> {op_name: (def_text, opkind)} for every definition line."""
    defs = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        # opkind = first bare word after the shape(s)
        k = re.search(r"\}?\s*([a-z][\w-]*)\(", rhs)
        defs[name] = (rhs, k.group(1) if k else "")
    return defs


def operand_names(rhs):
    """Operand %refs of a def line (top-level call parens only)."""
    m = re.search(r"\((.*)\)", rhs)
    if not m:
        return []
    return re.findall(r"%([\w.-]+)", m.group(1))


def conv_macs(rhs, defs):
    """MACs of one `convolution` def line: out_elems * kh*kw*ci, with the
    kernel shape resolved from operand 1. Supports the b01f_01io->b01f
    labeling every op in this package lowers to (NHWC/HWIO)."""
    shapes = _SHAPE_RE.findall(rhs.split("convolution(")[0])
    if not shapes:
        return 0
    out_elems = 1
    for d in shapes[0][1].split(","):
        if d:
            out_elems *= int(d)
    ops = operand_names(rhs)
    if len(ops) < 2 or ops[1] not in defs:
        return 0
    kshapes = _SHAPE_RE.findall(defs[ops[1]][0])
    if not kshapes:
        return 0
    kdims = [int(d) for d in kshapes[0][1].split(",") if d]
    if len(kdims) != 4:
        return 0
    m = re.search(r"dim_labels=\w*_(\w+)->", rhs)
    labels = m.group(1) if m else "01io"
    ci = kdims[labels.index("i")]
    taps = 1
    for idx, ch in enumerate(labels):
        if ch in "01":
            taps *= kdims[idx]
    return out_elems * taps * ci


def fused_bodies(hlo_text):
    """-> {computation_name: body_text} for every %fused_computation /
    named computation block."""
    bodies = {}
    cur, buf = None, []
    for line in hlo_text.splitlines():
        m = re.match(r"^\s*%?([\w.-]+)\s+\(.*\)\s*->\s*.*\{\s*$", line)
        if m:
            cur, buf = m.group(1), []
            continue
        if cur is not None:
            if line.strip().startswith("}"):
                bodies[cur] = "\n".join(buf)
                cur = None
            else:
                buf.append(line)
    return bodies


def op_stats(name, defs, bodies):
    """-> (bytes_moved, macs, kind) for one profiled op name."""
    if name not in defs:
        return 0, 0, "?"
    rhs, kind = defs[name]
    # bytes: result shape(s) + every operand's result shape
    total = shape_bytes(rhs.split(kind + "(")[0] if kind else rhs)
    for op in operand_names(rhs):
        if op in defs:
            od = defs[op][0]
            ok = defs[op][1]
            total += shape_bytes(od.split(ok + "(")[0] if ok else od)
    macs = 0
    if kind == "convolution":
        macs = conv_macs(rhs, defs)
    m = re.search(r"calls=%?([\w.-]+)", rhs)
    if m and m.group(1) in bodies:
        body = bodies[m.group(1)]
        bdefs = parse_defs(body)
        for bname, (brhs, bkind) in bdefs.items():
            if bkind == "convolution":
                macs += conv_macs(brhs, bdefs)
        if macs:
            kind += "+conv"
    return total, macs, kind


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", required=True)
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--line", default="XLA Ops",
                    help="plane line to read (per-op self-times); module "
                         "and Async-DMA lines enclose/overlap these and "
                         "must not be summed into a roofline")
    ap.add_argument("--bw-gbs", type=float, default=157.0,
                    help="measured stream bandwidth (BASELINE envelope)")
    ap.add_argument("--tf-probe", type=float, default=39.6,
                    help="measured bf16 dense-matmul probe TFLOP/s")
    ap.add_argument("--md", action="store_true",
                    help="emit a markdown table (for BASELINE.md)")
    args = ap.parse_args()

    path = resolve_trace_path(args.trace)
    hlo_text = open(args.hlo).read()
    defs = parse_defs(hlo_text)
    bodies = fused_bodies(hlo_text)

    best = None
    for plane_buf in load_xspace_planes(path):
        name, ops = plane_op_times(plane_buf, line_name=args.line)
        total = sum(t for t, _ in ops.values())
        if args.plane.lower() in name.lower() and total:
            best = (name, ops, total)
            break
        if total and (best is None or total > best[2]):
            best = (name, ops, total)
    assert best, "no busy plane found"
    pname, ops, total_ps = best

    rows = []
    for op, (ps, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0]):
        ms = ps / 1e9 / max(cnt, 1)  # duration_ps -> ms, per execution
        nbytes, macs, kind = op_stats(op, defs, bodies)
        gbs = nbytes / (ms / 1e3) / 1e9 if ms else 0.0
        tf = 2 * macs / (ms / 1e3) / 1e12 if ms else 0.0
        rows.append((op, kind, ms, 100.0 * ps / total_ps, nbytes, gbs,
                     macs, tf))
        if len(rows) >= args.top:
            break

    print(f"# plane: {pname}; line {args.line!r}; total device time "
          f"{total_ps / 1e9:.1f} ms across events")
    if args.md:
        print("| op | kind | ms/exec | % dev | GB/s (% bw) | "
              "TFLOP/s (% probe) | verdict |")
        print("|---|---|---|---|---|---|---|")
    for op, kind, ms, pct, nbytes, gbs, macs, tf in rows:
        bw_pct = 100.0 * gbs / args.bw_gbs
        tf_pct = 100.0 * tf / args.tf_probe
        verdict = ("compute" if tf_pct >= 50 else
                   "bandwidth" if bw_pct >= 50 else "underutilized")
        if args.md:
            print(f"| `{op}` | {kind} | {ms:.2f} | {pct:.1f}% | "
                  f"{gbs:.0f} ({bw_pct:.0f}%) | "
                  f"{tf:.1f} ({tf_pct:.0f}%) | {verdict} |")
        else:
            print(f"{op:40s} {kind:12s} {ms:8.2f} ms {pct:5.1f}%  "
                  f"{gbs:7.0f} GB/s ({bw_pct:3.0f}%)  "
                  f"{tf:6.1f} TF ({tf_pct:3.0f}%)  {verdict}")


if __name__ == "__main__":
    main()
