#!/usr/bin/env python3
"""Minimal XSpace (xplane.pb) reader: per-op device-time aggregation.

`jax.profiler.trace` works on the axon backend and writes
``plugins/profile/<ts>/*.xplane.pb``, but no xplane proto is installed in
this image. This is a dependency-free protobuf wire-format decoder for the
subset of tensorflow/core/profiler/protobuf/xplane.proto we need:

  XSpace.planes[]           field 1
  XPlane.name               field 2
  XPlane.lines[]            field 3
  XPlane.event_metadata{}   field 4 (map<int64, XEventMetadata>)
  XLine.name                field 2, XLine.events[] field 4
  XEvent.metadata_id        field 1, XEvent.duration_ps field 3
  XEventMetadata.id/name    fields 1/2 (display_name field 4)

Usage:
  python tools/xplane.py <trace_dir_or_pb> [--top N] [--plane SUBSTR]

Aggregates total duration per event name on planes whose name matches
--plane (default: 'TPU', falling back to the busiest plane).
"""

import struct
import sys
from collections import defaultdict


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) for one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fnum, _, val in fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3:
            lines.append(val)
        elif fnum == 4:  # map entry {1: key, 2: XEventMetadata}
            mid, mname = None, ""
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 2 and not mname:
                            mname = v3.decode("utf-8", "replace")
                        elif f3 == 4 and v3:
                            mname = v3.decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
    return name, lines, meta


def plane_op_times(plane_buf, line_name=None):
    """-> (plane_name, {op_name: (total_ps, count)}).

    ``line_name``: aggregate only lines with EXACTLY this name (e.g.
    ``"XLA Ops"`` for per-op self-times on a TPU device plane — substring
    matching would also catch ``"Async XLA Ops"``, whose DMA windows
    overlap compute). Without it, ALL lines are summed — which double
    counts on device planes ("XLA Modules" events enclose the "XLA Ops"
    events), so pass it whenever the numbers feed a roofline.
    """
    name, lines, meta = parse_plane(plane_buf)
    agg = defaultdict(lambda: [0, 0])
    for line_buf in lines:
        lname = ""
        for fnum, _, val in fields(line_buf):
            if fnum == 2:
                lname = val.decode("utf-8", "replace")
        if line_name is not None and lname != line_name:
            continue
        for fnum, _, val in fields(line_buf):
            if fnum != 4:
                continue
            mid = dur = 0
            for f2, wt2, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            op = meta.get(mid, f"<id {mid}>")
            agg[op][0] += dur
            agg[op][1] += 1
    return name, {k: tuple(v) for k, v in agg.items()}


def resolve_trace_path(path):
    """A trace dir (as written by ``jax.profiler.trace``) resolves to its
    newest ``*.xplane.pb``; a file path passes through."""
    import glob
    from os.path import isdir, join

    if isdir(path):
        cands = sorted(glob.glob(join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        assert cands, f"no *.xplane.pb under {path}"
        return cands[-1]
    return path


def load_xspace_planes(path):
    buf = open(path, "rb").read()
    return [val for fnum, _, val in fields(buf) if fnum == 1]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--line", default="XLA Ops",
                    help="exact line name to aggregate (per-op self-times; "
                         "'XLA Modules' encloses these and 'Async XLA Ops' "
                         "overlaps them, so summing all lines double "
                         "counts). Pass '' to sum every line; planes "
                         "without the named line fall back to all lines")
    args = ap.parse_args()

    path = resolve_trace_path(args.path)
    print(f"# {path}")

    line = args.line or None
    best = None
    for plane_buf in load_xspace_planes(path):
        name, ops = plane_op_times(plane_buf, line_name=line)
        label = line
        if line is not None and not ops:  # plane without that line
            name, ops = plane_op_times(plane_buf)
            label = None
        total = sum(t for t, _ in ops.values())
        if args.plane.lower() in name.lower() and total:
            best = (name, label, ops, total)
            break
        if total and (best is None or total > best[3]):
            best = (name, label, ops, total)
    assert best, "no events found"
    name, label, ops, total = best
    print(f"# plane: {name}   line: {label or '<all>'}   "
          f"total {total / 1e9:.3f} ms")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])[:args.top]
    for op, (ps, cnt) in rows:
        print(f"{ps / 1e9:9.3f} ms  x{cnt:<5d} {100 * ps / total:5.1f}%  {op}")


if __name__ == "__main__":
    main()
