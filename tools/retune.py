#!/usr/bin/env python3
"""Re-tune harness for first contact with new silicon (VERDICT r2 #9).

The shipped tuning (batch 128, s2d tail depth 3, Pallas-vs-XLA verdicts in
`experiments/pallas_archive/`) is specific to the axon-virtualized v5e this repo was built
against (~10-20% of nominal; BASELINE.md "measured envelope"). On real
hardware, run this once: it sweeps batch x s2d-tail-depth x s2d-on/off over
the fused z->(image,mask) pipeline and emits both JSON lines and the
BASELINE.md table block, so re-tuning is one command.

    python tools/retune.py                     # full sweep at 1024^2
    python tools/retune.py --quick             # miniature smoke sweep (res 32)
    python tools/retune.py --batches 32,64,128 --tails 2,3,4 --iters 4

Each configuration that fails to compile (e.g. the remote compile helper's
batch ceiling) is recorded as {"ok": false} and the sweep continues.
"""

import argparse
import json
import sys
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))


def sweep(batches, tails, max_res_log2, iters, include_no_s2d=True,
          quant_kinds=("int8", "int8-full"), out=sys.stdout):
    from bench import measure

    results = []
    configs = [(b, t, True, None) for b in batches for t in tails]
    if include_no_s2d:
        configs += [(b, 0, False, None) for b in batches]
    if quant_kinds:
        # int8 decoder tail and full (generator too) int8 (ops/quant.py) at
        # the default tail depth: lets first contact with real silicon
        # answer whether its int8 conv emitter beats bf16 (2x nominal on
        # the MXU) in one sweep
        configs += [(b, 3, True, q) for b in batches for q in quant_kinds]
    for batch, tail, s2d, quant in configs:
        rec = {"batch": batch, "s2d": s2d,
               "n_block_stages": tail if s2d else None,
               "quant": quant, "max_res_log2": max_res_log2}
        try:
            rates, n_chips = measure(batch, iters, max_res_log2, s2d=s2d,
                                     n_block_stages=tail if s2d else 3,
                                     quant=quant)
            rec.update(ok=True,
                       samples_per_sec=round(rates[0] / n_chips, 2))
        except Exception as exc:  # compile ceiling, OOM, ...
            rec.update(ok=False, error=f"{type(exc).__name__}: {exc}"[:200])
        results.append(rec)
        print(json.dumps(rec), file=out, flush=True)
    return results


def baseline_table(results) -> str:
    """The BASELINE.md block: best config first, markdown table after."""
    ok = [r for r in results if r["ok"]]
    lines = ["| batch | s2d | tail | quant | samples/sec/chip |",
             "|---|---|---|---|---|"]
    for r in sorted(ok, key=lambda r: -r["samples_per_sec"]):
        lines.append(f"| {r['batch']} | {'yes' if r['s2d'] else 'no'} | "
                     f"{r['n_block_stages'] or '-'} | "
                     f"{r.get('quant') or 'bf16'} | "
                     f"{r['samples_per_sec']} |")
    for r in results:
        if not r["ok"]:
            lines.append(f"| {r['batch']} | {'yes' if r['s2d'] else 'no'} | "
                         f"{r['n_block_stages'] or '-'} | "
                         f"{r.get('quant') or 'bf16'} | FAILED |")
    if ok:
        best = max(ok, key=lambda r: r["samples_per_sec"])
        head = (f"Best: batch={best['batch']} s2d={best['s2d']} "
                f"tail={best['n_block_stages']} "
                f"quant={best.get('quant') or 'bf16'} -> "
                f"{best['samples_per_sec']} samples/sec/chip "
                f"@{2 ** best['max_res_log2']}px\n\n")
    else:
        head = "No configuration compiled.\n\n"
    return head + "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,96,128,160",
                    help="comma-separated batch sizes")
    ap.add_argument("--tails", default="2,3,4",
                    help="comma-separated s2d n_block_stages")
    ap.add_argument("--max-res-log2", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no-s2d-off", action="store_true",
                    help="skip the s2d=off baseline configs")
    ap.add_argument("--no-quant", action="store_true",
                    help="skip the int8-decoder configs")
    ap.add_argument("--quick", action="store_true",
                    help="miniature smoke sweep (res 32, batch 4)")
    a = ap.parse_args(argv)
    if a.quick:
        # Smoke the sweep HARNESS, not the configs: one batch, both tail
        # depths, the s2d-off baseline, and the int8 quant config — 4
        # distinct programs at res 32. int8-full is deliberately absent
        # from --quick: its fused program costs MINUTES of XLA CPU compile
        # (int8 conv codegen, measured ~5.5 min at res 32 on this host) and
        # its correctness is covered by test_quant_int8_full_pipeline and
        # the export bundle roundtrip; the full sweep (no --quick) keeps it.
        batches, tails, res, iters = [4], [2, 3], 5, 1
        quant_kinds = ("int8",)
    else:
        batches = [int(b) for b in a.batches.split(",")]
        tails = [int(t) for t in a.tails.split(",")]
        res, iters = a.max_res_log2, a.iters
        quant_kinds = () if a.no_quant else ("int8", "int8-full")
    results = sweep(batches, tails, res, iters,
                    include_no_s2d=not a.no_s2d_off,
                    quant_kinds=quant_kinds if not a.no_quant else ())
    print()
    print(baseline_table(results))
    return results


if __name__ == "__main__":
    main()
