"""Aggregate a jax.profiler Chrome trace (vm.trace.json.gz) into per-op totals.

Usage: python scripts/trace_summary.py [trace.json.gz] [n_steps]
Prints ops grouped by a coarse component bucket and the top-N individual ops,
durations in ms per step (total / n_steps).
"""

import gzip
import json
import re
import sys
from collections import defaultdict


def bucket(name: str) -> str:
    n = name.lower()
    if "flash" in n or ("custom-call" in n and "attention" in n):
        return "pallas:attention"
    if "ffn_act" in n:
        return "pallas:ffn_act"
    if "resid_" in n:
        return "pallas:resid"
    if "prng_dropout" in n:
        return "pallas:dropout"
    if "bf_fwd" in n or "bf_grad" in n:
        return "pallas:beamformer"
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas:other"
    if "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "transpose" in n or "copy" in n or "reshape" in n or "bitcast" in n:
        return "layout"
    if "reduce" in n or "norm" in n:
        return "reduce/norm"
    if "fusion" in n:
        return "fusion(elementwise)"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "transfer"
    return "other"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else None
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if path is None:
        import glob

        cands = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
        path = cands[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # Find TPU/device process ids (XLA ops live on pids whose name mentions TPU or device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"tpu|device|/device|xla", n, re.I)
                and not re.search(r"host", n, re.I)}

    # Only the "XLA Ops" lane holds leaf ops; "Steps"/"XLA Modules" are umbrella spans.
    tid_names = {}
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") in dev_pids):
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lanes = {k for k, n in tid_names.items() if "ops" in n.lower()} or None

    per_op = defaultdict(float)
    per_bucket = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_lanes is not None and (e["pid"], e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        per_op[name] += dur
        per_bucket[bucket(name)] += dur
        total += dur

    print(f"# trace: {path}")
    print(f"# device pids: { {p: pid_names[p] for p in dev_pids} }")
    print(f"# total device time: {total / steps:.2f} ms/step over {steps} steps\n")
    print("== by bucket (ms/step) ==")
    for b, d in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{d / steps:9.3f}  {b}")
    print("\n== top 40 ops (ms/step) ==")
    for n, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d / steps:9.3f}  {n[:140]}")


if __name__ == "__main__":
    main()
