"""Aggregate a jax.profiler device trace into the PERF.md anatomy tables.

Usage:
    python tools/analyze_trace.py /tmp/trace_pp [--iters 3] [--top 25]

Reads the chrome-trace json (``plugins/profile/<run>/*.trace.json.gz``)
written by ``tools/trace_model.py``, keeps the TensorCore op lanes, and
prints per-run (= per traced iteration) cost grouped two ways:

- by HLO category (fusion kinds, copies/data formatting, sort, conv, ...)
- by model source line (the ``source`` metadata XLA carries through from
  jaxprs), which is what names the buckets in PERF.md.

The reference's own profiling story is nvprof/nsys + the FPS harness
(tools/analysis_tools/benchmark.py); this is the TPU-native equivalent
over XLA's op-level trace.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(outdir: str) -> dict:
    pats = [
        os.path.join(outdir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(outdir, "*.trace.json.gz"),
    ]
    for pat in pats:
        hits = sorted(glob.glob(pat))
        if hits:
            with gzip.open(hits[-1], "rt") as f:
                return json.load(f)
    raise SystemExit(f"no *.trace.json.gz under {outdir}")


def device_pids(events) -> set:
    """pids of TPU device lanes (exclude host threads + steps/scopes)."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return {
        pid
        for pid, name in names.items()
        if re.search(r"TPU|/device:|TensorCore", name)
        and "host" not in name.lower()
    }


def lane_names(events) -> dict:
    out = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            out[(e["pid"], e["tid"])] = e["args"].get("name", "")
    return out


CATEGORY_PATTERNS = [
    (r"^(wide_param|param|copy(-done|-start)?|bitcast|transpose|reshape)", "data formatting"),
    (r"^fusion", None),  # decided by args kind below
    (r"^(custom-call|cublas|custom_call)", "custom-call"),
    (r"^sort", "sort"),
    (r"^(conditional|case)", "conditional"),
    (r"^while", "while"),
    (r"^(convolution|conv)", "convolution"),
    (r"^(all-reduce|all-gather|collective)", "collective"),
    (r"^(slice|dynamic-slice|dynamic_slice)", "slice"),
    (r"^concatenate", "concatenate"),
    (r"^(gather|scatter)", "gather/scatter"),
    (r"^(dot|cublas)", "dot"),
]


def categorize(name: str, args: dict) -> str:
    kind = (args or {}).get("fusion_kind") or ""
    low = name.lower()
    if low.startswith("fusion") or ".fusion" in low:
        if "input" in kind:
            return "input fusion (gathers/scatters)"
        if "output" in kind:
            return "output fusion (scatter)"
        if "loop" in kind or kind == "kLoop":
            return "loop fusion"
        return f"fusion:{kind}" if kind else "fusion"
    for pat, cat in CATEGORY_PATTERNS:
        if cat and re.match(pat, low):
            return cat
    return low.split(".")[0].split("(")[0][:24] or "other"


SRC_RE = re.compile(r"([\w./-]+\.py):(\d+)")


def source_of(args: dict) -> str:
    """Best-effort source file:line from the op metadata XLA propagates."""
    if not args:
        return ""
    for key in ("source_info", "source", "tf_op", "long_name", "hlo_module"):
        v = args.get(key)
        if isinstance(v, str):
            m = SRC_RE.search(v)
            if m:
                path = m.group(1)
                for anchor in ("deepinteraction_tpu/", "tools/", "flax/", "jax/"):
                    if anchor in path:
                        path = path[path.index(anchor):]
                        break
                return f"{path}:{m.group(2)}"
    return ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--iters", type=int, default=3, help="traced iterations (divides totals)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--ops", action="store_true", help="also print top individual ops")
    args = ap.parse_args()

    trace = load_trace(args.outdir)
    events = trace["traceEvents"]
    dev = device_pids(events)
    lanes = lane_names(events)

    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        lane = lanes.get((e["pid"], e["tid"]), "")
        # keep op lanes only; skip step/scope/overlay lanes
        if re.search(r"step|scope|XLA Modules|Framework", lane, re.I):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        ea = e.get("args") or {}
        total += dur
        by_cat[categorize(e.get("name", ""), ea)] += dur
        src = source_of(ea)
        if src:
            by_src[src] += dur
        by_op[e.get("name", "")] += dur
        n_by_op[e.get("name", "")] += 1

    it = max(args.iters, 1)
    print(f"device op time: {total:.1f} ms total, {total/it:.1f} ms/run ({it} runs)")
    print("\nby HLO category (ms/run):")
    for cat, ms in by_cat.most_common(args.top):
        print(f"  {ms/it:8.1f}  {cat}")
    print("\nby source line (ms/run):")
    for src, ms in by_src.most_common(args.top):
        print(f"  {ms/it:8.1f}  {src}")
    if args.ops:
        print("\ntop ops (ms/run, count/run):")
        for op, ms in by_op.most_common(args.top):
            print(f"  {ms/it:8.1f}  x{n_by_op[op]//it:<4d} {op[:100]}")


if __name__ == "__main__":
    main()
