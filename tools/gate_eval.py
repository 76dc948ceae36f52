"""Quality-gate runner for the eval-time deviations (VERDICT r4 #2).

Every TPU-side eval lever this repo ships (nearest I2P sampling, joint
top-k / per-level top-k MSDA, top-2-view compaction, banded sparse conv,
staged bf16 / depth-lite knobs) deviates from the reference's exact math
(encoder_utils.py:283-305, fusion_transformerv4.py:222-240). This tool
re-gates each of them, isolated, against the strict-parity program on a
trained checkpoint + val split — built for the realistic-scale synthetic
set (tools/create_data.py synthetic --profile realistic), whose ~40
objects/scene x N scenes give the mAP/NDS deltas enough statistical power
to resolve ±0.005 (the tiny 3-scene gate could not).

    python tools/gate_eval.py fusion_base <ckpt_dir> \
        --infos /tmp/real_data/nuscenes_infos_val.pkl \
        --out /tmp/gates_base.json [--gates default parity nearest_i2p ...]

Each gate is a fresh subprocess of tools/test.py with the knob env vars
set, so the traced program matches production exactly. Results land in a
JSON report + a markdown table on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# strict reference math: every deviation off
PARITY = {
    "DI_MSDA_JOINT_POINTS": "0",
    "DI_MSDA_EVAL_POINTS": "0",
    "DI_I2P_SAMPLE": "bilinear",
    "DI_I2P_VIEWS": "0",
    "DI_WARP_VIEWS": "0",
    "DI_SPARSE_IMPL": "gather",
    "DI_DEPTH_FILL_LITE": "0",
    "DI_DENSE_BF16": "0",
}

# each gate = parity + ONE deviation (so deltas are attributable), plus the
# production default set as shipped
GATES = {
    "parity": {},
    "default": None,  # None -> clear all knobs, use shipped defaults
    "nearest_i2p": {"DI_I2P_SAMPLE": "nearest"},
    "joint_top4_msda": {"DI_MSDA_JOINT_POINTS": "4"},
    "plevel_top2_msda": {"DI_MSDA_EVAL_POINTS": "2"},
    "i2p_top2_views": {"DI_I2P_VIEWS": "2"},
    "warp_top2_views": {"DI_WARP_VIEWS": "2"},
    "banded_sparse_conv": {"DI_SPARSE_IMPL": "banded"},
    "depth_fill_lite": {"DI_DEPTH_FILL_LITE": "1"},
    "dense_bf16": {"DI_DENSE_BF16": "1"},
    # dedupe needs nearest + the hoisted top-k-view path; read its delta
    # against the nearest_top2_views control row
    "nearest_top2_views": {"DI_I2P_SAMPLE": "nearest", "DI_I2P_VIEWS": "2"},
    "i2p_dedupe8": {
        "DI_I2P_SAMPLE": "nearest",
        "DI_I2P_VIEWS": "2",
        "DI_I2P_DEDUPE": "8",
    },
}


def run_gate(cfg: str, ckpt: str, infos: str, name: str, workdir: str) -> dict:
    env = dict(os.environ)
    overrides = GATES[name]
    if overrides is None:  # shipped defaults: scrub every knob
        for k in PARITY:
            env.pop(k, None)
    else:
        env.update(PARITY)
        env.update(overrides)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out_pkl = os.path.join(workdir, f"dets_{name}.pkl")
    cmd = [
        sys.executable,
        os.path.join(_REPO, "tools", "test.py"),
        cfg,
        "--infos",
        infos,
        "--checkpoint",
        ckpt,
        "--num-workers",
        "2",
        "--out",
        out_pkl,
    ]
    print(f"[gate {name}] {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-3000:])
        return {"gate": name, "rc": proc.returncode}
    # metrics = the last JSON object printed by tools/test.py
    tail = proc.stdout.strip().rsplit("\n{", 1)
    blob = "{" + tail[1] if len(tail) == 2 else tail[0]
    try:
        metrics = json.loads(blob)
    except json.JSONDecodeError:
        sys.stderr.write(proc.stdout[-2000:])
        return {"gate": name, "rc": 0, "error": "unparseable metrics"}
    keep = {
        k: metrics[k]
        for k in ("NDS", "mAP", "mATE", "mASE", "mAOE", "mAVE", "mAAE")
        if k in metrics
    }
    keep.update({"gate": name, "rc": 0})
    print(f"[gate {name}] {json.dumps(keep, sort_keys=True)}", flush=True)
    return keep


def diff_dets(parity_pkl: str, gate_pkl: str, top_k: int = 50) -> dict:
    """Detection-level perturbation stats of one gate vs strict parity.

    mAP deltas need a well-trained checkpoint to be resolvable; matched-box
    score/center deltas do not — they measure the numeric perturbation the
    deviation injects into the SAME program/weights directly, with
    24 scenes x top-50 boxes ~= 1200 pairs of statistical power regardless
    of detector quality. Matching: per sample, each of parity's top-k boxes
    (by score) pairs greedily with the nearest unused deviation box.
    """
    import pickle

    import numpy as np

    pa = pickle.load(open(parity_pkl, "rb"))
    ga = pickle.load(open(gate_pkl, "rb"))
    assert pa["tokens"] == ga["tokens"], "sample order mismatch"
    d_score, d_center, label_ok, n_pairs = [], [], 0, 0
    for fp, fg in zip(pa["frames"], ga["frames"]):
        order = np.argsort(-fp.scores)[:top_k]
        used = np.zeros(len(fg.boxes), dtype=bool)
        for i in order:
            dist = np.linalg.norm(fg.boxes[:, :3] - fp.boxes[i, :3], axis=1)
            dist = np.where(used, np.inf, dist)
            j = int(np.argmin(dist))
            used[j] = True
            n_pairs += 1
            d_score.append(abs(float(fp.scores[i]) - float(fg.scores[j])))
            d_center.append(float(dist[j]))
            label_ok += int(fp.names[i] == fg.names[j])
    d_score, d_center = np.asarray(d_score), np.asarray(d_center)
    return {
        "pairs": n_pairs,
        "score_mean": float(d_score.mean()),
        "score_p99": float(np.percentile(d_score, 99)),
        "score_max": float(d_score.max()),
        "center_m_mean": float(d_center.mean()),
        "center_m_p99": float(np.percentile(d_center, 99)),
        "center_m_max": float(d_center.max()),
        "label_match": label_ok / max(n_pairs, 1),
    }


def print_diff_table(workdir: str, out: str | None = None) -> None:
    import glob

    parity = os.path.join(workdir, "dets_parity.pkl")
    if not os.path.exists(parity):
        print("no dets_parity.pkl in workdir; skipping detection-level diff")
        return
    rows = {}
    print(
        "\n| gate vs parity | pairs | d-score mean / p99 / max "
        "| d-center m mean / p99 / max | label match |"
    )
    print("|---|---|---|---|---|")
    for pkl in sorted(glob.glob(os.path.join(workdir, "dets_*.pkl"))):
        name = os.path.basename(pkl)[len("dets_"):-len(".pkl")]
        if name == "parity":
            continue
        s = diff_dets(parity, pkl)
        rows[name] = s
        print(
            f"| {name} | {s['pairs']} "
            f"| {s['score_mean']:.2e} / {s['score_p99']:.2e} / {s['score_max']:.2e} "
            f"| {s['center_m_mean']:.3f} / {s['center_m_p99']:.3f} / {s['center_m_max']:.3f} "
            f"| {s['label_match']:.4f} |"
        )
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--infos", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--workdir", default="/tmp/gate_eval")
    p.add_argument("--gates", nargs="*", default=list(GATES))
    p.add_argument(
        "--diff-only",
        action="store_true",
        help="skip eval runs; just diff existing dets_*.pkl in workdir",
    )
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if not args.diff_only:
        rows = [
            run_gate(args.config, args.checkpoint, args.infos, g, args.workdir)
            for g in args.gates
        ]
        report = {
            "config": args.config,
            "checkpoint": args.checkpoint,
            "rows": rows,
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)

        base = next(
            (r for r in rows if r["gate"] == "parity" and "mAP" in r), None
        )
        print("\n| gate | mAP | dmAP | NDS | dNDS |")
        print("|---|---|---|---|---|")
        for r in rows:
            if "mAP" not in r:
                print(f"| {r['gate']} | FAILED rc={r.get('rc')} | | | |")
                continue
            dm = r["mAP"] - base["mAP"] if base else float("nan")
            dn = r["NDS"] - base["NDS"] if base else float("nan")
            print(
                f"| {r['gate']} | {r['mAP']:.4f} | {dm:+.4f} "
                f"| {r['NDS']:.4f} | {dn:+.4f} |"
            )
    print_diff_table(
        args.workdir,
        out=(args.out or "").replace(".json", "_dets.json") or None,
    )


if __name__ == "__main__":
    main()
