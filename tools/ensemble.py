"""Multi-model ensembling: merge detection pkls and evaluate.

The -e leaderboard entries ensemble several models (reference README
tables). Each member is produced by ``tools/test.py --out member_k.pkl``
(optionally with --tta); this merges them per sample with weighted box
fusion (eval/tta.merge_detections) and reports metrics.

    python tools/ensemble.py --infos val.pkl --out fused.pkl \
        member1.pkl member2.pkl ...
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("members", nargs="+", help="detections pkls from tools/test.py --out")
    p.add_argument("--infos", required=True, help="val info pkl for evaluation")
    p.add_argument("--out", default=None)
    p.add_argument("--radius", type=float, default=0.5, help="fusion cluster radius (m)")
    p.add_argument(
        "--classes",
        nargs="*",
        default=None,
        help="class names (default: nuScenes 10)",
    )
    args = p.parse_args()

    import numpy as np

    from deepinteraction_tpu.configs import DataConfig
    from deepinteraction_tpu.data.dataset import load_infos
    from deepinteraction_tpu.eval.nuscenes_metrics import DetectionFrame, evaluate_detections
    from deepinteraction_tpu.eval.results import default_attribute, gt_frame_from_info
    from deepinteraction_tpu.eval.tta import merge_detections

    class_names = tuple(args.classes) if args.classes else DataConfig().class_names

    members = []
    for path in args.members:
        with open(path, "rb") as f:
            members.append(pickle.load(f))
    tokens = members[0]["tokens"]
    for m in members[1:]:
        assert m["tokens"] == tokens, "members cover different samples"

    name_to_idx = {n: i for i, n in enumerate(class_names)}
    fused_frames = []
    for si in range(len(tokens)):
        boxes_l, scores_l, labels_l = [], [], []
        for m in members:
            fr = m["frames"][si]
            b = np.concatenate(
                [fr.boxes, fr.velocity.reshape(len(fr.boxes), -1)], axis=1
            )
            boxes_l.append(b)
            scores_l.append(np.asarray(fr.scores))
            labels_l.append(np.asarray([name_to_idx[n] for n in fr.names]))
        fb, fs, fl = merge_detections(boxes_l, scores_l, labels_l, radius=args.radius)
        names = np.asarray([class_names[int(i)] for i in fl])
        vel = fb[:, 7:9] if fb.shape[1] >= 9 else np.zeros((len(fb), 2))
        fused_frames.append(
            DetectionFrame(
                boxes=fb[:, :7],
                velocity=vel,
                names=names,
                scores=fs,
                attributes=np.asarray(
                    [
                        default_attribute(n, float(np.linalg.norm(v)))
                        for n, v in zip(names, vel)
                    ]
                ),
            )
        )

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"tokens": tokens, "frames": fused_frames}, f)

    by_tok = {i["token"]: i for i in load_infos(args.infos)}
    gts = [gt_frame_from_info(by_tok[t]) for t in tokens]
    metrics = evaluate_detections(gts, fused_frames, class_names)
    print(json.dumps(metrics, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
