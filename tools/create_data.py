"""Offline data preparation CLI (reference tools/create_data.py).

    python tools/create_data.py nuscenes --root data/nuscenes \
        --out data/nuscenes --version v1.0-trainval --max-sweeps 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Generate dataset info pkls")
    p.add_argument("dataset", choices=["nuscenes", "synthetic"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument(
        "--num-samples", type=int, default=4, help="synthetic only: samples to write"
    )
    p.add_argument(
        "--profile",
        choices=["tiny", "realistic"],
        default="tiny",
        help="synthetic only: 'realistic' writes a full-scale multi-scene "
        "set (~45k-pt lidar spins, 40 objects/scene, 1600x900 6-cam) for "
        "the eval-deviation quality gates (PERF.md round 5)",
    )
    p.add_argument("--num-scenes", type=int, default=24, help="realistic only")
    p.add_argument("--num-objects", type=int, default=40, help="realistic only")
    p.add_argument(
        "--gt-database",
        action="store_true",
        help="also build the GT-paste database (reference create_gt_database)",
    )
    p.add_argument(
        "--export-2d",
        action="store_true",
        help="also export COCO-style 2D (+mono3d) annotations per camera "
        "(reference export_2d_annotation, create_data.py:71-79)",
    )
    args = p.parse_args()
    out = args.out or args.root

    if args.dataset == "synthetic":
        if args.profile == "realistic":
            from deepinteraction_tpu.utils.synthetic_nuscenes import (
                write_realistic_nuscenes,
            )

            write_realistic_nuscenes(
                args.root,
                num_scenes=args.num_scenes,
                samples_per_scene=args.num_samples,
                num_objects=args.num_objects,
            )
            args.version = "v1.0-trainval"
        else:
            from deepinteraction_tpu.utils.synthetic_nuscenes import (
                write_synthetic_nuscenes,
            )

            write_synthetic_nuscenes(args.root, num_samples=args.num_samples)
            args.version = "v1.0-mini"

    from deepinteraction_tpu.data.nuscenes_converter import create_nuscenes_infos

    paths = create_nuscenes_infos(
        args.root, out, version=args.version, max_sweeps=args.max_sweeps
    )
    for path in paths:
        print("wrote", path)

    if args.export_2d:
        from deepinteraction_tpu.data.anno_2d import export_2d_annotation

        for path in paths:
            print("wrote", export_2d_annotation(args.root, path, args.version))

    if args.gt_database:
        from deepinteraction_tpu.data.dataset import load_infos
        from deepinteraction_tpu.data.gt_database import create_gt_database

        db = create_gt_database(
            load_infos(paths[0]), out, num_sweeps=args.max_sweeps
        )
        print("wrote", db)


if __name__ == "__main__":
    main()
