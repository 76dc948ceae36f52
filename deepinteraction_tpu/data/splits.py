"""nuScenes scene splits.

The devkit hardcodes the official train/val scene-name lists
(nuscenes/utils/splits.py); the reference pulls them in transitively via
``create_nuscenes_infos``. The mini splits are small enough to embed; for
v1.0-trainval the 150-name val list must be provided as a text file (one
scene name per line) — either ``$NUSCENES_VAL_SCENES`` or
``<data_root>/val_scenes.txt`` — so we never ship a silently-wrong list.
"""

from __future__ import annotations

import os
from typing import Set

MINI_VAL = {"scene-0103", "scene-0916"}


def val_scenes(version: str, data_root: str | None = None) -> Set[str]:
    if version == "v1.0-mini":
        return set(MINI_VAL)
    if version == "v1.0-test":
        return set()
    path = os.environ.get("NUSCENES_VAL_SCENES")
    if not path and data_root:
        cand = os.path.join(data_root, "val_scenes.txt")
        path = cand if os.path.exists(cand) else None
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "full-split conversion needs the official 150-scene val list: "
            "write it (one scene name per line, from nuscenes-devkit "
            "splits.py) to <data_root>/val_scenes.txt or set "
            "$NUSCENES_VAL_SCENES"
        )
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}
