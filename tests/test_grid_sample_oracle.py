"""Direct randomized torch oracle for utils/geometry.grid_sample_2d — the
bilinear primitive under BEVWarp, PolarI2P and I2P sampling. Covers
in-bounds, border-straddling and far out-of-bounds grids, both
align_corners settings, against torch F.grid_sample."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deepinteraction_tpu.utils.geometry import grid_sample_2d  # noqa: E402


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_matches_torch(align_corners):
    rng = np.random.default_rng(0)
    h, w, c = 7, 11, 5
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    grids = np.concatenate(
        [
            rng.uniform(-0.9, 0.9, size=(64, 2)),   # interior
            rng.uniform(-1.15, -0.85, size=(32, 2)),  # straddling -1
            rng.uniform(0.85, 1.15, size=(32, 2)),    # straddling +1
            rng.uniform(-3.0, 3.0, size=(32, 2)),     # far out
        ]
    ).astype(np.float32)

    mine = np.asarray(
        grid_sample_2d(jnp.asarray(feat), jnp.asarray(grids), align_corners)
    )
    golden = (
        F.grid_sample(
            torch.tensor(feat).permute(2, 0, 1)[None],
            torch.tensor(grids)[None, :, None, :],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align_corners,
        )[0, :, :, 0]
        .permute(1, 0)
        .numpy()
    )
    np.testing.assert_allclose(mine, golden, rtol=1e-5, atol=1e-5)
