import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.ops.voxelize import hard_simple_vfe, voxelize


def _np_voxelize(points, mask, voxel_size, pc_range, max_pts, max_vox):
    """Slow first-principles oracle (dict-based, first-come point order)."""
    vox = {}
    nx = int(round((pc_range[3] - pc_range[0]) / voxel_size[0]))
    ny = int(round((pc_range[4] - pc_range[1]) / voxel_size[1]))
    nz = int(round((pc_range[5] - pc_range[2]) / voxel_size[2]))
    for i, p in enumerate(points):
        if not mask[i]:
            continue
        ix = int(np.floor((p[0] - pc_range[0]) / voxel_size[0]))
        iy = int(np.floor((p[1] - pc_range[1]) / voxel_size[1]))
        iz = int(np.floor((p[2] - pc_range[2]) / voxel_size[2]))
        if not (0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz):
            continue
        vox.setdefault((iz, iy, ix), []).append(p)
    return vox


def test_voxelize_matches_oracle():
    rng = np.random.default_rng(0)
    n = 500
    pts = rng.uniform(-5, 5, size=(n, 5)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.1
    vs = (0.5, 0.5, 0.5)
    pcr = (-4.0, -4.0, -4.0, 4.0, 4.0, 4.0)
    out = voxelize(
        jnp.asarray(pts),
        jnp.asarray(mask),
        voxel_size=vs,
        point_cloud_range=pcr,
        max_num_points=4,
        max_voxels=2048,
    )
    oracle = _np_voxelize(pts, mask, vs, pcr, 4, 2048)
    assert int(out.num_voxels) == len(oracle)
    got = {}
    for v in range(int(out.num_voxels)):
        key = tuple(int(c) for c in out.coords[v])
        npts = int(out.num_points[v])
        got[key] = np.asarray(out.voxels[v, :npts])
    assert set(got.keys()) == set(oracle.keys())
    for key, plist in oracle.items():
        expect = np.stack(plist[:4])
        np.testing.assert_allclose(got[key], expect, rtol=1e-6)


def test_voxelize_overflow_caps():
    # 100 points in 100 distinct voxels, capacity 10
    pts = np.zeros((100, 5), np.float32)
    pts[:, 0] = np.arange(100) * 0.1 - 4.0 + 0.05  # cell centers: robust floor
    out = voxelize(
        jnp.asarray(pts),
        jnp.ones(100, bool),
        voxel_size=(0.1, 0.1, 0.1),
        point_cloud_range=(-4.0, -4.0, -4.0, 6.0, 6.0, 6.0),
        max_num_points=2,
        max_voxels=10,
    )
    assert int(out.num_voxels) == 10
    assert int((out.coords[:, 0] >= 0).sum()) == 10
    # dropped points marked -1
    assert int((out.point_voxel_idx >= 0).sum()) == 10


def test_voxelize_point_cap_keeps_first_come():
    # 5 identical-voxel points, cap 3: first three (by input order) kept
    pts = np.zeros((5, 5), np.float32)
    pts[:, 3] = np.arange(5)  # tag each point
    out = voxelize(
        jnp.asarray(pts),
        jnp.ones(5, bool),
        voxel_size=(1.0, 1.0, 1.0),
        point_cloud_range=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0),
        max_num_points=3,
        max_voxels=4,
    )
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 3
    np.testing.assert_array_equal(np.asarray(out.voxels[0, :, 3]), [0, 1, 2])


def test_hard_simple_vfe():
    voxels = jnp.asarray(
        [
            [[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]],
            [[5.0, 6.0], [0.0, 0.0], [0.0, 0.0]],
            [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
        ]
    )
    counts = jnp.asarray([2, 1, 0])
    mean = hard_simple_vfe(voxels, counts)
    np.testing.assert_allclose(
        np.asarray(mean), [[2.0, 3.0], [5.0, 6.0], [0.0, 0.0]]
    )


def test_voxelize_jit_static_shapes():
    f = jax.jit(
        lambda p, m: voxelize(
            p,
            m,
            voxel_size=(0.5, 0.5, 0.5),
            point_cloud_range=(-4.0, -4.0, -4.0, 4.0, 4.0, 4.0),
            max_num_points=4,
            max_voxels=128,
        )
    )
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, size=(300, 5)).astype(np.float32)
    out = f(jnp.asarray(pts), jnp.ones(300, bool))
    assert out.voxels.shape == (128, 4, 5)
    assert out.coords.shape == (128, 3)


def test_grid_sample_patch_matches_oracle():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.utils.geometry import grid_sample_2d, grid_sample_2d_patch

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(9, 13, 8)).astype(np.float32))
    # include out-of-range and boundary-straddling coords
    grid = jnp.asarray(rng.uniform(-1.4, 1.4, size=(500, 2)).astype(np.float32))
    ref = grid_sample_2d(feat, grid)
    out = grid_sample_2d_patch(feat, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
