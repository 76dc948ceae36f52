"""I2P top-2-view compaction == full 120-key path when pillars hit <=2 views
(which is geometrically guaranteed for real camera rigs; see MMRI_I2P)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.models.mmri_encoder import MMRI_I2P


def _fixture(rng):
    b, v = 1, 4
    kp, p, c = 32, 6, 16
    hb = wb = 8
    hc, wc = 8, 16
    ih, iw = 32, 64

    # four cameras looking +x, -x, +y, -y with narrow-ish frusta
    l2i = np.zeros((b, v, 4, 4), np.float32)
    looks = [
        np.eye(4, dtype=np.float32),
        np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32),
        np.array([[0, 1, 0, 0], [0, 0, 1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                 np.float32),
        np.array([[0, -1, 0, 0], [0, 0, 1, 0], [-1, 0, 0, 0], [0, 0, 0, 1]],
                 np.float32),
    ]
    for i in range(v):
        kmat = np.eye(4, dtype=np.float32)
        kmat[0, 0] = 20.0
        kmat[1, 1] = 20.0
        kmat[0, 2] = iw / 2
        kmat[1, 2] = ih / 2
        l2i[:, i] = kmat @ looks[i]

    pillars = np.zeros((b, kp, p, 5), np.float32)
    counts = np.zeros((b, kp), np.int32)
    coords = np.zeros((b, kp, 3), np.int32)
    valid = np.zeros((b, kp), bool)
    for j in range(kp - 4):  # leave some invalid pillars
        # tight clusters along a random principal direction: visible in
        # one camera, sometimes two near the diagonals
        axis = rng.integers(0, 4)
        center = np.array(
            [[6, 0, 0], [-6, 0, 0], [0, 6, 0], [0, -6, 0]], np.float32
        )[axis] + rng.normal(0, 2.0, 3).astype(np.float32)
        pn = int(rng.integers(1, p + 1))
        pillars[0, j, :pn, :3] = center + rng.normal(0, 0.2, (pn, 3))
        counts[0, j] = pn
        coords[0, j] = [0, j % hb, (j * 3) % wb]
        valid[0, j] = True

    # fixture invariant: no pillar projects into 3+ views
    def views_hit(pts, cnt):
        hits = 0
        for i in range(v):
            hom = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
            cam = hom @ l2i[0, i].T
            ok = cam[:cnt, 2] > 1e-5
            xy = cam[:cnt, :2] / np.maximum(cam[:cnt, 2:3], 1e-5)
            gx = (xy[:, 0] / iw - 0.5) * 2
            gy = (xy[:, 1] / ih - 0.5) * 2
            inb = ok & (np.abs(gx) < 1) & (np.abs(gy) < 1)
            hits += int(inb.any())
        return hits
    for j in range(kp):
        if valid[0, j]:
            assert views_hit(pillars[0, j, :, :3], counts[0, j]) <= 2

    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    lidar_feat = rng.normal(size=(b, hb, wb, c)).astype(np.float32)
    img_feats = rng.normal(size=(b, v, hc, wc, c)).astype(np.float32)
    return dict(
        lidar_feat=jnp.asarray(lidar_feat),
        img_feats=jnp.asarray(img_feats),
        pillars=jnp.asarray(pillars),
        counts=jnp.asarray(counts),
        coords=jnp.asarray(coords),
        valid=jnp.asarray(valid),
        l2i=jnp.asarray(l2i),
        aug_inv=jnp.asarray(eye),
        input_shape=(ih, iw),
        c=c, p=p, v=v,
    )


def test_top2_compaction_matches_full_keys():
    rng = np.random.default_rng(0)
    fx = _fixture(rng)

    def run(n_views):
        mod = MMRI_I2P(fx["c"], fx["p"] * fx["v"], chunk=16, n_views=n_views)
        vars_ = mod.init(
            jax.random.PRNGKey(1),
            fx["lidar_feat"], fx["img_feats"], fx["pillars"], fx["counts"],
            fx["coords"], fx["valid"], fx["l2i"], fx["aug_inv"],
            fx["input_shape"], False,
        )
        return np.asarray(mod.apply(
            vars_,
            fx["lidar_feat"], fx["img_feats"], fx["pillars"], fx["counts"],
            fx["coords"], fx["valid"], fx["l2i"], fx["aug_inv"],
            fx["input_shape"], False,
        ))

    full = run(0)
    top2 = run(2)
    np.testing.assert_allclose(top2, full, rtol=1e-5, atol=1e-5)
    assert np.abs(full).max() > 0  # fixture actually produces output


def test_hoisted_geometry_matches_inchunk():
    """i2p_geometry()-hoisted sampling == the in-chunk projection path,
    bit-identically, for both eval samplers (the hoist must be a pure
    code motion: same top-k tie-breaking, same masks)."""
    from deepinteraction_tpu.models.mmri_encoder import i2p_geometry

    rng = np.random.default_rng(3)
    fx = _fixture(rng)
    geom = i2p_geometry(
        fx["pillars"], fx["counts"], fx["l2i"], fx["aug_inv"],
        fx["input_shape"], 2,
    )

    for mode in ("bilinear", "nearest"):
        mod = MMRI_I2P(
            fx["c"], fx["p"] * fx["v"], chunk=16, n_views=2, sample_mode=mode
        )
        args = (
            fx["lidar_feat"], fx["img_feats"], fx["pillars"], fx["counts"],
            fx["coords"], fx["valid"], fx["l2i"], fx["aug_inv"],
            fx["input_shape"], False,
        )
        vars_ = mod.init(jax.random.PRNGKey(1), *args)
        inchunk = np.asarray(mod.apply(vars_, *args))
        hoisted = np.asarray(mod.apply(vars_, *args, geom=geom))
        np.testing.assert_array_equal(hoisted, inchunk)
        assert np.abs(inchunk).max() > 0


def test_unrolled_chunks_match_lax_map(monkeypatch):
    """DI_I2P_UNROLL=1 (straight-line chunk bodies) is bit-identical to the
    lax.map loop on both the in-chunk and hoisted-geometry paths."""
    from deepinteraction_tpu.models.mmri_encoder import i2p_geometry

    rng = np.random.default_rng(5)
    fx = _fixture(rng)
    geom = i2p_geometry(
        fx["pillars"], fx["counts"], fx["l2i"], fx["aug_inv"],
        fx["input_shape"], 2,
    )
    mod = MMRI_I2P(fx["c"], fx["p"] * fx["v"], chunk=8, n_views=2,
                   sample_mode="nearest")
    args = (
        fx["lidar_feat"], fx["img_feats"], fx["pillars"], fx["counts"],
        fx["coords"], fx["valid"], fx["l2i"], fx["aug_inv"],
        fx["input_shape"], False,
    )
    vars_ = mod.init(jax.random.PRNGKey(1), *args)
    monkeypatch.delenv("DI_I2P_UNROLL", raising=False)
    looped = np.asarray(mod.apply(vars_, *args))
    looped_g = np.asarray(mod.apply(vars_, *args, geom=geom))
    monkeypatch.setenv("DI_I2P_UNROLL", "1")
    unrolled = np.asarray(mod.apply(vars_, *args))
    unrolled_g = np.asarray(mod.apply(vars_, *args, geom=geom))
    np.testing.assert_array_equal(unrolled, looped)
    np.testing.assert_array_equal(unrolled_g, looped_g)
    assert np.abs(looped).max() > 0


def test_i2p_dedupe_matches_full_keys():
    """DI_I2P_DEDUPE with an un-capping budget (dedupe = p, so no unique
    pixel is ever dropped) must reproduce the non-deduped nearest-path
    output: softmax over the key multiset == softmax over unique keys
    with log-multiplicity bias (exact identity). The fixture's tight
    pillar clusters guarantee heavy pixel duplication, so the bias path
    is genuinely exercised."""
    from deepinteraction_tpu.models.mmri_encoder import i2p_geometry

    rng = np.random.default_rng(5)
    fx = _fixture(rng)
    geom = i2p_geometry(
        fx["pillars"], fx["counts"], fx["l2i"], fx["aug_inv"],
        fx["input_shape"], 2,
    )
    args = (
        fx["lidar_feat"], fx["img_feats"], fx["pillars"], fx["counts"],
        fx["coords"], fx["valid"], fx["l2i"], fx["aug_inv"],
        fx["input_shape"], False,
    )

    def run(dd):
        mod = MMRI_I2P(
            fx["c"], fx["p"] * fx["v"], chunk=16, n_views=2,
            sample_mode="nearest", dedupe=dd,
        )
        vars_ = mod.init(jax.random.PRNGKey(1), *args)
        return np.asarray(mod.apply(vars_, *args, geom=geom))

    full = run(0)
    dedup = run(fx["p"])
    np.testing.assert_allclose(dedup, full, rtol=1e-4, atol=1e-5)
    assert np.abs(full).max() > 0
