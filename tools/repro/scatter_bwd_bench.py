"""Microbench: backward-scatter strategies for the flat patch-table gather.

The ++ train trace (round 5) shows the MSDA sampling gather's autodiff
transpose — scatter-ADD of R=4.3M [64]-lane cotangent rows into the
T=1.07M-row flat patch table with NON-UNIQUE indices — costs ~780 ms per
instance on v5e (4 instances = 48% of the 6.5 s train step), ~17x the
forward gather at the same index count. This measures the alternatives
that could back a custom VJP:

  1. baseline        zeros.at[ix].add(ct)
  2. sorted_hint     pre-sorted ix + indices_are_sorted=True
  3. segsum          sort -> gather rows -> jax.ops.segment_sum(sorted)
  4. bf16            baseline with bf16 updates

Run on the TPU env:  python tools/repro/scatter_bwd_bench.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.utils.backend import require_live_backend

T, R, C = 1_075_200, 4_300_800, 64


@jax.jit
def _fence_sum(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(tree))


def timeit(name, fn, *args):
    # honest axon timing: fence on a jitted scalar reduction (CLAUDE.md) —
    # np.asarray on the full output would ship ~1 GB over the tunnel/iter.
    out = fn(*args)
    np.asarray(_fence_sum(out))
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = fn(*args)
        np.asarray(_fence_sum(out))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:24s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    require_live_backend()
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    rng = np.random.default_rng(0)
    # index distribution like MSDA sampling: clustered around query cells
    ix = jnp.asarray(rng.integers(0, T, size=R, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))

    @jax.jit
    def baseline(ix, ct):
        return jnp.zeros((T, C), jnp.float32).at[ix].add(ct)

    @jax.jit
    def sorted_hint(six, sct):
        return jnp.zeros((T, C), jnp.float32).at[six].add(
            sct, indices_are_sorted=True
        )

    @jax.jit
    def segsum(ix, ct):
        order = jnp.argsort(ix)
        six = ix[order]
        sct = ct[order]
        return jax.ops.segment_sum(
            sct, six, num_segments=T, indices_are_sorted=True
        )

    @jax.jit
    def sort_only(ix, ct):
        order = jnp.argsort(ix)
        return ix[order], ct[order]

    @jax.jit
    def bf16_base(ix, ct):
        return jnp.zeros((T, C), jnp.bfloat16).at[ix].add(ct.astype(jnp.bfloat16))

    @jax.jit
    def fwd_gather(tb, ix):
        return tb[ix]

    tb = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    timeit("fwd gather (reference)", fwd_gather, tb, ix)
    timeit("scatter-add baseline", baseline, ix, ct)
    six = jnp.sort(ix)
    sct = ct  # payload permutation does not change scatter cost profile
    timeit("scatter-add sorted hint", sorted_hint, six, sct)
    timeit("sort+gather (prep only)", sort_only, ix, ct)
    timeit("sort+segment_sum", segsum, ix, ct)
    timeit("scatter-add bf16", bf16_base, ix, ct)

    # --- round-5 second wave: is the scatter latency-serialized on
    # DUPLICATES? If a unique-index scatter runs near bandwidth, the
    # backward can be: sort -> segmented combine (cumsum or doubling
    # passes) -> ONE unique-index scatter of the per-segment totals.

    @jax.jit
    def unique_scatter(ixu, ct):
        return jnp.zeros((T + 1, C), jnp.float32).at[ixu].add(
            ct, unique_indices=True, indices_are_sorted=True
        )

    # boundary mask from the real sorted distribution: last row of each
    # segment is live, the rest go to a trash row (T)
    is_last = jnp.concatenate([six[1:] != six[:-1], jnp.ones((1,), bool)])
    ixu = jnp.where(is_last, six, T)
    timeit("unique+sorted scatter", unique_scatter, ixu, ct)

    @jax.jit
    def unique_unsorted_scatter(ixp, ct1):
        return jnp.zeros((T, C), jnp.float32).at[ixp].add(
            ct1, unique_indices=True
        )

    ixp = jnp.asarray(rng.permutation(T).astype(np.int32))
    ct1 = ct[:T]
    timeit("unique perm scatter (T rows)", unique_unsorted_scatter, ixp, ct1)

    @jax.jit
    def cumsum_rows(ct):
        return jnp.cumsum(ct, axis=0)

    timeit("cumsum [R,64]", cumsum_rows, ct)

    # --- wave 3: end-to-end candidate pipelines for the custom VJP, with
    # exactness checks vs the baseline scatter.

    @jax.jit
    def pipeline_cumsum(ix, ct):
        order = jnp.argsort(ix)
        six = jnp.take(ix, order)
        sct = jnp.take(ct, order, axis=0)
        cum = jnp.cumsum(sct, axis=0)
        r = ix.shape[0]
        is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
        is_last = jnp.concatenate([six[1:] != six[:-1], jnp.ones((1,), bool)])
        # start position of each row's segment via a running max (cummax is
        # a primitive; lax.associative_scan here built an unrolled graph
        # that did not finish compiling in 27 min)
        start = jax.lax.cummax(
            jnp.where(is_first, jnp.arange(r, dtype=jnp.int32), -1)
        )
        prev = jnp.where(start > 0, start - 1, 0)
        exc = jnp.where((start > 0)[:, None], jnp.take(cum, prev, axis=0), 0.0)
        totals = cum - exc  # at is_last rows: the segment total
        ixu = jnp.where(is_last, six, T)
        return jnp.zeros((T + 1, C), jnp.float32).at[ixu].add(
            totals, unique_indices=True, indices_are_sorted=True
        )[:T]

    @jax.jit
    def pipeline_doubling(ix, ct):
        order = jnp.argsort(ix)
        six = jnp.take(ix, order)
        acc = jnp.take(ct, order, axis=0)
        r = ix.shape[0]
        d = 1
        while d < r:  # suffix-combine: FIRST row of each segment -> total
            same = jnp.concatenate([six[d:] == six[:-d], jnp.zeros((d,), bool)])
            shifted = jnp.concatenate([acc[d:], jnp.zeros((d, C), acc.dtype)])
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            d *= 2
        is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
        ixu = jnp.where(is_first, six, T)
        return jnp.zeros((T + 1, C), jnp.float32).at[ixu].add(
            acc, unique_indices=True, indices_are_sorted=True
        )[:T]

    # --- wave 4: HONEST-flag variants. Wave 3's masked trash-row scatters
    # claimed indices_are_sorted on a [a,T,T,b,T,...] vector — a lie the
    # TPU miscompiles on (both wave-3 pipelines returned rel-1.0 garbage).

    @jax.jit
    def masked_unique_unsorted(ix, ct):
        # totals at first rows via doubling, losers -> trash; ONLY the
        # unique hint (true except at the trash row)
        order = jnp.argsort(ix)
        six = jnp.take(ix, order)
        acc = jnp.take(ct, order, axis=0)
        d = 1
        while d < R:
            same = jnp.concatenate([six[d:] == six[:-d], jnp.zeros((d,), bool)])
            shifted = jnp.concatenate([acc[d:], jnp.zeros((d, C), acc.dtype)])
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            d *= 2
        is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
        ixu = jnp.where(is_first, six, T)
        return jnp.zeros((T + 1, C), jnp.float32).at[ixu].add(
            acc, unique_indices=True
        )[:T]

    @jax.jit
    def set_sorted_broadcast(ix, ct):
        # every row carries its segment TOTAL (cumsum at segment end minus
        # cumsum before segment start, positions via cummax/cummin), then
        # one .set scatter with TRULY sorted indices; duplicate writers all
        # write the same value
        r = ix.shape[0]
        order = jnp.argsort(ix)
        six = jnp.take(ix, order)
        sct = jnp.take(ct, order, axis=0)
        cum = jnp.cumsum(sct, axis=0)
        is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
        is_last = jnp.concatenate([six[1:] != six[:-1], jnp.ones((1,), bool)])
        ar = jnp.arange(r, dtype=jnp.int32)
        start = jax.lax.cummax(jnp.where(is_first, ar, -1))
        end = -jax.lax.cummax(jnp.where(is_last, -ar, -r)[::-1])[::-1]
        tot = jnp.take(cum, end, axis=0) - jnp.where(
            (start > 0)[:, None], jnp.take(cum, start - 1, axis=0), 0.0
        )
        return jnp.zeros((T, C), jnp.float32).at[six].set(
            tot, indices_are_sorted=True
        )

    ref = np.asarray(baseline(ix, ct))
    for name, fn in (
        ("masked unique unsorted", masked_unique_unsorted),
        ("set sorted broadcast", set_sorted_broadcast),
    ):
        got = np.asarray(fn(ix, ct))
        err = float(np.max(np.abs(got - ref)))
        rel = err / float(np.max(np.abs(ref)))
        print(f"{name:24s} max abs err {err:.3e} (rel {rel:.2e})", flush=True)
        timeit(name, fn, ix, ct)

    for name, fn in (("pipeline cumsum", pipeline_cumsum),
                     ("pipeline doubling", pipeline_doubling)):
        got = np.asarray(fn(ix, ct))
        err = float(np.max(np.abs(got - ref)))
        rel = err / float(np.max(np.abs(ref)))
        print(f"{name:24s} max abs err {err:.3e} (rel {rel:.2e})", flush=True)
        timeit(name, fn, ix, ct)

    @jax.jit
    def doubling_reduce(six, ct):
        # segmented suffix combine: after log2(R) shift-add passes the LAST
        # row of each segment holds the segment total
        acc = ct
        d = 1
        while d < R:
            same = jnp.concatenate(
                [six[d:] == six[:-d], jnp.zeros((d,), bool)]
            )
            shifted = jnp.concatenate([acc[d:], jnp.zeros((d, C), acc.dtype)])
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            d *= 2
        return acc

    timeit("doubling reduce (23 passes)", doubling_reduce, six, ct)


if __name__ == "__main__":
    main()
