"""Multi-host input feeding + distributed eval gather (parallel/input.py).

The real thing needs a multi-host slice; here a 2-process CPU
``jax.distributed`` ring (gloo collectives, localhost coordinator) proves
the semantics the driver can't: disjoint lockstep loader shards, global
batch assembly via ``make_array_from_process_local_data``, and the
file-based eval gather. Reference behavior: DDP per-rank samplers +
``collect_results`` (tools/test.py:221-226, tools/dist_train.sh).
"""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, pickle, sys
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from deepinteraction_tpu.data.loader import DataLoader
    from deepinteraction_tpu.parallel.input import (
        gather_results, globalize_batch, process_shard_indices,
    )
    from deepinteraction_tpu.parallel.mesh import make_mesh

    class Stub:
        train = True
        def __len__(self):
            return 11
        def epoch_indices(self, epoch, shuffle):
            rng = np.random.default_rng(epoch)  # same on every process
            return rng.permutation(len(self))
        def __getitem__(self, i):
            return {"x": np.full((3,), float(i), np.float32), "token": str(i)}

    mesh = make_mesh()  # 4 global devices (2 procs x 2)
    ds = Stub()
    loader = DataLoader(ds, batch_size=2, num_workers=0,
                        process_index=pid, process_count=2)
    report = {"batches": [], "sums": [], "tokens": []}
    for batch in loader.epoch(0):
        toks = batch.pop("token")
        report["tokens"].append(list(toks))
        g = globalize_batch(mesh, batch)
        assert g["x"].shape == (4, 3), g["x"].shape  # GLOBAL batch
        # the psum path every train step relies on
        report["sums"].append(float(jax.jit(lambda b: jnp.sum(b["x"]))(g)))
        report["batches"].append([int(float(t)) for t in toks])
    # eval-style gather: rank 0 sees both processes' items in process order
    merged = gather_results([f"p{pid}_{k}" for k in range(2)],
                            os.path.join(outdir, "gather"),
                            process_index=pid, process_count=2)
    report["merged"] = merged
    with open(os.path.join(outdir, f"report_{pid}.pkl"), "wb") as f:
        pickle.dump(report, f)
    print("MH WORKER OK", flush=True)
    """
) % (REPO,)


def test_two_process_feeding_and_gather(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = 20000 + os.getpid() % 10000
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(k), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for k in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "MH WORKER OK" in out, out[-2000:]

    reports = []
    for k in range(2):
        with open(tmp_path / f"report_{k}.pkl", "rb") as f:
            reports.append(pickle.load(f))

    # lockstep: same number of steps on both processes (len=11, pc=2 ->
    # min shard 5, local_bs 2 -> 2 steps each)
    assert len(reports[0]["batches"]) == len(reports[1]["batches"]) == 2
    # disjoint samples within each global step and across the epoch
    seen = []
    for b0, b1 in zip(reports[0]["batches"], reports[1]["batches"]):
        assert not (set(b0) & set(b1))
        seen += b0 + b1
    assert len(seen) == len(set(seen))
    # both processes computed the same global sum (batch truly global)
    for s0, s1, b0, b1 in zip(
        reports[0]["sums"], reports[1]["sums"],
        reports[0]["batches"], reports[1]["batches"],
    ):
        assert s0 == s1 == 3.0 * (sum(b0) + sum(b1))
    # gather: rank 0 got everything in process order, rank 1 got None
    assert reports[0]["merged"] == ["p0_0", "p0_1", "p1_0", "p1_1"]
    assert reports[1]["merged"] is None


def test_single_process_degenerate():
    """The same helpers on one process: identity semantics."""
    import jax

    from deepinteraction_tpu.parallel.input import (
        gather_results,
        globalize_batch,
        process_shard_indices,
    )
    from deepinteraction_tpu.parallel.mesh import make_mesh

    ids = list(range(10))
    assert process_shard_indices(ids, 2, 0, 1) == ids
    # stride shards are disjoint, lockstep-trimmed to equal batch counts
    s0 = process_shard_indices(list(range(11)), 2, 0, 2)
    s1 = process_shard_indices(list(range(11)), 2, 1, 2)
    assert len(s0) == len(s1) == 4 and not (set(s0) & set(s1))

    assert gather_results([1, 2], "/tmp/unused", 0, 1) == [1, 2]

    mesh = make_mesh()
    n = len(jax.devices())
    g = globalize_batch(mesh, {"x": np.arange(2 * n, dtype=np.float32)})
    assert g["x"].shape == (2 * n,)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.arange(2 * n))
