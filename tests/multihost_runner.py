"""Subprocess body for the multi-host test: one JAX process of a 2-process
CPU cluster running ONE data-parallel train step.

Invoked by tests/test_multihost.py as
    python tests/multihost_runner.py <process_id> <num_processes> <port> <out.json>

Each process owns 1 CPU device; the global mesh spans both processes, the
global batch (built identically everywhere from a fixed seed) is sliced per
process, and shard_batch assembles the global jax.Array from process-local
data -- exactly the multi-host path cli/train.py takes with --dist.enabled.
"""

import json
import os
import sys


def main(pid: int, nproc: int, port: int, out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from baseboostdepth_tpu.parallel import initialize_distributed

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()

    import numpy as np

    from baseboostdepth_tpu.parallel import data_mesh, replicate, shard_batch
    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.step import StepStatic, init_state, make_train_step
    import optax

    st = StepStatic(
        zoo="md2", num_layers=18, height=64, width=64, F=1, scales=(0,),
        trimin=True, incremental=False, partial=False, decomp=True,
    )
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))

    B = 4
    rng = np.random.default_rng(0)
    NF = num_frames(st.F)
    frames = rng.integers(0, 255, (B, NF, 64, 64, 3), dtype=np.uint8)
    f_max = np.ones(B, np.int64)
    K = np.broadcast_to(
        np.array([[0.58 * 64, 0, 32, 0], [0, 1.92 * 64, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (B, 4, 4),
    ).copy()
    stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    stereo_T[:, 0, 3] = 0.1
    jitter = np.ones((B, NF, 4), np.float32)
    jitter[..., 3] = 0.0
    batch = make_batch(frames, f_max, K, stereo_T, np.zeros(B, bool), jitter, st.F, True, True)

    # this process's slice of the global batch (loader._local_slice contract)
    lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
    local = {k: v[lo:hi] for k, v in batch.items()}

    mesh = data_mesh(nproc)
    state = replicate(state, mesh)
    gbatch = shard_batch(local, mesh)
    for k, v in gbatch.items():
        assert v.shape[0] == B, (k, v.shape)

    step_fn = make_train_step(st, opt)
    state, metrics = step_fn(state, gbatch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))

    # param fingerprint: sum of |params| over the replicated tree
    psum = float(
        sum(float(jax.numpy.abs(x).sum()) for x in jax.tree.leaves(jax.device_get(state.params)))
    )
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss, "param_abs_sum": psum}, f)
    print(f"process {pid}: loss={loss:.6f} param_abs_sum={psum:.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
