"""Multi-host data parallelism: a real 2-process jax.distributed cluster on
CPU must produce the SAME one-step training result as a single-process run
over the same global batch (SURVEY.md section 2.10 item 3's required
equivalent; the reference has no distributed path at all, trainer.py:43).

Also covers the loader's process-sharded slicing contract.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"p{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "multihost_runner.py"),
                 str(pid), "2", str(port), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe the identical replicated result
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    assert results[0]["param_abs_sum"] == pytest.approx(
        results[1]["param_abs_sum"], rel=1e-6
    )

    # single-process baseline over the same global batch on a 2-device mesh
    import jax
    import optax

    from baseboostdepth_tpu.parallel import data_mesh, replicate, shard_batch
    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.step import StepStatic, init_state, make_train_step

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
    K = np.broadcast_to(
        np.array([[0.58 * 64, 0, 32, 0], [0, 1.92 * 64, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (B, 4, 4),
    ).copy()
    stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    stereo_T[:, 0, 3] = 0.1
    jitter = np.ones((B, NF, 4), np.float32)
    jitter[..., 3] = 0.0
    batch = make_batch(
        frames, np.ones(B, np.int64), K, stereo_T, np.zeros(B, bool), jitter,
        st.F, True, True,
    )
    mesh = data_mesh(2)
    state = replicate(state, mesh)
    gbatch = shard_batch(batch, mesh)
    step_fn = make_train_step(st, opt)
    state, metrics = step_fn(state, gbatch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    psum = float(
        sum(float(jax.numpy.abs(x).sum()) for x in jax.tree.leaves(jax.device_get(state.params)))
    )

    assert results[0]["loss"] == pytest.approx(loss, abs=5e-5), (results, loss)
    assert results[0]["param_abs_sum"] == pytest.approx(psum, rel=1e-5)


def test_loader_process_slices_partition_the_global_batch(tmp_path):
    """Two loader instances with process_index 0/1 must jointly reproduce
    exactly the single-process loader's global batches, in order."""
    from PIL import Image

    from baseboostdepth_tpu.data import kitti
    from baseboostdepth_tpu.data.curriculum import stage_for_epoch
    from baseboostdepth_tpu.data.loader import KittiTrainLoader

    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.default_rng(0)
    for cam in (2, 3):
        d = tmp_path / folder / f"image_0{cam}" / "data"
        d.mkdir(parents=True)
        for i in range(16):
            arr = rng.integers(0, 255, (64, 200, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:010d}.jpg")
    split = tmp_path / "split.txt"
    split.write_text(
        "\n".join(f"{folder} {i} l kt 0.05" for i in range(3, 12)) + "\n"
    )
    index = kitti.KittiRawIndex(str(tmp_path), str(split))
    stage = stage_for_epoch(0, trimin=True)

    def loader(pi, pc):
        return KittiTrainLoader(
            index, stage, batch_size=4, height=64, width=64, trimin=True,
            use_stereo=True, num_workers=2, seed=7, use_native=False,
            process_index=pi, process_count=pc,
        )

    single = list(loader(0, 1))
    left = list(loader(0, 2))
    right = list(loader(1, 2))
    assert len(single) == len(left) == len(right)
    for full, a, b in zip(single, left, right):
        for k in full:
            merged = np.concatenate([a[k], b[k]], axis=0)
            np.testing.assert_array_equal(merged, full[k], err_msg=k)
