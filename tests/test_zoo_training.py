"""Train-step smoke tests for the non-default zoos + gradient-flow audit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from baseboostdepth_tpu.training.batch import make_batch, num_frames
from baseboostdepth_tpu.training.step import StepStatic, init_state, loss_forward


def _toy_batch(rng, B, F, H, W):
    NF = num_frames(F)
    frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    K = np.broadcast_to(K, (B, 4, 4)).copy()
    sT = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    sT[:, 0, 3] = 0.1
    jit = np.ones((B, NF, 4), np.float32)
    jit[..., 3] = 0.0
    return make_batch(frames, np.full(B, F), K, sT, np.zeros(B, bool), jit, F, True, True)


@pytest.mark.parametrize("zoo,H,W", [
    ("monovit", 64, 128),
    ("cadepth", 64, 128),
    ("diffnet", 64, 128),
    ("sql", 128, 512),  # SQL head needs >= 64 patch tokens at H/2
])
def test_zoo_loss_and_grads(zoo, H, W):
    st = StepStatic(zoo=zoo, height=H, width=W, F=1, scales=(0,),
                    trimin=True, decomp=True, dtype="float32")
    state = init_state(st, optax.adam(1e-4), jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(0), 1, 1, H, W))

    def loss_fn(params):
        l, _ = loss_forward(params, state.stats, batch, jax.random.PRNGKey(1), st, True)
        return l

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    assert np.isfinite(float(loss))

    # gradient flow: depth AND pose subtrees must receive signal
    gd = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["depth"]))
    gp = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["pose"]))
    assert gd > 0, f"{zoo}: no gradient into the depth network"
    assert gp > 0, f"{zoo}: no gradient into the pose network"


@pytest.mark.parametrize("zoo,H,W", [
    ("monovit", 64, 128),
    ("cadepth", 64, 128),
    ("diffnet", 64, 128),
    ("sql", 128, 512),
])
def test_zoo_bf16_step_traces(zoo, H, W):
    """Every zoo's train step must TRACE in the production bfloat16 config
    (regression: MonoViT's DropPath rates were np.float64, promoting bf16
    activations to f32 inside flax Dropout's lax.select -- the fp32 smoke
    tests above never saw it, the TPU bench crashed)."""
    from baseboostdepth_tpu.training.step import make_train_step

    st = StepStatic(zoo=zoo, height=H, width=W, F=1, scales=(0,),
                    trimin=True, decomp=True, dtype="bfloat16")
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(0), 1, 1, H, W))
    make_train_step(st, opt).lower(state, batch, jax.random.PRNGKey(1))
