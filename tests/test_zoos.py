"""Model-zoo contract tests: every zoo produces 4 disparity maps at the
right scales with the right output semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baseboostdepth_tpu.models import DEPTH_IS_METRIC, build_depth_net


def _run(name, H, W):
    net = build_depth_net(name)
    x = jnp.linspace(0, 1, H * W * 3).reshape(1, H, W, 3)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    return net.apply(v, x, train=False)


@pytest.mark.parametrize(
    "name,H,W",
    [("md2", 64, 128), ("monovit", 64, 128), ("cadepth", 64, 128), ("diffnet", 64, 128)],
)
def test_sigmoid_zoos(name, H, W):
    disps = _run(name, H, W)
    assert len(disps) == 4
    for s, d in enumerate(disps):
        assert d.shape == (1, H // 2**s, W // 2**s, 1), (name, s, d.shape)
        assert 0.0 <= float(d.min()) and float(d.max()) <= 1.0
    assert name not in DEPTH_IS_METRIC


def test_sql_outputs_metric_depth():
    H, W = 128, 640
    disps = _run("sql", H, W)
    d = disps[0]
    # SQL head runs on the H/2 dense map and emits metric depth in
    # [min_val, max_val]
    assert d.shape == (1, H // 2, W // 2, 1)
    assert float(d.min()) >= 0.001 and float(d.max()) <= 80.0
    assert "sql" in DEPTH_IS_METRIC


def test_monovit_train_mode_needs_dropout_rng():
    net = build_depth_net("monovit")
    x = jnp.zeros((1, 64, 128, 3))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = net.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert len(out) == 4
