"""Non-circular MPViT importer validation (round-1 VERDICT item 10).

tests/torch_mpvit_ref.py replicates the reference's torch module tree
(/root/reference/networksvit/mpvit.py), so its state_dict() carries the
released mpvit_small.pth key layout (mpvit.py:809-815). Randomly-initialized
weights round-trip through models.torch_import.mpvit_torch_to_flax and the
flax encoder must reproduce the real torch forward at every one of the 5
output features -- layout AND math, checked against torch execution instead
of our own tree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model


@pytest.mark.slow
def test_mpvit_small_layout_roundtrip_forward_parity():
    from tests.torch_mpvit_ref import mpvit_small
    from baseboostdepth_tpu.models.monovit import MPViT
    from baseboostdepth_tpu.models.torch_import import mpvit_torch_to_flax

    tm = _randomize(mpvit_small()).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    params, stats = mpvit_torch_to_flax(sd)

    # flax tree must accept the imported structure exactly
    enc = MPViT()
    ref = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref["params"])[0])
    flat_imp = dict(jax.tree_util.tree_flatten_with_path({k: v for k, v in params.items()})[0])
    assert set(map(str, flat_ref.keys())) == set(map(str, flat_imp.keys()))
    for k in flat_ref:
        assert flat_ref[k].shape == np.asarray(flat_imp[k]).shape, k

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        t_outs = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())

    f_outs = enc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    assert len(t_outs) == len(f_outs) == 5
    for i, (t, f) in enumerate(zip(t_outs, f_outs)):
        t_np = t.permute(0, 2, 3, 1).numpy()
        f_np = np.asarray(f)
        assert t_np.shape == f_np.shape, (i, t_np.shape, f_np.shape)
        scale = np.abs(t_np).max() + 1e-6
        err = np.abs(t_np - f_np).max() / scale
        assert err < 2e-4, (i, err, scale)
