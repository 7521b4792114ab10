"""Golden parity vs actual torch ops (the reference's building blocks):
non-affine LayerNorm, Linear+ReLU MLP stacks, and one AdamW step. These pin
down convention details (eps placement, weight-decay coupling) that a NumPy
oracle could silently get wrong the same way we do."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from bsms_gnn_tpu.ops.dense import init_mlp, layer_norm, mlp_apply


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((17, 64)).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x)))
    ln = torch.nn.LayerNorm(64, elementwise_affine=False)
    want = ln(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_matches_torch_sequential(rng):
    p = init_mlp(jax.random.PRNGKey(0), 10, 32, 8, hidden_layers=3, layer_normalized=True)
    x = rng.standard_normal((23, 10)).astype(np.float32)
    got = np.asarray(mlp_apply(p, jnp.asarray(x)))

    # Reference MLP structure (src/ops/basic.py:6-23): hidden_layers ×
    # (Linear→ReLU) then Linear then non-affine LayerNorm.
    mods = []
    dims = [10, 32, 32, 32, 8]
    for i in range(4):
        lin = torch.nn.Linear(dims[i], dims[i + 1])
        lin.weight.data = torch.tensor(np.asarray(p.weights[i]).T.copy())
        lin.bias.data = torch.tensor(np.asarray(p.biases[i]).copy())
        mods.append(lin)
        if i < 3:
            mods.append(torch.nn.ReLU())
    mods.append(torch.nn.LayerNorm(8, elementwise_affine=False))
    seq = torch.nn.Sequential(*mods)
    want = seq(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_adamw_step_matches_torch(rng):
    w0 = rng.standard_normal((6, 4)).astype(np.float32)
    g = rng.standard_normal((6, 4)).astype(np.float32)
    lr, wd = 1e-3, 1e-4

    tw = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.tensor(g.copy())
    opt.step()
    want = tw.detach().numpy()

    tx = optax.adamw(lr, weight_decay=wd)
    state = tx.init(jnp.asarray(w0))
    updates, _ = tx.update(jnp.asarray(g), state, jnp.asarray(w0))
    got = np.asarray(optax.apply_updates(jnp.asarray(w0), updates))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_linear_init_statistics():
    """Initialization matches torch.nn.Linear's default U(±1/√fan_in)."""
    p = init_mlp(jax.random.PRNGKey(1), 256, 256, 256, hidden_layers=1)
    w = np.asarray(p.weights[0])
    bound = 1 / np.sqrt(256)
    assert w.min() >= -bound and w.max() <= bound
    # Uniform variance = bound²/3.
    np.testing.assert_allclose(w.var(), bound**2 / 3, rtol=0.1)
