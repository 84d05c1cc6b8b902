"""Pallas fused UGRNN scan vs the lax.scan reference implementation —
forward and gradients (interpret mode, runs on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chameleon_recsys_tpu.ops.pallas.ugrnn_pallas import ugrnn_scan_pallas
from chameleon_recsys_tpu.ops.rnn import ugrnn_scan


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    b, t, units = 4, 6, 12
    x_proj = rng.randn(b, t, 2 * units).astype(np.float32) * 0.5
    w_hh = (rng.randn(units, 2 * units) * 0.3).astype(np.float32)
    lengths = rng.randint(1, t + 1, size=b)
    mask = np.arange(t)[None, :] < lengths[:, None]
    return jnp.asarray(x_proj), jnp.asarray(w_hh), jnp.asarray(mask)


def test_forward_matches_lax_scan(data):
    x_proj, w_hh, mask = data
    ref = ugrnn_scan(x_proj, w_hh, mask)
    out = ugrnn_scan_pallas(x_proj, w_hh, mask, 1.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_gradients_match_lax_scan(data):
    x_proj, w_hh, mask = data

    def loss_ref(x, w):
        h = ugrnn_scan(x, w, mask)
        return jnp.sum(jnp.sin(h) * 0.3)

    def loss_pallas(x, w):
        h = ugrnn_scan_pallas(x, w, mask, 1.0, True)
        return jnp.sum(jnp.sin(h) * 0.3)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x_proj, w_hh)
    gx_pal, gw_pal = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-5)


def test_unaligned_units_padding():
    """Odd widths (e.g. the reference's 255 units) pad to lanes correctly."""
    rng = np.random.RandomState(1)
    b, t, units = 3, 4, 9
    x_proj = jnp.asarray(rng.randn(b, t, 2 * units).astype(np.float32))
    w_hh = jnp.asarray((rng.randn(units, 2 * units) * 0.2).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    ref = ugrnn_scan(x_proj, w_hh, mask)
    out = ugrnn_scan_pallas(x_proj, w_hh, mask, 1.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
