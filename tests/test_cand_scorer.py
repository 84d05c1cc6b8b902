"""Fused candidate-scorer kernel vs its plain-JAX twin (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chameleon_recsys_tpu.ops.pallas.cand_scorer import (
    _BT_TILE,
    cand_score_pallas,
    cand_score_reference,
)


def _make_inputs(bt_total=16, k=6, c=64, m1=32, m2=16, m3=8, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3, dtype)
    return dict(
        i_rows=mk(bt_total * k, c), u_pre=mk(bt_total, c),
        pred=mk(bt_total, c), car_w=mk(c, c) * 0.1, car_b=mk(c),
        w1=mk(c, m1) * 0.2, b1=mk(m1), w2=mk(m1, m2), b2=mk(m2),
        w3=mk(m2, m3), b3=mk(m3), w4=mk(m3),
    )


def test_forward_matches_reference():
    inp = _make_inputs()
    out = cand_score_pallas(*inp.values(), 0.2, True)
    ref = cand_score_reference(*inp.values(), 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gradients_match_autodiff():
    inp = _make_inputs(bt_total=_BT_TILE * 2, k=5, c=32, m1=16, m2=8, m3=8)
    keys = list(inp.keys())
    vals = list(inp.values())
    tgt = jnp.asarray(
        np.random.RandomState(1).randn(vals[1].shape[0], 5), jnp.float32
    )

    def loss_pallas(*args):
        return jnp.sum(jnp.tanh(cand_score_pallas(*args, 0.2, True)) * tgt)

    def loss_ref(*args):
        return jnp.sum(jnp.tanh(cand_score_reference(*args, 0.2)) * tgt)

    g1 = jax.grad(loss_pallas, argnums=tuple(range(len(vals))))(*vals)
    g2 = jax.grad(loss_ref, argnums=tuple(range(len(vals))))(*vals)
    for name, a, b in zip(keys, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_bf16_inputs_supported():
    inp = _make_inputs(dtype=jnp.bfloat16)
    out = cand_score_pallas(*inp.values(), 0.2, True)
    ref = cand_score_reference(*inp.values(), 0.2)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gradients_match_autodiff_stash_variant(monkeypatch):
    """The stash-nc variant must produce bit-identical gradients to the
    recompute path (same inputs, same op order for nc)."""
    from chameleon_recsys_tpu.ops.pallas import cand_scorer as cs

    inp = _make_inputs(bt_total=_BT_TILE * 2, k=5, c=32, m1=16, m2=8, m3=8)
    vals = list(inp.values())

    def loss(*args):
        return jnp.sum(jnp.tanh(cand_score_pallas(*args, 0.2, True)))

    g_rec = jax.grad(loss, argnums=tuple(range(len(vals))))(*vals)
    monkeypatch.setattr(cs, "_STASH_NC", True)
    g_sta = jax.grad(loss, argnums=tuple(range(len(vals))))(*vals)
    for name, a, b in zip(inp.keys(), g_sta, g_rec):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
