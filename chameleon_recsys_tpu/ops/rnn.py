"""Recurrent sequence scans, written for the TPU compilation model.

Design: the input projection of every gate is hoisted OUT of the recurrence
into one large batched matmul over [B, T, D] (MXU-friendly, bfloat16-capable);
the ``lax.scan`` body only carries the small [B, U] @ [U, 2U] recurrent matmul
and elementwise gate math.  Sessions are short (T ≤ 20), so the scan is cheap
and XLA unrolls/pipelines it well.

Cells:
  * UGRNN — exact semantics of ``tf.contrib.rnn.UGRNNCell`` used by the NAR
    session encoder (reference nar_module/nar/nar_model.py:1317; the papers
    say GRU but the code uses UGRNN — the code is reproduced):
        g = sigmoid(W_g·[x, h] + b_g + forget_bias)      (forget_bias = 1.0)
        c = tanh  (W_c·[x, h] + b_c)
        h' = g·h + (1 − g)·c
  * GRU — cuDNN variant ("linear before reset") matching
    ``tf.contrib.cudnn_rnn.CudnnGRU`` used by the ACR text encoder
    (reference acr_module/acr/acr_model.py:355-394):
        r  = sigmoid(W_r·x + R_r·h + b_Wr + b_Rr)
        z  = sigmoid(W_z·x + R_z·h + b_Wz + b_Rz)
        n  = tanh  (W_n·x + b_Wn + r·(R_n·h + b_Rn))
        h' = (1 − z)·n + z·h
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _scan_time_major(step, h0, xs_btu, mask_bt):
    """Run ``step`` over time with copy-through masking beyond seq length."""
    xs = jnp.swapaxes(xs_btu, 0, 1)  # [T, B, ...]
    mask = jnp.swapaxes(mask_bt, 0, 1)  # [T, B]

    def body(h, inp):
        x_t, m_t = inp
        h_new = step(h, x_t)
        h = jnp.where(m_t[:, None], h_new, h)
        return h, h

    _, hs = lax.scan(body, h0, (xs, mask))
    return jnp.swapaxes(hs, 0, 1)  # [B, T, U]


def ugrnn_scan(
    x_proj: jax.Array,  # [B, T, 2U] precomputed W_x·x + b
    w_hh: jax.Array,  # [U, 2U]
    mask: jax.Array,  # [B, T] bool validity
    h0: Optional[jax.Array] = None,
    forget_bias: float = 1.0,
) -> jax.Array:
    """UGRNN recurrence given the precomputed input projection."""
    b, t, two_u = x_proj.shape
    units = two_u // 2
    if h0 is None:
        h0 = jnp.zeros((b, units), x_proj.dtype)

    def step(h, xp_t):
        acts = xp_t + h @ w_hh
        g_act, c_act = jnp.split(acts, 2, axis=-1)
        c = jnp.tanh(c_act)
        g = jax.nn.sigmoid(g_act + forget_bias)
        return g * h + (1.0 - g) * c

    return _scan_time_major(step, h0, x_proj, mask)


def gru_scan(
    x_proj: jax.Array,  # [B, T, 3U] precomputed W·x + b_W (order r, z, n)
    r_hh: jax.Array,  # [U, 3U] recurrent kernels (order r, z, n)
    b_hh: jax.Array,  # [3U] recurrent biases
    mask: jax.Array,  # [B, T]
    h0: Optional[jax.Array] = None,
) -> jax.Array:
    """cuDNN-variant GRU recurrence given the precomputed input projection."""
    b, t, three_u = x_proj.shape
    units = three_u // 3
    if h0 is None:
        h0 = jnp.zeros((b, units), x_proj.dtype)

    def step(h, xp_t):
        rec = h @ r_hh + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(rec, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    return _scan_time_major(step, h0, x_proj, mask)


class UGRNNLayer(nn.Module):
    """One UGRNN layer; input projection runs as a single [B,T,D]·[D,2U] matmul.

    ``use_pallas`` swaps the lax.scan recurrence for the fused Pallas TPU
    kernel (ops/pallas/ugrnn_pallas.py) — identical math, VMEM-resident state.
    """

    units: int
    forget_bias: float = 1.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        x_proj = nn.Dense(
            2 * self.units,
            use_bias=True,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="input_proj",
        )(x)
        w_hh = self.param(
            "recurrent_kernel",
            nn.initializers.glorot_uniform(),
            (self.units, 2 * self.units),
            jnp.float32,
        ).astype(self.dtype)
        if self.use_pallas:
            from .pallas.ugrnn_pallas import ugrnn_scan_pallas

            return ugrnn_scan_pallas(
                x_proj, w_hh, mask, self.forget_bias,
                jax.default_backend() != "tpu",  # interpret off-TPU
            )
        return ugrnn_scan(x_proj, w_hh, mask, forget_bias=self.forget_bias)


class StackedUGRNN(nn.Module):
    """Stacked UGRNN with per-layer output dropout.

    Twin of the reference's MultiRNNCell([UGRNNCell×L] with DropoutWrapper
    output_keep_prob) + dynamic_rnn (nar_model.py:1308-1361).  Like
    dynamic_rnn, outputs at padded steps are zeroed.
    """

    units: int
    num_layers: int = 1
    keep_prob: float = 1.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        h = x
        for i in range(self.num_layers):
            h = UGRNNLayer(
                self.units, dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"layer_{i}",
            )(h, mask)
            if self.keep_prob < 1.0:
                h = nn.Dropout(rate=1.0 - self.keep_prob)(
                    h, deterministic=deterministic
                )
        return h * mask[..., None].astype(h.dtype)


class GRULayer(nn.Module):
    """One cuDNN-style GRU layer (see gru_scan)."""

    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, h0: Optional[jax.Array] = None
    ) -> jax.Array:
        x_proj = nn.Dense(
            3 * self.units,
            use_bias=True,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="input_proj",
        )(x)
        r_hh = self.param(
            "recurrent_kernel",
            nn.initializers.glorot_uniform(),
            (self.units, 3 * self.units),
            jnp.float32,
        ).astype(self.dtype)
        b_hh = self.param(
            "recurrent_bias", nn.initializers.zeros, (3 * self.units,), jnp.float32
        ).astype(self.dtype)
        return gru_scan(x_proj, r_hh, b_hh, mask, h0=h0)


def lstm_scan(
    x_proj: jax.Array,  # [B, T, 4U] precomputed W·x + b_W (order i, f, g, o)
    r_hh: jax.Array,  # [U, 4U]
    b_hh: jax.Array,  # [4U]
    mask: jax.Array,  # [B, T]
    h0: Optional[jax.Array] = None,
    c0: Optional[jax.Array] = None,
    forget_bias: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Standard (cuDNN-compatible) LSTM recurrence; returns (outputs, hT, cT)."""
    b, t, four_u = x_proj.shape
    units = four_u // 4
    if h0 is None:
        h0 = jnp.zeros((b, units), x_proj.dtype)
    if c0 is None:
        c0 = jnp.zeros((b, units), x_proj.dtype)

    xs = jnp.swapaxes(x_proj, 0, 1)
    ms = jnp.swapaxes(mask, 0, 1)

    def body(carry, inp):
        h, c = carry
        xp_t, m_t = inp
        gates = xp_t + h @ r_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + forget_bias)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = m_t[:, None]
        h = jnp.where(keep, h_new, h)
        c = jnp.where(keep, c_new, c)
        return (h, c), h

    (h_t, c_t), hs = lax.scan(body, (h0, c0), (xs, ms))
    return jnp.swapaxes(hs, 0, 1), h_t, c_t


class LSTMLayer(nn.Module):
    """One cuDNN-style LSTM layer (see lstm_scan)."""

    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array,
        h0: Optional[jax.Array] = None, c0: Optional[jax.Array] = None,
    ):
        x_proj = nn.Dense(
            4 * self.units,
            use_bias=True,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="input_proj",
        )(x)
        r_hh = self.param(
            "recurrent_kernel",
            nn.initializers.glorot_uniform(),
            (self.units, 4 * self.units),
            jnp.float32,
        ).astype(self.dtype)
        b_hh = self.param(
            "recurrent_bias", nn.initializers.zeros, (4 * self.units,), jnp.float32
        ).astype(self.dtype)
        return lstm_scan(x_proj, r_hh, b_hh, mask, h0=h0, c0=c0)


class StackedLSTM(nn.Module):
    """Stacked LSTM with inter-layer dropout, cuDNN layout (for the ACR text
    encoder's LSTM option, reference acr_model.py:308-353).

    ``direction='bidirectional'`` mirrors CudnnLSTM's bidirectional mode
    (reference acr_model.py:316-353): each layer runs an independent backward
    pass over the time-reversed input, per-step outputs are the [fwd ‖ bwd]
    concat (so layer l+1 consumes 2U features), and each layer's final state
    is the [fwd ‖ bwd] concat of both directions' last states."""

    units: int
    num_layers: int = 1
    keep_prob: float = 1.0
    dtype: jnp.dtype = jnp.float32
    direction: str = "unidirectional"

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        if self.direction not in ("unidirectional", "bidirectional"):
            raise ValueError(f"invalid rnn direction {self.direction}")
        h = x
        finals = []
        for i in range(self.num_layers):
            if i > 0 and self.keep_prob < 1.0:
                h = nn.Dropout(rate=1.0 - self.keep_prob)(
                    h, deterministic=deterministic
                )
            fwd, h_t, _ = LSTMLayer(self.units, dtype=self.dtype, name=f"layer_{i}")(
                h, mask
            )
            if self.direction == "bidirectional":
                bwd_rev, h_t_bwd, _ = LSTMLayer(
                    self.units, dtype=self.dtype, name=f"layer_{i}_bwd"
                )(jnp.flip(h, axis=1), jnp.flip(mask, axis=1))
                h = jnp.concatenate([fwd, jnp.flip(bwd_rev, axis=1)], axis=-1)
                finals.append(jnp.concatenate([h_t, h_t_bwd], axis=-1))
            else:
                h = fwd
                finals.append(h_t)
        return h, jnp.stack(finals)


class StackedGRU(nn.Module):
    """Stacked GRU with inter-layer dropout (cuDNN applies dropout between
    layers only, acr_model.py:372).

    ``direction='bidirectional'`` mirrors CudnnGRU's bidirectional mode
    (reference acr_model.py:356-399): per-layer independent backward pass on
    the reversed input, [fwd ‖ bwd] per-step outputs, [fwd ‖ bwd] final
    states.  ``h0`` (decoder seeding) is only supported unidirectionally."""

    units: int
    num_layers: int = 1
    keep_prob: float = 1.0
    dtype: jnp.dtype = jnp.float32
    direction: str = "unidirectional"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        h0: Optional[Sequence[jax.Array]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        if self.direction not in ("unidirectional", "bidirectional"):
            raise ValueError(f"invalid rnn direction {self.direction}")
        if h0 is not None and self.direction == "bidirectional":
            raise ValueError("h0 seeding requires unidirectional direction")
        h = x
        finals = []
        for i in range(self.num_layers):
            if i > 0 and self.keep_prob < 1.0:
                h = nn.Dropout(rate=1.0 - self.keep_prob)(
                    h, deterministic=deterministic
                )
            layer_h0 = None if h0 is None else h0[i]
            fwd = GRULayer(self.units, dtype=self.dtype, name=f"layer_{i}")(
                h, mask, h0=layer_h0
            )
            # final state = last valid step's hidden
            lengths = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=1), 1)
            fwd_final = jnp.take_along_axis(
                fwd, (lengths - 1)[:, None, None], axis=1
            )[:, 0]
            if self.direction == "bidirectional":
                bwd_rev = GRULayer(
                    self.units, dtype=self.dtype, name=f"layer_{i}_bwd"
                )(jnp.flip(h, axis=1), jnp.flip(mask, axis=1))
                # backward final = state after consuming the whole reversed
                # sequence (copy-through masking skips the leading padding)
                h = jnp.concatenate([fwd, jnp.flip(bwd_rev, axis=1)], axis=-1)
                finals.append(
                    jnp.concatenate([fwd_final, bwd_rev[:, -1]], axis=-1)
                )
            else:
                h = fwd
                finals.append(fwd_final)
        return h, jnp.stack(finals)
