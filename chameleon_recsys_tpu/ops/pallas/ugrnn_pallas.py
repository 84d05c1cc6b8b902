"""Pallas TPU kernel: fused UGRNN sequence scan with custom VJP.

The lax.scan UGRNN (ops/rnn.py) round-trips the hidden state through HBM on
every step boundary XLA fails to fuse.  This kernel keeps the entire
recurrence — the [B_tile, U]·[U, 2U] recurrent matmul on the MXU plus the
gate math on the VPU — resident in VMEM for a whole batch tile, writing only
the per-step outputs.

Shapes are padded to hardware tiles inside the wrapper (the NAR config's
rnn_units=255 — the reference's quirky width — pads to 256 lanes).

Forward (per step, semantics of tf.contrib.rnn.UGRNNCell):
    a   = x_proj_t + h · W_hh          (split into [g_act ‖ c_act])
    g   = sigmoid(g_act + forget_bias)
    c   = tanh(c_act)
    h'  = m_t ? g·h + (1−g)·c : h      (copy-through past sequence end)

Backward (BPTT, recomputing gates from saved outputs):
    dg      = dh·(h_prev − c);  dc = dh·(1−g)
    da_g    = dg·g·(1−g);       da_c = dc·(1−c²)
    dx_proj = [da_g ‖ da_c]
    dh_prev = dh·g + da · W_hhᵀ
    dW_hh  += h_prevᵀ · da
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# batch rows per grid program: bounds resident VMEM (~10 MB in the backward
# at u_pad=256, T=19) regardless of the batch size
_B_TILE = 64


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, mask_ref, out_ref, h_scratch, *, t_steps,
                forget_bias):
    """Time-major layout: x_ref [T, B_tile, 2U] (batch-tiled), mask_ref
    [T, B_tile, 1] (batch on the sublane dim), out_ref [T, B_tile, U]."""
    units = h_scratch.shape[-1]
    h_scratch[:] = jnp.zeros_like(h_scratch)

    def step(t, _):
        h = h_scratch[:]
        acts = x_ref[t] + jnp.dot(
            h, w_ref[:], preferred_element_type=jnp.float32
        )
        g = jax.nn.sigmoid(acts[:, :units] + forget_bias)
        c = jnp.tanh(acts[:, units:])
        h_new = g * h + (1.0 - g) * c
        m = mask_ref[t]  # [B_tile, 1]
        h_next = jnp.where(m > 0, h_new, h)
        h_scratch[:] = h_next
        out_ref[t] = h_next
        return 0

    lax.fori_loop(0, t_steps, step, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, w_ref, mask_ref, hs_ref, g_out_ref, dx_ref, dw_ref,
                dh_scratch, *, t_steps, forget_bias):
    """Time-major BPTT; all per-step tensors index the leading axis."""
    units = dh_scratch.shape[-1]
    dh_scratch[:] = jnp.zeros_like(dh_scratch)

    @pl.when(pl.program_id(0) == 0)
    def _zero_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def step(i, _):
        t = t_steps - 1 - i
        h_prev = jnp.where(
            t > 0,
            hs_ref[jnp.maximum(t - 1, 0)],
            jnp.zeros_like(dh_scratch[:]),
        )
        acts = x_ref[t] + jnp.dot(
            h_prev, w_ref[:], preferred_element_type=jnp.float32
        )
        g = jax.nn.sigmoid(acts[:, :units] + forget_bias)
        c = jnp.tanh(acts[:, units:])

        dh = dh_scratch[:] + g_out_ref[t]
        m = (mask_ref[t] > 0).astype(dh.dtype)  # [B_tile, 1]
        dh_m = dh * m

        dg = dh_m * (h_prev - c)
        dc = dh_m * (1.0 - g)
        da_g = dg * g * (1.0 - g)
        da_c = dc * (1.0 - c * c)
        da = jnp.concatenate([da_g, da_c], axis=-1)
        dx_ref[t] = da
        dw_ref[:] += jnp.dot(
            h_prev.T, da, preferred_element_type=jnp.float32
        )
        # carry: masked step flows through the gate, padded step copies dh
        dh_scratch[:] = dh_m * g + jnp.dot(
            da, w_ref[:].T, preferred_element_type=jnp.float32
        ) + dh * (1.0 - m)
        return 0

    lax.fori_loop(0, t_steps, step, 0)


# ---------------------------------------------------------------------------
# wrapper with padding + custom VJP
# ---------------------------------------------------------------------------


def _pad_args(x_proj, w_hh, mask):
    """Pad to hardware tiles and transpose to time-major [T, B, ...]."""
    b, t, two_u = x_proj.shape
    units = two_u // 2
    u_pad = _round_up(units, 128)
    b_pad = _round_up(b, _B_TILE)
    xg = x_proj[..., :units]
    xc = x_proj[..., units:]
    xg = jnp.pad(xg, ((0, b_pad - b), (0, 0), (0, u_pad - units)))
    xc = jnp.pad(xc, ((0, b_pad - b), (0, 0), (0, u_pad - units)))
    x_pad = jnp.swapaxes(
        jnp.concatenate([xg, xc], axis=-1).astype(jnp.float32), 0, 1
    )  # [T, B_pad, 2U_pad]
    w_pad = jnp.zeros((u_pad, 2 * u_pad), jnp.float32)
    w_pad = w_pad.at[:units, :units].set(w_hh[:, :units].astype(jnp.float32))
    w_pad = w_pad.at[:units, u_pad:u_pad + units].set(
        w_hh[:, units:].astype(jnp.float32)
    )
    # [T, B_pad, 1]: the trailing singleton keeps batch on the SUBLANE dim so
    # the mask batch-tiles like every other operand — a 2-D [T, B] layout
    # would put batch on the lane dim, where 64-wide blocks and 64-aligned
    # dynamic slices both violate Mosaic's 128-lane rule
    mask_pad = jnp.swapaxes(
        jnp.pad(mask.astype(jnp.float32), ((0, b_pad - b), (0, 0))), 0, 1
    )[..., None]
    return x_pad, w_pad, mask_pad, units, u_pad, b, b_pad, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ugrnn_scan_pallas(x_proj, w_hh, mask, forget_bias=1.0, interpret=False):
    """Drop-in replacement for ops.rnn.ugrnn_scan (zero h0)."""
    out, _ = _fwd_impl(x_proj, w_hh, mask, forget_bias, interpret)
    return out


def _fwd_impl(x_proj, w_hh, mask, forget_bias, interpret):
    x_pad, w_pad, mask_pad, units, u_pad, b, b_pad, t = _pad_args(
        x_proj, w_hh, mask
    )
    n_tiles = b_pad // _B_TILE
    out_pad = pl.pallas_call(
        functools.partial(_fwd_kernel, t_steps=t, forget_bias=forget_bias),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, u_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((t, _B_TILE, 2 * u_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_pad, 2 * u_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _B_TILE, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, _B_TILE, u_pad), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_B_TILE, u_pad), jnp.float32)],
        interpret=interpret,
    )(x_pad, w_pad, mask_pad)
    hs = jnp.swapaxes(out_pad[:, :b, :units], 0, 1).astype(x_proj.dtype)
    return hs, out_pad


def _fwd_vjp(x_proj, w_hh, mask, forget_bias, interpret):
    hs, out_pad = _fwd_impl(x_proj, w_hh, mask, forget_bias, interpret)
    # residuals must be JAX types: keep primals + padded outputs, re-derive
    # padding in bwd
    return hs, (x_proj, w_hh, mask, out_pad)


def _bwd_vjp(forget_bias, interpret, residuals, g_out):
    x_proj, w_hh, mask, hs_pad = residuals
    x_dtype, w_dtype = x_proj.dtype, w_hh.dtype
    x_pad, w_pad, mask_pad, units, u_pad, b, b_pad, t = _pad_args(
        x_proj, w_hh, mask
    )
    g_pad = jnp.zeros((t, b_pad, u_pad), jnp.float32)
    g_pad = g_pad.at[:, :b, :units].set(
        jnp.swapaxes(g_out.astype(jnp.float32), 0, 1)
    )
    n_tiles = b_pad // _B_TILE
    dx_pad, dw_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, t_steps=t, forget_bias=forget_bias),
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((t, b_pad, 2 * u_pad), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, 2 * u_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((t, _B_TILE, 2 * u_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_pad, 2 * u_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _B_TILE, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _B_TILE, u_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _B_TILE, u_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, _B_TILE, 2 * u_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # dW: every program maps to the SAME block — the TPU grid runs
            # sequentially, so the block persists and accumulates
            pl.BlockSpec((u_pad, 2 * u_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((_B_TILE, u_pad), jnp.float32)],
        interpret=interpret,
    )(x_pad, w_pad, mask_pad, hs_pad, g_pad)

    dx_g = jnp.swapaxes(dx_pad[:, :b, :units], 0, 1)
    dx_c = jnp.swapaxes(dx_pad[:, :b, u_pad : u_pad + units], 0, 1)
    dx = jnp.concatenate([dx_g, dx_c], axis=-1).astype(x_dtype)
    dw = jnp.concatenate(
        [dw_pad[:units, :units], dw_pad[:units, u_pad : u_pad + units]],
        axis=-1,
    ).astype(w_dtype)
    return dx, dw, None


ugrnn_scan_pallas.defvjp(_fwd_vjp, _bwd_vjp)
