"""Pallas TPU kernel: fused negative-candidate scoring chain.

The pooled scoring path (models/nar.py, reference nar_model.py:374-505
semantics) computes, for every (session, step, candidate):

    pre  = leaky_relu(u_pre[b,t] + i_rows[b,t,k] + const)     # PreCAR
    nc   = tanh(pre @ car_W + car_b)                          # CAR
    prod = nc * pred[b,t]                                     # matching input
    x    = leaky(prod@W1+b1); x = leaky(x@W2+b2); x = leaky(x@W3+b3)
    s    = x @ w4 + b4                                        # [B,T,K] scores

In XLA this chain materializes several [B,T,K,C] tensors in HBM
(~0.5 GB each at the G1 config) plus tiled-layout copies around the
pool-gather's flat [N,C] output (profiled: ~9 ms forward + ~13 ms backward
of a 30 ms step, against an MXU roofline of ~3 + ~8 ms).

This kernel consumes the gathered pool rows in their natural flat [N, C]
layout and keeps every intermediate in VMEM: each grid program processes
``_BT_TILE`` (session, step) pairs — ``_BT_TILE * K`` candidate rows — so
the MXU sees well-shaped [400, C] matmuls.  HBM traffic per step: the
[B*T, K] scores plus, under training (``_STASH_NC``), one [N, C] bf16
residual — the CAR output ``nc``, written by the forward and re-read by
the backward (~1 GB round-trip at the G1 config, fully hidden behind the
MXU) so the backward skips the 2.7 ms nc-recompute matmul; all OTHER
activations are rematerialized in-kernel from the inputs.  The backward
accumulates weight gradients across the sequential grid into shared
output blocks.  See PERFORMANCE.md "Round-3 backward ablation" for the
measured cost model (the kernel is ~97% MXU-roofline-bound).

Semantics notes:
  * leaky_relu slope must match the model's (TF default 0.2 — the
    ``alpha`` argument; models/nar.py ``_LEAKY_ALPHA``).
  * u_pre is expected to already include the constant term
    (``beta @ pre_kernel + pre_bias``) — fold it outside.
  * matmuls run in the input dtype (bf16 in the G1 config) with f32
    accumulation, mirroring XLA's behaviour on the unfused path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (session, step) pairs per grid program; rows per program = tile * K.
# Mosaic requires the second-to-last block dim to be a multiple of 8 (the
# sublane width) unless it equals the array dim, so for the [BT, C]-blocked
# operands (u_pre, pred, du, dp) the tile cannot go below 8 — a tile-4
# backward lowers fine in interpret mode but is rejected on real TPU.
# Shrinking the backward's live set therefore has to come from in-kernel
# rematerialization order / kernel splits, not smaller tiles.
_BT_TILE = 8          # forward (and the model's divisibility gate, via LCM)
_BT_TILE_BWD = 8      # must stay a multiple of 8 (sublane constraint)

# Stash-nc variant (ON): the forward additionally writes the CAR output nc
# ([N, C] bf16, ~500 MB HBM residual at the G1 config) and the backward
# consumes it instead of recomputing it.  A chip ablation (PERFORMANCE.md,
# round 3) showed the backward is ~97% MXU-roofline-bound and the nc
# recompute matmul costs a real 2.7 ms — the stash buys it back for ~1 ms
# of fully-hidden DMA: train step 25.57 → 23.09 ms end-to-end.  (The
# earlier "wash" A/B on jit(grad(sum∘scorer)) was an XLA-DCE artifact: the
# plain forward is dead there — residuals are the raw inputs — while the
# stash forward is not, so the comparison charged the stash a forward the
# real train step pays either way.)  The extra [tile*K, C] backward input
# block needs the per-kernel VMEM limit raised above the 16 MB scoped
# default (v5e has 128 MB VMEM; see _VMEM_LIMIT_BYTES) — with the default
# limit the stash variant is a hard compile failure (round-2 regression).
_STASH_NC = True
_VMEM_LIMIT_BYTES = 32 * 1024 * 1024


def _leaky(x, alpha):
    # compare in f32: Mosaic has no bf16 vector compare on this target
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, alpha * xf)


def _dleaky(x, alpha):
    return jnp.where(x.astype(jnp.float32) > 0, 1.0, alpha)


def _dot_tl(a, b):
    """aᵀ @ b as a dim-0 contraction — no materialized transpose.

    Inside a Mosaic kernel an explicit ``x.T`` is a real VPU shuffle (for
    the [C, C] CAR weight it is a 1M-element transpose PER grid program);
    expressing the same product as a dot_general contraction lets the MXU
    load the operand transposed for free.
    """
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_tr(a, b):
    """a @ bᵀ as a dim-1/dim-1 contraction (see _dot_tl)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _seg_matrix(bt, k, dtype):
    """0/1 segment matrix S [bt, bt*k]: S[b, r] = 1 iff r // k == b.

    The per-(session, step) broadcast (u/pred → candidate rows) and the
    k-segment reductions (du/dp) are awkward on the VPU — k=50 segments are
    not sublane-aligned, so Mosaic lowers them to long shuffle/shift chains
    that serialize with the MXU.  Expressed as matmuls against S they are
    ~6.5 MFLOP each (noise for the MXU) and leave the VPU free.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * k), 1) // k
    c = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * k), 0)
    return (r == c).astype(dtype)


def _seg_broadcast_f32(seg, x):
    """[bt, C] → [bt*k, C] row replication as Sᵀ @ x (one term per row),
    f32 result (Mosaic requires a 32-bit matmul acc)."""
    return jax.lax.dot_general(
        seg, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _seg_broadcast(seg, x):
    """As _seg_broadcast_f32 but cast back to x.dtype (exact: one 0/1 term
    per output element)."""
    return _seg_broadcast_f32(seg, x).astype(x.dtype)


def _seg_reduce(seg, x):
    """[bt*k, C] → [bt, C] per-segment sum as S @ x (f32 accumulation)."""
    return jax.lax.dot_general(
        seg, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _fwd_compute(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
                 w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, *, k, alpha):
    """Shared forward body → (scores [rows, 1] f32, nc [rows, C] input-dtype)."""
    bt = u_ref.shape[0]
    d = i_ref.dtype
    seg = _seg_matrix(bt, k, d)
    # u_rep stays in the f32 the MXU accumulated — the add below runs in
    # f32 either way and skipping the bf16 round-trip saves a VPU pass
    u_rep = _seg_broadcast_f32(seg, u_ref[:])
    p_rep = _seg_broadcast(seg, p_ref[:])

    pre = _leaky(i_ref[:] + u_rep, alpha).astype(d)
    nc = jnp.tanh(
        jnp.dot(pre, carw_ref[:], preferred_element_type=jnp.float32)
        + carb_ref[0]
    ).astype(pre.dtype)
    prod = nc * p_rep
    x = _leaky(
        jnp.dot(prod, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0], alpha,
    ).astype(d)
    x = _leaky(
        jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0], alpha,
    ).astype(d)
    x = _leaky(
        jnp.dot(x, w3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[0], alpha,
    ).astype(d)
    # final Dense(1): a lane reduce beats a [32,1] matmul
    scores = jnp.sum(
        x.astype(jnp.float32) * w4_ref[0], axis=-1, keepdims=True
    )
    return scores, nc


def _fwd_kernel(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, out_ref, *, k,
                alpha):
    out_ref[:], _ = _fwd_compute(
        i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, k=k, alpha=alpha)


def _bwd_body(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
              w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, nc_ref, g_ref,
              di_ref, du_ref, dp_ref, dcarw_ref, dcarb_ref,
              dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
              dw4_ref, *, k, alpha):
    """Backward math.  ``nc_ref`` is the stashed CAR output block when the
    stash variant is on (``_STASH_NC``), else None → recompute in-kernel."""
    bt = u_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dcarw_ref[:] = jnp.zeros_like(dcarw_ref)
        dcarb_ref[:] = jnp.zeros_like(dcarb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)

    d = i_ref.dtype
    seg = _seg_matrix(bt, k, d)
    u_rep = _seg_broadcast_f32(seg, u_ref[:])
    p_rep = _seg_broadcast(seg, p_ref[:])

    # ---- recompute forward activations (kept in VMEM) ----
    a0 = i_ref[:] + u_rep
    pre = _leaky(a0, alpha).astype(d)
    if nc_ref is not None:
        # stashed by the forward — bit-identical to the recompute below
        nc = nc_ref[:]
    else:
        ncp = (
            jnp.dot(pre, carw_ref[:], preferred_element_type=jnp.float32)
            + carb_ref[0]
        )
        nc = jnp.tanh(ncp).astype(pre.dtype)
    prod = nc * p_rep
    a1 = (
        jnp.dot(prod, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    x1 = _leaky(a1, alpha).astype(d)
    a2 = (
        jnp.dot(x1, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    x2 = _leaky(a2, alpha).astype(d)
    a3 = (
        jnp.dot(x2, w3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[0]
    )
    x3 = _leaky(a3, alpha).astype(d)

    # ---- backward ----
    ds = g_ref[:].astype(jnp.float32)  # [rows, 1]
    dx3 = ds * w4_ref[0][None, :].astype(jnp.float32)
    dw4_ref[0, :] += jnp.sum(x3.astype(jnp.float32) * ds, axis=0)

    da3 = (dx3 * _dleaky(a3, alpha)).astype(d)
    dw3_ref[:] += _dot_tl(x2, da3)
    db3_ref[0, :] += jnp.sum(da3.astype(jnp.float32), axis=0)
    dx2 = _dot_tr(da3, w3_ref[:])

    da2 = (dx2 * _dleaky(a2, alpha)).astype(d)
    dw2_ref[:] += _dot_tl(x1, da2)
    db2_ref[0, :] += jnp.sum(da2.astype(jnp.float32), axis=0)
    dx1 = _dot_tr(da2, w2_ref[:])

    da1 = (dx1 * _dleaky(a1, alpha)).astype(d)
    dw1_ref[:] += _dot_tl(prod, da1)
    db1_ref[0, :] += jnp.sum(da1.astype(jnp.float32), axis=0)
    dprod = _dot_tr(da1, w1_ref[:])
    dprod = dprod.astype(d)

    dnc = dprod * p_rep
    dp_rep = dprod * nc
    dp_ref[:] = _seg_reduce(seg, dp_rep).astype(dp_ref.dtype)

    # tanh'(ncp) from the already-computed nc (bf16 round-trip of tanh —
    # well inside bf16 training noise) instead of a second transcendental
    # pass over the [rows, C] block; the whole cotangent chain stays bf16
    # (the weight-grad contractions accumulate f32 in the MXU regardless)
    one = nc.dtype.type(1)
    dncp_c = (dnc * (one - nc * nc)).astype(d)
    dcarw_ref[:] += _dot_tl(pre, dncp_c)
    dcarb_ref[0, :] += jnp.sum(dncp_c.astype(jnp.float32), axis=0)
    dpre = _dot_tr(dncp_c, carw_ref[:])

    da0 = (dpre * _dleaky(a0, alpha)).astype(d)
    di_ref[:] = da0
    du_ref[:] = _seg_reduce(seg, da0).astype(du_ref.dtype)


def _bwd_kernel(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, g_ref, *outs,
                k, alpha):
    _bwd_body(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
              w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, None, g_ref, *outs,
              k=k, alpha=alpha)


def _bwd_kernel_stash(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref,
                      nc_ref, g_ref, *outs, k, alpha):
    _bwd_body(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
              w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, nc_ref, g_ref, *outs,
              k=k, alpha=alpha)


def _fwd_stash_kernel(i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref,
                      out_ref, nc_ref, *, k, alpha):
    out_ref[:], nc = _fwd_compute(
        i_ref, u_ref, p_ref, carw_ref, carb_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, k=k, alpha=alpha)
    nc_ref[:] = nc


def _specs(bt_total, k, c, m1, m2, m3, tile=_BT_TILE):
    row_block = tile * k
    return [
        pl.BlockSpec((row_block, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # i_rows
        pl.BlockSpec((tile, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # u_pre
        pl.BlockSpec((tile, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # pred
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m1, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m2, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def cand_score_pallas(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2,
                      w3, b3, w4, alpha=0.2, interpret=False):
    """Fused candidate scores.

    i_rows [BT*K, C] (flat gathered pool rows), u_pre [BT, C] (constant
    folded in), pred [BT, C]; weights: car_w [C,C], car_b [C], w1 [C,M1],
    b1 [M1], w2 [M1,M2], b2 [M2], w3 [M2,M3], b3 [M3], w4 [M3] (final
    Dense(1) kernel; its bias cancels in the softmax and is omitted).
    Returns scores [BT, K] float32.
    """
    out, _ = _fwd_impl(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2,
                       w3, b3, w4, alpha, interpret)
    return out


def _shapes(i_rows, u_pre, w1, w2, w3):
    bt_total, c = u_pre.shape
    k = i_rows.shape[0] // bt_total
    return bt_total, k, c, w1.shape[1], w2.shape[1], w3.shape[1]


def _row2(v):
    return v[None, :]


def _fwd_impl(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2, w3, b3,
              w4, alpha, interpret, stash_nc=False):
    bt_total, k, c, m1, m2, m3 = _shapes(i_rows, u_pre, w1, w2, w3)
    n_tiles = bt_total // _BT_TILE
    row_block = _BT_TILE * k
    operands = (i_rows, u_pre, pred, car_w, _row2(car_b), w1, _row2(b1),
                w2, _row2(b2), w3, _row2(b3), _row2(w4))
    if stash_nc:
        out, nc = pl.pallas_call(
            functools.partial(_fwd_stash_kernel, k=k, alpha=alpha),
            grid=(n_tiles,),
            out_shape=(
                jax.ShapeDtypeStruct((bt_total * k, 1), jnp.float32),
                jax.ShapeDtypeStruct((bt_total * k, c), i_rows.dtype),
            ),
            # tile passed explicitly: _specs' default was bound to _BT_TILE
            # at import, which desynchronizes from grid/out_specs when a
            # bench script mutates the module global for a tile sweep
            in_specs=_specs(bt_total, k, c, m1, m2, m3, tile=_BT_TILE),
            out_specs=(
                pl.BlockSpec((row_block, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_block, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*operands)
    else:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, k=k, alpha=alpha),
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((bt_total * k, 1), jnp.float32),
            in_specs=_specs(bt_total, k, c, m1, m2, m3, tile=_BT_TILE),
            out_specs=pl.BlockSpec((row_block, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*operands)
        nc = None
    out = out.reshape(bt_total, k)
    return out, (i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2, w3, b3,
                 w4, nc)


def _fwd_vjp(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2, w3, b3, w4,
             alpha, interpret):
    return _fwd_impl(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2, w3,
                     b3, w4, alpha, interpret, stash_nc=_STASH_NC)


def _bwd_vjp(alpha, interpret, res, g):
    (i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2, w3, b3, w4,
     nc) = res
    bt_total, k, c, m1, m2, m3 = _shapes(i_rows, u_pre, w1, w2, w3)
    tile = (
        _BT_TILE_BWD
        if _BT_TILE_BWD % 8 == 0 and bt_total % _BT_TILE_BWD == 0
        else _BT_TILE
    )
    n_tiles = bt_total // tile
    row_block = tile * k
    out_shapes = (
        jax.ShapeDtypeStruct(i_rows.shape, i_rows.dtype),      # di
        jax.ShapeDtypeStruct(u_pre.shape, u_pre.dtype),        # du
        jax.ShapeDtypeStruct(pred.shape, pred.dtype),          # dp
        jax.ShapeDtypeStruct((c, c), jnp.float32),             # dcar_w
        jax.ShapeDtypeStruct((1, c), jnp.float32),             # dcar_b
        jax.ShapeDtypeStruct((c, m1), jnp.float32),            # dw1
        jax.ShapeDtypeStruct((1, m1), jnp.float32),            # db1
        jax.ShapeDtypeStruct((m1, m2), jnp.float32),           # dw2
        jax.ShapeDtypeStruct((1, m2), jnp.float32),            # db2
        jax.ShapeDtypeStruct((m2, m3), jnp.float32),           # dw3
        jax.ShapeDtypeStruct((1, m3), jnp.float32),            # db3
        jax.ShapeDtypeStruct((1, m3), jnp.float32),            # dw4
    )
    shared = lambda i: (0, 0)
    out_specs = (
        pl.BlockSpec((row_block, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, c), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        # weight grads: every program maps to the SAME block — the TPU grid
        # runs sequentially, so the block persists and accumulates
        pl.BlockSpec((c, c), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, m1), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m1), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((m1, m2), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m2), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((m2, m3), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m3), shared, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m3), shared, memory_space=pltpu.VMEM),
    )
    in_specs = _specs(bt_total, k, c, m1, m2, m3, tile=tile)
    operands = [i_rows, u_pre, pred, car_w, _row2(car_b), w1, _row2(b1),
                w2, _row2(b2), w3, _row2(b3), _row2(w4)]
    if nc is not None:
        in_specs.append(
            pl.BlockSpec((row_block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM))             # nc [N, C]
        operands.append(nc)
        kernel = _bwd_kernel_stash
    else:
        kernel = _bwd_kernel
    in_specs.append(
        pl.BlockSpec((row_block, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM))                 # g [N, 1]
    operands.append(g.astype(jnp.float32).reshape(bt_total * k, 1))
    (di, du, dp, dcw, dcb, dw1, db1, dw2, db2, dw3, db3, dw4) = pl.pallas_call(
        functools.partial(kernel, k=k, alpha=alpha),
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # above the 16 MB scoped default: tiles >8 (and the stash variant's
        # extra input block) need the headroom; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*operands)
    return (di, du, dp,
            dcw.astype(car_w.dtype), dcb[0].astype(car_b.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dw3.astype(w3.dtype), db3[0].astype(b3.dtype),
            dw4[0].astype(w4.dtype))


cand_score_pallas.defvjp(_fwd_vjp, _bwd_vjp)


def cand_score_reference(i_rows, u_pre, pred, car_w, car_b, w1, b1, w2, b2,
                         w3, b3, w4, alpha=0.2):
    """Plain-JAX twin of the fused kernel (tests; XLA fallback)."""
    bt_total, c = u_pre.shape
    k = i_rows.shape[0] // bt_total
    i4 = i_rows.reshape(bt_total, k, c)
    pre = _leaky(i4 + u_pre[:, None, :], alpha)
    nc = jnp.tanh(
        jnp.einsum("bkc,cd->bkd", pre, car_w,
                   preferred_element_type=jnp.float32) + car_b
    ).astype(pre.dtype)
    x = nc * pred[:, None, :]
    for w, b in ((w1, b1), (w2, b2), (w3, b3)):
        x = _leaky(
            jnp.einsum("bkc,cd->bkd", x, w,
                       preferred_element_type=jnp.float32) + b, alpha,
        ).astype(pre.dtype)
    return jnp.sum(x.astype(jnp.float32) * w4, axis=-1)
