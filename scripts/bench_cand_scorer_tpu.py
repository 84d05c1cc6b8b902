"""Same-process A/B of the fused candidate-scorer kernel on the TPU.

Times forward and forward+backward at the G1 shapes for several BACKWARD
tile sizes (the VMEM/double-buffering experiment: the bwd program's live
set includes the f32 weight-grad accumulators; smaller streamed blocks keep
the pipeline overlapped).  Run on the real chip:

    python scripts/bench_cand_scorer_tpu.py

Smoke gate (REQUIRED before committing any change under ops/pallas/ —
see PERFORMANCE.md "Real-TPU kernel gate"): compiles and executes fwd+bwd
once at the exact G1 bench shape (BT=4864, K=50, C=1024) on the live chip
and checks the results are finite.  Interpret-mode tests cannot see Mosaic
lowering rejections or scoped-VMEM budgets — this can (<1 min):

    python scripts/bench_cand_scorer_tpu.py --smoke
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/chameleon_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from chameleon_recsys_tpu.ops.pallas import cand_scorer as cs

BT, K, C = 256 * 19, 50, 1024
if "--bt" in sys.argv:
    BT = int(sys.argv[sys.argv.index("--bt") + 1])
M1, M2, M3 = 128, 64, 32
DTYPE = jnp.bfloat16


def make_inputs(rng):
    def r(*shape, dtype=DTYPE):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05, dtype)

    return (
        r(BT * K, C),  # i_rows
        r(BT, C),      # u_pre
        r(BT, C),      # pred
        r(C, C), r(C),
        r(C, M1), r(M1),
        r(M1, M2), r(M2),
        r(M2, M3), r(M3),
        r(M3),
    )


def time_fn(fn, args, n=20):
    """Device-trace timing: wall clock through the tunneled backend measures
    RPC latency, not the chip (utils/profiling.py::device_time_ms)."""
    from chameleon_recsys_tpu.utils.profiling import device_time_ms

    return device_time_ms(fn, args, iters=n)


def smoke():
    """Compile + run fwd and fwd+bwd once on the live device; exit nonzero
    on any compile/execute failure or non-finite output."""
    dev = jax.devices()[0]
    print(f"smoke device: {dev} ({jax.default_backend()})", flush=True)
    rng = np.random.RandomState(0)
    args = make_inputs(rng)

    t0 = time.time()
    scores = jax.jit(cs.cand_score_pallas)(*args)
    scores.block_until_ready()
    assert np.isfinite(np.asarray(scores, np.float32)).all(), "fwd non-finite"
    print(f"fwd  compile+run OK ({time.time() - t0:.1f}s) "
          f"scores[0,0]={float(scores[0, 0]):+.5f}", flush=True)

    def loss(*a):
        return jnp.sum(cs.cand_score_pallas(*a))

    t0 = time.time()
    grads = jax.jit(jax.grad(loss, argnums=tuple(range(12))))(*args)
    jax.block_until_ready(grads)
    for i, gr in enumerate(grads):
        assert np.isfinite(np.asarray(gr, np.float32)).all(), \
            f"bwd grad {i} non-finite"
    print(f"bwd  compile+run OK ({time.time() - t0:.1f}s) "
          f"|dcar_w|={float(jnp.abs(grads[3]).sum()):.4f}", flush=True)
    print(f"SMOKE PASS  BT={BT} K={K} C={C} tile_fwd={cs._BT_TILE} "
          f"tile_bwd={cs._BT_TILE_BWD}", flush=True)


def ab_stash():
    """A/B the grad path: recompute-nc backward vs stash-nc backward (the
    latter with the raised per-kernel VMEM limit).  Decides _STASH_NC."""
    rng = np.random.RandomState(0)
    args = make_inputs(rng)

    def loss(*a):
        return jnp.sum(cs.cand_score_pallas(*a))

    grad = jax.grad(loss, argnums=tuple(range(12)))
    for stash in (False, True):
        cs._STASH_NC = stash
        g = jax.jit(grad)
        ms = time_fn(g, args)
        print(f"fwd+bwd stash_nc={stash}: {ms:.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    args = make_inputs(rng)

    def fwd(*a):
        return cs.cand_score_pallas(*a)

    def loss(*a):
        return jnp.sum(cs.cand_score_pallas(*a))

    grad = jax.grad(loss, argnums=tuple(range(12)))

    cs._VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # experiment headroom
    # sublane constraint: tiles must be multiples of 8 AND divide BT=4864
    for tile in (8, 16, 32):
        cs._BT_TILE = tile
        fwd_j = jax.jit(fwd)
        print(f"forward tile={tile}: {time_fn(fwd_j, args):.2f} ms", flush=True)
    cs._BT_TILE = 8
    for tile in (8, 16, 32):
        cs._BT_TILE_BWD = tile
        g = jax.jit(grad)
        ms = time_fn(g, args)
        print(f"fwd+bwd tile_bwd={tile}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        smoke()
    elif "--ab-stash" in sys.argv:
        ab_stash()
    else:
        main()
