"""Same-process A/B of the fused candidate-scorer kernel on the TPU.

Times forward and forward+backward at the G1 shapes for several BACKWARD
tile sizes (the VMEM/double-buffering experiment: the bwd program's live
set includes the f32 weight-grad accumulators; smaller streamed blocks keep
the pipeline overlapped).  Run on the real chip:

    python scripts/bench_cand_scorer_tpu.py
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


def main():
    rng = np.random.RandomState(0)
    args = make_inputs(rng)

    def fwd(*a):
        return cs.cand_score_pallas(*a)

    def loss(*a):
        return jnp.sum(cs.cand_score_pallas(*a))

    grad = jax.grad(loss, argnums=tuple(range(12)))

    fwd_j = jax.jit(fwd)
    print(f"forward (tile {cs._BT_TILE}): {time_fn(fwd_j, args):.2f} ms", flush=True)

    # sublane constraint: backward tiles must be multiples of 8
    for tile in (8, 16):
        cs._BT_TILE_BWD = tile
        g = jax.jit(grad)
        ms = time_fn(g, args)
        print(f"fwd+bwd tile_bwd={tile}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
