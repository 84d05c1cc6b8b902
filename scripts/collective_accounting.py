"""HLO collective accounting for the sharded NAR train step.

Compiles the PRODUCTION sharded train step (the exact
``shard_nar_programs`` path the trainer uses) at the G1-scale
configuration over (data x model) meshes of 1/2/4/8 virtual CPU devices,
parses the optimized HLO, and reports bytes moved per step by collective
kind and mesh axis.  From those byte counts PERFORMANCE.md derives an
ICI-bandwidth scaling-efficiency bound for real multi-chip slices — the
measurement that cannot be taken on this 1-chip host.

No step is executed: everything happens on ShapeDtypeStructs + AOT
``lower().compile()``, so the only cost is XLA compile time.

Usage: python scripts/collective_accounting.py [--configs 1x1,2x1,4x1,8x1,4x2]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# must precede jax import effects: virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from chameleon_recsys_tpu.utils.jax_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

from chameleon_recsys_tpu.config import (
    NARConfig,
    gcom_article_schema,
    gcom_session_schema,
)
from chameleon_recsys_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    params_sharding,
    replicated,
    state_sharding,
)
from chameleon_recsys_tpu.train.steps import build_nar_train, nar_init_state

NUM_ITEMS = 46_034
ACE_DIM = 250
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

# matches e.g. "all-reduce.3 = (f32[255,1024]{1,0}, ...)" or
# "ag = bf16[2,50,1024]{...} all-gather(...)"
_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?[%\w.\-]+\s*=\s*(\([^)]*\)|[\w\[\],{}\s]+?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start|-done)?\(", re.M)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(\{[\d,{} ]*\})\}")
_SRC_TGT_RE = re.compile(r"source_target_pairs=\{([\d,{} ]*)\}")


def shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def classify_axis(groups_str: str, dp: int, mp: int) -> str:
    """Mesh devices are laid out row-major (data-major, model-minor):
    device id = d*mp + m.  A group whose ids share d varies over the model
    axis; sharing m varies over data."""
    try:
        groups = [
            [int(x) for x in g.split(",") if x.strip()]
            for g in re.findall(r"\{([\d, ]*)\}", groups_str)
        ]
    except ValueError:
        return "?"
    groups = [g for g in groups if g]
    if not groups:
        return "?"
    g0 = groups[0]
    if len(g0) == dp * mp:
        return "both"
    same_d = len({i // mp for i in g0}) == 1
    same_m = len({i % mp for i in g0}) == 1
    if same_d and not same_m:
        return "model"
    if same_m and not same_d:
        return "data"
    return "mixed"


def account(hlo_text: str, dp: int, mp: int):
    per = {}
    ops = []
    for m in _COLL_RE.finditer(hlo_text):
        type_str, kind = m.group(1), m.group(2)
        if "-done(" in m.group(0):
            continue  # bytes counted at the -start/plain op
        line_end = hlo_text.find("\n", m.end())
        line = hlo_text[m.start():line_end]
        gm = _GROUPS_RE.search(line)
        axis = classify_axis(gm.group(1), dp, mp) if gm else (
            "permute" if _SRC_TGT_RE.search(line) else "?"
        )
        key = (kind, axis)
        d = per.setdefault(key, {"count": 0, "bytes": 0})
        d["count"] += 1
        nbytes = shape_bytes(type_str)
        d["bytes"] += nbytes
        ops.append({"kind": kind, "axis": axis, "bytes": nbytes,
                    "type": " ".join(type_str.split())[:120]})
    ops.sort(key=lambda o: -o["bytes"])
    return per, ops[:12]


def build(dp: int, mp: int):
    devices = jax.devices()[: dp * mp]
    plan = make_mesh(data_parallelism=dp, model_parallelism=mp,
                     devices=devices)
    cfg = NARConfig(
        car_embedding_size=1024,
        rnn_units=255,
        rnn_num_layers=2,
        negative_samples=50,
        negative_sample_from_buffer=3000,
        eval_negative_samples=50,
        eval_negative_sample_from_buffer=5000,
        recent_clicks_buffer_max_size=20000,
        recent_clicks_for_normalization=5000,
        batch_size=256,
        max_session_length=20,
        metrics_top_n=10,
        compute_dtype="bfloat16",
        train_valid_row_capacity=1024,
        train_compaction_groups=dp,
    )
    session_schema = gcom_session_schema(num_items=NUM_ITEMS)
    article_schema = gcom_article_schema(num_items=NUM_ITEMS)

    rng = np.random.RandomState(0)
    T = cfg.max_session_length
    batch = {}
    from chameleon_recsys_tpu.data.collate import batches_from_sessions
    from chameleon_recsys_tpu.data.collate import Session

    sessions = []
    for i in range(cfg.batch_size):
        L = int(rng.randint(2, 6))
        ctx = {}
        for spec in session_schema.context_sequence_features():
            if spec.kind == "categorical":
                ctx[spec.name] = rng.randint(1, spec.cardinality, L).tolist()
            else:
                ctx[spec.name] = rng.uniform(-1, 1, L).astype(np.float32).tolist()
        sessions.append(Session(
            session_id=i, user_id=int(rng.randint(1, 1000)),
            session_start=1000 + i,
            item_ids=(rng.randint(1, NUM_ITEMS, L)).tolist(),
            timestamps=(1000 + np.arange(L) * 10).tolist(),
            context=ctx,
        ))
    batch = next(iter(batches_from_sessions(
        sessions, session_schema, cfg.batch_size, T)))

    ace = np.zeros((NUM_ITEMS, ACE_DIM), np.float32)
    metadata = {
        "created_at_ts": np.zeros(NUM_ITEMS, np.int64),
        "category_id": np.zeros(NUM_ITEMS, np.int64),
    }
    programs = build_nar_train(cfg, session_schema, article_schema)
    _, _, state = nar_init_state(
        cfg, session_schema, article_schema,
        {k: jax.numpy.asarray(v) for k, v in batch.items()},
        ace, metadata,
    )

    state_sh = state_sharding(plan, state, min_rows=4096)
    batch_sh = batch_sharding(plan, batch)
    ace_sh = params_sharding(plan, ace, min_rows=4096)
    meta_sh = {k: replicated(plan) for k in metadata}
    _, tm_shape = jax.eval_shape(
        programs.train_step_fn, state, batch, ace, metadata)
    tm_sh = jax.tree_util.tree_map(lambda _: replicated(plan), tm_shape)

    jitted = jax.jit(
        programs.train_step_fn,
        in_shardings=(state_sh, batch_sh, ace_sh, meta_sh),
        out_shardings=(state_sh, tm_sh),
        donate_argnums=(0,),
    )
    lowered = jitted.lower(state, batch, ace, metadata)
    return lowered.compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1x1,2x1,4x1,8x1,4x2")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    report = {}
    for conf in args.configs.split(","):
        dp, mp = (int(x) for x in conf.split("x"))
        print(f"== compiling sharded train step: mesh data={dp} model={mp}",
              flush=True)
        compiled = build(dp, mp)
        text = compiled.as_text()
        per, top_ops = account(text, dp, mp)
        rows = {
            f"{kind}/{axis}": dict(v)
            for (kind, axis), v in sorted(per.items())
        }
        total = sum(v["bytes"] for v in per.values())
        report[conf] = {"collectives": rows, "total_bytes_per_step": total,
                        "largest_ops": top_ops}
        print(json.dumps(report[conf], indent=2), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
