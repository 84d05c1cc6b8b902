"""Serve the trained pseudo-Adressa campaign checkpoint with NARServer.

Closes the loop from the end-to-end Adressa campaign (ACR train -> ACE
export -> NAR temporal training, RESULTS.md "pseudo-Adressa campaign")
to a deployable artifact: load the campaign checkpoint (params + live
streaming state incl. the recent-clicks buffer) into ``NARServer``,
build the recommendable pool from the live buffer, and measure
recommend() latency at batch 1 and 32 on the chip.

Usage:
  PYTHONPATH=/root/repo python scripts/serve_adressa_campaign.py \
      --data_dir g1data/adressa [--batch_sizes 1,32] [--iters 200]
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="g1data/adressa")
    ap.add_argument("--model_dir", default="")
    ap.add_argument("--batch_sizes", default="1,32")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--num_candidates", type=int, default=500)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    d = args.data_dir
    model_dir = args.model_dir or os.path.join(d, "nar_run")

    from chameleon_recsys_tpu.cli.nar_preprocess_adressa import (
        adressa_article_schema,
        adressa_session_schema,
    )
    from chameleon_recsys_tpu.config import (
        ADRESSA_ARTICLE_FEATURE_GROUPS,
        NARConfig,
        filter_article_schema,
    )
    from chameleon_recsys_tpu.data.collate import Session
    from chameleon_recsys_tpu.serve import NARServer

    # same asset loading as cli/nar_trainer_adressa.py:94-149
    with open(os.path.join(d, "acr_articles_metadata_embeddings.pickle"),
              "rb") as f:
        acr_label_encoders, metadata_raw, ace = pickle.load(f)
    norms = np.linalg.norm(ace, axis=1, keepdims=True)
    ace = np.divide(ace, norms, out=np.zeros_like(ace), where=norms > 0)
    ace = (ace * 6.0).astype(np.float32)
    with open(os.path.join(d, "nar_resources.pickle"), "rb") as f:
        resources = pickle.load(f)
    cardinalities = dict(resources.get("cardinalities", {}))
    num_items = max(int(cardinalities.get("item_clicked", 0)), ace.shape[0])
    if ace.shape[0] < num_items:
        ace = np.vstack([ace, np.zeros(
            (num_items - ace.shape[0], ace.shape[1]), np.float32)])
    if isinstance(acr_label_encoders, dict):
        for name, enc in acr_label_encoders.items():
            try:
                cardinalities.setdefault(name, len(enc))
            except TypeError:
                pass
    article_schema = filter_article_schema(
        adressa_article_schema(num_items=num_items, cardinalities=cardinalities),
        "ALL", groups_map=ADRESSA_ARTICLE_FEATURE_GROUPS,
    )
    session_schema = adressa_session_schema(cardinalities)
    metadata = {}
    for spec in article_schema.features:
        if spec.name == "article_id":
            continue
        col = np.zeros(num_items, np.int64)
        src = metadata_raw.get(spec.name) if isinstance(metadata_raw, dict) else None
        if src is not None:
            src = np.asarray(src)
            if spec.name == "created_at_ts":
                src = src // 1000
            col[: min(len(src), num_items)] = src[:num_items]
        metadata[spec.name] = col

    # the campaign's NAR config (scripts/run_nar_train_adressa_local.sh)
    cfg = NARConfig(
        car_embedding_size=1024, rnn_units=10, rnn_num_layers=1,
        softmax_temperature=0.2, negative_samples=7,
        eval_negative_samples=7, recent_clicks_buffer_max_size=20000,
        recent_clicks_for_normalization=2000, batch_size=64,
        max_session_length=20, metrics_top_n=5,
    )

    t0 = time.time()
    server = NARServer.from_checkpoint(
        os.path.join(model_dir, "checkpoint.pkl"), cfg, session_schema,
        article_schema, ace, metadata,
    )
    pool = server.default_candidates(args.num_candidates)
    live = int((pool != 0).sum())
    load_s = time.time() - t0

    ctx_specs = session_schema.context_sequence_features()
    rng = np.random.RandomState(0)
    buffer_ids = pool[pool != 0]
    max_ts = int(np.asarray(server.stream.buffer_ts).max())

    def make_sessions(n):
        out = []
        for i in range(n):
            k = int(rng.randint(2, 6))
            items = rng.choice(buffer_ids, size=k).tolist()
            ts = [max_ts - 60 * (k - j) for j in range(k)]
            ctx = {}
            for spec in ctx_specs:
                if spec.kind == "categorical":
                    ctx[spec.name] = rng.randint(1, max(spec.cardinality, 2),
                                                 size=k).tolist()
                else:
                    ctx[spec.name] = rng.uniform(-1, 1, size=k).tolist()
            out.append(Session(session_id=i, user_id=1, session_start=max_ts,
                               item_ids=items, timestamps=ts, context=ctx))
        return out

    report = {"checkpoint_load_s": round(load_s, 2),
              "live_pool": live, "results": {}}
    for bs in (int(x) for x in args.batch_sizes.split(",")):
        sessions = make_sessions(bs)
        cand = np.broadcast_to(pool, (bs, len(pool))).copy()
        # warmup/compile
        for _ in range(3):
            recs = server.recommend(sessions, candidates=cand, top_k=5)
        lat = []
        for _ in range(args.iters):
            t = time.time()
            recs = server.recommend(sessions, candidates=cand, top_k=5)
            np.asarray(recs[0])
            lat.append((time.time() - t) * 1e3)
        lat = np.array(lat)
        report["results"][f"batch_{bs}"] = {
            "p50_ms": round(float(np.percentile(lat, 50)), 3),
            "p99_ms": round(float(np.percentile(lat, 99)), 3),
            "sessions_per_s": round(bs / (np.percentile(lat, 50) / 1e3), 1),
        }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
