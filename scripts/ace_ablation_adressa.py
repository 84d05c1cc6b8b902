"""ACE-method + input-configuration ablation study (the papers' raison
d'être experiments — reference README.md:194 "Input Configurations";
acr_module/acr/preprocessing/{lsa,doc2vec,w2v_tfidf}_*.py).

On ONE fixed pseudo-Adressa stream, run the UNMODIFIED NAR trainer with
the Article Content Embeddings produced by each method:

  cnn        ACR CNN classifier (the campaign ACE)
  sdae       ACR GRU sequence-denoising autoencoder
  lsa        latent semantic analysis          (acr/ace_baselines.py)
  w2v_tfidf  TF-IDF-weighted word2vec average  (acr/ace_baselines.py)
  doc2vec    PV-DBOW                           (acr/ace_baselines.py)

plus the internal-feature off-axes with the CNN ACE:

  no_ace     --enabled_internal_features recency,novelty,item_clicked_embeddings
  no_recency --enabled_internal_features novelty,article_content_embeddings,item_clicked_embeddings
  no_novelty --enabled_internal_features recency,article_content_embeddings,item_clicked_embeddings

Each row = one `cli.nar_trainer_adressa` run at the paper's Adressa
configuration with `--disable_eval_benchmarks` (the classical tier is
identical across rows); the summary aggregates click-weighted
HR/MRR/NDCG/ESI-RR over all eval hours.

Usage:
  PYTHONPATH=/root/repo python scripts/ace_ablation_adressa.py \
      --data_dir g1data/adressa_mixed --out_dir g1data/adressa_mixed/ablation \
      [--rows cnn,sdae,...] [--hours 0]   # 0 = full stream
"""
import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ABLATION_FEATURES = {
    "no_ace": "recency,novelty,item_clicked_embeddings",
    "no_recency": "novelty,article_content_embeddings,item_clicked_embeddings",
    "no_novelty": "recency,article_content_embeddings,item_clicked_embeddings",
    # no article-side content AT ALL: ACE off AND the category/author
    # metadata towers off (the metadata features otherwise carry the
    # category signal, masking the ACE contribution)
    "no_content": "recency,novelty,item_clicked_embeddings",
}
ROW_EXTRA_ARGS = {
    "no_content": ["--enabled_articles_input_features_groups", "NONE"],
}
ACE_METHODS = ("cnn", "sdae", "lsa", "w2v_tfidf", "doc2vec")
DEFAULT_ROWS = list(ACE_METHODS) + list(ABLATION_FEATURES)


def sh(cmd, log_path):
    env = dict(os.environ, PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    with open(log_path, "w") as log:
        rc = subprocess.call(cmd, stdout=log, stderr=subprocess.STDOUT,
                             cwd=REPO, env=env)
    if rc != 0:
        raise RuntimeError(f"{cmd[:3]}... rc={rc}; see {log_path}")


def ensure_ace(row, d, out_dir):
    """Return the ACE pickle path for a row, producing it if needed."""
    if row in ABLATION_FEATURES or row == "cnn":
        return os.path.join(d, "acr_articles_metadata_embeddings.pickle")
    path = os.path.join(out_dir, f"ace_{row}.pickle")
    if os.path.exists(path):
        return path
    t0 = time.time()
    if row == "sdae":
        # reference unsupervised config (run_acr_training_*_autoencoder.sh:
        # GRU 512x1, noise 0.05, 30-token truncation, lr 1e-4) — epochs cut
        # to 10 at this corpus size
        sh([sys.executable, "-m",
            "chameleon_recsys_tpu.cli.acr_trainer_adressa",
            "--train_set_path_regex", f"{d}/acr/articles_tokenized_*.tfrecord.gz",
            "--input_word_vocab_embeddings_path", f"{d}/acr/acr_word_vocab_embeddings.pickle",
            "--input_label_encoders_path", f"{d}/acr/acr_label_encoders.pickle",
            "--output_acr_metadata_embeddings_path", path,
            "--training_task", "autoencoder", "--text_feature_extractor", "GRU",
            "--autoencoder_noise", "0.05", "--batch_size", "32",
            "--truncate_tokens_length", "30", "--training_epochs", "10",
            "--learning_rate", "1e-4", "--rnn_units", "512",
            "--acr_embeddings_size", "250"],
           os.path.join(out_dir, "ace_sdae.log"))
    else:
        sh([sys.executable, "-m",
            "chameleon_recsys_tpu.cli.ace_baselines_cli",
            "--method", row,
            "--train_set_path_regex", f"{d}/acr/articles_tokenized_*.tfrecord.gz",
            "--input_word_vocab_embeddings_path", f"{d}/acr/acr_word_vocab_embeddings.pickle",
            "--input_label_encoders_path", f"{d}/acr/acr_label_encoders.pickle",
            "--output_acr_metadata_embeddings_path", path,
            "--platform", "cpu"],
           os.path.join(out_dir, f"ace_{row}.log"))
    print(f"[ace] {row} exported in {time.time()-t0:.0f}s", flush=True)
    return path


def aggregate(csv_path):
    rows = list(csv.DictReader(open(csv_path)))
    out = {}
    tot = sum(float(r["clicks_count"]) for r in rows)
    for m in ("hitrate_at_n", "mrr_at_n", "ndcg_at_n", "esi-rr_at_n"):
        col = f"{m}_chameleon"
        out[m] = round(sum(
            float(r[col]) * float(r["clicks_count"]) for r in rows
        ) / tot, 4)
    out["eval_rows"] = len(rows)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="g1data/adressa_mixed")
    ap.add_argument("--out_dir", default="")
    ap.add_argument("--rows", default=",".join(DEFAULT_ROWS))
    ap.add_argument("--hours", type=int, default=0,
                    help="train on the first N hour files (0 = all)")
    ap.add_argument("--capacity", type=int, default=384)
    args = ap.parse_args()
    d = os.path.abspath(os.path.join(REPO, args.data_dir))
    out_dir = os.path.abspath(args.out_dir or os.path.join(d, "ablation"))
    os.makedirs(out_dir, exist_ok=True)

    regex = f"{d}/sessions/sessions_hour_*.tfrecord.gz"
    if args.hours:
        import glob

        files = sorted(glob.glob(regex))[: args.hours]
        # trainer takes a glob; restrict via a zero-padded range pattern
        # by symlinking the slice into a sub-dir
        slice_dir = os.path.join(out_dir, f"slice_{args.hours}")
        os.makedirs(slice_dir, exist_ok=True)
        for f in files:
            dst = os.path.join(slice_dir, os.path.basename(f))
            if not os.path.exists(dst):
                os.symlink(f, dst)
        regex = f"{slice_dir}/sessions_hour_*.tfrecord.gz"

    summary = {}
    for row in args.rows.split(","):
        t0 = time.time()
        ace_path = ensure_ace(row, d, out_dir)
        model_dir = os.path.join(out_dir, f"nar_{row}")
        feats = ABLATION_FEATURES.get(row, "ALL")
        csv_path = os.path.join(model_dir, "eval_stats_benchmarks.csv")
        if not os.path.exists(csv_path):
            sh([sys.executable, "-m",
                "chameleon_recsys_tpu.cli.nar_trainer_adressa",
                "--train_set_path_regex", regex,
                "--acr_module_resources_path", ace_path,
                "--nar_module_preprocessing_resources_path", f"{d}/nar_resources.pickle",
                "--model_dir", model_dir, "--training_hours_for_each_eval", "5",
                "--batch_size", "64", "--learning_rate", "3e-4",
                "--reg_l2_rate", "1e-4", "--softmax_temperature", "0.2",
                "--CAR_embedding_size", "1024", "--rnn_units", "10",
                "--rnn_num_layers", "1", "--train_total_negative_samples", "7",
                "--eval_total_negative_samples", "7", "--eval_metrics_top_n", "5",
                "--train_valid_row_capacity", str(args.capacity),
                "--enabled_internal_features", feats,
                "--disable_eval_benchmarks"]
               + ROW_EXTRA_ARGS.get(row, []),
               os.path.join(out_dir, f"nar_{row}.log"))
        summary[row] = aggregate(csv_path)
        summary[row]["wall_s"] = round(time.time() - t0, 1)
        print(f"[row] {row}: {summary[row]}", flush=True)
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    print("\n| configuration | HR@5 | MRR@5 | NDCG@5 | ESI-RR@5 |")
    print("|---|---|---|---|---|")
    for row, s in summary.items():
        print(f"| {row} | {s['hitrate_at_n']:.3f} | {s['mrr_at_n']:.3f} "
              f"| {s['ndcg_at_n']:.3f} | {s['esi-rr_at_n']:.3f} |")


if __name__ == "__main__":
    main()
