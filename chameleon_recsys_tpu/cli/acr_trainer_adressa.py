"""ACR training CLI for Adressa: multi-head ACE side task.

Twin of acr_module/acr/acr_trainer_adressa.py:1-408 — the differences from
the G1 trainer: two label heads (``category0`` weighted multiclass +
``keywords`` multilabel, reference :83-88), class weights from preprocessing,
GRU default encoder, and metadata exported with the extra columns.

Usage:
  python -m chameleon_recsys_tpu.cli.acr_trainer_adressa \
    --train_set_path_regex "acr_pre/articles_tokenized_*.tfrecord.gz" \
    --input_word_vocab_embeddings_path acr_pre/acr_word_vocab_embeddings.pickle \
    --input_label_encoders_path acr_pre/acr_label_encoders.pickle \
    --output_acr_metadata_embeddings_path acr_articles_metadata_embeddings.pickle
"""
from __future__ import annotations

import argparse
import glob
import pickle

import numpy as np

from ..acr.trainer import ACRTrainer, export_ace_pickle
from ..config import ACRConfig
from ..data.example_proto import decode_sequence_example
from ..data.tfrecord import read_tfrecord_file
from ..models.acr import ACRLabelSpec

MAX_KEYWORDS = 10


def load_article_arrays(tfrecord_paths, truncate_tokens_length):
    cols = {k: [] for k in (
        "article_id", "category0", "category1", "author", "created_at_ts",
    )}
    texts, lengths, keywords = [], [], []
    for path in tfrecord_paths:
        for record in read_tfrecord_file(path):
            context, sequences = decode_sequence_example(record)
            for k in cols:
                cols[k].append(context.get(k, [0])[0])
            tokens = [int(s[0]) if s else 0 for s in sequences["text"]]
            tokens = tokens[:truncate_tokens_length]
            tokens += [0] * (truncate_tokens_length - len(tokens))
            texts.append(tokens)
            lengths.append(sum(1 for t in tokens if t != 0))
            kw = list(context.get("keywords", []))[:MAX_KEYWORDS]
            kw += [0] * (MAX_KEYWORDS - len(kw))
            keywords.append(kw)
    arrays = {k: np.asarray(v, np.int64) for k, v in cols.items()}
    arrays["text"] = np.asarray(texts, np.int32)
    arrays["text_length"] = np.asarray(lengths, np.int32)
    arrays["keywords"] = np.asarray(keywords, np.int64)
    return arrays


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--train_set_path_regex", required=True)
    p.add_argument("--input_word_vocab_embeddings_path", required=True)
    p.add_argument("--input_label_encoders_path", required=True)
    p.add_argument("--output_acr_metadata_embeddings_path", required=True)
    p.add_argument("--training_task", default="metadata_classification")
    p.add_argument("--text_feature_extractor", default="GRU")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--training_epochs", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--dropout_keep_prob", type=float, default=1.0)
    p.add_argument("--l2_reg_lambda", type=float, default=7e-4)
    p.add_argument("--acr_embeddings_size", type=int, default=250)
    p.add_argument("--rnn_units", type=int, default=250)
    p.add_argument("--rnn_layers", type=int, default=1)
    p.add_argument("--rnn_direction", default="unidirectional",
                   choices=["unidirectional", "bidirectional"])
    p.add_argument("--truncate_tokens_length", type=int, default=300)
    p.add_argument("--autoencoder_noise", type=float, default=0.0)
    p.add_argument("--keywords_weight_on_loss", type=float, default=1.0)
    p.add_argument("--platform", default="", help="force a JAX platform (e.g. cpu)")
    args = p.parse_args(argv)
    if getattr(args, "platform", ""):
        import jax

        jax.config.update("jax_platforms", args.platform)

    with open(args.input_word_vocab_embeddings_path, "rb") as f:
        vocab, word_embeddings = pickle.load(f)
    with open(args.input_label_encoders_path, "rb") as f:
        enc_payload = pickle.load(f)
    encoders = enc_payload["encoders"]
    class_weights = enc_payload.get("class_weights", {})

    files = sorted(glob.glob(args.train_set_path_regex))
    if not files:
        raise SystemExit(f"no article files match {args.train_set_path_regex}")
    articles = load_article_arrays(files, args.truncate_tokens_length)
    print(f"Loaded {len(articles['article_id'])} articles")

    cfg = ACRConfig(
        training_task=args.training_task,
        text_feature_extractor=args.text_feature_extractor,
        word_embedding_size=word_embeddings.shape[1],
        vocab_size=word_embeddings.shape[0],
        truncate_tokens_length=args.truncate_tokens_length,
        acr_embeddings_size=args.acr_embeddings_size,
        rnn_units=args.rnn_units,
        rnn_layers=args.rnn_layers,
        rnn_direction=args.rnn_direction,
        learning_rate=args.learning_rate,
        dropout_keep_prob=args.dropout_keep_prob,
        l2_reg_lambda=args.l2_reg_lambda,
        autoencoder_noise=args.autoencoder_noise,
        batch_size=args.batch_size,
        training_epochs=args.training_epochs,
    )

    label_specs = ()
    trainer_class_weights = None
    if args.training_task == "metadata_classification":
        label_specs = (
            ACRLabelSpec("category0", len(encoders["category0"]), "multiclass"),
            ACRLabelSpec(
                "keywords", len(encoders["keywords"]), "multilabel",
                feature_weight_on_loss=args.keywords_weight_on_loss,
            ),
        )
        trainer_class_weights = {
            "category0": np.asarray(class_weights["category0"], np.float32)
        }

    trainer = ACRTrainer(cfg, word_embeddings, label_specs, trainer_class_weights)
    trainer.fit(articles)
    # evaluate on the TRAIN set — the reference's deliberate-overfit
    # check (acr_trainer_adressa.py:368-375)
    train_metrics = trainer.evaluate(articles)
    if train_metrics:
        print(f"Train-set metrics: {train_metrics}")
    ace_matrix = trainer.build_ace_matrix(articles)

    metadata = {
        key: np.concatenate([[0], articles[key]])
        for key in ("article_id", "category0", "category1", "author",
                    "created_at_ts")
    }
    export_ace_pickle(
        args.output_acr_metadata_embeddings_path, encoders, metadata, ace_matrix
    )
    print(
        f"Exported ACE matrix {ace_matrix.shape} to "
        f"{args.output_acr_metadata_embeddings_path}"
    )


if __name__ == "__main__":
    main()
