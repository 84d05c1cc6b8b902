#!/bin/bash
# NAR training for G1 — the small local configuration
# (reference README.md:205-245: batch 64, lr 3e-5, rnn 255x1, 30 negatives,
# top-6, 72 hourly files)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
MODEL_DIR=${MODEL_DIR:-"/tmp/chameleon_tpu/nar_gcom_local"} && \
python -m chameleon_recsys_tpu.cli.nar_trainer_gcom \
  --train_set_path_regex "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz" \
  --acr_module_articles_metadata_csv_path "${DATA_DIR}/articles_metadata.csv" \
  --acr_module_articles_content_embeddings_pickle_path "${DATA_DIR}/articles_embeddings.pickle" \
  --model_dir "${MODEL_DIR}" \
  --train_files_from 0 \
  --train_files_up_to 72 \
  --training_hours_for_each_eval 5 \
  --batch_size 64 \
  --learning_rate 3e-5 \
  --rnn_units 255 \
  --rnn_num_layers 1 \
  --train_total_negative_samples 30 \
  --eval_total_negative_samples 30 \
  --eval_metrics_top_n 6
