#!/bin/bash
# NAR training for Adressa (reference scripts/run_nar_train_adressa_local.sh:9-40:
# batch 64, lr 3e-4, L2 1e-4, temp 0.2, rnn 10x1, 7 negatives, top-5)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_adressa"} && \
MODEL_DIR=${MODEL_DIR:-"/tmp/chameleon_tpu/nar_adressa"} && \
python -m chameleon_recsys_tpu.cli.nar_trainer_adressa \
  --train_set_path_regex "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz" \
  --acr_module_resources_path "${DATA_DIR}/acr_articles_metadata_embeddings.pickle" \
  --nar_module_preprocessing_resources_path "${DATA_DIR}/nar_preprocessing_resources.pickle" \
  --model_dir "${MODEL_DIR}" \
  --training_hours_for_each_eval 5 \
  --batch_size 64 \
  --learning_rate 3e-4 \
  --reg_l2_rate 1e-4 \
  --softmax_temperature 0.2 \
  --CAR_embedding_size 1024 \
  --rnn_units 10 \
  --rnn_num_layers 1 \
  --train_total_negative_samples 7 \
  --eval_total_negative_samples 7 \
  --eval_metrics_top_n 5
