#!/bin/bash
# NAR temporal training for G1 — the paper-reproduction configuration
# (reference README.md:255-308: batch 256, lr 1e-4, L2 1e-5, temp 0.1,
# CAR 1024, UGRNN 255x2, 50 negatives / 3000 from a 20k buffer, top-10,
# content scale 6.0, 384 hourly files, eval every 5 train hours)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
MODEL_DIR=${MODEL_DIR:-"/tmp/chameleon_tpu/nar_gcom_full"} && \
python -m chameleon_recsys_tpu.cli.nar_trainer_gcom \
  --train_set_path_regex "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz" \
  --acr_module_articles_metadata_csv_path "${DATA_DIR}/articles_metadata.csv" \
  --acr_module_articles_content_embeddings_pickle_path "${DATA_DIR}/articles_embeddings.pickle" \
  --model_dir "${MODEL_DIR}" \
  --train_files_from 0 \
  --train_files_up_to 384 \
  --training_hours_for_each_eval 5 \
  --batch_size 256 \
  --truncate_session_length 20 \
  --learning_rate 1e-4 \
  --dropout_keep_prob 1.0 \
  --reg_l2_rate 1e-5 \
  --softmax_temperature 0.1 \
  --CAR_embedding_size 1024 \
  --rnn_units 255 \
  --rnn_num_layers 2 \
  --train_total_negative_samples 50 \
  --train_negative_samples_from_buffer 3000 \
  --eval_total_negative_samples 50 \
  --eval_negative_samples_from_buffer 5000 \
  --eval_metrics_top_n 10 \
  --recent_clicks_buffer_hours 1.0 \
  --recent_clicks_buffer_max_size 20000 \
  --recent_clicks_for_normalization 5000 \
  --content_embedding_scale_factor 6.0 \
  --save_eval_sessions_negative_samples \
  --enabled_internal_features "recency,novelty,article_content_embeddings,item_clicked_embeddings"
