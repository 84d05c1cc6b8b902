#!/bin/bash
# GRU4Rec external baseline over the same temporal protocol
# (reference run_gru4rec.py config: bpr-max-0.5, layers [300], n_sample 200)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
python -m chameleon_recsys_tpu.cli.run_gru4rec \
  --train_set_path_regex "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz" \
  --eval_sessions_negative_samples_json_path "/tmp/chameleon_tpu/nar_gcom_full/eval_sessions_negative_samples.json" \
  --num_items 364047 \
  --output_csv "/tmp/chameleon_tpu/gru4rec_eval.csv" \
  --loss bpr-max --bpreg 0.5 --layers 300 --n_sample 200
