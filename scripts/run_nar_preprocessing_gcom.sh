#!/bin/bash
# NAR preprocessing for G1: hourly click CSVs -> per-hour session TFRecords
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
python -m chameleon_recsys_tpu.cli.nar_preprocess_gcom \
  --input_clicks_csv_path_regex "${DATA_DIR}/clicks/clicks_hour_*.csv" \
  --output_sessions_tfrecords_path "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz"
