#!/bin/bash
# NAR preprocessing for Adressa (reference
# nar_module/scripts/run_nar_preprocessing_adressa.sh).  The reference's
# step 1 runs on a Dataproc Spark cluster; here the sessionization
# (30-min idle cutoff, >=2 clicks, in-session dedup) is built into
# data/preprocessing/sessionization.py and runs locally inside this CLI,
# so only the raw click-log JSON is needed.
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_adressa"} && \
python -m chameleon_recsys_tpu.cli.nar_preprocess_adressa \
  --input_clicks_json_path "${DATA_DIR}/clicks/*.json" \
  --output_sessions_tfrecords_path "${DATA_DIR}/sessions_tfrecords/sessions_hour_*.tfrecord.gz" \
  --output_nar_preprocessing_resources_path "${DATA_DIR}/nar_preprocessing_resources.pickle" \
  --timezone Europe/Oslo
