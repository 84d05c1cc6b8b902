#!/bin/bash
# ACR preprocessing for G1/Globo.com (reference scripts/run_acr_preprocessing_gcom.sh)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
python -m chameleon_recsys_tpu.cli.acr_preprocess_gcom \
  --input_articles_csv_path "${DATA_DIR}/document_g1/documents_g1.csv" \
  --input_word_embeddings_path "${DATA_DIR}/word2vec/skip_s300.txt" \
  --output_dir "${DATA_DIR}/articles_tfrecords" \
  --vocab_most_freq_words 50000 \
  --max_words_length 1000 \
  --first_sentences 8
