#!/bin/bash
# ACR preprocessing for Adressa (reference
# acr_module/scripts/run_acr_preprocessing_adressa.sh: 100k vocab,
# 1000-word cap, Norwegian w2v, 1000 articles per TFRecord)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_adressa"} && \
python -m chameleon_recsys_tpu.cli.acr_preprocess_adressa \
  --input_articles_json_path "${DATA_DIR}/contentdata/*.json" \
  --input_word_embeddings_path "${DATA_DIR}/word_embeddings/no_w2v_skipgram.txt" \
  --output_dir "${DATA_DIR}/articles_tfrecords" \
  --vocab_most_freq_words 100000 \
  --max_sentences 12 \
  --max_words_length 1000 \
  --truncate_tokens_length 300 \
  --articles_by_tfrecord 1000
