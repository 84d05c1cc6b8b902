#!/bin/bash
# ACR training for G1 (reference README.md:114-141: batch 64, lr 3e-4,
# CNN filters 3/4/5 x128, ACE dim 250, 300-token truncation)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
python -m chameleon_recsys_tpu.cli.acr_trainer_gcom \
  --train_set_path_regex "${DATA_DIR}/articles_tfrecords/articles_tokenized_*.tfrecord.gz" \
  --input_word_vocab_embeddings_path "${DATA_DIR}/articles_tfrecords/acr_word_vocab_embeddings.pickle" \
  --input_label_encoders_path "${DATA_DIR}/articles_tfrecords/acr_label_encoders.pickle" \
  --output_acr_metadata_embeddings_path "${DATA_DIR}/acr_articles_metadata_embeddings.pickle" \
  --text_feature_extractor CNN \
  --cnn_filter_sizes "3,4,5" \
  --cnn_num_filters 128 \
  --acr_embeddings_size 250 \
  --truncate_tokens_length 300 \
  --batch_size 64 \
  --training_epochs 5 \
  --learning_rate 3e-4 \
  --dropout_keep_prob 1.0 \
  --l2_reg_lambda 7e-4
