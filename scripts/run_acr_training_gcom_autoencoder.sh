#!/bin/bash
# ACR training for G1, unsupervised GRU sequence-denoising autoencoder
# (reference acr_module/scripts/run_acr_training_gcom_local_autoencoder.sh:
# batch 32, 30-token truncation, 20 epochs, lr 1e-4, noise 0.05)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_gcom"} && \
python -m chameleon_recsys_tpu.cli.acr_trainer_gcom \
  --train_set_path_regex "${DATA_DIR}/articles_tfrecords/articles_tokenized_*.tfrecord.gz" \
  --input_word_vocab_embeddings_path "${DATA_DIR}/articles_tfrecords/acr_word_vocab_embeddings.pickle" \
  --input_label_encoders_path "${DATA_DIR}/articles_tfrecords/acr_label_encoders.pickle" \
  --output_acr_metadata_embeddings_path "${DATA_DIR}/acr_articles_metadata_embeddings_unsupervised_gru.pickle" \
  --training_task autoencoder \
  --text_feature_extractor GRU \
  --autoencoder_noise 0.05 \
  --batch_size 32 \
  --truncate_tokens_length 30 \
  --training_epochs 20 \
  --learning_rate 1e-4 \
  --dropout_keep_prob 1.0 \
  --l2_reg_lambda 7e-4 \
  --rnn_units 512 \
  --rnn_layers 1 \
  --rnn_direction unidirectional \
  --acr_embeddings_size 250
