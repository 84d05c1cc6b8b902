#!/bin/bash
# ACR training for Adressa, supervised classification (reference
# acr_module/scripts/run_acr_training_adressa_local_classification.sh:
# batch 8, CNN filters 3/4/5 x128, ACE dim 250, lr 3e-4, L2 1e-5)
DATA_DIR=${DATA_DIR:-"$HOME/chameleon_dataset_adressa"} && \
python -m chameleon_recsys_tpu.cli.acr_trainer_adressa \
  --train_set_path_regex "${DATA_DIR}/articles_tfrecords/adressa_articles_*.tfrecord.gz" \
  --input_word_vocab_embeddings_path "${DATA_DIR}/articles_tfrecords/acr_word_vocab_embeddings.pickle" \
  --input_label_encoders_path "${DATA_DIR}/articles_tfrecords/acr_label_encoders.pickle" \
  --output_acr_metadata_embeddings_path "${DATA_DIR}/acr_articles_metadata_embeddings.pickle" \
  --training_task metadata_classification \
  --text_feature_extractor CNN \
  --batch_size 8 \
  --truncate_tokens_length 300 \
  --training_epochs 1 \
  --learning_rate 3e-4 \
  --dropout_keep_prob 1.0 \
  --l2_reg_lambda 1e-5 \
  --rnn_units 512 \
  --rnn_layers 1 \
  --rnn_direction unidirectional \
  --acr_embeddings_size 250
