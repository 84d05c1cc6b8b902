"""chameleon_recsys_tpu — a TPU-native session-based news recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the CHAMELEON meta-architecture
(reference: gabrielspmoreira/chameleon_recsys):

* ``acr``     — Article Content Representation: trains Article Content
  Embeddings (ACE) from article text via CNN / GRU classifiers or a GRU
  sequence-denoising autoencoder.
* ``models``  — NAR (Next-Article Recommendation): a UGRNN session model
  fusing frozen ACEs with user context and dynamic article features,
  ranking 1 positive against K sampled negatives.
* ``state``   — device-resident streaming state (recent-clicks buffer,
  popularity) threaded functionally through the jitted train step.
* ``ops``     — TPU compute kernels: UGRNN/GRU scans, fixed-shape negative
  sampling, buffer-stat normalization (lax + Pallas variants).
* ``metrics`` — full streaming metric suite (HR/MRR/NDCG/COV/ESI/EILD/...).
* ``baselines`` — classical session recommenders sharing the eval contract.
* ``train``   — streaming temporal train/eval harness with checkpoint/resume.
* ``parallel``— mesh / sharding layout for multi-host execution.
"""

__version__ = "0.1.0"
