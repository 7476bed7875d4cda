"""multimodal_rssm_tpu — a TPU-native JAX framework for Multimodal Recurrent
State-Space Models (MRSSM).

A ground-up re-design of the capabilities of the PyTorch reference
(EmergentSystemLabStudent/Multimodal-RSSM) for TPU hardware:

- the trajectory recurrence is a single `lax.scan` (time-major) instead of a
  Python loop (reference: utils/models/transition_model.py:66,226);
- conv/MLP observation encoders and decoders run over the folded (T*B) batch
  in bf16 on the MXU (reference folds via "bottle_tupele",
  utils/models/encoder.py:13-48);
- multimodal posterior fusion (PoE / MoPoE / NN) is a set of pure functions
  over stacked expert (mean, std) tensors (reference:
  utils/models/encoder.py:50-124);
- training is one jit-compiled, donated `(state, batch, key) -> (state,
  metrics)` step, data-parallel over a `jax.sharding.Mesh` batch axis;
- the host->device feed stores uint8 episodes in host RAM and performs
  augmentation + bit-depth normalisation on device.

Package layout:
  core/      config system (hydra-compatible YAML groups), PRNG discipline
  ops/       pure math: Gaussians, categorical latents, expert fusion,
             image normalisation, GLU
  models/    flax linen modules: encoders, decoders, heads, policy/value
  rssm/      the scan-based RSSM core (prior/posterior rollouts)
  losses/    ELBO: reconstruction, KL balancing, free nats, overshooting
  data/      episode store, chunk sampler, augmentation, pose processing
  train/     optimizer, jitted train step, training loop
  parallel/  mesh + sharding helpers (data-parallel over ICI)
  io/        checkpointing, PyTorch checkpoint import, metric logging
  eval/      state estimation, reconstruction, open-loop imagination, PCA
  bench/     throughput/parity benchmark harness
"""

__version__ = "0.1.0"
