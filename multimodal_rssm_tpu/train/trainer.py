"""Optimizer, the jit-compiled train step, and the training loop helpers.

TPU-native replacement for the reference trainer
(algos/MRSSM/base/algo.py:244-293 + algos/MRSSM/MRSSM/train.py:27-66):

- one donated, jit-compiled ``(state, batch, aug, key) -> (state, metrics)``
  step containing the device half of the input pipeline (crop / noise / PCA
  colour / bit-depth normalise), the encoder, the scan, the ELBO, and the
  optax update — the reference runs these as ~5 separate torch phases per
  iteration;
- optax chain(clip_by_global_norm(grad_clip), adam(lr, eps)) with the
  reference's linear warm-up when ``learning_rate_schedule != 0``
  (ref base/algo.py:40-42, 194-198, 258);
- mixed precision = bf16 compute / f32 params+loss (``use_amp``), replacing
  torch.cuda.amp + GradScaler (bf16 needs no loss scaling);
- data parallelism: batches sharded over the mesh ``data`` axis, params
  replicated; XLA inserts the gradient all-reduce.

Loss metric names match the reference's wandb keys
(``observation_{name}_loss``, ``reward_loss``, ``kl_loss_sum``, ``kl_loss``,
``observations_loss_sum`` — ref base/algo.py:224-230).

Augmentation split: per-batch *choices* (crop index, noise scale, PCA rand)
are drawn on the host exactly like the reference's np.random calls
(data_augment.py:178-208), but enter the jitted step as traced scalars so
no recompilation ever happens; which augmentations exist at all is static
(``AugSpec``) and baked into the compiled step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodal_rssm_tpu.data import augment as aug
from multimodal_rssm_tpu.losses import elbo
from multimodal_rssm_tpu.losses.overshoot import overshooting_losses
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.ops.image import normalize_image


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def compute_dtype(cfg):
    """bf16 compute when use_amp (TPU-native AMP; ref train.yaml:29)."""
    return jnp.bfloat16 if cfg.train.use_amp else jnp.float32


def build_optimizer(cfg) -> optax.GradientTransformation:
    lr = float(cfg.rssm.model_learning_rate)
    schedule_steps = int(cfg.rssm.learning_rate_schedule or 0)
    if schedule_steps:
        # Reference ramps lr linearly from 0 to lr over `schedule` steps
        # (base/algo.py:194-198).
        schedule = optax.linear_schedule(0.0, lr, schedule_steps)
    else:
        schedule = lr
    return optax.chain(
        optax.clip_by_global_norm(float(cfg.rssm.grad_clip_norm)),
        optax.adam(schedule, eps=float(cfg.rssm.adam_epsilon)),
    )


# -- augmentation plumbing ------------------------------------------------


class ModalityAugSpec(NamedTuple):
    """Static (hashable) augmentation structure for one image modality."""

    out_size: Tuple[int, int]      # crop target H, W
    needs_crop: bool               # stored size > out size
    noise: bool                    # gaussian noise enabled
    pca: bool                      # PCA colour shift enabled
    normalize: bool                # bit-depth normalise (False for "bin")


class AugSpec(NamedTuple):
    """Static augmentation structure for the whole batch (closure of the
    compiled train step)."""

    modalities: Tuple[Tuple[str, ModalityAugSpec], ...]

    def get(self, name: str) -> Optional[ModalityAugSpec]:
        for n, spec in self.modalities:
            if n == name:
                return spec
        return None


def build_aug_spec(buffer) -> AugSpec:
    """Derive the static spec from a buffer's configuration."""
    mods = []
    for name in buffer.observation_names:
        if "image" not in name:
            continue
        stored_hw = tuple(buffer.observations[name].shape[1:3])
        out_size = (
            aug.crop_size_for(name) if buffer.n_crop is not None else stored_hw
        )
        noise = (
            "bin" not in name
            and buffer.noise_scales is not None
            and any(s > 0 for s in buffer.noise_scales)
        )
        pca = (
            "bin" not in name
            and buffer.pca_scales is not None
            and any(s > 0 for s in buffer.pca_scales)
            and buffer.p_eigen_vectors.get(name) is not None
        )
        mods.append(
            (
                name,
                ModalityAugSpec(
                    out_size=out_size,
                    needs_crop=stored_hw != out_size,
                    noise=noise,
                    pca=pca,
                    normalize="bin" not in name,
                ),
            )
        )
    return AugSpec(modalities=tuple(mods))


class HostAugmentDraws:
    """Draw per-batch augmentation values on the host (ref
    data_augment.py:178-208 np.random choices): crop offsets from the
    deterministic spiral, a noise scale, a shared PCA rand vector."""

    def __init__(self, buffer, spec: AugSpec, seed: int = 0):
        self.buffer = buffer
        self.spec = spec
        self.rng = np.random.default_rng(seed)

    def draw(self) -> Dict[str, Dict[str, np.ndarray]]:
        b = self.buffer
        out: Dict[str, Dict[str, np.ndarray]] = {}
        pca_rand = None
        for name, mspec in self.spec.modalities:
            entry: Dict[str, np.ndarray] = {}
            if mspec.needs_crop:
                crop_idx = int(self.rng.integers(0, b.n_crop))
                stored_hw = b.observations[name].shape[1:3]
                dh, dw = aug.idx_to_offsets(
                    crop_idx, stored_hw, mspec.out_size, b.dh_base, b.dw_base
                )
                entry["crop"] = np.asarray([dh, dw], np.int32)
            if mspec.noise:
                entry["noise"] = np.float32(
                    b.noise_scales[int(self.rng.integers(0, len(b.noise_scales)))]
                )
            if mspec.pca:
                if pca_rand is None:
                    scale = float(
                        b.pca_scales[int(self.rng.integers(0, len(b.pca_scales)))]
                    )
                    pca_rand = (
                        self.rng.standard_normal(3).astype(np.float32) * scale
                        if scale > 0
                        else np.zeros(3, np.float32)
                    )
                entry["pca"] = aug.pca_delta(
                    b.p_eigen_vectors[name], b.lambd_eigen_values[name], pca_rand
                ).astype(np.float32)
            out[name] = entry
        return out


def pallas_normalize_enabled(cfg) -> bool:
    """Resolve ``train.pallas_normalize`` (false | true | auto): whether the
    fused Pallas bit-depth-normalise kernel (ops/pallas_kernels.py) replaces
    the jax.random path inside the train step.  "auto" = on TPU only (the
    kernel is TPU pallas; distribution-equivalent but not bit-identical to
    the keyed jax.random noise, so runs with it on/off are statistically —
    not bitwise — comparable)."""
    mode = str(cfg.train.get("pallas_normalize", "auto")).lower()
    if mode == "true":
        return True
    if mode == "false":
        return False
    if mode != "auto":
        raise ValueError(
            f"train.pallas_normalize={mode!r} not in (false, true, auto)")
    return jax.default_backend() == "tpu"


def prepare_observations(
    observations: Mapping[str, jnp.ndarray],
    spec: AugSpec,
    draws: Mapping[str, Mapping[str, jnp.ndarray]],
    bit_depth: int,
    key: jax.Array,
    pallas_normalize: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Device half of the input pipeline (ref ``_retrieve_batch``,
    memory.py:189-209): crop / noise / PCA / clip for images, then
    bit-depth normalise ("bin" images: crop+clip only, no normalise —
    ref :198-200).  ``pallas_normalize`` selects the fused Pallas kernel
    for the normalise stage when the shape allows (TPU hot path)."""
    out = {}
    names = list(observations.keys())
    keys = jax.random.split(key, 2 * max(len(names), 1))
    for i, name in enumerate(names):
        arr = observations[name]
        mspec = spec.get(name)
        if mspec is None:  # non-image modality
            out[name] = arr.astype(jnp.float32)
            continue
        entry = draws.get(name, {})
        img = arr.astype(jnp.float32)
        L, B = img.shape[:2]
        C = img.shape[-1]
        oh, ow = mspec.out_size
        if mspec.needs_crop:
            dh, dw = entry["crop"][0], entry["crop"][1]
            img = jax.lax.dynamic_slice(
                img, (0, 0, dh, dw, 0), (L, B, oh, ow, C)
            )
        delta = None
        if mspec.noise:
            noise = (
                jax.random.normal(keys[2 * i], img.shape, jnp.float32)
                * (entry["noise"] * 255.0)
            )
            delta = noise
        if mspec.pca:
            delta = entry["pca"] if delta is None else delta + entry["pca"]
        if delta is not None:
            img = jnp.clip(img + delta, 0.0, 255.0)
        if mspec.normalize:
            from multimodal_rssm_tpu.ops import pallas_kernels

            if pallas_normalize and pallas_kernels.supports_shape(img.shape):
                seed = jax.random.randint(
                    keys[2 * i + 1], (), 0, jnp.iinfo(jnp.int32).max)
                img = pallas_kernels.normalize_image_pallas(
                    img, bit_depth, seed)
            else:
                img = normalize_image(img, bit_depth, keys[2 * i + 1])
        out[name] = img
    return out


# -- gradient accumulation ------------------------------------------------


def resolve_grad_accum(cfg) -> int:
    """``train.grad_accum``: number of microbatches the train step splits the
    batch into (1 = off).  Exact by construction — every loss term reduces as
    a mean over (T, B) with batch-independent masks (losses/elbo.py,
    losses/overshoot.py), so the average of equal-size microbatch gradients
    IS the full-batch gradient.  Use it to fit batch sizes whose one-shot
    program exceeds HBM or this container's compile-service limits
    (DESIGN.md "Large-batch scaling"): the scan body compiles once at
    microbatch scale."""
    raw = cfg.train.get("grad_accum", 1)
    accum = 1 if raw is None else int(raw)
    if accum < 1:
        raise ValueError(f"train.grad_accum={accum} must be >= 1")
    return accum


def resolve_xla_options(cfg):
    """``train.xla_options``: per-jit XLA compiler options for the train/eval
    steps (``None`` = compiler defaults).  A mapping of flag name (without
    the ``--`` prefix) to value, e.g.
    ``train.xla_options="{xla_tpu_scoped_vmem_limit_kib: 65536}"``.

    This reaches XLA knobs — layout assignment, fusion sizing, VMEM scoping —
    that this container's fixed ``XLA_FLAGS`` cannot (absl flags are parsed
    once per process before user code runs); ``jax.jit(compiler_options=…)``
    applies per-executable instead.  Unknown flags fail loudly at compile
    time.  Recorded in the persisted run config like every other knob.

    TPU-only options (``xla_tpu_*`` / ``xla_jf_*`` prefixes) are dropped on
    other backends so a TPU-tuned shipped default (train.yaml sets the
    measured-win ``xla_tpu_scoped_vmem_limit_kib``) stays valid for the CPU
    test mesh and the virtual-device dryruns — the CPU compiler would
    reject them as unknown flags."""
    raw = cfg.train.get("xla_options", None)
    if not raw:
        return None
    if not isinstance(raw, dict):
        raise ValueError(
            f"train.xla_options must be a mapping, got {type(raw).__name__}: "
            f"{raw!r}")
    on_tpu = jax.default_backend() == "tpu"
    opts = {
        str(k): v for k, v in raw.items()
        if on_tpu or not str(k).startswith(("xla_tpu_", "xla_jf_"))
    }
    return opts or None


def _slice_microbatch(batch, start: int, size: int):
    """Slice every leaf's batch axis (axis 1: [L, B, ...])."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, size, axis=1), batch
    )


def accumulated_value_and_grad(loss_fn, params, batch_stats, batch, key,
                               accum: int):
    """value_and_grad of ``loss_fn`` over ``accum`` equal microbatches.

    The (already prepared) batch is sliced along axis 1 so augmentation
    semantics are identical to the unaccumulated step (batch-wide crop /
    noise-scale / PCA draws are shared).  Gradients and metrics are averaged
    (exact: all reductions are batch means); batch_stats (BatchNorm running
    stats) thread sequentially through the microbatches — a smaller-batch
    EMA of the same statistics (deviation D15).  ``key=None`` is the
    deterministic path used by the exactness/parity tests.

    The microbatch loop is UNROLLED at trace time, never a ``lax.scan``:
    ``accum`` is a small static int, unrolling lets XLA schedule/fuse
    across microbatch boundaries, and — measured on a 1-core CPU host
    (round 4) — a scan whose body is the full fwd+bwd executes ~85x
    slower than the identical unrolled program on XLA:CPU (510 s vs 12 s
    per step at test scale; the while-loop body re-dispatches every thunk
    per iteration with no cross-iteration scheduling).  On TPU the
    unrolled form is also what the compiler handles best; the cost is
    compile time linear in ``accum``, fine for the realistic 2-16 range.
    """
    B = jax.tree_util.tree_leaves(batch)[0].shape[1]
    if B % accum != 0:
        raise ValueError(
            f"batch size {B} not divisible by train.grad_accum={accum}")
    mb = B // accum
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    keys = [None] * accum if key is None else list(jax.random.split(key, accum))
    gacc = None
    stats = batch_stats
    loss_sum = 0.0
    ms = []
    for i in range(accum):
        (loss, (stats, m)), g = grad_fn(
            params, stats, _slice_microbatch(batch, i * mb, mb), keys[i], True
        )
        gacc = g if gacc is None else jax.tree_util.tree_map(jnp.add, gacc, g)
        loss_sum = loss_sum + loss
        ms.append(m)
    grads = jax.tree_util.tree_map(lambda x: x / accum, gacc)
    metrics = jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *ms)
    return (loss_sum / accum, (stats, metrics)), grads


# -- loss assembly --------------------------------------------------------


def make_loss_fn(model: WorldModel, cfg):
    """Build the pure ELBO over a prepared (normalised) batch."""
    rssm = cfg.rssm
    use_log_prob = bool(rssm.worldmodel_LogProbLoss)
    kl_alpha = rssm.kl_balancing_alpha
    kl_alpha = None if kl_alpha is None else float(kl_alpha)
    free_nats = float(rssm.free_nats)
    global_kl_beta = float(rssm.global_kl_beta)
    overshooting_kl_beta = float(rssm.overshooting_kl_beta)
    # Reference clamps distance to chunk size (utils/logger.py:42-43).
    overshooting_distance = int(
        min(rssm.overshooting_distance or 0, cfg.train.chunk_size)
    )
    overshooting_reward_scale = float(rssm.overshooting_reward_scale)
    predict_reward = bool(rssm.predict_reward)
    fusion_method = (
        rssm.multimodal_params.fusion_method if rssm.multimodal else "NN"
    )
    chunk_size = int(cfg.train.chunk_size)

    def loss_fn(params, batch_stats, batch, key, train: bool):
        observations, actions, rewards, nonterminals = batch
        obs_target = {k: v[1:] for k, v in observations.items()}
        # key=None -> fully deterministic (posterior/prior samples collapse
        # to their means); used by the torch-oracle loss-parity tests.
        if key is None:
            key_est = key_os = None
        else:
            key_est, key_os = jax.random.split(key)

        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (states, per_elem, rew), mutated = model.apply(
                variables,
                obs_target,
                actions[:-1],
                nonterminals[:-1],
                key_est,
                use_log_prob,
                train=True,
                method=model.train_forward,
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            states, per_elem, rew = model.apply(
                variables,
                obs_target,
                actions[:-1],
                nonterminals[:-1],
                key_est,
                use_log_prob,
                train=False,
                method=model.train_forward,
            )
            new_stats = batch_stats

        observations_loss = elbo.observation_losses(per_elem, negate=use_log_prob)
        observations_loss_sum = sum(observations_loss.values())

        # reward target: rewards[:-1] (ref base/algo.py:102,107)
        reward_l = elbo.reward_loss(
            rew["loc"], rew["scale"], rewards[:-1], use_log_prob
        )
        if not predict_reward:
            reward_l = jnp.zeros_like(reward_l)  # ref base/algo.py:200-201

        categorical = model.latent_dist == "categorical"
        if model.multimodal and fusion_method == "MoPoE":
            if categorical:
                kl_loss = elbo.mopoe_kl_categorical(
                    states["expert_logits_stacked"],
                    states["prior_logits"],
                    free_nats,
                )
            else:
                kl_loss = elbo.mopoe_kl(
                    states["expert_means_stacked"],
                    states["expert_std_devs_stacked"],
                    states["prior_means"],
                    states["prior_std_devs"],
                    free_nats,
                )
        elif categorical:
            kl_loss = elbo.kl_balanced_categorical(
                states["posterior_logits"],
                states["prior_logits"],
                kl_alpha,
                free_nats,
            )
        else:
            kl_loss = elbo.kl_balanced(
                states["posterior_means"],
                states["posterior_std_devs"],
                states["prior_means"],
                states["prior_std_devs"],
                kl_alpha,
                free_nats,
            )
        kl_loss_sum = kl_loss

        if global_kl_beta != 0:
            if categorical:
                kl_loss_sum = kl_loss_sum + global_kl_beta * (
                    elbo.global_kl_categorical(states["posterior_logits"])
                )
            else:
                kl_loss_sum = kl_loss_sum + global_kl_beta * elbo.global_kl(
                    states["posterior_means"], states["posterior_std_devs"]
                )

        if overshooting_kl_beta != 0 and overshooting_distance > 0:
            def prior_rollout_fn(init_h, init_s, acts, nonterms, eps):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    init_h, init_s, acts, nonterms, eps,
                    method=lambda m, *a: m.core.prior_rollout(*a),
                )

            def reward_fn(h, s):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    h, s, method=lambda m, *a: m.reward_model(*a),
                )

            kl_os, reward_os = overshooting_losses(
                prior_rollout_fn,
                reward_fn if overshooting_reward_scale != 0 else None,
                states,
                actions,
                rewards,
                nonterminals,
                chunk_size,
                overshooting_distance,
                free_nats,
                overshooting_reward_scale,
                key_os,
                fusion_method=fusion_method if model.multimodal else "NN",
                det=key_os is None,
                latent_dist=model.latent_dist,
            )
            kl_loss_sum = kl_loss_sum + overshooting_kl_beta * kl_os
            if predict_reward:
                reward_l = reward_l + reward_os

        total = (
            observations_loss_sum + reward_l + float(rssm.kl_beta) * kl_loss_sum
        )

        metrics = {"observations_loss_sum": observations_loss_sum}
        for name, v in observations_loss.items():
            metrics[f"observation_{name}_loss"] = v
        metrics["reward_loss"] = reward_l
        metrics["kl_loss_sum"] = kl_loss_sum
        metrics["kl_loss"] = kl_loss
        metrics["loss"] = total
        return total, (new_stats, metrics)

    return loss_fn


def _state_constrainer(cfg, mesh):
    """Identity without a mesh; with one, pins the output TrainState's
    sharding inside the jitted step (parallel/mesh.constrain_state) so the
    model-axis layout survives across steps instead of being resolved to
    replicated by GSPMD."""
    if mesh is None:
        return lambda s: s
    from multimodal_rssm_tpu.parallel import mesh as mesh_lib

    min_width = mesh_lib.config_min_shard_width(cfg)
    return lambda s: mesh_lib.constrain_state(s, mesh, min_width)


def make_train_step(model: WorldModel, cfg, optimizer, aug_spec: AugSpec,
                    mesh=None):
    """Build the donated jitted train step and the eval (validation) step.

    ``aug_spec`` is static (baked into the compilation); per-batch
    augmentation draws are traced arguments.  ``mesh``: pin the output
    state's sharding to the training mesh's layout.
    """
    loss_fn = make_loss_fn(model, cfg)
    bit_depth = int(cfg.env.bit_depth)
    use_pallas = pallas_normalize_enabled(cfg)
    accum = resolve_grad_accum(cfg)
    xla_opts = resolve_xla_options(cfg)
    constrain = _state_constrainer(cfg, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,), compiler_options=xla_opts)
    def train_step(state: TrainState, raw_batch, aug_draws, key):
        observations, actions, rewards, nonterminals = raw_batch
        key_prep, key_loss = jax.random.split(key)
        observations = prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        batch = (observations, actions, rewards, nonterminals)

        if accum > 1:
            (loss, (new_stats, metrics)), grads = accumulated_value_and_grad(
                loss_fn, state.params, state.batch_stats, batch, key_loss,
                accum,
            )
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, key_loss, True
            )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        # per-module gradient norms (the reference's wandb.watch analogue,
        # RSSM/algo.py:39-43) — cheap scalars, logged with the step metrics
        for mod, sub in grads.items():
            metrics[f"grad_norm_{mod}"] = optax.global_norm(sub)
        return constrain(new_state), metrics

    # eval compiles with compiler DEFAULTS: the shipped train.xla_options
    # vmem flag miscompiles the no-grad eval program on v5e (finite-vs-NaN
    # image loss on identical state+batch, DESIGN.md round-2 addendum);
    # the tuned options were only ever measured on (and only matter for)
    # the gradient step.
    @jax.jit
    def eval_step(state: TrainState, raw_batch, aug_draws, key):
        observations, actions, rewards, nonterminals = raw_batch
        key_prep, key_loss = jax.random.split(key)
        observations = prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        batch = (observations, actions, rewards, nonterminals)
        _, (_, metrics) = loss_fn(
            state.params, state.batch_stats, batch, key_loss, False
        )
        return metrics

    return train_step, eval_step


def make_grad_fn(model: WorldModel, cfg, aug_spec: AugSpec):
    """Gradients-only step (no optimizer update) for the ``wandb.watch``
    histogram analogue (train.histogram_interval): same input pipeline and
    loss as the train step, returns the raw gradient pytree."""
    loss_fn = make_loss_fn(model, cfg)
    bit_depth = int(cfg.env.bit_depth)
    use_pallas = pallas_normalize_enabled(cfg)

    @jax.jit
    def grad_fn(state: TrainState, raw_batch, aug_draws, key):
        observations, actions, rewards, nonterminals = raw_batch
        key_prep, key_loss = jax.random.split(key)
        observations = prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        batch = (observations, actions, rewards, nonterminals)
        return jax.grad(
            lambda p: loss_fn(p, state.batch_stats, batch, key_loss, True)[0]
        )(state.params)

    return grad_fn


def make_device_resident_steps(model: WorldModel, cfg, optimizer,
                               aug_spec: AugSpec, observation_names,
                               mesh=None, row_shapes=None):
    """Train/eval steps over an HBM-resident replay (data/device_buffer.py):
    inputs are the device buffer arrays + [n, L] index matrices; the chunk
    gather happens on device, so the steady-state host->device traffic is a
    few KB of indices per step."""
    from multimodal_rssm_tpu.data.device_buffer import gather_batch

    loss_fn = make_loss_fn(model, cfg)
    bit_depth = int(cfg.env.bit_depth)
    use_pallas = pallas_normalize_enabled(cfg)
    obs_names = tuple(observation_names)
    accum = resolve_grad_accum(cfg)
    xla_opts = resolve_xla_options(cfg)
    constrain = _state_constrainer(cfg, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,), compiler_options=xla_opts)
    def train_step(state: TrainState, buffer_arrays, idxs, aug_draws, key):
        observations, actions, rewards, nonterminals = gather_batch(
            buffer_arrays, idxs, obs_names, row_shapes
        )
        key_prep, key_loss = jax.random.split(key)
        observations = prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        batch = (observations, actions, rewards, nonterminals)
        if accum > 1:
            (loss, (new_stats, metrics)), grads = accumulated_value_and_grad(
                loss_fn, state.params, state.batch_stats, batch, key_loss,
                accum,
            )
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, key_loss, True
            )
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt_state,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        for mod, sub in grads.items():
            metrics[f"grad_norm_{mod}"] = optax.global_norm(sub)
        return constrain(new_state), metrics

    # compiler defaults for eval — see make_train_step's eval_step note
    @jax.jit
    def eval_step(state: TrainState, buffer_arrays, idxs, aug_draws, key):
        observations, actions, rewards, nonterminals = gather_batch(
            buffer_arrays, idxs, obs_names, row_shapes
        )
        key_prep, key_loss = jax.random.split(key)
        observations = prepare_observations(
            observations, aug_spec, aug_draws, bit_depth, key_prep,
            pallas_normalize=use_pallas,
        )
        batch = (observations, actions, rewards, nonterminals)
        _, (_, metrics) = loss_fn(state.params, state.batch_stats, batch,
                                  key_loss, False)
        return metrics

    return train_step, eval_step


def init_train_state(
    model: WorldModel, cfg, optimizer, key, example_batch
) -> TrainState:
    """Initialise parameters from an example (already prepared) batch."""
    observations, actions, rewards, nonterminals = example_batch
    obs_target = {k: v[1:] for k, v in observations.items()}
    variables = model.init(
        key, obs_target, actions[:-1], nonterminals[:-1], key, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
