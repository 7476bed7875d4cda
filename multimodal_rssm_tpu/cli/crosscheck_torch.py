#!/usr/bin/env python
"""Cross-framework validation: run the PyTorch REFERENCE implementation on
a trained run's exported checkpoint and compare, frame for frame, what both
frameworks compute from identical inputs.

Chain exercised end to end:

1. load the run's native ``models_{itr}.msgpack`` into our WorldModel;
2. export it to the reference schema ``.pth`` (io/torch_export.py) if the
   run has no ``torch_export/`` yet;
3. build the reference's own algo via its ``build_RSSM`` factory
   (algos/MRSSM/MRSSM/algo.py:6-18) and load the ``.pth`` through its own
   ``load_model`` (base/algo.py:51-54 — incl. the optimizer-state load);
4. feed BOTH frameworks the same preprocessed episode (our deterministic
   eval pipeline; the reference gets the identical arrays, so D12's
   cross-framework RNG caveat does not apply);
5. compare deterministic posterior trajectories (beliefs, posterior means)
   and open-loop imagination — latent max-abs diff, per-modality
   frame-level MSE between frameworks, and each framework's
   video-prediction MSE vs ground truth.

This is the full-scale, trained-weights version of the tiny-shape parity
tests (tests/test_torch_parity.py / test_torch_export.py): proof that a
user can train here and continue in the reference stack with the same
model.  Requires the reference checkout (--reference) and torch.

    python scripts/crosscheck_torch.py --run-dir results/.../run_0 \
        [--itr 10000] [--episode 0] [--t-start 20] [--horizon 20]

Writes ``{run}/analysis/crosscheck_torch.json`` and exits non-zero if the
frameworks disagree beyond --latent-tol / --frame-tol.
"""

import argparse
import json
import os
import sys


def _require_reference(path: str):
    if not os.path.isdir(path):
        raise SystemExit(f"reference checkout not found at {path} "
                         "(--reference)")
    if path not in sys.path:
        sys.path.insert(0, path)
    # the reference algo modules import wandb at module scope
    # (base/algo.py:9); it is not installed here and is never used when
    # cfg.main.wandb is False
    import types

    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--itr", type=int, default=10_000)
    parser.add_argument("--episode", type=int, default=0)
    parser.add_argument("--t-start", type=int, default=20)
    parser.add_argument("--horizon", type=int, default=20)
    parser.add_argument("--cwd", default=".")
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument("--latent-tol", type=float, default=5e-3,
                        help="max |ours - torch| over beliefs/posterior "
                             "means (f32 drift accumulates over the GRU "
                             "recurrence; 5e-3 is generous for T<=200)")
    parser.add_argument("--frame-tol", type=float, default=1e-4,
                        help="max per-modality MSE between the two "
                             "frameworks' imagined frames")
    args = parser.parse_args(argv)

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch is CPU; keep both
    # sides on the same f32 arithmetic (the TPU would be fine too, but a
    # cross-device comparison would fold device numerics into the result)
    jax.config.update("jax_default_matmul_precision", "highest")

    from multimodal_rssm_tpu.core.config import load_run_config
    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache
    from multimodal_rssm_tpu.eval import imagination, state_estimation
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr
    from multimodal_rssm_tpu.train.loop import get_dataset_loader

    enable_persistent_cache()

    cfg = load_run_config(args.run_dir)
    cfg.main.wandb = False
    model_path = os.path.join(args.run_dir, f"models_{args.itr}.msgpack")
    if not os.path.exists(model_path):
        raise SystemExit(f"no {model_path}")

    model = WorldModel.from_config(cfg)
    variables = state_estimation.load_model_variables(model, cfg, model_path)
    D = get_dataset_loader(cfg, args.cwd, cfg.train.train_data_path)
    spec = tr.build_aug_spec(D)
    bit_depth = int(cfg.env.bit_depth)

    # -- shared inputs: our deterministic eval preprocessing --------------
    key = jax.random.PRNGKey(0)
    obs, actions, rewards, nonterm = state_estimation.get_episode_data(
        D, args.episode, spec, state_estimation.fixed_draws(D, spec),
        bit_depth, key,
    )
    obs_target = {k: np.asarray(v[1:]) for k, v in obs.items()}
    actions_in = np.asarray(actions[:-1])
    nonterm_in = np.asarray(nonterm[:-1])
    T = actions_in.shape[0]
    t_start = min(args.t_start, T - 2)
    horizon = min(args.horizon, T - t_start - 1)

    # -- ours --------------------------------------------------------------
    import jax.numpy as jnp

    obs_j = {k: jnp.asarray(v) for k, v in obs_target.items()}
    states = model.apply(variables, obs_j, jnp.asarray(actions_in),
                         jnp.asarray(nonterm_in), None, True, False,
                         method=model.estimate_state)
    _, preds = imagination.imagine(
        model, variables, states, jnp.asarray(actions_in), t_start, horizon,
        det=True)
    ours_mse = imagination.video_prediction_mse(
        preds, obs_j, t_start, horizon)
    ours_beliefs = np.asarray(states["beliefs"])
    ours_post = np.asarray(states["posterior_means"])

    # -- export (reuse the run's torch_export if present) -------------------
    pth = os.path.join(args.run_dir, "torch_export", f"models_{args.itr}.pth")
    if not os.path.exists(pth):
        from multimodal_rssm_tpu.io.torch_export import save_reference_checkpoint

        os.makedirs(os.path.dirname(pth), exist_ok=True)
        lr = (0.0 if int(cfg.rssm.learning_rate_schedule) != 0
              else float(cfg.rssm.model_learning_rate))
        save_reference_checkpoint(pth, model, variables, lr=lr,
                                  eps=float(cfg.rssm.adam_epsilon))
        print(f"exported {pth}", file=sys.stderr)

    # -- reference side ------------------------------------------------------
    _require_reference(args.reference)
    import copy

    import torch

    from algos.MRSSM.MRSSM.algo import build_RSSM

    ref_cfg = copy.deepcopy(cfg)
    ref_cfg.main.device = "cpu"
    ref_cfg.train.use_amp = False
    torch.manual_seed(0)
    ref = build_RSSM(ref_cfg, torch.device("cpu"))
    ref.load_model(pth)  # the reference's own loader (base/algo.py:51-54)
    ref.eval()

    def to_torch(v):
        arr = np.asarray(v)
        if arr.ndim == 5:  # [T, B, H, W, C] -> [T, B, C, H, W]
            arr = arr.transpose(0, 1, 4, 2, 3)
        return torch.tensor(arr)

    obs_t = {k: to_torch(v) for k, v in obs_target.items()}
    with torch.no_grad():
        ref_states = ref.estimate_state(
            obs_t, torch.tensor(actions_in), torch.tensor(np.asarray(rewards)),
            torch.tensor(nonterm_in), det=True)
        # open-loop imagination, notebook cells 55-57 semantics with the
        # same action indexing as eval/imagination.imagine (the prior step
        # consuming actions_in[t] emits the belief aligned with obs index
        # t+1, so the window starts at t_start+1)
        h = ref_states["beliefs"][t_start]
        s = ref_states["posterior_means"][t_start]
        hs, ss = [], []
        for t in range(horizon):
            a = torch.tensor(actions_in[t_start + 1 + t]).unsqueeze(0)
            outs = ref.transition_model(s, a, h, det=True)
            h = outs[0].squeeze(0)
            s = outs[2].squeeze(0)
            hs.append(h)
            ss.append(s)
        ref_preds = ref.observation_model(h_t=torch.stack(hs),
                                          s_t=torch.stack(ss))
    if not bool(cfg.rssm.multimodal):
        # unimodal: the reference's observation_model is ONE decoder whose
        # forward returns {"loc": ...} directly (observation_model.py:42,
        # built for observation_names_rec[0], RSSM/algo.py:24-32) — key it
        # by that modality to match the multimodal dict-of-dicts contract
        ref_preds = {str(cfg.rssm.observation_names_rec[0]): ref_preds}

    # -- comparison ----------------------------------------------------------
    result = {
        "run_dir": args.run_dir, "itr": args.itr, "episode": args.episode,
        "t_start": t_start, "horizon": horizon,
        "latent_max_abs_diff": {
            "beliefs": float(np.max(np.abs(
                ours_beliefs - ref_states["beliefs"].numpy()))),
            "posterior_means": float(np.max(np.abs(
                ours_post - ref_states["posterior_means"].numpy()))),
        },
        "imagination_mse_vs_gt": {"ours": ours_mse, "torch": {}},
        "imagination_cross_framework_mse": {},
    }
    gt_window = {k: v[t_start + 1 : t_start + 1 + horizon]
                 for k, v in obs_target.items()}
    for name, pred in ref_preds.items():
        loc = pred["loc"].numpy()
        ours_loc = np.asarray(preds[name]["loc"])
        if ours_loc.ndim == 5:  # HWC -> CHW to match torch
            ours_loc = ours_loc.transpose(0, 1, 4, 2, 3)
            gt = gt_window[name].transpose(0, 1, 4, 2, 3)
        else:
            gt = gt_window[name]
        result["imagination_mse_vs_gt"]["torch"][name] = float(
            np.mean(np.square(loc - gt)))
        result["imagination_cross_framework_mse"][name] = float(
            np.mean(np.square(loc - ours_loc)))

    out_dir = os.path.join(args.run_dir, "analysis")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "crosscheck_torch.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))

    worst_latent = max(result["latent_max_abs_diff"].values())
    worst_frame = max(result["imagination_cross_framework_mse"].values())
    if worst_latent > args.latent_tol or worst_frame > args.frame_tol:
        print(f"MISMATCH: latent {worst_latent:.2e} (tol {args.latent_tol}) "
              f"/ frame MSE {worst_frame:.2e} (tol {args.frame_tol})",
              file=sys.stderr)
        return 1
    print(f"crosscheck OK -> {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
