#!/usr/bin/env python
"""Model analysis artifacts — the library-grade replacement for the
reference's manual ``check_model.ipynb``:

- per-modality posterior reconstruction vs ground truth (PNG grids,
  notebook cells 33-36);
- latent-space PCA trajectories of beliefs / posterior means (cells 25-29);
- open-loop imagination rollouts + video-prediction MSE (cells 55-58).

    python scripts/check_model.py --run results/exp/2026-08-16/run_0 \
        [--itr 10000] [--episode 0] [--t-start 20] [--horizon 20]

Outputs land in ``{run}/analysis/``.
"""

import argparse
import json
import os

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run", required=True)
    parser.add_argument("--itr", type=int, default=10_000)
    parser.add_argument("--episode", type=int, default=0)
    parser.add_argument("--t-start", type=int, default=20)
    parser.add_argument("--horizon", type=int, default=20)
    parser.add_argument("--cwd", default=".")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache

    enable_persistent_cache()

    from multimodal_rssm_tpu.core.config import load_run_config
    from multimodal_rssm_tpu.eval import imagination, state_estimation, visualize
    from multimodal_rssm_tpu.eval import metrics as metrics_lib
    from multimodal_rssm_tpu.models.world_model import WorldModel
    from multimodal_rssm_tpu.train import trainer as tr
    from multimodal_rssm_tpu.train.loop import get_dataset_loader

    cfg = load_run_config(args.run)
    cfg.main.wandb = False
    out_dir = os.path.join(args.run, "analysis")
    os.makedirs(out_dir, exist_ok=True)

    for ext in (".msgpack", ".pth"):
        model_path = os.path.join(args.run, f"models_{args.itr}{ext}")
        if os.path.exists(model_path):
            break
    else:
        raise FileNotFoundError(f"no models_{args.itr} checkpoint in {args.run}")

    model = WorldModel.from_config(cfg)
    variables = state_estimation.load_model_variables(model, cfg, model_path)
    D = get_dataset_loader(cfg, args.cwd, cfg.train.train_data_path)
    spec = tr.build_aug_spec(D)
    bit_depth = int(cfg.env.bit_depth)

    # -- per-episode posterior estimation -----------------------------
    key = jax.random.PRNGKey(0)
    k_prep, k_est = jax.random.split(key)
    obs, actions, rewards, nonterm = state_estimation.get_episode_data(
        D, args.episode, spec, state_estimation.fixed_draws(D, spec),
        bit_depth, k_prep,
    )
    obs_target = {k: v[1:] for k, v in obs.items()}
    actions_in = actions[:-1]
    states = model.apply(variables, obs_target, actions_in, nonterm[:-1],
                         None, True, False, method=model.estimate_state)

    # -- reconstruction grid ------------------------------------------
    recon = imagination.reconstruct(model, variables, states)
    _save_image_grids(out_dir, "reconstruction", recon, obs_target, bit_depth)

    # -- PCA of latents ------------------------------------------------
    # Notebook cells 25-29: the PCA basis is fit over ALL episodes'
    # latents stacked (np.vstack across the states dict), then every
    # episode's trajectory is projected and drawn as one 3D line.
    try:
        epi_beliefs, epi_post = [], []
        for epi in range(D.episodes):
            s_e = (states if epi == args.episode else
                   state_estimation.estimate_episode(
                       model, variables, D, epi, spec, bit_depth,
                       jax.random.fold_in(key, epi), det=True))
            epi_beliefs.append(np.asarray(s_e["beliefs"])[:, 0])
            epi_post.append(np.asarray(s_e["posterior_means"])[:, 0])
        n_comp = 3 if epi_beliefs[0].shape[0] >= 3 else 2
        pca_b, proj_b = visualize.pca_trajectories(epi_beliefs, n_comp)
        pca_s, proj_s = visualize.pca_trajectories(epi_post, n_comp)
        np.save(os.path.join(out_dir, "pca_beliefs.npy"),
                np.asarray(proj_b, dtype=object), allow_pickle=True)
        np.save(os.path.join(out_dir, "pca_posterior_means.npy"),
                np.asarray(proj_s, dtype=object), allow_pickle=True)
        _plot_pca(out_dir, proj_b, proj_s)
    except Exception as e:  # sklearn optional
        print(f"PCA skipped: {e}")

    # -- expert distributions (cells 39-48) ---------------------------
    if model.multimodal and "expert_means" in states:
        _save_expert_artifacts(out_dir, states)

    # -- open-loop imagination ----------------------------------------
    t_start = min(args.t_start, actions_in.shape[0] - 2)
    horizon = min(args.horizon, actions_in.shape[0] - t_start - 1)
    roll, preds = imagination.imagine(
        model, variables, states, actions_in, t_start, horizon, det=True)
    mse = imagination.video_prediction_mse(preds, obs_target, t_start, horizon)
    quality = metrics_lib.video_prediction_metrics(
        preds, obs_target, t_start, horizon)
    with open(os.path.join(out_dir, "imagination_mse.json"), "w") as f:
        json.dump({"t_start": t_start, "horizon": horizon, "mse": mse,
                   "metrics": quality}, f, indent=2)
    gt_window = {k: v[t_start + 1 : t_start + 1 + horizon]
                 for k, v in obs_target.items()}
    _save_image_grids(out_dir, "imagination", preds, gt_window, bit_depth)
    print(f"analysis artifacts in {out_dir}; imagination MSE: {mse}; "
          f"metrics: {quality}")


def _save_image_grids(out_dir, tag, preds, targets, bit_depth, max_frames=8):
    from multimodal_rssm_tpu.eval.visualize import reverse_image_observation

    for name, pred in preds.items():
        if "image" not in name:
            continue
        loc = np.asarray(pred["loc"])[:, 0]  # [T, H, W, C]
        gt = np.asarray(targets[name])[:, 0]
        step = max(1, loc.shape[0] // max_frames)
        sel = slice(0, max_frames * step, step)
        row_pred = np.concatenate(list(reverse_image_observation(loc[sel], bit_depth)), axis=1)
        row_gt = np.concatenate(list(reverse_image_observation(gt[sel], bit_depth)), axis=1)
        grid = np.concatenate([row_gt, row_pred], axis=0)
        try:
            from PIL import Image

            if grid.shape[-1] == 1:
                grid = grid[..., 0]
            Image.fromarray(grid).save(os.path.join(out_dir, f"{tag}_{name}.png"))
        except ImportError:
            np.save(os.path.join(out_dir, f"{tag}_{name}.npy"), grid)


def _plot_pca(out_dir, proj_beliefs, proj_states):
    """Per-episode latent trajectories in the shared PCA basis (notebook
    cells 28-29: one 3D line per episode, alpha-blended)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        three_d = proj_beliefs[0].shape[1] >= 3
        fig = plt.figure(figsize=(12, 6))
        for i, (projs, title) in enumerate(
                ((proj_beliefs, "beliefs"), (proj_states, "posterior means"))):
            ax = fig.add_subplot(1, 2, i + 1,
                                 projection="3d" if three_d else None)
            for proj in projs:
                coords = (proj[:, 0], proj[:, 1], proj[:, 2]) if three_d \
                    else (proj[:, 0], proj[:, 1])
                ax.plot(*coords, alpha=0.4)
            ax.set_title(f"PCA of {title} ({len(projs)} episodes)")
        fig.savefig(os.path.join(out_dir, "pca_latents.png"), dpi=120)
        plt.close(fig)
    except ImportError:
        pass


def _save_expert_artifacts(out_dir, states):
    """Per-expert posterior (mean, std) series + every expert-subset PoE
    (notebook cells 39-48: expert extraction + calc_subset_states; the
    notebook stops short of plotting — we also render mean±std bands)."""
    from multimodal_rssm_tpu.ops import fusion

    expert_means = {k: np.asarray(v)[:, 0]
                    for k, v in states["expert_means"].items()}
    expert_stds = {k: np.asarray(v)[:, 0]
                   for k, v in states["expert_std_devs"].items()}
    means = np.asarray(states["expert_means_stacked"])   # [T, K, B, S]
    stds = np.asarray(states["expert_std_devs_stacked"])
    sub_m, sub_s = fusion.subset_poe_states(
        np.moveaxis(means, 1, 0), np.moveaxis(stds, 1, 0))
    np.save(os.path.join(out_dir, "expert_distributions.npy"),
            {"expert_means": expert_means, "expert_std_devs": expert_stds,
             "subset_means": [np.asarray(m)[:, 0] for m in sub_m],
             "subset_std_devs": [np.asarray(s)[:, 0] for s in sub_s]},
            allow_pickle=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        dims = min(4, next(iter(expert_means.values())).shape[-1])
        fig, axes = plt.subplots(dims, 1, figsize=(10, 2.5 * dims),
                                 squeeze=False)
        for d in range(dims):
            ax = axes[d][0]
            for name in expert_means:
                m, s = expert_means[name][:, d], expert_stds[name][:, d]
                t = np.arange(len(m))
                (line,) = ax.plot(t, m, label=name)
                ax.fill_between(t, m - s, m + s, alpha=0.15,
                                color=line.get_color())
            ax.set_ylabel(f"s[{d}]")
        axes[0][0].legend(loc="upper right", fontsize=8)
        axes[-1][0].set_xlabel("t")
        fig.suptitle("per-expert posterior mean ± std")
        fig.savefig(os.path.join(out_dir, "expert_distributions.png"), dpi=120)
        plt.close(fig)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
