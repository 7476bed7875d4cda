#!/usr/bin/env python
"""Collect demonstration episodes from a MuJoCo peg-insertion simulation
(BASELINE.json config #4: "sim-env task training via with_simulation_env
path").

The reference ships MuJoCo 2.0 only inside a Docker image for data
collection (docker/with_simulation_env/ — no collection code exists in its
repo; the training stack never imports a simulator).  This script is the
runnable equivalent: the scripted peg-descent policy drives the steppable
environment (multimodal_rssm_tpu/envs/peg.py — scene, renderer with
software fallback, contact-force spectrogram) and writes episodes in the
exact COBOTTA ``.npy`` schema (multimodal_rssm_tpu/data/episodes.py), so
sim-collected data feeds ``scripts/train.py`` unchanged:

- ``image_horizon`` [64, 64, 3] uint8 — camera view (GL renderer when
  ``MUJOCO_GL=egl|osmesa`` works, built-in software rasterizer otherwise).
- ``sound`` [128, 20] float — STFT magnitude spectrogram of the summed
  contact-force signal (the contact-microphone analogue).
- ``pose_quat_v2`` [3] float — normalized peg position;
  ``d_pose_quat_v2`` [3] — commanded position deltas (the action channel).
- ``reward`` — negative peg-to-hole distance; ``done`` — episode end.

    python scripts/collect_sim_data.py --out dataset/sim --episodes 8 \
        --length 100

For online (actor-in-the-loop) training on the same task see
``scripts/train_online.py``.
"""

import argparse
import os

import numpy as np

from multimodal_rssm_tpu.envs.peg import (  # noqa: E402,F401  (re-exported
    ACTION_SCALE,                            # for importers of this script)
    HOLE,
    POS_SCALE,
    SCENE_XML,
    PegInsertionEnv,
    contact_force_sample,
    software_render,
    spectrogram,
    try_gl_renderer,
)


def collect_episode(length, seed, substeps=10, render_size=64, env=None):
    """One scripted-policy episode in the COBOTTA episode schema.

    Row convention matches the reference datasets: row t = (o_t, a_t, r_t)
    with a_t taken FROM o_t — the COBOTTA ``d_pose`` channels are forward
    differences (pose_processing.py; multimodal_rssm_tpu/data/pose.py:
    116-121), which is the (actions[:-1], obs[1:]) pairing the trainer
    scans.  The terminal observation is dropped.

    ``env``: a pre-built environment (e.g. an envs/zoo.py adapter) to
    collect from instead of the default peg env; envs without a
    ``scripted_action`` demonstration policy get uniform random actions.
    """
    if env is None:
        env = PegInsertionEnv(length=length, substeps=substeps,
                              render_size=render_size, seed=seed)
    rng = np.random.default_rng(seed)

    obs = env.reset(seed=seed)
    obs_lists = {name: [] for name in env.observation_names}
    acts, rewards, dones = [], [], []
    for _ in range(length):
        if hasattr(env, "scripted_action"):
            action = env.scripted_action(rng)
        else:
            action = rng.uniform(-1.0, 1.0, env.action_size).astype(
                np.float32)
        for name in env.observation_names:
            obs_lists[name].append(obs[name])
        obs, reward, done = env.step(action)
        acts.append(action)
        rewards.append(reward)
        dones.append(float(done))

    out = {name: np.stack(v) for name, v in obs_lists.items()}
    out["d_pose_quat_v2"] = np.stack(acts)
    out["reward"] = np.asarray(rewards, np.float32)
    out["done"] = np.asarray(dones, np.float32)
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--episodes", type=int, default=8)
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--env", default="peg",
        help="environment to collect from: 'peg' (scripted demonstration "
             "policy) | 'synthetic' | suite spec ('gym:<id>', "
             "'dmc:<domain>:<task>', 'robosuite:<Task>' — envs/zoo.py; "
             "random policy unless the env defines scripted_action)")
    args = parser.parse_args()

    for split, n, seed0 in (("train", args.episodes, args.seed),
                            ("validation", max(1, args.episodes // 4),
                             args.seed + 10_000)):
        out = os.path.join(args.out, split)
        os.makedirs(out, exist_ok=True)
        for i in range(n):
            env = None
            if args.env != "peg":
                from multimodal_rssm_tpu.envs import make_env

                env = make_env(args.env, length=args.length,
                               seed=seed0 + i)
            ep = collect_episode(args.length, seed0 + i, env=env)
            np.save(os.path.join(out, f"episode_{i:04d}.npy"), ep,
                    allow_pickle=True)
        print(f"wrote {n} episodes to {out}")


if __name__ == "__main__":
    main()
