#!/usr/bin/env python
"""Collect demonstration episodes from a MuJoCo peg-insertion simulation
(BASELINE.json config #4: "sim-env task training via with_simulation_env
path").

The reference ships MuJoCo 2.0 only inside a Docker image for data
collection (docker/with_simulation_env/ — no collection code exists in its
repo; the training stack never imports a simulator).  This script is the
runnable equivalent: a scripted peg-descent policy in a MuJoCo scene
produces episodes in the exact COBOTTA ``.npy`` schema
(multimodal_rssm_tpu/data/episodes.py), so sim-collected data feeds
``scripts/train.py`` unchanged:

- ``image_horizon`` [64, 64, 3] uint8 — camera view.  Rendered with
  MuJoCo's renderer when a GL backend works (``MUJOCO_GL=egl|osmesa``);
  in GL-less containers it falls back to a built-in software rasterizer
  (orthographic painter's algorithm over the scene geoms) so collection
  runs anywhere the physics runs.
- ``sound`` [128, 20] float — STFT magnitude spectrogram of the summed
  contact-force signal (the contact-microphone analogue; drilling contact
  is exactly what the COBOTTA mic records).
- ``pose_quat_v2`` [3] float — normalized peg position;
  ``d_pose_quat_v2`` [3] — commanded position deltas (the action channel).
- ``reward`` — negative peg-to-hole distance; ``done`` — episode end.

    python scripts/collect_sim_data.py --out dataset/sim --episodes 8 \
        --length 100
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCENE_XML = """
<mujoco model="peg_insertion">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="1 1 .1" rgba=".35 .4 .45 1"/>
    <!-- block with a square opening, built from 4 boxes -->
    <geom name="b0" type="box" pos="0 .09 .05" size=".12 .03 .05" rgba=".7 .55 .3 1"/>
    <geom name="b1" type="box" pos="0 -.09 .05" size=".12 .03 .05" rgba=".7 .55 .3 1"/>
    <geom name="b2" type="box" pos=".09 0 .05" size=".03 .06 .05" rgba=".7 .55 .3 1"/>
    <geom name="b3" type="box" pos="-.09 0 .05" size=".03 .06 .05" rgba=".7 .55 .3 1"/>
    <body name="peg" pos="0 0 .3">
      <joint name="px" type="slide" axis="1 0 0" range="-.4 .4" damping="8"/>
      <joint name="py" type="slide" axis="0 1 0" range="-.4 .4" damping="8"/>
      <joint name="pz" type="slide" axis="0 0 1" range="-.28 .2" damping="8"/>
      <geom name="peg_shaft" type="capsule" fromto="0 0 0 0 0 .12" size=".035"
            rgba=".85 .2 .2 1" density="2000"/>
      <site name="tip" pos="0 0 0" size=".005"/>
    </body>
  </worldbody>
  <actuator>
    <position joint="px" kp="60"/>
    <position joint="py" kp="60"/>
    <position joint="pz" kp="60"/>
  </actuator>
</mujoco>
"""

HOLE = np.array([0.0, 0.0, 0.05], np.float64)
POS_SCALE = np.array([0.4, 0.4, 0.3], np.float64)  # joint ranges -> [-1, 1]


def software_render(model, data, size=64):
    """Painter's-algorithm rasterizer over the scene geoms (orthographic,
    looking down the -y axis tilted 35deg) — the GL-free fallback.  Crude
    but dynamics-consistent: the peg and block move exactly as simulated.
    """
    import mujoco

    img = np.zeros((size, size, 3), np.float32)
    # background: vertical gradient (floor/sky analogue)
    img[:] = np.linspace(0.25, 0.1, size, dtype=np.float32)[:, None, None]
    img[..., 2] += 0.08

    c, s = np.cos(np.deg2rad(35)), np.sin(np.deg2rad(35))
    cam_fwd = np.array([0.0, c, -s])  # view direction

    order = []
    for g in range(model.ngeom):
        if model.geom(g).name == "floor":
            continue
        pos = data.geom_xpos[g]
        depth = pos @ cam_fwd
        order.append((depth, g))
    order.sort()  # far first

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    world_w = 0.8  # metres spanned by the image
    for _, g in order:
        geom = model.geom(g)
        pos = data.geom_xpos[g]
        # orthographic: u from x, v from (tilted) y/z
        u = (pos[0] / world_w + 0.5) * size
        v = (0.5 - (pos[2] * c + pos[1] * s) / world_w) * size
        sz = geom.size
        # box (mjGEOM_BOX=6): use the largest half-extent; sphere/capsule:
        # sz[0] is the radius
        if sz.size == 0:
            r = 0.03
        elif int(geom.type) == 6:
            r = float(np.max(sz))
        else:
            r = float(sz[0])
        r_px = max(2.0, r / world_w * size * 1.6)
        rgba = np.asarray(geom.rgba[:3], np.float32)
        mask = ((xx - u) ** 2 + (yy - v) ** 2) <= r_px ** 2
        shade = 0.75 + 0.25 * np.clip((v - yy[:, 0:1]).mean() / size, -1, 1)
        img[mask] = rgba * shade
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def try_gl_renderer(model, size=64):
    """Only attempt the GL renderer when MUJOCO_GL names a headless
    backend: probing blindly in GL-less containers aborts the process
    inside the GLFW fallback (native crash, not a Python exception)."""
    if os.environ.get("MUJOCO_GL") not in ("egl", "osmesa"):
        return None
    try:
        import mujoco

        return mujoco.Renderer(model, size, size)
    except Exception:
        return None


def contact_force_sample(model, data):
    import mujoco

    total = 0.0
    buf = np.zeros(6)
    for i in range(data.ncon):
        mujoco.mj_contactForce(model, data, i, buf)
        total += float(np.linalg.norm(buf[:3]))
    return total


def spectrogram(signal, n_freq=128, n_time=20, win=256, hop=64):
    """|STFT| of the trailing force signal -> [n_freq, n_time]."""
    need = win + hop * (n_time - 1)
    sig = np.zeros(need, np.float32)
    tail = np.asarray(signal[-need:], np.float32)
    sig[-len(tail):] = tail
    window = np.hanning(win).astype(np.float32)
    cols = []
    for t in range(n_time):
        seg = sig[t * hop: t * hop + win] * window
        mag = np.abs(np.fft.rfft(seg))[:n_freq]
        cols.append(mag)
    spec = np.stack(cols, axis=1)
    return np.log1p(spec).astype(np.float32)


def collect_episode(length, seed, substeps=10, render_size=64):
    import mujoco

    rng = np.random.default_rng(seed)
    model = mujoco.MjModel.from_xml_string(SCENE_XML)
    data = mujoco.MjData(model)
    renderer = try_gl_renderer(model, render_size)

    # random start above the block
    target = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), 0.15])
    data.qpos[:] = target
    mujoco.mj_forward(model, data)

    force_signal = []
    obs_im, obs_sp, obs_pose = [], [], []
    acts, rewards, dones = [], [], []

    for t in range(length):
        # scripted policy: move over the hole, then descend and grind
        tip = data.site("tip").xpos.copy()
        to_hole = HOLE + np.array([0, 0, 0.12]) - tip
        if np.linalg.norm(to_hole[:2]) > 0.02:
            delta = np.clip(to_hole * 0.25, -0.04, 0.04)
        else:
            delta = np.array([0.0, 0.0, -0.03])
        delta = delta + rng.normal(0, 0.006, 3)
        target = np.clip(target + delta, [-0.4, -0.4, -0.28], [0.4, 0.4, 0.2])
        data.ctrl[:] = target
        for _ in range(substeps):
            mujoco.mj_step(model, data)
            force_signal.append(contact_force_sample(model, data))

        if renderer is not None:
            try:
                renderer.update_scene(data)
                frame = renderer.render()
            except Exception:
                renderer = None
                frame = software_render(model, data, render_size)
        else:
            frame = software_render(model, data, render_size)

        obs_im.append(frame)
        obs_sp.append(spectrogram(force_signal))
        pose = np.asarray(data.qpos[:3], np.float32) / POS_SCALE
        obs_pose.append(pose.astype(np.float32))
        acts.append((delta / 0.05).astype(np.float32))
        rewards.append(float(-np.linalg.norm(data.site("tip").xpos - HOLE)))
        dones.append(0.0)
    dones[-1] = 1.0

    return {
        "image_horizon": np.stack(obs_im),
        "sound": np.stack(obs_sp),
        "pose_quat_v2": np.stack(obs_pose),
        "d_pose_quat_v2": np.stack(acts),
        "reward": np.asarray(rewards, np.float32),
        "done": np.asarray(dones, np.float32),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--episodes", type=int, default=8)
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    for split, n, seed0 in (("train", args.episodes, args.seed),
                            ("validation", max(1, args.episodes // 4),
                             args.seed + 10_000)):
        out = os.path.join(args.out, split)
        os.makedirs(out, exist_ok=True)
        for i in range(n):
            ep = collect_episode(args.length, seed0 + i)
            np.save(os.path.join(out, f"episode_{i:04d}.npy"), ep,
                    allow_pickle=True)
        print(f"wrote {n} episodes to {out}")


if __name__ == "__main__":
    main()
