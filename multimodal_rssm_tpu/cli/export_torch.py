#!/usr/bin/env python
"""Export a trained run back to a PyTorch reference checkpoint.

The inverse of the ``.pth`` importer: converts a run's native
``models_{itr}.msgpack`` into the reference's saved state-dict schema
(io/torch_export.py), so a TPU-trained world model can be loaded by the
reference's own tooling — ``check_model.ipynb``, ``estimate_state.py``,
or as a ``train.model_path`` warm start (reference base/algo.py:51-58).

    python scripts/export_torch.py --run-dir results/.../run_0 \
        [--itr 10000] [--out models_10000.pth]

Multimodal runs emit the nested ``MRSSM_base.get_state_dict`` schema with
a fresh ``model_optimizer`` entry (the reference validates then discards
it); unimodal runs emit the flat algo-level schema with no optimizer key
(reference RSSM/algo.py:48-49).
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    parser.add_argument("--run-dir", required=True)
    parser.add_argument("--itr", type=int, default=None,
                        help="checkpoint iteration (default: latest)")
    parser.add_argument("--out", default=None,
                        help="output .pth path (default: "
                             "<run-dir>/torch_export/models_{itr}.pth)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure layout transforms

    from multimodal_rssm_tpu.core.config import apply_overrides, load_run_config
    from multimodal_rssm_tpu.eval.state_estimation import load_model_variables
    from multimodal_rssm_tpu.io import checkpoint as ckpt
    from multimodal_rssm_tpu.io.torch_export import save_reference_checkpoint
    from multimodal_rssm_tpu.models.world_model import WorldModel

    cfg = load_run_config(args.run_dir)
    apply_overrides(cfg, args.overrides)

    if args.itr is not None:
        wm_path = os.path.join(args.run_dir, f"models_{args.itr}.msgpack")
        if not os.path.exists(wm_path):
            raise FileNotFoundError(wm_path)
    else:
        wm_path = ckpt.latest_checkpoint(args.run_dir)
        if wm_path is None:
            raise FileNotFoundError(f"no models_*.msgpack in {args.run_dir}")
    print(f"checkpoint: {wm_path}", file=sys.stderr)

    model = WorldModel.from_config(cfg)
    variables = load_model_variables(model, cfg, wm_path)

    itr = os.path.basename(wm_path).replace("models_", "").split(".")[0]
    out = args.out
    if out is None:
        out_dir = os.path.join(args.run_dir, "torch_export")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"models_{itr}.pth")

    # mirror the reference optimizer ctor (base/algo.py:40-42): lr pinned to
    # 0 when a warm-up schedule is configured
    lr = (0.0 if int(cfg.rssm.learning_rate_schedule) != 0
          else float(cfg.rssm.model_learning_rate))
    save_reference_checkpoint(out, model, variables, lr=lr,
                              eps=float(cfg.rssm.adam_epsilon))
    print(out)


if __name__ == "__main__":
    main()
