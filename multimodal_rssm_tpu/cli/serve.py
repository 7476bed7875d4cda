#!/usr/bin/env python
"""Serve exported model artifacts over HTTP (io/serve.py).

    python scripts/serve.py --artifacts results/.../run_0/exported \
        [--host 0.0.0.0] [--port 8000] [--platform cpu|tpu]

Endpoints: GET /healthz, GET /v1/info, POST /v1/call/<artifact>
(request/response bodies are .npz archives of named arrays; nested
structures use dotted keys, e.g. ``obs.image_horizon``).
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifacts", required=True,
                        help="directory of *.jaxexport files "
                             "(scripts/export_model.py output)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="backend to execute on (must be among the "
                             "artifact's lowering platforms)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from multimodal_rssm_tpu.core.runtime import enable_persistent_cache
    from multimodal_rssm_tpu.io.serve import serve_forever

    enable_persistent_cache()
    serve_forever(args.artifacts, args.host, args.port)


if __name__ == "__main__":
    main()
