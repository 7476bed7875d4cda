#!/usr/bin/env python
"""Compatibility shim — the implementation lives in
multimodal_rssm_tpu/cli/crosscheck_torch.py (installed as the
``mrssm-crosscheck-torch`` command)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multimodal_rssm_tpu.cli.crosscheck_torch import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
