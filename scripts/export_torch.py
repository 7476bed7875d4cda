#!/usr/bin/env python
"""Compatibility shim — the implementation lives in
multimodal_rssm_tpu/cli/export_torch.py (installed as ``mrssm-export-torch``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multimodal_rssm_tpu.cli.export_torch import main  # noqa: E402

if __name__ == "__main__":
    main()
