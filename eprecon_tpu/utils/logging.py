"""Logging + scalar summaries.

Reference: main.py:84-93 (loguru file+console logging, rank-0 only;
tensorboardX SummaryWriter) and utils.py:83-113 (save_scalars/save_images).
Here: stdlib logging with the same rank-0 gating, and scalar summaries via
torch.utils.tensorboard when available (torch is a baked dependency) with a
JSONL fallback so training metrics are always recorded.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logger(logdir: Optional[str] = None, name: str = "eprecon") -> logging.Logger:
    """Console + file logger, main-process only (reference main.py:84-91)."""
    from eprecon_tpu.parallel.mesh import is_main_process

    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO if is_main_process() else logging.WARNING)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logdir and is_main_process():
        os.makedirs(logdir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(
            logdir, f"{time.strftime('%Y%m%d-%H%M%S')}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SummaryWriter:
    """Scalar summary writer: tensorboard events if available, JSONL always
    (reference utils.py:83-93 save_scalars)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self.tb = TBWriter(logdir)
        except Exception:
            pass

    def add_scalars(self, mode: str, scalars: Dict[str, float], step: int):
        rec = {"mode": mode, "step": step,
               **{k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{mode}/{k}", float(v), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
