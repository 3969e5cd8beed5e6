"""Metrics / logging: host-0 scalar writers (tensorboard + JSONL).

Behavior contract: the reference logs gathered train_loss + lr to
tensorboard/wandb via accelerate trackers (train_svd.py:837-838, 1057) and
writes per-process stdlib logging (train_svd.py:614-626). Here: loss is
psum-averaged in-graph (no post-hoc gather), and only process 0 writes.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def get_logger(name: str = "svd_xtend_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s [%(levelname)s] p%(process)d %(name)s: %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(logging.INFO if jax.process_index() == 0 else logging.WARNING)
    return logger


class MetricWriter:
    """Scalar writer: JSONL always; tensorboard when available. No-op on
    non-zero processes (single-writer discipline, reference train_svd.py:1060)."""

    def __init__(self, logdir: str, report_to: str = "tensorboard",
                 project: str = "SVDXtend"):
        self.enabled = jax.process_index() == 0
        self._tb = None
        self._wandb = None
        self._comet = None
        self._jsonl = None
        if not self.enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if report_to in ("tensorboard", "all"):
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except ImportError:
                self._tb = None
        if report_to in ("wandb", "all"):
            # reference supports wandb trackers (train_svd.py:508-516, 608-612);
            # gated on availability (this environment has no network egress)
            try:
                import wandb
                self._wandb = wandb.init(project=project, dir=logdir)
            except Exception:
                self._wandb = None
        if report_to in ("comet_ml", "all"):
            # the reference's third tracker choice (train_svd.py:508-516)
            try:
                import comet_ml
                self._comet = comet_ml.Experiment(project_name=project)
            except Exception:
                self._comet = None

    def write(self, step: int, metrics: Dict[str, float]):
        if not self.enabled:
            return
        metrics = {k: float(v) for k, v in metrics.items()}
        self._jsonl.write(json.dumps({"step": int(step), "ts": time.time(),
                                      **metrics}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._comet is not None:
            self._comet.log_metrics(metrics, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()
