"""Logging, meters, and profiling hooks.

Parity targets: `cmp/utils/common_utils.py:8-60` (create_logger,
AverageMeter), `train_controlnet.py:762-774` (accelerate logger) — plus
TPU-native additions the reference lacks (SURVEY.md section 5): jax.profiler
trace hooks and per-step timing.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time
from typing import Dict, Optional


def create_logger(name: str = "diffcodec",
                  log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Windowed running average (`cmp/utils/common_utils.py:38-60`)."""

    def __init__(self, window: int = 0):
        self.window = window
        self.reset()

    def reset(self):
        self.vals = []
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        if self.window > 0:
            self.vals.append(val)
            self.vals = self.vals[-self.window:]

    @property
    def avg(self) -> float:
        if self.window > 0 and self.vals:
            return sum(self.vals) / len(self.vals)
        return self.sum / max(self.count, 1)


class StepTimer:
    """Per-step wall-clock timing with an exponential moving average."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else \
            self.alpha * dt + (1 - self.alpha) * self.ema

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.ema if self.ema else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Scalar metrics sink: stdout lines + optional TensorBoard + optional
    wandb (`accelerator.log` with report_to tensorboard/wandb,
    train_controlnet.py:519-523,1213-1219).

    wandb activates when `wandb_project` is passed AND the `wandb` package
    imports (it is not in this image; the option degrades to a no-op with
    a logged notice, the same shape as the reference's optional
    `--report_to wandb`)."""

    def __init__(self, log_dir: Optional[str] = None,
                 logger: Optional[logging.Logger] = None,
                 wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None):
        self.logger = logger or create_logger()
        self.tb = None
        self.wandb = None
        if log_dir:
            try:
                from flax.metrics import tensorboard
                self.tb = tensorboard.SummaryWriter(log_dir)
            except Exception:
                self.tb = None
        if wandb_project:
            try:
                import wandb
                self.wandb = wandb.init(project=wandb_project,
                                        name=wandb_run_name, dir=log_dir)
            except Exception as e:  # package absent / offline
                self.logger.warning(
                    "wandb requested but unavailable (%s); scalars go to "
                    "stdout/TensorBoard only", e)
                self.wandb = None

    def log(self, metrics: Dict[str, float], step: int):
        line = " ".join(f"{k}={float(v):.5g}" for k, v in metrics.items())
        self.logger.info("step %d: %s", step, line)
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log({k: float(v) for k, v in metrics.items()},
                           step=step)

    def log_image(self, tag: str, image, step: int):
        """HWC uint8 image panel to TensorBoard (the reference's validation
        image grids, train_controlnet.py:222-248)."""
        if self.tb is not None:
            self.tb.image(tag, image, step)
        if self.wandb is not None:
            import wandb
            self.wandb.log({tag: wandb.Image(image)}, step=step)
