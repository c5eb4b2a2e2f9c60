"""Logging / metrics: rotating-file logger + per-step scalar reporting.

Parity with `metamorph/utils.py:23-96` (`build_logger`, stdout/stderr capture)
and the W&B custom callback that logs the two loss components
(`metamorph/train/train.py:1339-1369`, `metamorph_llama.py:464-466`). W&B is
optional (zero-egress environments log to JSONL instead).
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import os
import sys
import time
from typing import Dict, Optional

_handler = None


def build_logger(logger_name: str, logger_filename: str,
                 log_dir: str = ".") -> logging.Logger:
    """Timed-rotating file logger shared across loggers (utils.py:23-63)."""
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")

    if _handler is None:
        os.makedirs(log_dir, exist_ok=True)
        filename = os.path.join(log_dir, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True)
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)

    stdout_logger = logging.getLogger("stdout")
    stdout_logger.setLevel(logging.INFO)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    logger.addHandler(_handler)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(formatter)
        logger.addHandler(sh)
    return logger


def rank0_print(*args):
    """Print only on process 0 (`train.py:34-36`)."""
    import jax

    if jax.process_index() == 0:
        print(*args, file=sys.stderr, flush=True)


class MetricsLogger:
    """Per-step scalars {loss, loss_language, loss_image_ar, lr, tokens/s/chip}
    to JSONL (+ W&B when available) — the SURVEY §5.5 parity set."""

    def __init__(self, log_path: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        self.log_path = log_path
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self.wandb = wandb
            except Exception as e:
                print(f"wandb unavailable ({e}); logging to JSONL only",
                      file=sys.stderr)
        self._t_last = None
        self._f = open(log_path, "a") if log_path else None

    def log(self, step: int, metrics: Dict[str, float],
            tokens_per_step: Optional[int] = None, n_chips: int = 1):
        now = time.time()
        row = {"step": step, "time": now}
        row.update({k: float(v) for k, v in metrics.items()})
        if tokens_per_step and self._t_last is not None:
            dt = now - self._t_last
            if dt > 0:
                row["tokens_per_sec_per_chip"] = tokens_per_step / dt / n_chips
        self._t_last = now
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()
        if self.wandb:
            self.wandb.log(row, step=step)
        return row

    def close(self):
        if self._f:
            self._f.close()
        if self.wandb:
            self.wandb.finish()


def violates_moderation(text: str, endpoint: Optional[str] = None) -> bool:
    """Moderation check (parity surface for `utils.py:108-126`). Offline /
    zero-egress deployments return False; set `endpoint` to enable."""
    if not endpoint:
        return False
    try:
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            endpoint, data=_json.dumps({"input": text}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5) as r:
            return bool(_json.load(r).get("flagged", False))
    except Exception:
        return False


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace (SURVEY §5.1 — the
    reference has no tracing; this feeds xprof/tensorboard)."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def cm():
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return cm()


def pretty_print_semaphore(semaphore) -> str:
    """Debug formatting for an asyncio/threading semaphore (`utils.py:129-132`)."""
    if semaphore is None:
        return "None"
    return f"Semaphore(value={semaphore._value}, locked={semaphore.locked()})"
