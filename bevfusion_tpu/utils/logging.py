"""Metric logging: text + optional TensorBoard.

Behavioral reference: TextLoggerHook + TensorboardLoggerHook every 50
iters (reference configs/default.yaml:8-14).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, run_dir: str, interval: int = 50):
        self.run_dir = run_dir
        self.interval = interval
        self._t0 = time.time()
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
        except Exception:
            pass

    def log(self, epoch: int, it: int, steps_per_epoch: int,
            logs: Dict[str, Any]) -> None:
        # hard guard EVERY step (before the interval early-out): a windowed
        # sparse-conv neighbor drop silently zeroes conv contributions in
        # fwd AND bwd — corrupt training, fail loudly
        # (raise SparseEncoder.window_slack / site caps instead)
        ovf = float(logs.get("diag/window_overflow", 0.0) or 0.0)
        if ovf > 0:
            raise RuntimeError(
                f"sparse-conv window overflow during training: "
                f"{int(ovf)} neighbors dropped "
                "(increase SparseEncoder.window_slack or site_caps)")
        if it % self.interval:
            return
        step = epoch * steps_per_epoch + it
        scal = {k: float(v) for k, v in logs.items()}
        rec = {"epoch": epoch, "iter": it, "step": step,
               "time": round(time.time() - self._t0, 1), **scal}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scal.items():
                self._tb.add_scalar(k, v, step)
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(scal.items())[:8])
        print(f"[E{epoch} {it}/{steps_per_epoch}] {msg}", flush=True)

    def log_eval(self, epoch: int, metrics: Dict[str, Any]) -> None:
        """Per-epoch val metrics (the DistEvalHook log line)."""
        scal = {k: float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))}
        rec = {"epoch": epoch, "eval": True,
               "time": round(time.time() - self._t0, 1), **scal}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scal.items():
                self._tb.add_scalar(f"val/{k}", v, epoch)
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(scal.items())[:8])
        print(f"[E{epoch} eval] {msg}", flush=True)
