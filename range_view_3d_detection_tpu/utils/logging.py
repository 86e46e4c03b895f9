"""Metrics logging: JSONL always; TensorBoard/W&B when available.

Replaces the reference's WandbLogger/TensorBoardLogger surface
(``conf/trainer/train.yaml:31-37``, ``rendering/tensorboard.py:102-123``)
with a dependency-tolerant sink.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        save_dir: str | Path,
        *,
        backend: str = "jsonl",
        enabled: bool = True,
    ):
        # enabled=False (non-zero ranks in multi-host) opens no files and
        # drops every record — the reference's rank_zero_only gating.
        self.enabled = enabled
        self.save_dir = Path(save_dir)
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.save_dir / "metrics.jsonl", "a")
        if backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=str(self.save_dir))
            except Exception:
                self._tb = None

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.enabled:
            return
        scalars = {
            k: float(v)
            for k, v in metrics.items()
            if _is_scalar(v)
        }
        record = {"step": int(step), "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _is_scalar(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
