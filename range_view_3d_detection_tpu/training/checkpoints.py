"""Orbax checkpointing with config-in-checkpoint semantics.

The reference persists hyperparameters inside the Lightning checkpoint
(``save_hyperparameters``, detector.py:143-158 / loader.py:155-164) so a
checkpoint alone can rebuild model + datamodule. We mirror that: the
composed config dict is stored next to the train state, and
``restore`` returns both.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from range_view_3d_detection_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path, *, keep: int = 2):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, config: Dict[str, Any]) -> None:
        (self.directory / "config.json").write_text(json.dumps(config))
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state_template: TrainState, *, step: Optional[int] = None
    ) -> Tuple[TrainState, Dict[str, Any]]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        state = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        config = json.loads((self.directory / "config.json").read_text())
        return state, config

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
