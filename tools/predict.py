#!/usr/bin/env python
"""Standalone inference: restore a checkpoint, decode a split, write shards.

Parity with the reference's checkpoint-restore + predict flow
(``tools/benchmark.py:60-63`` + ``predict_dataloader``): the checkpoint
carries its composed config, so only the checkpoint dir (and optionally a
different data root) is needed.

Usage:
    python tools/predict.py --ckpt-dir RUN/checkpoints \\
        [--split val] [--root-dir ...] [--out-dir predictions]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--root-dir", default=None)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    from range_view_3d_detection_tpu.training.loop import Trainer

    cfg = json.loads((Path(args.ckpt_dir) / "config.json").read_text())
    if args.root_dir:
        cfg["dataset"]["root_dir"] = args.root_dir
        for k in ("_train_dataset", "_val_dataset", "_test_dataset"):
            cfg["dataset"][k]["root_dir"] = args.root_dir
    cfg["trainer"]["checkpoint"]["dir"] = args.ckpt_dir
    cfg["model"]["debug"] = False

    trainer = Trainer(cfg)
    # Restore without training: initialize from one val batch, then load.
    batch = next(iter(trainer.val_loader))
    import numpy as np

    from range_view_3d_detection_tpu.parallel import shard_batch

    device_batch = shard_batch(
        {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
        trainer.mesh,
    )
    trainer.state = trainer._init_state(device_batch)
    out = trainer.validate(
        Path(args.out_dir) if args.out_dir else None, compute_losses=False
    )
    print(f"predictions written to {out}")


if __name__ == "__main__":
    main()
