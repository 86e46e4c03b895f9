#!/usr/bin/env python
"""Training entrypoint.

Parity with the reference ``scripts/train.py`` surface:

    python scripts/train.py experiment=rv-av2 ++model.batch_size=4 ...

Composes the ``conf/`` tree (Hydra-compatible subset), builds the trainer,
fits, then runs validation + evaluation.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# This image latches the jax platform very early (JAX_PLATFORMS=cpu in the
# environment alone still selects the TPU tunnel); mirror the env into
# jax.config FIRST, before any repo import can touch jax.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from range_view_3d_detection_tpu.parallel.mesh import initialize_distributed
from range_view_3d_detection_tpu.utils.config import compose

# NOTE: Trainer (and through it orbax/flax) is imported inside main(),
# AFTER initialize_distributed() — importing it first initializes the XLA
# backend, which jax.distributed.initialize() refuses to follow.

# force=True: jax/absl may already have configured the root logger at
# WARNING, which would silently swallow every INFO line below.
logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("train")


def main(argv: list[str]) -> None:
    experiment = None
    overrides = []
    for arg in argv:
        if arg.startswith("experiment="):
            experiment = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    if experiment is None:
        raise SystemExit("usage: train.py experiment=<name> [++key=value ...]")

    initialize_distributed()

    from range_view_3d_detection_tpu.training.loop import Trainer

    cfg = compose(REPO_ROOT / "conf", experiment, overrides)
    trainer = Trainer(cfg)
    logger.info(
        "experiment=%s train_sweeps=%d val_sweeps=%d global_batch=%d",
        experiment,
        len(trainer.train_ds),
        len(trainer.val_ds),
        trainer.global_batch,
    )
    trainer.fit()
    pred_dir = trainer.validate()
    logger.info("predictions written to %s", pred_dir)

    # Host-side evaluation + artifact writes run on global rank 0 only
    # (reference: rank_zero gating in detector.py:426). validate() above
    # is collective and already ran on every process.
    import jax

    if jax.process_index() != 0:
        return

    try:
        from range_view_3d_detection_tpu.evaluation import (
            detection_cfg_factory,
        )
        from range_view_3d_detection_tpu.evaluation.av2_eval import (
            evaluate_predictions,
        )

        eval_cfg = detection_cfg_factory(
            cfg["dataset"].get("dataset_name", "av2")
        )
        eval_split = cfg["dataset"]["_val_dataset"].get("split_name", "val")
        metrics = evaluate_predictions(
            pred_dir,
            Path(cfg["dataset"]["root_dir"]) / eval_split,
            categories=trainer.categories,
            max_range_m=eval_cfg.max_range_m,
            eval_only_roi_instances=eval_cfg.eval_only_roi_instances,
            dataset_name=eval_cfg.dataset_name,
        )
        for k, v in metrics.items():
            logger.info("metric %s = %s", k, v)

        # Persist the metrics table as a feather artifact next to the
        # prediction shards (reference uploads these to W&B —
        # detector.py:518-535; local artifacts here).
        import numpy as np

        from range_view_3d_detection_tpu.utils.feather import write_feather

        rows = sorted(metrics)
        write_feather(
            trainer.run_dir / "metrics.feather",
            {
                "category": np.asarray(rows),
                **{
                    m: np.asarray([metrics[r].get(m, np.nan) for r in rows])
                    for m in ("AP", "ATE", "ASE", "AOE", "CDS", "num_gts")
                },
            },
        )
    except Exception as exc:  # eval is best-effort at train end
        logger.warning("evaluation skipped: %s", exc)


if __name__ == "__main__":
    main(sys.argv[1:])
