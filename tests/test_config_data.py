"""Config composition + data layer tests (synthetic dataset round trip)."""

import numpy as np
import pytest

from range_view_3d_detection_tpu.data.dataset import (
    DataLoader,
    DatasetConfig,
    RangeViewConfig,
    RangeViewDataset,
)
from range_view_3d_detection_tpu.data.synthetic import generate_dataset
from range_view_3d_detection_tpu.training import builders
from range_view_3d_detection_tpu.utils.config import compose

CONF = "conf"


def test_compose_rv_av2():
    cfg = compose(CONF, "rv-av2")
    assert cfg["name"] == "rv-av2"
    assert cfg["model"]["_backbone"]["stem_type"] == "META"
    assert cfg["model"]["_backbone"]["layers"] == [256, 128, 128, 128, 128]
    assert cfg["model"]["_head"]["fpn"][1] == 512
    assert cfg["model"]["_head"]["classification_head_channels"] == 512
    # baseline overrides
    assert cfg["model"]["use_linear_lr_scaling"] is True
    assert cfg["model"]["_scheduler"]["max_lr"] == 0.00075
    assert cfg["model"]["post_processing_config"]["nms_mode"] == "WEIGHTED"
    assert cfg["dataset"]["_train_dataset"]["range_view_config"]["height"] == 64
    assert cfg["dataset"]["_train_dataset"]["range_view_config"]["filter_roi"] is True
    assert len(cfg["model"]["tasks"][0]) == 26
    # interpolation
    assert (
        cfg["model"]["_head"]["targets_config"]["dataset_name"] == "av2"
    )


def test_compose_rv_waymo():
    cfg = compose(CONF, "rv-waymo")
    assert cfg["model"]["_backbone"]["in_channels"] == 6
    assert cfg["model"]["_head"]["fpn"][1] == 256
    assert cfg["dataset"]["_train_dataset"]["range_view_config"]["width"] == 2650
    names = cfg["dataset"]["_train_dataset"]["range_view_config"][
        "feature_column_names"
    ]
    assert names[0] == "elongation" and len(names) == 6


def test_compose_rv_nuscenes():
    cfg = compose(CONF, "rv-nuscenes")
    assert cfg["name"] == "rv-nuscenes"
    assert cfg["dataset"]["dataset_name"] == "nuscenes"
    rv = cfg["dataset"]["_train_dataset"]["range_view_config"]
    assert rv["height"] == 32 and rv["width"] == 1800
    assert rv["filter_roi"] is False
    assert len(cfg["model"]["tasks"][0]) == 10
    det = builders.build_detector_config(cfg)
    assert det.stem_type == "META"
    assert det.layers == (128, 128, 128, 128, 128)
    from range_view_3d_detection_tpu.evaluation import detection_cfg_factory

    eval_cfg = detection_cfg_factory(cfg["dataset"]["dataset_name"])
    assert eval_cfg.max_range_m == 55.0


def test_compose_overrides():
    cfg = compose(CONF, "rv-av2", ["++model.batch_size=2", "trainer.max_epochs=1"])
    assert cfg["model"]["batch_size"] == 2
    assert cfg["trainer"]["max_epochs"] == 1


def test_builders():
    cfg = compose(CONF, "rv-av2")
    det = builders.build_detector_config(cfg)
    assert det.stem_type == "META"
    assert det.layers == (256, 128, 128, 128, 128)
    assert det.fpn == ((1, 512),)
    assert len(det.tasks_dict[0]) == 26
    dec = builders.build_decoder_config(cfg)
    assert dec.subsampling_rates == (8, 2, 1)
    assert dec.nms_mode == "WEIGHTED"
    ds = builders.build_dataset_config(cfg, "train")
    assert ds.range_view.height == 64 and ds.range_view.width == 1800
    assert ds.augmentations is not None
    ds_val = builders.build_dataset_config(cfg, "val")
    assert ds_val.augmentations is None


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic") / "sensor"
    generate_dataset(
        root,
        splits={"train": 1, "val": 1},
        sweeps_per_log=2,
        height=8,
        width=56,  # +8 padding -> 64
        num_boxes=4,
        num_bg_points=800,
        seed=0,
    )
    return root


def _ds_cfg(root, split, **kw):
    return DatasetConfig(
        root_dir=str(root),
        dataset_name="av2",
        split_name=split,
        range_view=RangeViewConfig(height=8, width=56, filter_roi=True),
        tasks={0: ("PEDESTRIAN", "REGULAR_VEHICLE")},
        max_boxes=16,
        **kw,
    )


def test_dataset_loads(synthetic_root):
    ds = RangeViewDataset(_ds_cfg(synthetic_root, "val"))
    assert len(ds) == 2
    item = ds[0]
    assert item["features"].shape == (8, 64, 5)
    assert item["cart"].shape == (8, 64, 3)
    assert item["mask"].shape == (8, 64)
    assert item["boxes"].shape == (16, 7)
    assert item["box_valid"].sum() == item["num_boxes"]
    assert item["num_boxes"] > 0
    # cart channels of features match cart tensor (x,y,z are features 2:5).
    np.testing.assert_allclose(
        item["features"][..., 2:5] * item["mask"][..., None],
        item["cart"] * item["mask"][..., None],
        atol=1e-5,
    )


def test_dataset_augmented_consistency(synthetic_root):
    augs = {
        "flip_azimuth": {"p": 1.0},
        "random_rotation": {"low": -0.7, "high": 0.7, "p": 1.0},
        "random_global_scale": {"low": 0.9, "high": 1.1},
    }
    ds = RangeViewDataset(
        _ds_cfg(synthetic_root, "train", augmentations=augs)
    )
    item = ds[0]
    # Pixels interior to augmented boxes must still exist: box centers were
    # transformed with the same ops as the points.
    from range_view_3d_detection_tpu.ops import geometry
    import jax.numpy as jnp

    cart = item["cart"].reshape(-1, 3)
    valid = item["mask"].reshape(-1)
    n = item["num_boxes"]
    inside = np.asarray(
        geometry.points_in_boxes(
            jnp.asarray(cart), jnp.asarray(item["boxes"][:n])
        )
    )
    inside = inside & valid[None]
    assert inside.sum() > 0, "augmentation broke point/box consistency"


def test_dataloader_batches(synthetic_root):
    ds = RangeViewDataset(_ds_cfg(synthetic_root, "val"))
    loader = DataLoader(ds, batch_size=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["features"].shape == (2, 8, 64, 5)
    assert b["boxes"].shape == (2, 16, 7)
    assert len(b["uuids"]) == 2


def test_circular_padding(synthetic_root):
    ds = RangeViewDataset(
        _ds_cfg(synthetic_root, "val", padding_mode="circular")
    )
    item = ds[0]
    # wrap: first 4 columns == columns W-4..W of the unpadded image ==
    # columns at index -8..-4 of the padded image.
    np.testing.assert_allclose(
        item["features"][:, :4], item["features"][:, -8:-4], atol=1e-6
    )


def test_every_experiment_composes_and_builds():
    """All conf/experiment entries compose and produce valid typed
    configs (catches schema drift like new keys not reaching builders)."""
    from pathlib import Path

    from range_view_3d_detection_tpu.training.builders import (
        build_decoder_config,
        build_detector_config,
    )

    for path in sorted(Path(CONF).glob("experiment/*.yaml")):
        name = path.stem
        if name.startswith("base"):
            continue  # composition fragments, not launchable entries
        cfg = compose(CONF, name)
        det = build_detector_config(cfg)
        dec = build_decoder_config(cfg)
        assert det.layers and det.fpn, name
        assert dec.num_post_nms > 0, name
        if name in ("rv-av2", "rv-waymo", "rv-av2-fast"):
            assert det.stem_type == "META", name
            assert det.stem_pallas, name


def test_loader_smaller_than_batch_wraps():
    """A non-empty train set smaller than one batch yields ONE wrapped
    batch (static-shape analog of the reference's partial batch in the
    debug-overfit regime), not zero batches."""
    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp()) / "sensor"
    generate_dataset(
        root,
        splits={"train": 1},
        sweeps_per_log=1,
        height=8,
        width=56,
        num_boxes=4,
        num_bg_points=800,
        seed=1,
    )
    ds = RangeViewDataset(_ds_cfg(root, "train"))
    assert len(ds) == 1
    loader = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True)
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["features"].shape[0] == 3
