"""nuScenes converter fixture tests (SDK-free, synthetic mini dataset).

The reference ships only a nuScenes config (``conf/dataset/nuscenes.yaml``)
with no converter; ours reads the raw nuScenes relational-table format
directly. The fixture builds a one-scene, two-sample dataset with known
geometry (ego at origin then translated) and verifies projection, frame
conversions, num_interior_pts, and the on-disk AV2 layout.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from converters.nuscenes.export import export_dataset
from range_view_3d_detection_tpu.utils.feather import read_feather


def _write_mini_nuscenes(root: Path):
    rng = np.random.default_rng(0)
    version = "v1.0-mini"
    tdir = root / version
    tdir.mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)

    def dump(name, rows):
        (tdir / f"{name}.json").write_text(json.dumps(rows))

    # One scene, two samples 0.5 s apart; ego moves +10 m in x.
    dump(
        "scene",
        [
            {
                "token": "sc0",
                "name": "scene-0001",
                "first_sample_token": "s0",
                "last_sample_token": "s1",
            }
        ],
    )
    dump(
        "sample",
        [
            {
                "token": "s0",
                "timestamp": 1_000_000,
                "next": "s1",
                "prev": "",
                "scene_token": "sc0",
            },
            {
                "token": "s1",
                "timestamp": 1_500_000,
                "next": "",
                "prev": "s0",
                "scene_token": "sc0",
            },
        ],
    )
    # Lidar mounted 1.8 m up, no rotation.
    dump(
        "calibrated_sensor",
        [
            {
                "token": "cs0",
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "translation": [0.0, 0.0, 1.8],
            }
        ],
    )
    dump(
        "ego_pose",
        [
            {
                "token": "ep0",
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "translation": [0.0, 0.0, 0.0],
            },
            {
                "token": "ep1",
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "translation": [10.0, 0.0, 0.0],
            },
        ],
    )
    dump(
        "category",
        [
            {"token": "cat_car", "name": "vehicle.car"},
            {"token": "cat_dbg", "name": "static_object.bicycle_rack"},
        ],
    )
    dump(
        "instance",
        [
            {"token": "in0", "category_token": "cat_car"},
            {"token": "in1", "category_token": "cat_dbg"},
        ],
    )

    def points(seed):
        # Background ring + a 25-point cluster at global (15, 0, 0.5)m.
        r = np.random.default_rng(seed)
        n_bg = 3000
        az = r.uniform(-np.pi, np.pi, n_bg)
        rad = r.uniform(3, 50, n_bg)
        bg = np.stack(
            [
                rad * np.cos(az),
                rad * np.sin(az),
                r.uniform(-1.8, 0.5, n_bg),
            ],
            -1,
        )
        return bg, r

    # Sample 0: ego at origin. Sensor frame = ego - [0,0,1.8].
    bg, r0 = points(1)
    cluster_g = np.array([15.0, 0.0, 0.5]) + r0.uniform(-0.4, 0.4, (25, 3))
    pts_ego = np.concatenate([bg, cluster_g])  # ego == global at s0
    pts_sensor = pts_ego - [0.0, 0.0, 1.8]
    arr = np.concatenate(
        [
            pts_sensor.astype(np.float32),
            r0.uniform(0, 100, (len(pts_sensor), 1)).astype(np.float32),
            r0.integers(0, 32, (len(pts_sensor), 1)).astype(np.float32),
        ],
        axis=-1,
    )
    arr.astype(np.float32).tofile(root / "samples/LIDAR_TOP/s0.pcd.bin")

    # Sample 1: ego at (10, 0, 0); same global cluster now at ego (5, 0).
    bg1, r1 = points(2)
    cluster_e1 = np.array([5.0, 0.0, 0.5]) + r1.uniform(-0.4, 0.4, (25, 3))
    pts_ego1 = np.concatenate([bg1, cluster_e1])
    pts_sensor1 = pts_ego1 - [0.0, 0.0, 1.8]
    arr1 = np.concatenate(
        [
            pts_sensor1.astype(np.float32),
            r1.uniform(0, 100, (len(pts_sensor1), 1)).astype(np.float32),
            r1.integers(0, 32, (len(pts_sensor1), 1)).astype(np.float32),
        ],
        axis=-1,
    )
    arr1.astype(np.float32).tofile(root / "samples/LIDAR_TOP/s1.pcd.bin")

    dump(
        "sample_data",
        [
            {
                "token": "sd0",
                "sample_token": "s0",
                "ego_pose_token": "ep0",
                "calibrated_sensor_token": "cs0",
                "filename": "samples/LIDAR_TOP/s0.pcd.bin",
                "is_key_frame": True,
            },
            {
                "token": "sd1",
                "sample_token": "s1",
                "ego_pose_token": "ep1",
                "calibrated_sensor_token": "cs0",
                "filename": "samples/LIDAR_TOP/s1.pcd.bin",
                "is_key_frame": True,
            },
        ],
    )
    # One car around the global cluster (present in both samples), plus an
    # unmapped-category object that must be dropped.
    dump(
        "sample_annotation",
        [
            {
                "token": "a0",
                "sample_token": "s0",
                "instance_token": "in0",
                "translation": [15.0, 0.0, 0.5],
                "size": [2.0, 4.5, 1.6],  # w, l, h
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "num_lidar_pts": 99,
            },
            {
                "token": "a1",
                "sample_token": "s1",
                "instance_token": "in0",
                "translation": [15.0, 0.0, 0.5],
                "size": [2.0, 4.5, 1.6],
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "num_lidar_pts": 99,
            },
            {
                "token": "a2",
                "sample_token": "s0",
                "instance_token": "in1",
                "translation": [0.0, 5.0, 0.0],
                "size": [1.0, 1.0, 1.0],
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "num_lidar_pts": 0,
            },
        ],
    )
    return version


def test_nuscenes_converter_end_to_end(tmp_path):
    src = tmp_path / "nusc"
    version = _write_mini_nuscenes(src)
    dst = tmp_path / "out"
    export_dataset(
        str(src), str(dst), version=version, height=32, width=360
    )

    log = dst / "train" / "scene-0001"
    sweeps = sorted((log / "sensors" / "range_view").glob("*.feather"))
    assert [p.stem for p in sweeps] == ["1000000000", "1500000000"]

    rv = read_feather(sweeps[0])
    assert len(rv["range"]) == 32 * 360
    valid = rv["range"] > 0
    assert valid.sum() > 500
    # Ego-frame coordinates: range equals |xyz|.
    xyz = np.stack([rv["x"], rv["y"], rv["z"]], -1)
    np.testing.assert_allclose(
        np.linalg.norm(xyz[valid], axis=-1), rv["range"][valid], rtol=1e-5
    )

    ann = read_feather(log / "annotations.feather")
    # Unmapped category dropped; the car appears once per sample.
    assert list(ann["category"]) == ["CAR", "CAR"]
    # nuScenes size order (w, l, h) mapped correctly.
    np.testing.assert_allclose(ann["length_m"], [4.5, 4.5])
    np.testing.assert_allclose(ann["width_m"], [2.0, 2.0])
    # Global -> ego: at sample 1 the car center is at ego x = 5.
    np.testing.assert_allclose(sorted(ann["tx_m"]), [5.0, 15.0], atol=1e-6)
    # Interior points recomputed from the z-buffered sweep (not the
    # table's 99; collisions in the 3-column-wide cluster footprint
    # legitimately drop a few of the 25 points).
    assert (ann["num_interior_pts"] >= 10).all()
    assert (ann["num_interior_pts"] <= 40).all()

    poses = read_feather(log / "city_SE3_egovehicle.feather")
    np.testing.assert_allclose(sorted(poses["tx_m"]), [0.0, 10.0])


@pytest.mark.slow
def test_rv_nuscenes_train_smoke(tmp_path):
    """rv-nuscenes composes and trains end-to-end on the converted fixture.

    Debug-overfit semantics (reference scripts/debug-overfit.sh): val split
    pinned to train. Proves the nuScenes surface is a full pipeline here,
    not config-only as in the reference (conf/dataset/nuscenes.yaml).
    """
    src = tmp_path / "nusc"
    version = _write_mini_nuscenes(src)
    dst = tmp_path / "out"
    export_dataset(str(src), str(dst), version=version, height=32, width=360)

    from range_view_3d_detection_tpu.training.loop import Trainer
    from range_view_3d_detection_tpu.utils.config import compose

    repo = Path(__file__).resolve().parent.parent
    cfg = compose(
        repo / "conf",
        "rv-nuscenes",
        [
            f"dataset.root_dir={dst}",
            "dataset._val_dataset.split_name=train",
            "dataset._train_dataset.range_view_config.height=32",
            "dataset._train_dataset.range_view_config.width=360",
            "model.batch_size=2",
            "model.max_boxes=16",
            "model._backbone.layers=[8,8,8,8,8]",
            "model._backbone.stem_pallas=false",
            "model._head.fpn={1: 16}",
            "model._head.classification_head_channels=8",
            "model._head.regression_head_channels=8",
            "model._head.num_classification_blocks=1",
            "model._head.num_regression_blocks=1",
            "model.post_processing_config.nms_cap=128",
            "model.post_processing_config.min_confidence=0.01",
            "trainer.max_epochs=1",
            "trainer.devices=1",
            f"run_dir={tmp_path}/run",
        ],
    )
    trainer = Trainer(cfg)
    assert len(trainer.train_ds) == 2
    state = trainer.fit()
    assert state is not None

    pred_dir = trainer.validate()
    shards = list(Path(pred_dir).glob("*.feather"))
    assert len(shards) == 2
