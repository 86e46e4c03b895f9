"""AV2 converter fixture tests: map-based ROI + num_interior_pts.

Covers the reference converter capabilities the round-1 build stubbed:
per-point ``is_within_roi`` from the HD map's drivable areas
(``converters/av2/export.py:97``, ``converters/av2/utils.py:23,99``) and
``num_interior_pts`` computation when the source annotations lack it
(loader train filter dependency, ``prototype/loader.py:331-344``).
"""

import json

import numpy as np
import pytest

from converters.av2.export import export_dataset
from converters.av2.roi import RoiMap, load_roi_map
from range_view_3d_detection_tpu.utils.feather import read_feather, write_feather


def test_roi_raster_square_with_dilation():
    square = np.asarray(
        [[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]]
    )
    roi = RoiMap([square])
    pts = np.asarray(
        [
            [10.0, 10.0],  # inside
            [22.0, 10.0],  # 2 m out: within the 5 m buffer
            [30.0, 10.0],  # 10 m out: outside
            [-4.0, -4.0],  # corner diagonal ~5.66 m: outside
            [-3.0, 0.0],  # 3 m out along an edge: inside buffer
        ]
    )
    got = roi.contains(pts)
    np.testing.assert_array_equal(got, [True, True, False, False, True])


def _write_mini_log(src, log_id="log_roi", with_pts_col=False, ego_xy=(0.0, 0.0)):
    """A raw AV2-format log: one sweep, identity-ish pose at ego_xy, a map
    whose drivable area covers x in [0, 40] city frame."""
    rng = np.random.default_rng(0)
    log = src / "train" / log_id
    ts = 5_000_000_000

    # Points: a cluster inside the annotation box at (10, 0) and spread.
    n_bg = 500
    az = rng.uniform(-np.pi, np.pi, n_bg)
    r = rng.uniform(5, 60, n_bg)
    bg = np.stack([r * np.cos(az), r * np.sin(az), rng.uniform(-1, 1, n_bg)], -1)
    n_in = 25
    inside = np.stack(
        [
            rng.uniform(8.5, 11.5, n_in),
            rng.uniform(-0.8, 0.8, n_in),
            rng.uniform(-0.5, 0.5, n_in),
        ],
        -1,
    )
    xyz = np.concatenate([bg, inside])
    n = len(xyz)
    write_feather(
        log / "sensors" / "lidar" / f"{ts}.feather",
        {
            "x": xyz[:, 0].astype(np.float32),
            "y": xyz[:, 1].astype(np.float32),
            "z": xyz[:, 2].astype(np.float32),
            "intensity": rng.uniform(0, 255, n).astype(np.float32),
            "laser_number": rng.integers(0, 64, n).astype(np.uint8),
            "offset_ns": np.zeros(n, np.int64),
        },
    )

    ann = {
        "timestamp_ns": np.array([ts, ts], np.int64),
        "category": np.array(["REGULAR_VEHICLE", "PEDESTRIAN"]),
        "tx_m": np.array([10.0, -30.0]),  # second is far left (off-map)
        "ty_m": np.array([0.0, 0.0]),
        "tz_m": np.array([0.0, 0.0]),
        "length_m": np.array([4.0, 0.8]),
        "width_m": np.array([2.0, 0.8]),
        "height_m": np.array([1.5, 1.8]),
        "qw": np.array([1.0, 1.0]),
        "qx": np.array([0.0, 0.0]),
        "qy": np.array([0.0, 0.0]),
        "qz": np.array([0.0, 0.0]),
    }
    if with_pts_col:
        ann["num_interior_pts"] = np.array([999, 999], np.int64)
    write_feather(log / "annotations.feather", ann)

    write_feather(
        log / "city_SE3_egovehicle.feather",
        {
            "timestamp_ns": np.array([ts - 10**9, ts + 10**9], np.int64),
            "qw": np.ones(2),
            "qx": np.zeros(2),
            "qy": np.zeros(2),
            "qz": np.zeros(2),
            "tx_m": np.full(2, ego_xy[0]),
            "ty_m": np.full(2, ego_xy[1]),
            "tz_m": np.zeros(2),
        },
    )

    # Drivable area: city-frame x in [0, 40], y in [-15, 15].
    archive = {
        "drivable_areas": {
            "1": {
                "id": 1,
                "area_boundary": [
                    {"x": 0.0, "y": -15.0, "z": 0.0},
                    {"x": 40.0, "y": -15.0, "z": 0.0},
                    {"x": 40.0, "y": 15.0, "z": 0.0},
                    {"x": 0.0, "y": 15.0, "z": 0.0},
                ],
            }
        },
        "lane_segments": {},
        "pedestrian_crossings": {},
    }
    (log / "map").mkdir(parents=True, exist_ok=True)
    (log / "map" / f"log_map_archive_{log_id}.json").write_text(
        json.dumps(archive)
    )
    return log, ts


def test_load_roi_map(tmp_path):
    log, _ = _write_mini_log(tmp_path / "raw")
    roi = load_roi_map(log)
    assert roi is not None
    assert roi.contains(np.asarray([[20.0, 0.0]]))[0]
    assert not roi.contains(np.asarray([[-30.0, 0.0]]))[0]


def test_converter_computes_interior_points_and_roi(tmp_path):
    src = tmp_path / "raw"
    _write_mini_log(src)
    dst = tmp_path / "converted"
    export_dataset(str(src), str(dst), height=64, width=128, splits=("train",))

    ann = read_feather(dst / "train" / "log_roi" / "annotations.feather")
    # Vehicle box at (10,0) contains the 25-point cluster; the far
    # pedestrian contains none.
    veh = ann["category"] == "REGULAR_VEHICLE"
    assert int(ann["num_interior_pts"][veh][0]) == 25
    assert int(ann["num_interior_pts"][~veh][0]) == 0

    # ROI flags: vehicle on the drivable area; pedestrian at x=-30 is
    # beyond the 5 m buffer.
    assert bool(ann["is_within_roi"][veh][0])
    assert not bool(ann["is_within_roi"][~veh][0])

    # Per-point flags in the range view: points at city x < -5 are out.
    rv = read_feather(
        dst
        / "train"
        / "log_roi"
        / "sensors"
        / "range_view"
        / "5000000000.feather"
    )
    valid = rv["range"] > 0
    in_roi = rv["is_within_roi"][valid] > 0
    xs, ys = rv["x"][valid], rv["y"][valid]
    on_map = (xs > 1.0) & (xs < 39.0) & (np.abs(ys) < 14.0)
    assert on_map.any() and in_roi[on_map].all()
    assert (~in_roi[xs < -6.0]).all()  # left of the buffered map edge


def test_converter_respects_existing_interior_points(tmp_path):
    src = tmp_path / "raw"
    _write_mini_log(src, log_id="log_keep", with_pts_col=True)
    dst = tmp_path / "converted"
    export_dataset(str(src), str(dst), height=64, width=128, splits=("train",))
    ann = read_feather(dst / "train" / "log_keep" / "annotations.feather")
    np.testing.assert_array_equal(ann["num_interior_pts"], [999, 999])


def test_ego_offset_transforms_to_city(tmp_path):
    """With the ego at city (30, 0), a point at ego x=-25 (city x=5) is
    on-map while ego x=+25 (city x=55) is off-map — proves the ego->city
    transform is applied before the raster lookup."""
    src = tmp_path / "raw"
    log, ts = _write_mini_log(src, log_id="log_off", ego_xy=(30.0, 0.0))
    dst = tmp_path / "converted"
    export_dataset(str(src), str(dst), height=64, width=128, splits=("train",))
    rv = read_feather(
        dst / "train" / "log_off" / "sensors" / "range_view" / f"{ts}.feather"
    )
    valid = rv["range"] > 0
    xs, ys = rv["x"][valid], rv["y"][valid]
    roi = rv["is_within_roi"][valid] > 0
    # city x in (10, 15), |city y| < 14: inside
    near = (xs > -20) & (xs < -15) & (np.abs(ys) < 14.0)
    far = xs > 26  # city x > 56: outside buffer
    assert near.any() and roi[near].all()
    assert far.any() and (~roi[far]).all()


def test_detection_roi_annotation(tmp_path):
    """Detections on sweeps of a mapped log get is_within_roi from the
    ego->city transform + raster query (devkit filters detections too)."""
    from range_view_3d_detection_tpu.evaluation.av2_eval import (
        annotate_detection_roi,
    )

    src = tmp_path / "raw"
    _write_mini_log(src, log_id="log_det", ego_xy=(30.0, 0.0))
    dst = tmp_path / "converted"
    export_dataset(str(src), str(dst), height=64, width=128, splits=("train",))

    ts = 5_000_000_000
    dts = {
        "tx_m": np.asarray([-25.0, 25.0]),  # city x = 5 (in) / 55 (out)
        "ty_m": np.asarray([0.0, 0.0]),
        "tz_m": np.zeros(2),
        "score": np.asarray([0.9, 0.8]),
        "log_id": np.asarray(["log_det", "log_det"]),
        "timestamp_ns": np.asarray([ts, ts], np.int64),
    }
    out = annotate_detection_roi(dts, dst / "train")
    np.testing.assert_array_equal(out["is_within_roi"], [True, False])

    # Logs without maps keep everything.
    dts2 = dict(dts)
    dts2["log_id"] = np.asarray(["nolog", "nolog"])
    out2 = annotate_detection_roi(dts2, dst / "train")
    assert out2["is_within_roi"].all()
