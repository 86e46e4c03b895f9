"""Projection (z-buffer) + AV2 converter tests."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import projection


def _random_points(n=2000, H=8, W=32, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, H, n)
    col = rng.integers(0, W, n)
    dist = rng.uniform(0.2, 50, n).astype(np.float32)
    values = rng.normal(size=(n, 3)).astype(np.float32)
    return row, col, dist, values


def _oracle(row, col, dist, values, H, W, min_d=1.0):
    img = np.zeros((H, W, values.shape[1]), np.float32)
    best = np.full((H, W), np.inf)
    for i in np.argsort(dist, kind="stable"):
        if dist[i] < min_d:
            continue
        r, c = row[i], col[i]
        if dist[i] < best[r, c]:
            best[r, c] = dist[i]
            img[r, c] = values[i]
    return img


def test_z_buffer_numpy_vs_oracle():
    row, col, dist, values = _random_points()
    got = projection.z_buffer_numpy(row, col, dist, values, height=8, width=32)
    want = _oracle(row, col, dist, values, 8, 32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_z_buffer_jax_matches_numpy():
    row, col, dist, values = _random_points(seed=3)
    want = projection.z_buffer_numpy(row, col, dist, values, height=8, width=32)
    got = np.asarray(
        projection.z_buffer_jax(
            jnp.asarray(row),
            jnp.asarray(col),
            jnp.asarray(dist),
            jnp.asarray(values),
            height=8,
            width=32,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_z_buffer_jax_sorted_matches_numpy():
    row, col, dist, values = _random_points(seed=5)
    want = projection.z_buffer_numpy(row, col, dist, values, height=8, width=32)
    got = np.asarray(
        projection.z_buffer_jax_sorted(
            jnp.asarray(row),
            jnp.asarray(col),
            jnp.asarray(dist),
            jnp.asarray(values),
            height=8,
            width=32,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_z_buffer_jax_sorted_tie_break_first_wins():
    # Two points on the same pixel at identical distance: the sequential
    # reference keeps the first — sort stability must preserve that.
    row = np.array([0, 0])
    col = np.array([0, 0])
    dist = np.array([5.0, 5.0], np.float32)
    values = np.array([[1.0], [2.0]], np.float32)
    got = np.asarray(
        projection.z_buffer_jax_sorted(
            jnp.asarray(row),
            jnp.asarray(col),
            jnp.asarray(dist),
            jnp.asarray(values),
            height=1,
            width=1,
        )
    )
    assert got[0, 0, 0] == 1.0


def test_min_distance_filtering():
    row = np.array([0, 0])
    col = np.array([0, 0])
    dist = np.array([0.5, 10.0], np.float32)  # first below min_distance
    values = np.array([[1.0], [2.0]], np.float32)
    got = projection.z_buffer_numpy(row, col, dist, values, height=1, width=1)
    assert got[0, 0, 0] == 2.0


def test_av2_converter_roundtrip(tmp_path):
    """Raw AV2-layout lidar feathers -> converter -> loadable dataset."""
    from converters.av2.export import export_dataset
    from converters.av2.row_mappings import ROW_MAPPING_64
    from range_view_3d_detection_tpu.utils.feather import (
        read_feather,
        write_feather,
    )

    rng = np.random.default_rng(0)
    src = tmp_path / "raw"
    n = 3000
    laser = rng.integers(0, 64, n)
    az = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 60, n)
    xyz = np.stack(
        [r * np.cos(az), r * np.sin(az), rng.uniform(-2, 2, n)], axis=-1
    )
    log = src / "train" / "log_a"
    write_feather(
        log / "sensors" / "lidar" / "1000.feather",
        {
            "x": xyz[:, 0].astype(np.float32),
            "y": xyz[:, 1].astype(np.float32),
            "z": xyz[:, 2].astype(np.float32),
            "intensity": rng.uniform(0, 255, n).astype(np.float32),
            "laser_number": laser.astype(np.uint8),
            "offset_ns": np.zeros(n, np.int64),
        },
    )
    write_feather(
        log / "annotations.feather",
        {
            "timestamp_ns": np.array([1000], np.int64),
            "category": np.array(["REGULAR_VEHICLE"]),
            "tx_m": np.array([10.0]),
            "ty_m": np.array([0.0]),
            "tz_m": np.array([0.0]),
            "length_m": np.array([4.0]),
            "width_m": np.array([2.0]),
            "height_m": np.array([1.5]),
            "qw": np.array([1.0]),
            "qx": np.array([0.0]),
            "qy": np.array([0.0]),
            "qz": np.array([0.0]),
            "num_interior_pts": np.array([12], np.int64),
        },
    )

    dst = tmp_path / "converted"
    export_dataset(str(src), str(dst), height=64, width=128, splits=("train",))

    out = read_feather(
        dst / "train" / "log_a" / "sensors" / "range_view" / "1000.feather"
    )
    assert len(out["range"]) == 64 * 128
    img_rng = out["range"].reshape(64, 128)
    assert (img_rng > 0).sum() > 500
    # Row placement follows the laser mapping: a point with laser_number L
    # lands on row ROW_MAPPING_64[L].
    ln = out["laser_number"].reshape(64, 128)
    valid = img_rng > 0
    rows = np.nonzero(valid)[0]
    mapped = ROW_MAPPING_64[ln[valid].astype(int)]
    np.testing.assert_array_equal(rows, mapped)
    # Cartesian consistency: range == |xyz|.
    flat_xyz = np.stack([out["x"], out["y"], out["z"]], -1)
    np.testing.assert_allclose(
        np.linalg.norm(flat_xyz[valid.reshape(-1)], axis=-1),
        out["range"][valid.reshape(-1)],
        rtol=1e-5,
    )
    # annotations copied through
    ann = read_feather(dst / "train" / "log_a" / "annotations.feather")
    assert ann["category"][0] == "REGULAR_VEHICLE"
