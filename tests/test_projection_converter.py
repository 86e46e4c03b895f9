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


def _point_cloud(n=4000, H=8, W=64, seed=11):
    """Synthetic sensor-frame cloud whose rows are laser indices."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.3, 60.0, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(-0.3, 0.1, n)
    xyz = np.stack(
        [
            r * np.cos(el) * np.cos(az),
            r * np.cos(el) * np.sin(az),
            r * np.sin(el),
        ],
        axis=-1,
    ).astype(np.float32)
    laser = rng.integers(0, H, n).astype(np.int32)
    intensity = rng.uniform(0, 255, n).astype(np.float32)
    return xyz, laser, intensity


def _expected_inputs(
    xyz, laser, intensity, *, H, W, names, dataset="av2", x_stride=1, pad=0
):
    """Host-side reconstruction of load_sweep + _pad_and_stride."""
    row, col, rng_ = projection.range_view_coordinates(
        xyz, laser, height=H, width=W
    )
    per_point = {
        "range": rng_.astype(np.float32),
        "x": xyz[:, 0],
        "y": xyz[:, 1],
        "z": xyz[:, 2],
        "intensity": intensity,
        "laser": laser.astype(np.float32),
    }
    stack = np.stack([per_point[k] for k in sorted(per_point)], axis=-1)
    img = projection.z_buffer_numpy(
        row, col, rng_, stack, height=H, width=W
    )
    chan = {k: img[..., i] for i, k in enumerate(sorted(per_point))}
    mask = chan["range"] > 0
    planes = []
    for name in names:
        if name == "view":
            p = np.where(mask, np.where(chan["laser"] <= 32, 2.0, 1.0), 0.0)
        else:
            p = chan[name]
            if name == "intensity" and dataset == "waymo":
                p = np.tanh(p)
        planes.append(p.astype(np.float32))
    feats = np.stack(planes, axis=-1) * mask[..., None]
    cart = np.stack([chan["x"], chan["y"], chan["z"]], axis=-1)
    spec = ((0, 0), (pad, pad), (0, 0))
    feats = np.pad(feats, spec, mode="wrap")[:, ::x_stride]
    cart = np.pad(cart, spec, mode="wrap")[:, ::x_stride]
    mask = np.pad(mask, spec[:2], mode="wrap")[:, ::x_stride]
    return feats, cart.astype(np.float32), mask


def test_rasterize_points_jax_matches_host_path():
    """Device rasterization == load_sweep-semantics host reconstruction."""
    H, W = 8, 64
    xyz, laser, intensity = _point_cloud(H=H, W=W)
    names = ("intensity", "range", "x", "y", "z")
    want_f, want_c, want_m = _expected_inputs(
        xyz, laser, intensity, H=H, W=W, names=names
    )
    import jax

    got_f, got_c, got_m = jax.jit(
        lambda p, ln, i: projection.rasterize_points_jax(
            p,
            ln,
            {"intensity": i},
            height=H,
            width=W,
            feature_names=names,
        )
    )(xyz, laser, intensity)
    np.testing.assert_allclose(np.asarray(got_f), want_f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_rasterize_points_jax_pad_stride_view_waymo():
    """Circular pad + decimation + view channel + waymo tanh(intensity)."""
    H, W, x_stride = 8, 64, 2
    xyz, laser, intensity = _point_cloud(H=H, W=W, seed=13)
    # width_padding semantics: smallest pad with (W+2p) % (16*stride) == 0.
    from range_view_3d_detection_tpu.data.dataset import width_padding

    pad = width_padding(W, x_stride)
    names = ("view", "intensity", "range", "x", "y", "z")
    want_f, want_c, want_m = _expected_inputs(
        xyz, laser, intensity, H=H, W=W, names=names,
        dataset="waymo", x_stride=x_stride, pad=pad,
    )
    got_f, got_c, got_m = projection.rasterize_points_jax(
        jnp.asarray(xyz),
        jnp.asarray(laser),
        {"intensity": jnp.asarray(intensity)},
        height=H,
        width=W,
        feature_names=names,
        dataset_name="waymo",
        x_stride=x_stride,
        pad=pad,
    )
    assert got_f.shape == ((H, (W + 2 * pad) // x_stride, len(names)))
    np.testing.assert_allclose(np.asarray(got_f), want_f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_rasterize_points_zero_padded_points_dropped():
    """All-zero pad rows (range 0 < min_distance) never win a pixel."""
    xyz = np.zeros((64, 3), np.float32)
    xyz[0] = (10.0, 0.0, 1.0)
    laser = np.zeros(64, np.int32)
    feats, cart, mask = projection.rasterize_points_jax(
        jnp.asarray(xyz),
        jnp.asarray(laser),
        {},
        height=4,
        width=16,
        feature_names=("range", "x", "y", "z"),
    )
    assert int(np.asarray(mask).sum()) == 1
