"""rotate_slices (rotatespilt analog) + Catalog.from_http."""

import math
import os
import threading

import numpy as np
import pyarrow as pa
import pytest

from featurebox_ray.functions.tensor import (rotate_slice, rotate_slices,
                                             rotate_slices_fn, rotatespilt)
from featurebox_ray.sources.io import Catalog


def _naive_slice(vol, theta, axis=0, axis_site=(0.0, 0.0)):
    """Spec-by-the-book single-angle slice: per-step loop, one fiber at a
    time (the shape of reference array_extract.py:55-125)."""
    dims = [s for a, s in enumerate(vol.shape) if a != axis]
    u0, v0 = int(axis_site[0] * dims[0]), int(axis_site[1] * dims[1])
    if theta == np.pi / 2:
        if axis == 0:
            return np.squeeze(vol[:, [u0], :])
        if axis == 1:
            return np.squeeze(vol[[u0], :, :])
        return np.squeeze(vol[:, :, [u0]])
    pts = [(u, v) for v in range(dims[1]) for u in range(dims[0])
           if abs((u - u0) - math.tan(theta) * (v - v0)) < 2]
    if len(pts) <= 3:
        raise UserWarning("corner")
    pu = np.array([p[0] for p in pts])
    pv = np.array([p[1] for p in pts])
    n_steps = int(math.sqrt(float(np.ptp(pu)) ** 2 + float(np.ptp(pv)) ** 2)) + 1
    corner = ((pu.min(), pv.min()) if theta < 1.57 else (pu.min(), pv.max()))
    dist = np.sqrt((pu - corner[0]) ** 2.0 + (pv - corner[1]) ** 2.0)
    cols = []
    for i in range(n_steps):
        near = np.argpartition(np.abs(dist - i), 3)[:3]
        fibers = []
        for k in near:
            u, v = pu[k], pv[k]
            if axis == 0:
                fibers.append(vol[:, u, v])
            elif axis == 1:
                fibers.append(vol[u, :, v])
            else:
                fibers.append(vol[u, v, :])
        cols.append(np.mean(np.array(fibers), axis=0))
    return np.array(cols).T


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_rotate_slice_matches_naive(axis):
    rng = np.random.default_rng(7)
    vol = rng.normal(size=(9, 11, 13))
    for theta in [0.0, np.pi / 6, np.pi / 3, 2.2, 2.9]:
        try:
            want = _naive_slice(vol, theta, axis=axis)
        except UserWarning:
            with pytest.raises(UserWarning):
                rotate_slice(vol, theta, axis=axis)
            continue
        got = rotate_slice(vol, theta, axis=axis)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_rotate_slice_pi_half_is_axis_slice():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(6, 7, 8))
    np.testing.assert_array_equal(
        rotate_slice(vol, np.pi / 2, axis=0, axis_site=(0.5, 0.0)),
        vol[:, 3, :])
    np.testing.assert_array_equal(
        rotate_slice(vol, np.pi / 2, axis=2), vol[:, :, 0])


def test_rotate_sweep_counts_and_alias():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(8, 10, 10))
    out = rotate_slices(vol, angle=30, axis=0)
    assert rotatespilt is rotate_slices
    assert 1 <= len(out) <= 6  # 6 draws in [0, pi), corner clips may skip
    for sl in out:
        assert sl.ndim == 2 and sl.shape[0] == 8


def test_rotate_slice_corner_clip_raises():
    vol = np.zeros((3, 2, 2))
    with pytest.raises(UserWarning):
        # near-vertical line through a 2x2 plane grazes <=3 points
        rotate_slice(vol, 1.5, axis=0)


def test_rotate_slices_fn_batch(ray_session):
    import ray

    rng = np.random.default_rng(3)
    vols = [rng.normal(size=(5, 8, 9)) for _ in range(4)]
    tbl = pa.table({
        "vol_id": pa.array(list(range(4)), pa.int64()),
        "tensor": pa.array([v.ravel().tolist() for v in vols],
                           pa.list_(pa.float64())),
        "shape": pa.array([[5, 8, 9]] * 4, pa.list_(pa.int64())),
    })
    ds = ray.data.from_arrow(tbl).map_batches(
        lambda b: rotate_slices_fn(b, angle=45, axis=1),
        batch_format="pyarrow")
    got = ds.to_pandas().sort_values(["vol_id", "angle_deg"])
    # every returned row replays the pure-numpy kernel
    assert len(got) > 0
    for _, row in got.iterrows():
        want = rotate_slice(vols[int(row.vol_id)],
                            np.pi / 180.0 * row.angle_deg, axis=1)
        np.testing.assert_allclose(
            np.asarray(row["slice"]).reshape(row["slice_shape"]), want)


def test_from_http_roundtrip(tmp_path):
    import http.server

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    payload = os.urandom(700_000)  # > chunk_size: exercises chunked write
    (src / "blob.bin").write_bytes(payload)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(src), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/blob.bin"
        p = Catalog.from_http(url, str(dst))
        assert os.path.basename(p) == "blob.bin"
        assert open(p, "rb").read() == payload
        # explicit filename + query params
        p2 = Catalog.from_http(url, str(dst), filename="renamed.bin",
                               params={"x": "1"})
        assert p2.endswith("renamed.bin")
        with pytest.raises(Exception):
            Catalog.from_http(url + ".missing", str(dst))
        with pytest.raises(RuntimeError):
            Catalog.from_http(url, str(dst / "nope"))
    finally:
        srv.shutdown()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    d0=st.integers(3, 8), d1=st.integers(4, 10), d2=st.integers(4, 10),
    axis=st.integers(0, 2),
    theta=st.floats(0.0, 3.1, allow_nan=False),
    cu=st.sampled_from([0.0, 0.25, 0.5]),
    cv=st.sampled_from([0.0, 0.25]),
    seed=st.integers(0, 10_000),
)
def test_rotate_slice_fuzz_matches_naive(d0, d1, d2, axis, theta, cu, cv,
                                         seed):
    """Vectorized kernel == per-step naive implementation for random
    volumes, axes, angles and rotate centers (bit-identical, or both
    raise the corner-clip warning)."""
    rng = np.random.default_rng(seed)
    vol = rng.normal(size=(d0, d1, d2))
    site = (cu, cv)
    try:
        want = _naive_slice(vol, theta, axis=axis, axis_site=site)
    except UserWarning:
        with pytest.raises(UserWarning):
            rotate_slice(vol, theta, axis=axis, axis_site=site)
        return
    got = rotate_slice(vol, theta, axis=axis, axis_site=site)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_catalog_jsonl_roundtrip(tmp_path):
    import pyarrow as pa
    import ray

    from featurebox_ray.sources.io import Catalog, write_table

    t = pa.table({"id": pa.array([3, 1, 2], pa.int64()),
                  "name": pa.array(["c", "a", None]),
                  "cents": pa.array([100, None, -250], pa.int64())})
    d = tmp_path / "js"
    d.mkdir()
    write_table(ray.data.from_arrow(t), str(d / "things.jsonl"),
                fmt="jsonl")
    # Catalog discovers the .jsonl file written as a directory of shards
    cat = Catalog(str(d))
    assert "things.jsonl" in str(cat._tables.get("things", "")) or \
        "things" in cat.tables
    back = (cat.read("things").to_pandas()
            .sort_values("id").reset_index(drop=True))
    want = (t.to_pandas().sort_values("id").reset_index(drop=True))
    assert back["id"].tolist() == want["id"].tolist()
    assert back["cents"].fillna(-1).tolist() == \
        want["cents"].fillna(-1).tolist()
    assert back["name"].fillna("").tolist() == \
        want["name"].fillna("").tolist()


def test_write_table_unknown_format():
    import pyarrow as pa
    import pytest
    import ray

    from featurebox_ray.sources.io import write_table
    with pytest.raises(ValueError, match="unsupported"):
        write_table(ray.data.from_arrow(pa.table({"a": [1]})), "/tmp/x",
                    fmt="xlsx")
