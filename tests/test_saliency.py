"""Unit tests for the saliency pipeline's probe-point selection and
occlusion-impact accumulation (mgtpu/pipelines/saliency.py), pinned to
the reference's semantics (`pipelines/saliency/test.lua:51-117` probe
layout; `:146-157` impact>=0.1 gated mask sum)."""

import jax.numpy as jnp
import numpy as np

from mgtpu.pipelines.saliency import interest_point, saliency_map


def _probe_centers(points):
    """Center pixel of each (2dp+1)^2 probe window."""
    out = []
    for k in range(points.shape[0]):
        ys, xs = np.nonzero(points[k, :, :, 0])
        out.append((int(round(ys.mean())), int(round(xs.mean()))))
    return out


def test_interest_point_probe_layout():
    out = np.zeros((16, 16, 1), np.float32)
    out[4:13, 6:11, 0] = 1.0  # box rows 4..12, cols 6..10
    pts = interest_point(out, th=0.4, dp=1)
    assert pts is not None and pts.shape == (7, 16, 16, 1)
    centers = _probe_centers(pts)
    # center of box: ((4+12)//2, (6+10)//2)
    assert centers[0] == (8, 8)
    # 6 box-edge probes: x in {col_st, col_ed}, y in {row_st, mid, row_ed}
    expected = {(4, 6), (8, 6), (12, 6), (4, 10), (8, 10), (12, 10)}
    assert set(centers[1:]) == expected
    # every probe window is (2dp+1)^2 = 9 pixels
    assert all(points.sum() == 9 for points in pts[:, :, :, 0])


def test_interest_point_clamps_to_border():
    out = np.zeros((8, 8, 1), np.float32)
    out[0:8, 0:8, 0] = 1.0  # full-extent box -> corners clamp inward
    pts = interest_point(out, th=0.4, dp=1)
    centers = _probe_centers(pts)
    assert (1, 1) in centers and (6, 6) in centers  # clamped corners
    assert all(points.sum() == 9 for points in pts[:, :, :, 0])


def test_interest_point_none_without_extent():
    out = np.zeros((8, 8, 1), np.float32)
    out[3, 3, 0] = 1.0  # single row/col above threshold -> no box
    assert interest_point(out, th=0.4) is None
    assert interest_point(np.zeros((8, 8, 1), np.float32)) is None


def test_saliency_map_gated_accumulation():
    h = w = 4
    # original output + 2 occluded variants
    outputs = np.zeros((3, h, w, 1), np.float32)
    outputs[1, 1, 1, 0] = 0.5   # variant 1 differs by 0.5 at (1,1)
    outputs[2, 2, 2, 0] = 0.05  # variant 2 differs by 0.05 (below gate)
    points = np.zeros((7, h, w, 1), np.float32)
    points[0, 1, 1, 0] = 1.0    # probe 0 watches (1,1)
    points[3, 2, 2, 0] = 1.0    # probe 3 watches (2,2)
    mask = np.zeros((2, h, w, 1), np.float32)
    mask[0, 0, 0, 0] = 1.0      # variant 1 occluded the (0,0) region
    mask[1, 3, 3, 0] = 1.0
    sal = saliency_map(outputs, points, mask, threshold=0.1)
    assert sal.shape == (7, h, w, 1)
    # probe 0: impact 0.5 >= 0.1 -> mask_0 * 0.5 lands at (0,0)
    assert sal[0, 0, 0, 0] == np.float32(0.5)
    assert sal[0].sum() == np.float32(0.5)
    # probe 3: impact 0.05 < 0.1 -> gated out entirely
    assert sal[3].sum() == 0.0
    # probes that watch nothing accumulate nothing
    assert sal[1].sum() == sal[6].sum() == 0.0


def test_pipeline_grouping_bit_identical(tmp_path):
    """run() forwards k occlusion stacks per jit call with a padded
    tail group; outputs must be bit-identical for any -saliencyBatch
    (per-sample eval forwards are independent)."""
    import types

    import h5py

    from mgtpu.data import get_loaders
    from mgtpu.data.prefetch import DonkeyPool
    from mgtpu.pipelines import saliency as sal_pipe

    class StubModel:
        def apply(self, p, s, x, train=False, rng=None):
            return jnp.tanh(x), s

    def build_sess(k, save):
        opt = types.SimpleNamespace(
            dataset="mnist-saliency", data="synthetic", synthSize=5,
            imageSize=64, imageCrop=64, colorspace="gray",
            dataAug="default", saliencyBatch=k, save=str(save),
        )
        sess = types.SimpleNamespace(
            opt=opt, model=StubModel(), params={}, stats={},
            loaders=get_loaders(opt),
        )
        sess.pool = DonkeyPool(0, opt=opt, loaders=sess.loaders)
        return sess

    for k in (1, 3):
        sal_pipe.run(build_sess(k, tmp_path / f"k{k}"))

    with h5py.File(tmp_path / "k1" / "testOutput.h5") as f1, \
         h5py.File(tmp_path / "k3" / "testOutput.h5") as f3:
        keys1 = sorted(f1.keys())
        assert keys1 == sorted(f3.keys()) and keys1  # same samples kept
        for gid in keys1:
            for ds in ("points", "saliency", "input", "output"):
                np.testing.assert_array_equal(
                    np.asarray(f1[f"{gid}/{ds}"]), np.asarray(f3[f"{gid}/{ds}"])
                )


def test_device_probe_matches_host():
    """The on-device probe (-saliencyDumpStack 0) must reproduce the
    host path: identical probe masks (bit-exact), matching saliency
    accumulation, and `valid` mirroring the host's None return."""
    import jax

    from mgtpu.pipelines.saliency import _interest_point_jnp, _saliency_map_jnp

    rng = np.random.default_rng(5)
    cases = []
    # confident boxes of assorted extents (incl. border-clamping ones)
    for (r0, r1, c0, c1) in [(4, 12, 6, 10), (0, 15, 0, 15), (2, 3, 5, 9)]:
        o = np.zeros((16, 16, 1), np.float32)
        o[r0:r1 + 1, c0:c1 + 1, 0] = 0.9
        cases.append(o)
    cases.append(rng.random((16, 16, 1)).astype(np.float32))  # noisy
    cases.append(np.zeros((16, 16, 1), np.float32))           # invalid
    one_col = np.zeros((16, 16, 1), np.float32)
    one_col[:, 7, 0] = 1.0                                    # invalid (1 col)
    cases.append(one_col)

    jit_probe = jax.jit(_interest_point_jnp)
    jit_sal = jax.jit(_saliency_map_jnp)
    n_occl = 10
    mask = (rng.random((n_occl, 16, 16, 1)) > 0.7).astype(np.float32)
    for o in cases:
        host_pts = interest_point(o)
        valid, dev_pts = jit_probe(jnp.asarray(o))
        assert bool(valid) == (host_pts is not None)
        if host_pts is None:
            continue
        np.testing.assert_array_equal(np.asarray(dev_pts), host_pts)
        outputs = np.concatenate([o[None]] * 1 + [rng.random((n_occl, 16, 16, 1)).astype(np.float32)])
        host_sal = saliency_map(outputs, host_pts, mask)
        dev_sal = np.asarray(jit_sal(jnp.asarray(outputs), dev_pts, jnp.asarray(mask)))
        np.testing.assert_allclose(dev_sal, host_sal, rtol=1e-5, atol=1e-6)


def test_pipeline_dump_stack_flag(tmp_path):
    """-saliencyDumpStack 0 writes the same {points, saliency, input}
    (modulo float summation order) without the output stacks; 1 keeps
    today's exact layout."""
    import types

    import h5py

    from mgtpu.data import get_loaders
    from mgtpu.data.prefetch import DonkeyPool
    from mgtpu.pipelines import saliency as sal_pipe

    class StubModel:
        def apply(self, p, s, x, train=False, rng=None):
            return jnp.tanh(x), s

    def build_sess(dump, save):
        opt = types.SimpleNamespace(
            dataset="mnist-saliency", data="synthetic", synthSize=5,
            imageSize=64, imageCrop=64, colorspace="gray",
            dataAug="default", saliencyBatch=2, save=str(save),
            saliencyDumpStack=dump,
        )
        sess = types.SimpleNamespace(
            opt=opt, model=StubModel(), params={}, stats={},
            loaders=get_loaders(opt),
        )
        sess.pool = DonkeyPool(0, opt=opt, loaders=sess.loaders)
        return sess

    sal_pipe.run(build_sess(1, tmp_path / "on"))
    sal_pipe.run(build_sess(0, tmp_path / "off"))

    with h5py.File(tmp_path / "on" / "testOutput.h5") as f1, \
         h5py.File(tmp_path / "off" / "testOutput.h5") as f0:
        keys = sorted(f1.keys())
        assert sorted(f0.keys()) == keys and keys  # same samples kept
        for gid in keys:
            assert "output" in f1[gid] and "output" not in f0[gid]
            np.testing.assert_array_equal(
                np.asarray(f1[f"{gid}/points"]), np.asarray(f0[f"{gid}/points"]))
            np.testing.assert_array_equal(
                np.asarray(f1[f"{gid}/input"]), np.asarray(f0[f"{gid}/input"]))
            np.testing.assert_allclose(
                np.asarray(f1[f"{gid}/saliency"]),
                np.asarray(f0[f"{gid}/saliency"]), rtol=1e-4, atol=1e-5)
