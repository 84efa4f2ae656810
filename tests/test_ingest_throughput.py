"""Host-ingest regression pins (VERDICT r2 #6).

PARITY's ILSVRC feeding estimate (~25-35 host cores per chip) rests on
the native data plane sustaining ~80-120 img/s/core through the full
JPEG decode -> RandomSizedCrop -> ColorJitter -> Lighting -> normalize
-> flip train hook (`dataset/ilsvrc/donkey.lua:63-78`). These tests
keep that figure from silently rotting:

  1. the native C++ path must be LIVE whenever g++ exists — a build
     regression would silently fall back to the slower pure-PIL path;
  2. the per-image wall of the full hook must stay under a budget set
     ~4x above the uncontended measurement (11 ms/img on this box) —
     loose enough for a shared core, tight enough to catch an
     accidental O(n) regression or a dead fast path.
"""

import shutil
import time

import numpy as np
import pytest


def test_native_plane_available_when_toolchain_exists():
    from mgtpu import native

    if shutil.which("g++") is None:
        pytest.skip("no g++ on this host")
    assert native.available(), (
        "g++ exists but the native data plane failed to build/load — "
        "ingest throughput silently regressed to the PIL fallback"
    )


def test_ilsvrc_train_hook_per_image_budget(tmp_path):
    from PIL import Image as PILImage

    from mgtpu.data.ilsvrc import load_image, train_transform

    rng = np.random.default_rng(0)
    paths = []
    for j in range(8):
        arr = (rng.uniform(size=(384, 512, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"img{j}.jpg"
        PILImage.fromarray(arr).save(p, quality=90)
        paths.append(str(p))

    hook = train_transform()
    # warmup: native .so load + PIL decoder init
    hook(load_image(paths[0]), rng)

    # MIN per-image time: the mean is hostage to scheduler preemption
    # on this shared 1-core box (measured 12 ms idle vs 260 ms under a
    # 4-way contended core); the fastest image is the machine-capability
    # signal the regression guard needs
    best = float("inf")
    out = None
    for i in range(24):
        t0 = time.perf_counter()
        img = load_image(paths[i % len(paths)])
        out = hook(img, rng)
        best = min(best, time.perf_counter() - t0)
    assert out.shape == (224, 224, 3)
    # 11.9 ms/img measured uncontended (84 img/s, matching PARITY's
    # 80-120 img/s/core): 60 ms is ~5x headroom, still far below any
    # dead-fast-path or accidentally-quadratic regression
    assert best < 0.060, (
        f"train-hook ingest took {best * 1e3:.1f} ms/image at best "
        "(budget 60 ms) — the decode+augment fast path regressed"
    )
