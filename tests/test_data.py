import types

import numpy as np
import pytest

from mgtpu.data import get_loaders, list_datasets
from mgtpu.data import transforms as tf
from mgtpu.data.cluttered import (
    ClutterConfig,
    ClutterGenerator,
    sample_position,
    synthetic_digits,
)
from mgtpu.data.prefetch import DonkeyPool


def _opt(**kw):
    base = dict(data="synthetic", synthSize=64, imageSize=36, imageCrop=32,
                colorspace="bgr", dataAug="default")
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_transforms_shapes():
    rng = np.random.default_rng(0)
    img = rng.random((40, 44, 3)).astype(np.float32)
    assert tf.scale(36)(img, rng).shape[0] == 36  # shorter side
    assert tf.center_crop(32)(img, rng).shape == (32, 32, 3)
    assert tf.random_crop(32)(img, rng).shape == (32, 32, 3)
    assert tf.random_crop(32, 4)(np.zeros((32, 32, 3), np.float32), rng).shape == (32, 32, 3)
    assert tf.ten_crop(32)(img, rng).shape == (10, 32, 32, 3)
    out = tf.random_sized_crop(24)(img, rng)
    assert out.shape == (24, 24, 3)
    assert tf.rotation(30)(img, rng).shape == img.shape
    assert tf.affine(30)(img, rng).shape == img.shape


def test_color_normalize_and_bgr():
    rng = np.random.default_rng(0)
    img = np.ones((4, 4, 3), np.float32) * [10, 20, 30]
    out = tf.color_normalize([10, 20, 30], [1, 2, 3])(img, rng)
    np.testing.assert_allclose(out, 0)
    sw = tf.bgr(img)
    np.testing.assert_allclose(sw[0, 0], [30, 20, 10])


def test_occlusion_expands():
    rng = np.random.default_rng(0)
    mask = np.zeros((5, 8, 8, 1), np.float32)
    mask[:, :2, :2] = 1
    img = np.ones((8, 8, 1), np.float32)
    out = tf.occlusion(mask)(img, rng)
    assert out.shape == (6, 8, 8, 1)
    np.testing.assert_allclose(out[0], img)  # first is the original
    assert not np.allclose(out[1][:2, :2], img[:2, :2])


def test_cifar_whitened_synthetic_loaders():
    loaders = get_loaders(_opt(dataset="cifar100-whitened"))
    tr, te = loaders["train"], loaders["test"]
    x, y = tr.gen_inputs(8, epoch=1, seed=42)
    assert x.shape == (8, 32, 32, 3) and y.shape == (8,)
    assert y.min() >= 0 and y.max() < 100
    x2, y2 = tr.gen_inputs(8, epoch=1, seed=42)
    np.testing.assert_allclose(x, x2)  # deterministic per seed
    xt, yt = te.get_inputs(1, 4, epoch=1)
    assert xt.shape == (4, 32, 32, 3)


def test_class_balanced_sampling():
    loaders = get_loaders(_opt(dataset="cifar100-whitened", synthSize=500))
    xs, ys = loaders["train"].sample(600, np.random.default_rng(0))
    counts = np.bincount(ys, minlength=100)
    assert counts.max() <= 20  # roughly uniform over classes


def test_cifar100_plus_aug():
    loaders = get_loaders(_opt(dataset="cifar100+"))
    x, y = loaders["train"].gen_inputs(4, 1, seed=0)
    assert x.shape == (4, 32, 32, 3)


def test_mnist_seg_synthetic():
    loaders = get_loaders(_opt(dataset="mnist-seg", synthSize=16))
    x, y = loaders["train"].gen_inputs(4, 1, seed=0)
    assert x.shape == (4, 64, 64, 1)
    assert y.shape == (4, 64, 64, 10)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_mnist_three_splits(tmp_path):
    """mnist tasks expose train/eval/test as THREE distinct splits
    (`dataset/mnist-seg/dataset.lua:38-39`): synthetic path synthesizes
    all three; npz path loads valid_* when present and omits eval when
    the generator merged valid into train."""
    loaders = get_loaders(_opt(dataset="mnist-seg", synthSize=16))
    assert set(loaders) == {"train", "eval", "test"}
    xe, _ = loaders["eval"].get_inputs(1, 4, 1)
    xt, _ = loaders["test"].get_inputs(1, 4, 1)
    assert not np.allclose(xe, xt), "eval and test splits must differ"

    # npz with valid_* keys -> eval loader; without -> no eval loader
    rng = np.random.default_rng(0)
    blob = {
        f"{s}_{k}": rng.random((6, 64, 64, c), dtype=np.float32)
        for s in ("train", "valid", "test")
        for k, c in (("inputs", 1), ("targets", 10))
    }
    np.savez(tmp_path / "mnist_segmentation.npz", **blob)
    loaders = get_loaders(_opt(dataset="mnist-seg", data=str(tmp_path)))
    assert set(loaders) == {"train", "eval", "test"}
    assert loaders["eval"].size() == 6

    merged = {k: v for k, v in blob.items() if not k.startswith("valid")}
    np.savez(tmp_path / "mnist_spatial_transform.npz", **merged)
    loaders = get_loaders(_opt(dataset="mnist-spt", data=str(tmp_path)))
    assert set(loaders) == {"train", "test"}


def test_mnist_spt_synthetic():
    loaders = get_loaders(_opt(dataset="mnist-spt", synthSize=16))
    x, y = loaders["train"].gen_inputs(4, 1, seed=0)
    assert x.shape == (4, 64, 64, 1)
    assert y.shape == (4, 64, 64, 1)


def test_mnist_saliency_loader():
    loaders = get_loaders(_opt(dataset="mnist-saliency", synthSize=4))
    te = loaders["test"]
    assert te.mask.shape == (841, 64, 64, 1)  # 29*29 8x8 windows stride 2
    x, y = te.get_inputs(1, 1, epoch=1)
    assert x.shape == (1, 842, 64, 64, 1)  # original + 841 occlusions


def test_clutter_generator_segmentation():
    digits, labels = synthetic_digits(50)
    cfg = ClutterConfig(megapatch_w=64, n_digits=5, scale=(0.5, 1.25),
                        angle=60, threshold=0.3, task="segmentation", seed=1)
    gen = ClutterGenerator(digits, labels, cfg)
    obs, target = gen.next_example()
    assert obs.shape == (64, 64, 1)
    assert target.shape == (64, 64, 10)
    assert obs.max() <= 1.0 and obs.min() >= 0.0


def test_overlap_constraint_sampler():
    rng = np.random.default_rng(0)
    obs = np.ones((32, 32), np.float32)  # fully occupied -> always >30%
    sprite = np.ones((10, 10), np.float32)
    y, x = sample_position("overlap_constraint", obs, sprite, 0, rng)
    assert y is None and x is None
    obs = np.zeros((32, 32), np.float32)
    y, x = sample_position("overlap_constraint", obs, sprite, 0, rng)
    assert y is not None


def test_donkey_pool_order_and_sync_mode():
    for n in (0, 3):
        pool = DonkeyPool(n)
        jobs = [lambda i=i: i * i for i in range(20)]
        assert list(pool.imap(jobs)) == [i * i for i in range(20)]
        pool.shutdown()


def test_ilsvrc_synthetic():
    loaders = get_loaders(_opt(dataset="ilsvrc", synthSize=8, synthClasses=10))
    x, y = loaders["train"].gen_inputs(2, 1, seed=0)
    assert x.shape == (2, 224, 224, 3)
    xt, yt = loaders["test"].get_inputs(1, 2, epoch=1)
    assert xt.shape == (2, 224, 224, 3)


def test_ilsvrc_tencrop():
    loaders = get_loaders(_opt(dataset="ilsvrc", synthSize=8, synthClasses=10, tenCrop=True))
    xt, yt = loaders["test"].get_inputs(1, 1, epoch=1)
    assert xt.shape == (1, 10, 224, 224, 3)


def test_ilsvrc_folder_tree(tmp_path):
    """Real directory-per-class tree: discovery order, balanced
    sampling, sequential get, and the corrupt-JPEG fallback
    (`dataset/ilsvrc/donkey.lua:37-57` semantics)."""
    from PIL import Image as PILImage

    from mgtpu.data.ilsvrc import FolderDataset, load_image

    rng = np.random.default_rng(0)
    for ci, cname in enumerate(["n01", "n02", "n03"]):
        d = tmp_path / "train" / cname
        d.mkdir(parents=True)
        for j in range(3):
            arr = (rng.uniform(size=(40, 48, 3)) * 255).astype(np.uint8)
            arr[..., 0] = ci * 80  # class-coded red channel
            PILImage.fromarray(arr).save(d / f"img{j}.jpg")
    # a JPEG with trailing garbage (decodable via the fallback path)
    bad = tmp_path / "train" / "n01" / "img3.jpg"
    data = (tmp_path / "train" / "n01" / "img0.jpg").read_bytes()
    bad.write_bytes(data + b"\x00garbage")

    ds = FolderDataset(str(tmp_path / "train"), hook=lambda im, rng: im[:32, :32])
    assert ds.size() == 10
    assert ds.classes == ["n01", "n02", "n03"]
    x, y = ds.gen_inputs(16, epoch=1, seed=4)
    assert x.shape == (16, 32, 32, 3)
    assert set(np.unique(y)) <= {0, 1, 2}
    # balanced sampling hits every class in a 16-draw batch w.h.p.
    assert len(np.unique(y)) == 3
    x2, y2 = ds.get_inputs(1, 4, epoch=1)
    assert x2.shape == (4, 32, 32, 3) and y2.tolist() == [0, 0, 0, 0]
    img = load_image(str(bad))
    assert img.shape == (40, 48, 3) and img.max() <= 1.0


def test_donkey_pool_process_mode_determinism():
    """Process donkeys rebuild loaders per worker (the reference's
    per-donkey-state model) and must produce byte-identical batches to
    the synchronous pool for the same job specs."""
    import types

    from mgtpu.data import get_loaders
    from mgtpu.data.prefetch import DonkeyPool

    opt = types.SimpleNamespace(
        dataset="cifar100-whitened", data="synthetic", synthSize=64,
        imageSize=36, imageCrop=32, colorspace="bgr", dataAug="default",
        manualSeed=1, tenCrop=False, nEpochs=10,
    )
    loaders = get_loaders(opt)
    specs = [("gen", "train", 4, 1, 100 + i, 1) for i in range(3)]
    specs.append(("get", "test", 1, 3, 1))
    sync = DonkeyPool(0, loaders=loaders)
    ref = list(sync.imap_specs(specs))
    pool = DonkeyPool(2, mode="process", opt=opt, loaders=loaders)
    try:
        got = list(pool.imap_specs(specs))
    finally:
        pool.shutdown()
    for a, b in zip(ref, got):
        if isinstance(a, dict):
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["y"], b["y"])
        else:
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])


def test_colorspace_dataaug_matrix():
    """Every -colorspace x -dataAug combination produces correctly
    shaped batches (gray -> 1 channel; `donkey.lua:96-115`, `:27-45`;
    both 'rotate' and the reference's documented-but-broken 'rotation'
    spelling are accepted, SURVEY §2.8)."""
    import types

    from mgtpu.data import get_loaders

    for cs in ("gray", "rgb", "bgr"):
        for aug in ("default", "affine", "rotate", "rotation"):
            opt = types.SimpleNamespace(
                dataset="cifar100-whitened", data="synthetic", synthSize=16,
                imageSize=36, imageCrop=32, colorspace=cs, dataAug=aug,
                manualSeed=1, tenCrop=False, nEpochs=10,
            )
            x, y = get_loaders(opt)["train"].gen_inputs(4, 1, seed=3)
            c = 1 if cs == "gray" else 3
            assert x.shape == (4, 32, 32, c), (cs, aug, x.shape)


def test_cifar_whitened_testhook_zero_pads():
    """-imageCrop > -imageSize zero-pads the centered crop bottom/right
    (`dataset/cifar100-whitened/donkey.lua:167-177`)."""
    loaders = get_loaders(_opt(dataset="cifar100-whitened", imageSize=36,
                               imageCrop=40, synthSize=100))
    x, y = loaders["test"].get_inputs(1, 2, 1)
    assert x.shape == (2, 40, 40, 3)
    # image content lands top-left; the last 4 rows/cols are zero pad
    assert np.all(x[:, 36:, :, :] == 0) and np.all(x[:, :, 36:, :] == 0)
    assert np.any(x[:, :36, :36, :] != 0)

    # equal sizes keep the plain center-crop path
    sm = tf.center_crop_pad(3)(np.arange(25, dtype=np.float32).reshape(5, 5, 1),
                               np.random.default_rng(0))
    assert sm.shape == (3, 3, 1) and sm[0, 0, 0] == 6.0


def test_ilsvrc_single_tree_split(tmp_path):
    """-split N splits ONE directory-per-class tree per class:
    train = floor(count*N/100+.5) of a seeded permutation, test = rest
    (`dataset/ilsvrc/dataset.lua:217-263`)."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(1)
    for cname, count in (("n01", 10), ("n02", 5), ("n03", 1)):
        d = tmp_path / cname
        d.mkdir(parents=True)
        for j in range(count):
            arr = (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
            PILImage.fromarray(arr).save(d / f"img{j}.jpg")

    loaders = get_loaders(_opt(dataset="ilsvrc", data=str(tmp_path),
                               split=80, manualSeed=2))
    tr, te = loaders["train"], loaders["test"]
    # per-class: 10 -> 8/2, 5 -> 4/1, 1 -> 1/0 (all-train class allowed)
    assert tr.size() == 13 and te.size() == 3
    assert [len(m) for m in tr.class_list] == [8, 4, 1]
    assert [len(m) for m in te.class_list] == [2, 1, 0]
    # disjoint and exhaustive
    assert set(tr.paths).isdisjoint(te.paths)
    assert len(set(tr.paths) | set(te.paths)) == 16
    # deterministic per seed
    again = get_loaders(_opt(dataset="ilsvrc", data=str(tmp_path),
                             split=80, manualSeed=2))["train"]
    assert again.paths == tr.paths
    # loaders still function (sampling tolerates the empty test class)
    x, y = tr.gen_inputs(4, 1, seed=0)
    assert x.shape == (4, 224, 224, 3)
    xt, yt = te.get_inputs(1, te.size(), 1)
    assert xt.shape == (3, 224, 224, 3)


def test_get_rejects_zero_index_all_loaders(tmp_path):
    """Every loader class shares the 1-based get() guard (`INTRO.md:
    22-27`): i1=0 must raise, not silently wrap to the last sample."""
    from PIL import Image as PILImage

    from mgtpu.data.base import ClassBalancedDataset, PairedDataset
    from mgtpu.data.ilsvrc import FolderDataset, SynthIlsvrc, test_transform

    imgs = np.zeros((6, 8, 8, 3), np.float32)
    labs = np.arange(6) % 2
    d = tmp_path / "n01"
    d.mkdir(parents=True)
    PILImage.fromarray(np.zeros((40, 40, 3), np.uint8)).save(d / "a.jpg")
    loaders = [
        ClassBalancedDataset(imgs, labs, 2),
        PairedDataset(imgs, imgs),
        FolderDataset(str(tmp_path), test_transform()),
        SynthIlsvrc(4, test_transform()),
    ]
    for loader in loaders:
        with pytest.raises(ValueError, match="1-based"):
            loader.get(0, 1)
        x, _ = loader.get(1, 1)  # the valid lower bound still works
        assert x.shape[0] == 1


def test_cifar_eval_split_three_disjoint_sets():
    """-evalSplit N carves N samples/class from train into an eval
    split: three pairwise-disjoint index sets, train shrinks, sizes
    exact (VERDICT r2 #4; ref hook `pipelines/standard/eval.lua`)."""
    loaders = get_loaders(_opt(dataset="cifar100-whitened", synthSize=600,
                               evalSplit=2, manualSeed=2))
    tr, ev, te = loaders["train"], loaders["eval"], loaders["test"]
    assert ev.size() == 2 * 100
    assert tr.size() == 600 - 200
    fp = lambda ds: {ds.images[i].tobytes() for i in range(ds.size())}
    ftr, fev, fte = fp(tr), fp(ev), fp(te)
    assert ftr.isdisjoint(fev)
    assert ftr.isdisjoint(fte) and fev.isdisjoint(fte)
    # train + eval reassemble the original train set exactly
    full = get_loaders(_opt(dataset="cifar100-whitened", synthSize=600))["train"]
    assert ftr | fev == fp(full)
    # per-class balance of the carve
    assert all((ev.labels == c).sum() == 2 for c in range(100))
    # deterministic per seed
    again = get_loaders(_opt(dataset="cifar100-whitened", synthSize=600,
                             evalSplit=2, manualSeed=2))["eval"]
    assert fp(again) == fev
    # carving more than a class holds must refuse
    with pytest.raises(ValueError, match="evalSplit"):
        get_loaders(_opt(dataset="cifar100-whitened", synthSize=100,
                         evalSplit=1, manualSeed=2))


def test_ilsvrc_eval_split_three_way(tmp_path):
    """ilsvrc three-way -split + -evalSplit: test carved first, then
    eval carved per-class from the train share."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(1)
    for cname, count in (("n01", 10), ("n02", 8)):
        d = tmp_path / cname
        d.mkdir(parents=True)
        for j in range(count):
            arr = (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
            PILImage.fromarray(arr).save(d / f"img{j}.jpg")

    loaders = get_loaders(_opt(dataset="ilsvrc", data=str(tmp_path),
                               split=80, evalSplit=2, manualSeed=2))
    tr, ev, te = loaders["train"], loaders["eval"], loaders["test"]
    # per-class: 10 -> 8 train / 2 test, 8 -> 6/2; then eval takes 2 of
    # each train share
    assert te.size() == 4 and ev.size() == 4 and tr.size() == 10
    ptr, pev, pte = set(tr.paths), set(ev.paths), set(te.paths)
    assert ptr.isdisjoint(pev) and ptr.isdisjoint(pte) and pev.isdisjoint(pte)
    assert len(ptr | pev | pte) == 18
