"""Launch-recipe parity: every shipped script under scripts/ must parse
through the real two-stage option parser (global flags + the selected
model's contributed flags, `mgtpu/utils/opts.py`) and name a registered
model and dataset. The reference's scripts are the config-parity
surface (`/root/reference/scripts/`, SURVEY §2.7 L7); this pins ours
against flag drift as models/datasets evolve."""

import glob
import os
import re

import pytest

SCRIPTS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "scripts", "*", "*.sh"))
)


def recipe_argv(path):
    """Extract the `python -m mgtpu.main ...` argv from a recipe,
    resolving the ${DATA_PREFIX:-synthetic} idiom and dropping the
    trailing "$@" passthrough."""
    body = open(path).read()
    m = re.search(r"python -m mgtpu\.main(.*)", body, re.S)
    assert m, f"{path}: no mgtpu.main invocation"
    txt = m.group(1).replace("\\\n", " ")
    txt = re.sub(r"\$\{DATA_PREFIX:-([^}]*)\}", r"\1", txt)
    toks = [t for t in txt.split() if t != '"$@"']
    return toks


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.basename(p) for p in SCRIPTS])
def test_recipe_parses_and_resolves(path, tmp_path, monkeypatch):
    from mgtpu.data.registry import list_datasets
    from mgtpu.models import get_net
    from mgtpu.utils import opts

    argv = recipe_argv(path)
    assert argv, path
    # mnist-saliency.sh passes -trainedNet via "$@" in the reference
    # style; give the parser a placeholder so required-arg checks run
    if "mnist-saliency" in path:
        argv += ["-trainedNet", str(tmp_path / "model.ckpt")]
    opt = opts.parse(argv)
    get_net(opt.netType)  # registered model
    assert opt.dataset in list_datasets(), opt.dataset
    assert opt.train or opt.test or opt.eval
    # the run dir is derived from the flag string and must be creatable
    os.makedirs(os.path.join(str(tmp_path), *opt.save.split(os.sep)[-2:]))


def test_all_fourteen_recipes_present():
    names = {
        os.path.join(os.path.basename(os.path.dirname(p)), os.path.basename(p))
        for p in SCRIPTS
    }
    expected = {
        "cifar/nmg.sh", "cifar/pnmg.sh", "cifar/rnmg.sh", "cifar/prnmg.sh",
        "cifar/resnet.sh", "cifar/vgg.sh",
        "ilsvrc/rnmg.sh", "ilsvrc/prnmgseg.sh",
        "mnist-cluttered/unet.sh", "mnist-cluttered/unmg.sh",
        "mnist-cluttered/pnmg.mnist.sh", "mnist-cluttered/prnmg.mnist.sh",
        "mnist-cluttered/mnist-test.sh", "mnist-cluttered/mnist-saliency.sh",
    }
    assert len(expected) == 14 and expected <= names, expected - names
