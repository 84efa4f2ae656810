"""Model zoo registry. Names mirror the reference's `-netType` values
(`opts.lua:46`, `model.lua:21-24`), e.g. "cifar/nmg", "ilsvrc/rnmg",
"mnist-cluttered/unmg"."""

from __future__ import annotations

import importlib

_REGISTRY = {
    "cifar/nmg": "mgtpu.models.cifar.nmg",
    "cifar/pnmg": "mgtpu.models.cifar.pnmg",
    "cifar/rnmg": "mgtpu.models.cifar.rnmg",
    "cifar/prnmg": "mgtpu.models.cifar.prnmg",
    "cifar/resnet": "mgtpu.models.cifar.resnet",
    "cifar/vgg": "mgtpu.models.cifar.vgg",
    "ilsvrc/rnmg": "mgtpu.models.ilsvrc.rnmg",
    "ilsvrc/prnmgseg": "mgtpu.models.ilsvrc.prnmgseg",
    "mnist-cluttered/unet": "mgtpu.models.mnist_cluttered.unet",
    "mnist-cluttered/unmg": "mgtpu.models.mnist_cluttered.unmg",
    "mnist-cluttered/pnmg.mnist": "mgtpu.models.mnist_cluttered.pnmg_mnist",
    "mnist-cluttered/prnmg.mnist": "mgtpu.models.mnist_cluttered.prnmg_mnist",
    "mnist-cluttered/mnist-test": "mgtpu.models.mnist_cluttered.mnist_test",
    "mnist-cluttered/mnist-saliency": "mgtpu.models.mnist_cluttered.mnist_saliency",
}


def list_models():
    return sorted(_REGISTRY)


def get_net(name: str):
    """Return the NetSpec instance for a netType name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown netType '{name}'; available: {list_models()}")
    mod = importlib.import_module(_REGISTRY[name])
    return mod.NET
