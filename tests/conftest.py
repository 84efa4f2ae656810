"""Test config: force an 8-device virtual CPU platform so data-parallel
sharding paths are exercised without TPU hardware (the rebuild analog of
the reference's `-nDonkeys 0` synchronous debug mode, `data.lua:32-37`).

Note: this environment ships a sitecustomize that registers an 'axon'
TPU backend and pins jax_platforms to it, so we must both set XLA_FLAGS
before backend init and override jax_platforms explicitly."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# CPU tests (and every subprocess they spawn) must not depend on the
# remote-TPU relay being healthy: the box's sitecustomize calls the
# axon register() at EVERY interpreter start when PALLAS_AXON_POOL_IPS
# is set, which blocks for minutes if the relay tunnel is down.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
