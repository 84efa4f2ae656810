"""Headline benchmark: R-MG-34 (ilsvrc/rnmg depth 34) ImageNet-shape
inference throughput, images/sec/chip, bf16, on the attached TPU —
the driver target is >= 10,000 images/sec/chip on v5e (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is value / 10_000. Training (fwd+bwd+sgd) throughput is
reported on stderr as a secondary number.

Usage: python bench.py [batch] [--train]
"""

import json
import sys
import time
import types

import jax
import jax.numpy as jnp


def _sync(v):
    # fetch a VALUE: on the axon-relay platform block_until_ready
    # under-waits, inflating throughput ~5x; float() forces the chain
    return float(v)


def bench_infer(model, params, stats, batch):
    @jax.jit
    def fwd(p, s, x):
        y, _ = model.apply(p, s, x, train=False)
        return jnp.sum(y.astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)
    for _ in range(3):
        r = fwd(params, stats, x)
    _sync(r)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(params, stats, x)
    _sync(r)
    return batch * iters / (time.perf_counter() - t0)


def bench_train(model, net, opt, params, stats, batch):
    from mgtpu.train.optim import sgd_init
    from mgtpu.train.step import make_train_step

    step = jax.jit(
        make_train_step(model, net.create_loss(opt), net, iter_size=1),
        donate_argnums=(0, 1, 2),
    )
    opt_state = sgd_init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)
    y = (jax.random.uniform(jax.random.PRNGKey(2), (batch,)) * 1000).astype(jnp.int32)
    b = {"x": x, "y": y}
    for i in range(3):
        params, stats, opt_state, m = step(
            params, stats, opt_state, b, 0.1, 1e-4, jax.random.PRNGKey(i)
        )
    _sync(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, stats, opt_state, m = step(
            params, stats, opt_state, b, 0.1, 1e-4, jax.random.PRNGKey(i)
        )
    _sync(m["loss"])
    return batch * iters / (time.perf_counter() - t0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    with_train = "--train" in sys.argv

    from mgtpu.models import get_net

    opt = types.SimpleNamespace(depth=34, compute_dtype=jnp.bfloat16)
    net = get_net("ilsvrc/rnmg")
    model = net.create_model(opt)
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    # the jitted fns run unsharded on the default device, so this is a
    # single-chip measurement by construction — images/sec/chip needs
    # no device_count division (which would underreport on multi-chip
    # hosts)

    ips = bench_infer(model, params, stats, batch)
    if with_train:
        tips = bench_train(model, net, opt, params, stats, batch)
        print(f"train fwd+bwd+sgd: {tips:.1f} images/sec/chip (batch {batch})",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "images/sec/chip R-MG-34 224px inference (batch %d, bf16)" % batch,
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 10000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
