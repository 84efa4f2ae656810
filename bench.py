"""Headline benchmark: R-MG-34 (ilsvrc/rnmg depth 34) fwd+bwd training
throughput, images/sec/chip, bf16 compute, on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
vs_baseline is against the driver target of 10,000 images/sec/chip
(BASELINE.json / BASELINE.md).
"""

import json
import sys
import time
import types

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from mgtpu.models import get_net
    from mgtpu.train.optim import sgd_init
    from mgtpu.train.step import make_train_step

    opt = types.SimpleNamespace(depth=34, compute_dtype=jnp.bfloat16)
    net = get_net("ilsvrc/rnmg")
    model = net.create_model(opt)
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = sgd_init(params)

    step = jax.jit(
        make_train_step(model, net.create_loss(opt), net, iter_size=1),
        donate_argnums=(0, 1, 2),
    )

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)
    y = (jax.random.uniform(jax.random.PRNGKey(2), (batch,)) * 1000).astype(jnp.int32)
    batch_d = {"x": x, "y": y}

    # warmup / compile. NOTE: sync by fetching the loss VALUE — on the
    # axon-relay platform block_until_ready under-waits, inflating
    # throughput ~5x; float() forces the full dependency chain.
    for i in range(3):
        params, stats, opt_state, m = step(
            params, stats, opt_state, batch_d, 0.1, 1e-4, jax.random.PRNGKey(i)
        )
    float(m["loss"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, stats, opt_state, m = step(
            params, stats, opt_state, batch_d, 0.1, 1e-4, jax.random.PRNGKey(i)
        )
    float(m["loss"])
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    n_chips = jax.device_count()
    ips_chip = ips / n_chips
    print(
        json.dumps(
            {
                "metric": "images/sec/chip R-MG-34 fwd+bwd (batch %d, bf16)" % batch,
                "value": round(ips_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_chip / 10000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
