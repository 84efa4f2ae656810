"""Host input-pipeline throughput benchmark.

SURVEY §7 flags ILSVRC host-side loading as a hard part: feeding a
chip at ~11k images/sec (bench.py) needs the donkey pool + native
data plane to keep up. This tool measures images/sec of the full
per-sample path (decode -> augment -> batch assembly) for a dataset
across worker counts, independent of any device.

Usage:
  python tools/bench_data.py [-dataset ilsvrc] [-data synthetic|DIR]
      [-batchSize 128] [-iters 20] [-workers 1 2 4 8]

Prints one JSON line per worker count:
  {"dataset": ..., "workers": N, "images_per_sec": X, "native": bool}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-dataset", default="ilsvrc")
    ap.add_argument("-data", default="synthetic")
    ap.add_argument("-batchSize", type=int, default=128)
    ap.add_argument("-iters", type=int, default=20)
    ap.add_argument("-workers", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("-mode", default="thread", choices=["thread", "process"])
    ap.add_argument("-synthSize", type=int, default=4096)
    ap.add_argument("-imageSize", type=int, default=256)
    ap.add_argument("-imageCrop", type=int, default=224)
    args = ap.parse_args()

    from mgtpu import native
    from mgtpu.data import get_loaders
    from mgtpu.data.prefetch import DonkeyPool

    opt = types.SimpleNamespace(
        dataset=args.dataset, data=args.data, synthSize=args.synthSize,
        synthClasses=1000, imageSize=args.imageSize, imageCrop=args.imageCrop,
        colorspace="bgr", dataAug="default", manualSeed=1, tenCrop=False,
        nEpochs=10,
    )
    loaders = get_loaders(opt)

    for n_workers in args.workers:
        pool = DonkeyPool(n_workers, mode=args.mode, opt=opt, loaders=loaders)

        def specs():
            for it in range(args.iters):
                yield ("gen", "train", args.batchSize, 1, it, 1)

        # warmup one batch per worker (lazy imports, loader build)
        for _ in pool.imap_specs(("gen", "train", 4, 1, 999 + w, 1)
                                 for w in range(max(n_workers, 1))):
            pass
        t0 = time.perf_counter()
        n = 0
        for batch in pool.imap_specs(specs()):
            n += batch["x"].shape[0]
        dt = time.perf_counter() - t0
        pool.shutdown()
        print(json.dumps({
            "dataset": args.dataset,
            "workers": n_workers,
            "mode": args.mode,
            "images_per_sec": round(n / dt, 1),
            "native": native.available(),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
