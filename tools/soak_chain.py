#!/usr/bin/env python
"""Run a launch-script recipe as a CHAIN of resuming processes.

Why this exists: long single-process runs on the axon-relay dev box hit
a host-side memory leak in the relay's PJRT plugin — RSS grows by
approximately the bytes of every host->device transfer (~1 GB/epoch for
the mnist recipes; measured: fresh-batch steps leak ~2 MB/step with
`jax.live_arrays()` constant, same-device-array steps are flat, and the
round-2 CIFAR soaks peaked within ~10 GB of the box's 128 GB). Chaining
K-epoch processes through the framework's own `-retrain`/`-epochNumber`
resume bounds RSS at K epochs' worth AND exercises the failure-recovery
path (SURVEY §5) once per chunk — on production TPU hosts (real PJRT
plugin) the single process is fine and this driver is unnecessary.

  python tools/soak_chain.py scripts/mnist-cluttered/prnmg.mnist.sh \
      --cache runs/full_x --epochs 200 --chunk 25 [--deadline-ts T] \
      [-- extra recipe args...]

The recipe's own -nEpochsSave cadence is overridden to the chunk size
so every chunk ends on a checkpoint. Run dirs accumulate under the one
--cache root (one stamped dir per chunk); chain.log summarizes.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time


def find_latest_ckpt(cache_root: str):
    ckpts = glob.glob(os.path.join(cache_root, "**", "model_*.ckpt"),
                      recursive=True)
    best = None
    for c in ckpts:
        m = re.search(r"model_(\d+)\.ckpt$", c)
        if m:
            e = int(m.group(1))
            if best is None or e > best[0] or (e == best[0] and
                                               os.path.getmtime(c) > best[2]):
                best = (e, c, os.path.getmtime(c))
    return (best[0], best[1]) if best else (0, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe")
    ap.add_argument("--cache", required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--deadline-ts", type=float, default=None,
                    help="unix time after which no new chunk starts")
    ap.add_argument("rest", nargs="*", help="extra recipe args (after --)")
    args = ap.parse_args()

    os.makedirs(args.cache, exist_ok=True)
    log_path = os.path.join(args.cache, "chain.log")

    def log(msg):
        line = f"{time.strftime('%m/%d %H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    while True:
        done, ckpt = find_latest_ckpt(args.cache)
        if done >= args.epochs:
            log(f"chain complete: epoch {done}/{args.epochs}")
            return 0
        if args.deadline_ts and time.time() > args.deadline_ts:
            log(f"deadline reached at epoch {done}/{args.epochs}; stopping")
            return 0
        start = done + 1
        end = min(done + args.chunk, args.epochs)
        cmd = ["sh", args.recipe,
               "-cache", args.cache,
               "-nEpochs", str(args.epochs),
               "-epochNumber", str(start),
               "-stopAfter", str(end),
               "-nEpochsSave", str(args.chunk)]
        if ckpt:
            cmd += ["-retrain", ckpt]
        cmd += args.rest
        log(f"chunk: epochs {start}..{end} "
            f"(resume {os.path.basename(ckpt) if ckpt else 'fresh'})")
        # budget: generous per-chunk wall bound so one wedged chunk
        # cannot eat the chain; a killed chunk resumes from its last
        # checkpoint on the next iteration
        budget = int(os.environ.get("SOAK_CHUNK_BUDGET_S", 5400))
        t0 = time.time()
        with open(os.path.join(args.cache, f"chunk_{start:03d}.txt"), "w") as f:
            # own session so a timeout can kill the whole recipe tree
            # (sh + python), not just the direct sh child
            p = subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                                 start_new_session=True)
            try:
                rc = p.wait(timeout=budget)
            except subprocess.TimeoutExpired:
                import signal

                # the group can exit between the timeout and the kill —
                # a vanished group is success, not a chain-fatal error
                def killpg(sig):
                    try:
                        os.killpg(p.pid, sig)
                    except ProcessLookupError:
                        pass

                killpg(signal.SIGTERM)
                try:
                    p.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    killpg(signal.SIGKILL)
                    p.wait()
                rc = 124
        new_done, _ = find_latest_ckpt(args.cache)
        log(f"chunk rc={rc} wall={time.time() - t0:.0f}s "
            f"ckpt-epoch {done} -> {new_done}")
        if new_done <= done:
            log("no forward progress; aborting chain")
            return 1


if __name__ == "__main__":
    sys.exit(main())
