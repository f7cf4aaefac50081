"""Multi-host scaling proxy with repeats and a 1->2->4 curve
(VERDICT r2 #4: the round-2 80.4% number was measured once, 0.4% above
the >=80% target, from an ad-hoc script — this is the committed,
repeatable version).

No pod exists in this container, so "hosts" are OS processes pinned to
DISJOINT CPU core slices (os.sched_setaffinity via preexec_fn): a
k-host run gives each host cores_per_host cores, and strong-scaling
efficiency is t_1 / (k * t_k) on the fixed corpus, t_k = the slowest
host (the cluster-limited time, as on a real pod). Every host runs the
same CorpusRunner.run() path as the real 2-process jax.distributed
cluster (tests/test_multihost_real.py); compiles are warmed into the
shared persistent cache first so the measurement is steady-state codec
work + per-host IO/manifest overhead — exactly the scaling losses a pod
would see, minus ICI.

This machine has 4 cores, so the spec point (2-core hosts) runs 1->2
and the 1->2->4 curve runs 1-core hosts.

    python benchmarks/scaling_proxy.py [--reps 3] [--n 64] [--hw 256]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_WORKER = r"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
from frave_tpu.parallel.multihost import CorpusRunner

nproc, pid, corpus_dir, out_dir, warm_dir = sys.argv[1:6]
files = sorted(str(p) for p in __import__("pathlib").Path(corpus_dir).glob("*.png"))
if warm_dir != "-":
    # steady-state mode: warm this process's jit/program caches on a
    # small same-shape corpus BEFORE the timed run, modelling long-lived
    # per-host service processes (cold-start mode passes "-")
    wfiles = sorted(str(p) for p in __import__("pathlib").Path(warm_dir).glob("*.png"))
    CorpusRunner(output_dir=out_dir + "_warm", num_processes=1,
                 process_id=0, batch_size=8).run(wfiles)
r = CorpusRunner(output_dir=out_dir, num_processes=int(nproc),
                 process_id=int(pid), batch_size=8)
t0 = time.perf_counter()
m = r.run(files)
dt = time.perf_counter() - t0
bad = [k for k, e in m["entries"].items() if e["status"] != "done"]
assert not bad, bad
print(dt)
"""


def run_k_hosts(k: int, cores_per_host: int, worker: Path,
                corpus: Path, outbase: Path, tag: str,
                warm: Path = None, sequential: bool = False) -> float:
    """Launch k pinned hosts over the shared corpus; return the slowest
    host's run time (cluster-limited). sequential=True runs the hosts
    one after another on the same core slice — a contention-free proxy
    for hosts with PRIVATE machines (corpus encode has no inter-host
    communication; concurrent mode additionally charges this single
    machine's shared memory bandwidth to the cluster)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    avail = sorted(os.sched_getaffinity(0))

    def launch(pid):
        # slice the ACTUAL affinity mask (a cgroup/container mask may be
        # sparse or offset; absolute ids would raise inside preexec_fn)
        lo = (0 if sequential else pid) * cores_per_host
        cores = set(avail[lo : lo + cores_per_host])
        outd = outbase / f"{tag}_k{k}_h{pid}"
        return subprocess.Popen(
            [sys.executable, str(worker), str(k), str(pid),
             str(corpus), str(outd), str(warm) if warm else "-"],
            env=env, cwd="/root/repo", text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            preexec_fn=lambda c=cores: os.sched_setaffinity(0, c),
        )

    def collect(p):
        stdout, stderr = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise RuntimeError(stderr[-3000:])
        return float(stdout.strip().splitlines()[-1])

    if sequential:
        return max(collect(launch(pid)) for pid in range(k))
    procs = [launch(pid) for pid in range(k)]
    return max(collect(p) for p in procs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument(
        "--cold",
        action="store_true",
        help="cold-start mode: no per-process warm corpus before the "
        "timed run (the shared persistent compile cache stays warm, as "
        "it would be on a deployed host image) — measures fresh-process "
        "startup amortization",
    )
    args = ap.parse_args()

    ncores = len(os.sched_getaffinity(0))
    tmp = Path(tempfile.mkdtemp(prefix="frave_scal_"))
    corpus = tmp / "corpus"
    corpus.mkdir()
    from PIL import Image

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0: args.hw, 0: args.hw]
    for i in range(args.n):
        fx, fy = rng.uniform(8, 40, size=2)
        arr = np.clip(127 + 70 * np.sin(xx / fx + rng.uniform(0, 6.28))
                      + 50 * np.cos(yy / fy)
                      + rng.normal(0, 5, (args.hw, args.hw)),
                      0, 255).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(corpus / f"img_{i:03d}.png")

    worker = tmp / "worker.py"
    worker.write_text(_WORKER)
    # per-host in-process warmup corpus (same shape, batch-size-sized):
    # timed runs model long-lived host processes (steady state)
    warm_dir = tmp / "warmset"
    warm_dir.mkdir()
    for i in range(8):
        fx = float(rng.uniform(8, 40))
        arr = np.clip(127 + 70 * np.sin(xx / fx)
                      + rng.normal(0, 5, (args.hw, args.hw)),
                      0, 255).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(warm_dir / f"w_{i}.png")

    # warm the persistent compile cache (full-core, untimed)
    run_k_hosts(1, ncores, worker, corpus, tmp, "warm")

    out = {"corpus": f"{args.n} x {args.hw}x{args.hw} gray",
           "reps": args.reps, "machine_cores": ncores, "curves": {}}
    # concurrent plans share this one machine (k x cph cores of DRAM /
    # LLC bandwidth); the "-seq" plan runs hosts back-to-back on ONE
    # core slice — the contention-free proxy for private-machine hosts
    plans = (
        [("2core", 2, [1, 2], False), ("2core-seq", 2, [1, 2], True)]
        if ncores >= 4
        else []
    )
    plans.append(("1core", 1, [k for k in (1, 2, 4) if k <= ncores], False))
    out["mode"] = "cold" if args.cold else "steady-state"
    timed_warm = None if args.cold else warm_dir
    for tag, cph, ks, seq in plans:
        t = {k: [] for k in ks}
        for rep in range(args.reps):
            for k in ks:
                t[k].append(run_k_hosts(k, cph, worker, corpus, tmp,
                                        f"{tag}_r{rep}", warm=timed_warm,
                                        sequential=seq))
        curve = {}
        for k in ks:
            mean = statistics.mean(t[k])
            spread = (max(t[k]) - min(t[k])) / 2
            curve[str(k)] = {
                "t_s_mean": round(mean, 2),
                "t_s_spread": round(spread, 2),
                "speedup": round(statistics.mean(t[ks[0]]) / mean, 3),
                "efficiency_pct": round(
                    100 * statistics.mean(t[ks[0]]) / (k * mean), 1),
                # worst-case pairing across reps
                "efficiency_pct_worst": round(
                    100 * min(t[ks[0]]) / (k * max(t[k])), 1),
            }
        out["curves"][
            f"{cph}-core hosts" + (" (sequential/contention-free)" if seq else "")
        ] = curve
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
