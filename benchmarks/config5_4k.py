"""Config-5 benchmark at spec (BASELINE.json configs[4], VERDICT r2 #3):
a 4K RGB corpus over a REAL 2-process jax.distributed cluster, each host
driving the dp x tp ShardedEncoder (boundary-residue ppermute halo,
parallel/sharded.py) over its shard via CorpusRunner(mesh=...), per-host
manifests merged by the host-side mux.

Hardware note: the container has one tunneled TPU chip, so the cluster
runs on the CPU backend with a virtual 8-device mesh per host (the same
proxy the test suite and the scaling-proxy benchmark use; both worker
processes share this machine's cores, so MP/s here is a composition
check + lower bound, not a pod number). This is also the first >=4K
(3840x2160) content through the codec: geometry, schedule, sharded
encode, decode, all lossless-verified.

    python benchmarks/config5_4k.py [--n 8] [--per-host-devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W, H = 3840, 2160

_WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")

from frave_tpu.codec.options import EncoderOptions
from frave_tpu.parallel import make_mesh
from frave_tpu.parallel.multihost import CorpusRunner, init_distributed

coord, nproc, pid, corpus_dir, out_dir, ndev = sys.argv[1:7]
init_distributed(coord, int(nproc), int(pid))
# Host-LOCAL devices only: jax.devices() is the global list and its first
# ndev entries all belong to process 0, which would leave worker 1 with an
# entirely non-addressable mesh (every dispatch raises).
mesh = make_mesh(int(ndev), devices=jax.local_devices())
files = sorted(str(p) for p in __import__("pathlib").Path(corpus_dir).glob("*.png"))
runner = CorpusRunner(output_dir=out_dir, batch_size=2, mesh=mesh)
t0 = time.perf_counter()
manifest = runner.run(files, EncoderOptions(backend="jax"))
t1 = time.perf_counter()
done = [k for k, e in manifest["entries"].items() if e["status"] == "done"]
print(json.dumps({"pid": int(pid), "run_s": t1 - t0, "done": len(done),
                  "mesh": dict(mesh.shape)}))
"""


def make_4k_image(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    fx, fy = rng.uniform(20, 80, size=2)
    base = (
        127
        + 70 * np.sin(xx / fx + rng.uniform(0, 6.28))
        + 50 * np.cos(yy / fy)
        + rng.normal(0, 5, (H, W))
    )
    return np.stack(
        [np.clip(base + 10 * c, 0, 255) for c in range(3)], -1
    ).astype(np.uint8)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--per-host-devices", type=int, default=8)
    ap.add_argument("--verify", type=int, default=2,
                    help="how many outputs to decode losslessly")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="frave_c5_"))
    corpus, out = tmp / "corpus", tmp / "out"
    corpus.mkdir()
    from PIL import Image

    arrays = {}
    for i in range(args.n):
        arr = make_4k_image(i)
        name = f"uhd_{i}.png"
        Image.fromarray(arr).save(corpus / name)
        arrays[name] = arr
    print(f"corpus: {args.n} x {W}x{H} RGB at {tmp}", file=sys.stderr)

    worker = tmp / "worker.py"
    worker.write_text(_WORKER)
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.per_host_devices}"
    ).strip()
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid),
             str(corpus), str(out), str(args.per_host_devices)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=3000)
        if p.returncode != 0:
            print(stderr[-4000:], file=sys.stderr)
            return 1
        results.append(json.loads(stdout.strip().splitlines()[-1]))
    wall = time.perf_counter() - t0

    from frave_tpu.parallel.multihost import merged_manifest

    merged = merged_manifest(str(out))
    assert merged["num_done"] == args.n, merged
    assert merged["num_failed"] == 0

    # lossless spot-verify (full 4K decode each; CPU backend)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from frave_tpu.codec.decoder import FRIDecoder

    dec = FRIDecoder(backend="jax")
    for name in sorted(arrays)[: args.verify]:
        blob = (out / (Path(name).stem + ".frv")).read_bytes()
        np.testing.assert_array_equal(dec.decode(blob).data, arrays[name])

    mp = args.n * W * H / 1e6
    run_s = max(r["run_s"] for r in results)  # cluster-limited
    print(json.dumps({
        "metric": f"config5: {args.n} x {W}x{H} RGB corpus, REAL 2-process "
                  "jax.distributed cluster, dp x tp ShardedEncoder per host "
                  "(CPU-backend proxy)",
        "corpus_mp": round(mp, 1),
        "encode_mp_s": round(mp / run_s, 3),
        "cluster_run_s": round(run_s, 1),
        "wall_s_incl_compile": round(wall, 1),
        "hosts": results,
        "bpp": round(8 * merged["total_frif_bytes"]
                     / (args.n * W * H * 3), 3),
        "lossless_verified": args.verify,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
