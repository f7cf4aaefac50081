"""Multi-host corpus runner: sharding, checkpoint/resume, gather.

Hosts are simulated with explicit (num_processes, process_id) — the
distributed test pattern from SURVEY.md section 4 (no real pod needed).
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from frave_tpu.parallel.multihost import CorpusRunner, merged_manifest


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr, mode="L").save(p)
        files.append(str(p))
    return files


def test_shard_partition(corpus, tmp_path):
    shards = [
        CorpusRunner(
            output_dir=str(tmp_path / "out"),
            num_processes=2,
            process_id=pid,
        ).my_shard(corpus)
        for pid in range(2)
    ]
    assert sorted(shards[0] + shards[1]) == sorted(corpus)
    assert not set(shards[0]) & set(shards[1])


def test_two_host_run_and_gather(corpus, tmp_path):
    outd = str(tmp_path / "out")
    for pid in range(2):
        CorpusRunner(
            output_dir=outd, num_processes=2, process_id=pid, batch_size=2
        ).run(corpus)
    merged = merged_manifest(outd)
    assert merged["num_done"] == 6
    assert merged["num_failed"] == 0
    # every image produced a decodable .frv
    from frave_tpu.codec.decoder import FRIDecoder

    for fp in corpus:
        out = Path(outd) / (Path(fp).stem + ".frv")
        assert out.exists()
        img = FRIDecoder(backend="numpy").decode(out.read_bytes())
        ref = np.asarray(Image.open(fp))[:, :, None]
        np.testing.assert_array_equal(img.data, ref)


def test_resume_skips_done(corpus, tmp_path):
    outd = str(tmp_path / "out")
    r = CorpusRunner(output_dir=outd, num_processes=1, process_id=0, batch_size=3)
    r.run(corpus)
    m1 = json.loads(r.manifest_path.read_text())
    ts1 = {k: v["ts"] for k, v in m1["entries"].items()}
    # resume: nothing should be re-encoded (timestamps unchanged)
    r2 = CorpusRunner(output_dir=outd, num_processes=1, process_id=0, batch_size=3)
    r2.run(corpus)
    m2 = json.loads(r2.manifest_path.read_text())
    ts2 = {k: v["ts"] for k, v in m2["entries"].items()}
    assert ts1 == ts2


def test_two_host_sharded_mesh_run(corpus, tmp_path):
    """BASELINE.json config 5 composition (VERDICT r2 #3): each simulated
    host drives the dp x tp ShardedEncoder (ppermute halo and all) over
    its shard; merged manifest covers the corpus; every container decodes
    bit-exactly."""
    from frave_tpu.codec.decoder import FRIDecoder
    from frave_tpu.parallel import make_mesh

    mesh = make_mesh(8)  # dp=2, tp=4 on the virtual CPU mesh
    outd = str(tmp_path / "out")
    for pid in range(2):
        r = CorpusRunner(
            output_dir=outd,
            num_processes=2,
            process_id=pid,
            batch_size=2,
            mesh=mesh,
        )
        r.run(corpus)
        assert r._sharded_cache  # the mesh path actually ran
    merged = merged_manifest(outd)
    assert merged["num_done"] == 6
    assert merged["num_failed"] == 0
    for fp in corpus:
        out = Path(outd) / (Path(fp).stem + ".frv")
        img = FRIDecoder(backend="numpy").decode(out.read_bytes())
        ref = np.asarray(Image.open(fp))[:, :, None]
        np.testing.assert_array_equal(img.data, ref)


def test_unreadable_file_marked_failed(corpus, tmp_path):
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not a png")
    outd = str(tmp_path / "out")
    r = CorpusRunner(output_dir=outd, num_processes=1, process_id=0)
    m = r.run(corpus + [str(bad)])
    assert m["entries"][str(bad)]["status"] == "failed"
    assert sum(1 for e in m["entries"].values() if e["status"] == "done") == 6


def test_two_host_sharded_grid_mode(corpus, tmp_path):
    """Grid-mode containers through the multihost dp x tp path
    (VERDICT r3 #9): per-host ShardedEncoder compiled for mode=grid
    (cache keyed on mode — ADVICE r3), lossless merged output."""
    from frave_tpu.codec.container import deserialize
    from frave_tpu.codec.decoder import FRIDecoder
    from frave_tpu.codec.options import EncoderOptions
    from frave_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    outd = str(tmp_path / "out")
    for pid in range(2):
        r = CorpusRunner(
            output_dir=outd,
            num_processes=2,
            process_id=pid,
            batch_size=2,
            mesh=mesh,
        )
        r.run(corpus, EncoderOptions(mode="grid"))
    merged = merged_manifest(outd)
    assert merged["num_done"] == 6
    assert merged["num_failed"] == 0
    for fp in corpus:
        blob = (Path(outd) / (Path(fp).stem + ".frv")).read_bytes()
        assert deserialize(blob).mode == "grid"
        img = FRIDecoder(backend="numpy").decode(blob)
        ref = np.asarray(Image.open(fp))[:, :, None]
        np.testing.assert_array_equal(img.data, ref)
