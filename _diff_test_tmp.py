import numpy as np, jax, jax.numpy as jnp
import importlib.util
spec = importlib.util.spec_from_file_location("tpr", "/root/repo/tests/test_pallas_rans.py")
tpr = importlib.util.module_from_spec(spec); spec.loader.exec_module(tpr)
from frave_tpu.entropy.tables import CONTEXT_AMOUNT
from frave_tpu.ops.pallas_rans import decode_scan_wave, prepare_scan_tables, stream_pad_len
from frave_tpu.ops.rans_jax import decode_step_comparefree, prepare_compare_tables

for (C, NL, R) in [(1, 128, 5), (3, 256, 7), (3, 2048, 4)]:
    rng = np.random.default_rng(C * 100 + NL)
    cdfs_np, bits_np = tpr._random_tables(rng, C)
    cdfs = jnp.asarray(cdfs_np); bits = jnp.asarray(bits_np)
    x0 = jnp.asarray(rng.integers(1 << 16, 1 << 32, size=(C, NL), dtype=np.uint64).astype(np.uint32))
    buckets = jnp.asarray(rng.integers(0, CONTEXT_AMOUNT, size=(R, C, NL), dtype=np.int64).astype(np.int32))
    active = jnp.asarray(rng.random((R, NL)) < 0.8)
    Wr = R * C * NL
    W = stream_pad_len(C * NL, Wr)
    words = rng.integers(0, 1 << 16, size=Wr, dtype=np.int64)
    st16 = jnp.asarray(np.concatenate([words.astype(np.uint16), np.zeros(W - Wr, np.uint16)]))
    st32 = jnp.asarray(np.concatenate([words.astype(np.int32), np.zeros(W - Wr, np.int32)]))

    tabs_x = prepare_compare_tables(cdfs, bits)
    x = x0; gptr = jnp.int32(0); ref_syms = []
    iota_ca = jnp.arange(CONTEXT_AMOUNT, dtype=jnp.int32)
    for r in range(R):
        oh = jnp.asarray(buckets[r][..., None] == iota_ca, dtype=jnp.bfloat16)
        sym, x, gptr = decode_step_comparefree(x, gptr, oh, active[r], st16, tabs_x)
        ref_syms.append(sym)
    ref_syms = np.asarray(jnp.stack(ref_syms))

    tabs_p = prepare_scan_tables(cdfs, bits)
    syms, x_k, gp_k = decode_scan_wave(x0, jnp.int32(0), buckets, active, st32, tabs_p)
    act3 = np.broadcast_to(np.asarray(active)[:, None, :], (R, C, NL))
    ok_x = np.array_equal(np.asarray(x_k), np.asarray(x))
    ok_g = int(gp_k) == int(gptr)
    ok_s = np.array_equal(np.asarray(syms)[act3], ref_syms[act3])
    print((C, NL, R), "x", ok_x, "gptr", ok_g, int(gp_k), int(gptr), "syms", ok_s)
print("DONE")
