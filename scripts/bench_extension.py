#!/usr/bin/env python
"""Extension-kernel microbench (VERDICT r2 weak #3 / next #6).

Quantifies WHERE the Pallas gapped-extension path loses to the scalar
C++ aligners on this host, with kernel-only numbers vs a measured
vector roofline, by timing four legs on the SAME production DP pairs:

  1. production collection: run the divergent 3%-error set with
     device_extension=True and capture every (q, t) normal pair the
     pipeline actually sends to the kernel (patching
     ops.nw_device.nw_align_batch), plus per-call wall time;
  2. C++ scalar aligner (mc_nw / mc_ksw2 — the exact code the scalar
     path runs) over those pairs;
  3. device end-to-end: nw_align_batch() as production calls it
     (encode + H2D + DP kernel + traceback + D2H of packed ops);
  4. device kernel-only: inputs pre-staged in HBM, jitted DP+traceback,
     steady-state over repeats; two batch sizes to split per-dispatch
     fixed cost from marginal throughput.

Also measures an elementwise int32 vector roofline on the same chip so
the kernel's cells/s can be stated as a fraction of what the VPU
actually sustains here (the guide gives no absolute clock for this
part). Writes EXTENSION_BENCH.json at the repo root.

Reference contract being accelerated: ProcessNormalPair
(src/ReadAlignment.cpp:155-188) invoking nw_alignment
(src/nw_alignment.cpp:18) or ksw2_alignment (src/ksw2_alignment.cpp:250).
"""
import ctypes as C
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BENCH_DIR = "/tmp/benchdata"
MN = 192          # dp_max(160) + 32, the production kernel shape
PAIR_CAP = 40_000


def collect_production_pairs():
    """Leg 1: run the divergent set through the real pipeline with
    device_extension=True, capturing the DP pairs + per-call times."""
    import numpy as np
    from mapcaller_tpu.dna import decode
    from mapcaller_tpu.index.fmindex import load_index
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench")
    bench.ensure_fixtures()
    idx = load_index(f"{BENCH_DIR}/mci")
    div = f"{BENCH_DIR}/div.fq"
    if not os.path.exists(div):    # same generator/seed as bench_matrix.py
        rng = np.random.default_rng(3)
        g = idx.ref.codes
        L = idx.genome_size
        with open(div, "w") as f:
            for k in range(50_000):
                p = int(rng.integers(0, L - 110))
                c = g[p:p + 100].copy()
                nmut = rng.binomial(100, 0.03)
                for _ in range(nmut):
                    j = int(rng.integers(0, 100))
                    c[j] = (c[j] + 1 + rng.integers(0, 3)) % 4
                if k % 10 == 0:
                    d = int(rng.integers(2, 6))
                    c = np.concatenate([g[p:p + 50],
                                        g[p + 50 + d:p + 110]])[:100]
                f.write(f"@v{k}\n{decode(c)}\n+\n{'I' * 100}\n")

    from mapcaller_tpu.ops import nw_device
    pairs, call_times, call_sizes = [], [], []
    orig = nw_device.nw_align_batch

    def tap(batch, **kw):
        t0 = time.time()
        out = orig(batch, **kw)
        call_times.append(time.time() - t0)
        call_sizes.append(len(batch))
        pairs.extend(batch)
        return out

    nw_device.nw_align_batch = tap
    try:
        from mapcaller_tpu.config import Config
        from mapcaller_tpu.pipeline.stream import run_stream_mapping
        from mapcaller_tpu.runner import make_engine
        cfg = Config(vcf_file=f"{BENCH_DIR}/ext.vcf", vcf_output=False,
                     log_file=f"{BENCH_DIR}/ext.log", batch_size=8192,
                     max_read_len=128, device_extension=True)
        engine = make_engine(idx, cfg)
        cfg.read_files1, cfg.read_files2 = [div], []
        t0 = time.time()
        run_stream_mapping(engine, cfg, t0)
        engine.finalize()
        total_s = time.time() - t0
    finally:
        nw_device.nw_align_batch = orig
    return pairs, call_times, call_sizes, total_s


def bench_cxx_scalar(pairs, fn_name="mc_nw"):
    """Leg 2: the exact scalar C++ aligner the production scalar path
    uses (native/mc_native.cpp nw_align/ksw2_align via mc_nw/mc_ksw2)."""
    from mapcaller_tpu.native import load_lib
    lib = load_lib()
    fn = getattr(lib, fn_name)
    fn.argtypes = [C.c_char_p, C.c_char_p, C.c_char_p, C.c_char_p]
    o1 = C.create_string_buffer(4096)
    o2 = C.create_string_buffer(4096)
    enc = [(a.encode(), b.encode()) for a, b in pairs]
    t0 = time.time()
    for a, b in enc:
        fn(a, b, o1, o2)
    return time.time() - t0


def bench_device_e2e(pairs, chunk):
    """Leg 3: nw_align_batch exactly as native.py calls it."""
    from mapcaller_tpu.ops.nw_device import nw_align_batch
    nw_align_batch(pairs[:chunk], M=MN, N=MN, return_ops=True)  # compile
    t0 = time.time()
    for lo in range(0, len(pairs), chunk):
        nw_align_batch(pairs[lo:lo + chunk], M=MN, N=MN, return_ops=True)
    return time.time() - t0


def stage_arrays(pairs, B, M=MN, N=MN):
    import numpy as np
    from mapcaller_tpu.dna import NT4_TABLE
    c1 = np.full((B, M), 4, dtype=np.uint8)
    c2 = np.full((B, N), 4, dtype=np.uint8)
    m = np.zeros(B, dtype=np.int32)
    n = np.zeros(B, dtype=np.int32)
    for k in range(B):
        s1, s2 = pairs[k % len(pairs)]
        c1[k, :len(s1)] = NT4_TABLE[np.frombuffer(s1.encode(), np.uint8)]
        c2[k, :len(s2)] = NT4_TABLE[np.frombuffer(s2.encode(), np.uint8)]
        m[k], n[k] = len(s1), len(s2)
    return c1, c2, m, n


def bench_kernel_only(pairs, B, reps=8, M=MN, N=MN):
    """Leg 4: DP + on-device traceback, inputs already in HBM."""
    import jax
    import jax.numpy as jnp
    from mapcaller_tpu.ops.nw_device import (build_nw_kernel,
                                             build_nw_traceback)
    c1, c2, m, n = stage_arrays(pairs, B, M, N)
    kern = build_nw_kernel(M, N, 64,
                           interpret=jax.default_backend() != "tpu")
    tb = build_nw_traceback(M, N)

    @jax.jit
    def full(c1, c2, m, n):
        dirs, score = kern(c1, c2, m, n)
        return tb(dirs, m, n), score

    d = [jax.device_put(jnp.asarray(x)) for x in (c1, c2, m, n)]
    w, s = full(*d)
    w.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        w, s = full(*d)
    w.block_until_ready()
    dt = (time.time() - t0) / reps
    # split DP kernel vs traceback
    dirs, score = kern(*d)
    dirs.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        dirs, score = kern(*d)
    dirs.block_until_ready()
    dp_dt = (time.time() - t0) / reps
    return dt, dp_dt


def vector_roofline():
    """Measured elementwise int32 sustained rate on this chip: a chain
    of max/add ops long enough to be compute-bound, on a VMEM-friendly
    tile loop XLA fuses into one kernel."""
    import jax
    import jax.numpy as jnp
    K = 64

    @jax.jit
    def f(x):
        for _ in range(K):
            x = jnp.maximum(x + 1, x // 2)   # 3 int32 vector ops
        return x

    x = jnp.zeros((2048, 4096), jnp.int32)
    f(x).block_until_ready()
    t0 = time.time()
    r = 20
    for _ in range(r):
        x = f(x)
    x.block_until_ready()
    dt = (time.time() - t0) / r
    return (x.size * 3 * K) / dt     # int32 ops/s sustained


def main():
    import numpy as np
    out = {}
    pairs, call_times, call_sizes, total_s = collect_production_pairs()
    pairs = pairs[:PAIR_CAP]
    ms = np.array([len(a) for a, _ in pairs])
    ns = np.array([len(b) for _, b in pairs])
    useful = float((ms.astype(np.int64) * ns).sum())
    out["n_pairs_collected"] = len(pairs)
    out["n_kernel_calls"] = len(call_sizes)
    out["mean_pairs_per_call"] = round(float(np.mean(call_sizes)), 1)
    out["pair_len_q"] = {q: int(np.percentile(ms, q))
                         for q in (50, 90, 99, 100)}
    out["device_call_s_per_batch_mean"] = round(
        float(np.mean(call_times)), 4)
    out["useful_cells_per_pair"] = round(useful / len(pairs), 1)
    out["padded_cells_per_pair"] = (MN + 1) * (MN + 1)
    out["padding_waste_x"] = round((MN + 1) ** 2 * len(pairs) / useful, 1)

    cxx_s = bench_cxx_scalar(pairs)
    out["cxx_scalar_pairs_per_s"] = round(len(pairs) / cxx_s, 1)
    cxx2 = bench_cxx_scalar(pairs, "mc_ksw2")
    out["cxx_ksw2_pairs_per_s"] = round(len(pairs) / cxx2, 1)

    chunk = max(64, int(np.mean(call_sizes)) if call_sizes else 1024)
    chunk = ((chunk + 63) // 64) * 64
    e2e_s = bench_device_e2e(pairs, chunk)
    out["device_e2e_chunk"] = chunk
    out["device_e2e_pairs_per_s"] = round(len(pairs) / e2e_s, 1)
    # production now tiers the kernel shape to the batch's max pair len
    maxlen = int(max(ms.max(), ns.max()))
    tier = next((t for t in (32, 48, 96) if t >= maxlen), MN)
    if tier != MN:
        from mapcaller_tpu.ops.nw_device import nw_align_batch

        def e2e_tier(ps, ck):
            nw_align_batch(ps[:ck], M=tier, N=tier, return_ops=True)
            t0 = time.time()
            for lo in range(0, len(ps), ck):
                nw_align_batch(ps[lo:lo + ck], M=tier, N=tier,
                               return_ops=True)
            return time.time() - t0

        out["device_e2e_tiered_pairs_per_s"] = round(
            len(pairs) / e2e_tier(pairs, chunk), 1)
        out["tier_selected"] = tier

    for B in (256, 2048, 8192):
        dt, dp_dt = bench_kernel_only(pairs, B)
        out[f"kernel_only_B{B}_s"] = round(dt, 4)
        out[f"kernel_only_B{B}_pairs_per_s"] = round(B / dt, 1)
        out[f"kernel_dponly_B{B}_s"] = round(dp_dt, 4)
    for B in (2048, 8192):
        dt, dp_dt = bench_kernel_only(pairs, B, M=tier, N=tier)
        out[f"kernel_only_tier{tier}_B{B}_pairs_per_s"] = round(B / dt, 1)
        out[f"kernel_dponly_tier{tier}_B{B}_s"] = round(dp_dt, 4)
    # dispatch fixed cost vs marginal rate from the two extreme sizes
    a, b = out["kernel_only_B256_s"], out["kernel_only_B8192_s"]
    marg = (b - a) / (8192 - 256)
    out["kernel_marginal_s_per_pair"] = round(marg, 8)
    out["kernel_fixed_dispatch_s"] = round(a - 256 * marg, 4)
    out["kernel_marginal_pairs_per_s"] = round(1.0 / marg, 1)

    cells_per_s = 8192 * (MN + 1) ** 2 / out["kernel_dponly_B8192_s"]
    out["kernel_padded_cells_per_s"] = round(cells_per_s, 1)
    roof = vector_roofline()
    out["measured_vpu_int32_ops_per_s"] = round(roof, 1)
    # the row sweep costs ~(10 + 2*log2(N+1)) int32 vector ops per cell
    ops_per_cell = 10 + 2 * int(np.ceil(np.log2(MN + 1)))
    out["est_ops_per_cell"] = ops_per_cell
    out["kernel_pct_of_vector_roofline"] = round(
        100.0 * cells_per_s * ops_per_cell / roof, 1)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXTENSION_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
