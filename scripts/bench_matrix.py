#!/usr/bin/env python
"""Benchmark matrix beyond bench.py's headline row: SE/ksw2 modes, a
high-divergence read set (where gapped extension actually fires) with
the Pallas extension kernels on and off, and index-build time.
Writes BENCH_MATRIX.json at the repo root."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = "/tmp/benchdata"


def run_map_call(idx, cfg_kwargs, files, n_expect, passes=1):
    import numpy as np
    from mapcaller_tpu.config import Config
    from mapcaller_tpu.pipeline.engine import MappingEngine
    from mapcaller_tpu.pipeline.stream import run_stream_mapping
    from mapcaller_tpu.runner import make_engine, run_calling

    cfg = Config(vcf_file=f"{BENCH_DIR}/mx.vcf", log_file=f"{BENCH_DIR}/mx.log",
                 batch_size=8192, max_read_len=128, **cfg_kwargs)
    engine = make_engine(idx, cfg)
    cfg.read_files1 = [files[0]]
    cfg.read_files2 = [files[1]] if files[1] else []
    best = float("inf")
    for i in range(passes + 1):   # pass 0 = warm-up/compile
        engine = MappingEngine(idx, cfg, backend=engine.backend)
        t0 = time.time()
        run_stream_mapping(engine, cfg, t0)
        engine.finalize()
        if cfg.vcf_output:
            run_calling(engine, cfg, "bench-matrix")
        dt = time.time() - t0
        if i > 0:
            best = min(best, dt)
    n = engine.stats.total_reads
    assert n == n_expect, (n, n_expect)
    return n / best, best


def main():
    import numpy as np
    from mapcaller_tpu import enable_compilation_cache, tune_host_allocator
    tune_host_allocator()
    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench")
    bench.ensure_fixtures()
    from mapcaller_tpu.dna import decode
    from mapcaller_tpu.index.fmindex import build_index, load_index

    rows = {}
    idx = load_index(f"{BENCH_DIR}/mci")

    # index build time (E. coli scale)
    t0 = time.time()
    build_index(f"{BENCH_DIR}/ecoli.fa", f"{BENCH_DIR}/mci_rebuild")
    rows["index_build_s_4.6Mb"] = round(time.time() - t0, 2)

    # divergent read set: 3% error + indels (DP extension fires)
    div = f"{BENCH_DIR}/div.fq"
    N_DIV = 50_000
    if not os.path.exists(div):
        rng = np.random.default_rng(3)
        g = idx.ref.codes
        L = idx.genome_size
        with open(div, "w") as f:
            for k in range(N_DIV):
                p = int(rng.integers(0, L - 110))
                c = g[p:p + 100].copy()
                nmut = rng.binomial(100, 0.03)
                for _ in range(nmut):
                    j = int(rng.integers(0, 100))
                    c[j] = (c[j] + 1 + rng.integers(0, 3)) % 4
                if k % 10 == 0:   # 10% carry a small indel
                    d = int(rng.integers(2, 6))
                    c = np.concatenate([g[p:p + 50],
                                        g[p + 50 + d:p + 110]])[:100]
                f.write(f"@v{k}\n{decode(c)}\n+\n{'I' * 100}\n")

    r, t = run_map_call(idx, {}, (f"{BENCH_DIR}/sub_r1.fq",
                                  f"{BENCH_DIR}/sub_r2.fq"), 200_000)
    rows["pe_nw_map_call_reads_per_s"] = round(r, 1)
    r, t = run_map_call(idx, {"use_nw": False},
                        (f"{BENCH_DIR}/sub_r1.fq", None), 100_000)
    rows["se_ksw2_map_call_reads_per_s"] = round(r, 1)
    r, t = run_map_call(idx, {}, (div, None), N_DIV)
    rows["divergent3pct_scalar_ext_reads_per_s"] = round(r, 1)
    r, t = run_map_call(idx, {"device_extension": True}, (div, None), N_DIV)
    rows["divergent3pct_pallas_ext_reads_per_s"] = round(r, 1)
    r, t = run_map_call(idx, {"use_nw": False, "device_extension": True},
                        (div, None), N_DIV)
    rows["divergent3pct_pallas_ksw2_reads_per_s"] = round(r, 1)

    rows["baseline_reads_per_sec"] = 74000.0
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_MATRIX.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
