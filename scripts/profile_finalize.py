#!/usr/bin/env python
"""Decompose the genome-proportional finalize+call leg at chromosome
scale: per-stage wall times (device-synced) for the evidence finalize,
the dense caller scan, each D2H, and the sparse fetches, plus a tunnel
health probe (H2D/D2H MB/s) so runs hours apart can be normalized.

Uses the fixtures chr_scale_smoke.py leaves in MC_CHR_DIR."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("MC_CHR_DIR", "/tmp/chrscale2")


def sync(x):
    import jax
    jax.block_until_ready(x)
    return x


def main():
    import numpy as np
    from mapcaller_tpu import enable_compilation_cache, tune_host_allocator
    tune_host_allocator()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    out = {}
    # --- tunnel health probe -----------------------------------------
    dev = jax.local_devices()[0]
    host_buf = np.zeros(4 << 20, np.uint8)
    for _ in range(2):
        t0 = time.time()
        d = sync(jax.device_put(host_buf, dev))
        h2d = time.time() - t0
        t0 = time.time()
        np.asarray(d)
        d2h = time.time() - t0
    out["tunnel_h2d_mb_s"] = round(4 / h2d, 1)
    out["tunnel_d2h_mb_s"] = round(4 / d2h, 1)
    np.asarray(sync(jnp.zeros(16, jnp.int32)))   # warm: first call COMPILES
    lat = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(sync(jnp.zeros(16, jnp.int32)))
        lat = min(lat, time.time() - t0)
    out["tunnel_latency_ms"] = round(lat * 1e3, 1)

    from mapcaller_tpu.config import Config
    from mapcaller_tpu.index.fmindex import load_index
    from mapcaller_tpu.pipeline.engine import MappingEngine
    from mapcaller_tpu.pipeline.stream import run_stream_mapping
    from mapcaller_tpu.runner import make_engine, run_calling

    idx = load_index(f"{DIR}/idx")
    cfg = Config(vcf_file=f"{DIR}/out2.vcf", log_file=f"{DIR}/job2.log",
                 batch_size=8192, stream_batch_size=32768, max_read_len=128)
    cfg.read_files1, cfg.read_files2 = [f"{DIR}/r1.fq"], [f"{DIR}/r2.fq"]
    t0 = time.time()
    engine = make_engine(idx, cfg)
    out["engine_setup_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    run_stream_mapping(engine, cfg, t0)
    out["map_first_s"] = round(time.time() - t0, 2)

    dev_ev = engine.device_evidence
    assert dev_ev is not None
    t0 = time.time()
    dev_ev._merge_host_deltas()
    sync(dev_ev.planes.acgt if hasattr(dev_ev.planes, "acgt")
         else dev_ev.planes)
    out["merge_host_deltas_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    fin = dev_ev.finalize()
    sync(fin)
    out["finalize_kernel_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    scan = dev_ev.scan()
    out["scan_kernel_and_d2h_s"] = round(time.time() - t0, 3)
    bd = scan[0]
    out["n_cand"] = int(scan[4][0])
    out["n_runs"] = int(scan[4][1])
    t0 = time.time()
    engine.finalize()
    out["engine_finalize_rest_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    run_calling(engine, cfg, "profile-finalize")
    out["run_calling_s"] = round(time.time() - t0, 3)
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "FINALIZE_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
