#!/usr/bin/env python
"""Diagnose the chr-scale steady-pass cost: run N map passes over the
cached 60 Mb index (shared backend, fresh engine per pass) and print
per-pass wall time + per-batch collect times."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("MC_CHR_DIR", "/tmp/chrscale2")
PASSES = int(os.environ.get("MC_PROBE_PASSES", 3))


def main():
    from mapcaller_tpu import enable_compilation_cache, tune_host_allocator
    tune_host_allocator()
    enable_compilation_cache()
    from mapcaller_tpu.config import Config
    from mapcaller_tpu.index.fmindex import load_index
    from mapcaller_tpu.pipeline.engine import MappingEngine
    from mapcaller_tpu.pipeline.stream import run_stream_mapping
    from mapcaller_tpu.runner import make_engine

    t0 = time.time()
    idx = load_index(f"{DIR}/idx")
    print(f"load_index: {time.time()-t0:.1f}s", flush=True)

    cfg = Config(vcf_file=f"{DIR}/out.vcf", log_file=f"{DIR}/job.log",
                 vcf_output=True, batch_size=8192,
                 stream_batch_size=32768, max_read_len=128)
    cfg.read_files1, cfg.read_files2 = [f"{DIR}/r1.fq"], [f"{DIR}/r2.fq"]

    t0 = time.time()
    engine = make_engine(idx, cfg)
    print(f"make_engine: {time.time()-t0:.1f}s", flush=True)
    backend = engine.backend

    for p in range(PASSES):
        if p > 0:
            engine = MappingEngine(idx, cfg, backend=backend)
        t0 = time.time()
        run_stream_mapping(engine, cfg, t0)
        t1 = time.time()
        engine.finalize()
        t2 = time.time()
        print(f"\npass {p}: map={t1-t0:.2f}s finalize={t2-t1:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
