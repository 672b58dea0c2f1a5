#!/usr/bin/env python
"""Scaled gVCF + somatic sharded end-to-end validation (VERDICT r4
next #4 / BASELINE configs #4-#5 analogs): the genome-sharded
production pipeline (`-shards N`, x64 index + genome-sharded planes,
per-device memory O(L/n)) runs map+call in `-gvcf` and in
`-somatic -filter` modes against planted truth on a multi-10-Mb
genome, and each VCF record set must match the reference binary byte
for byte.

Reference behavior being matched: gVCF NOR blocks + monomorphic
emission and the somatic threshold overrides
(/root/reference/src/VariantCalling.cpp:571-575,652-669) plus the
-filter flag (DetermineFileter, VariantCalling.cpp:409-427).

Reuses the genome/truth machinery of scaled_calling_200mb.py (module
constants are env-driven; set before import).

Env: MC_SM_L (genome bp, default 60e6), MC_SM_SHARDS (8),
MC_SM_DEPTH (8), MC_SM_WIN (planted window bp, 4e6),
MC_SM_DIR (/tmp/smodes). Writes SCALED_GVCF.json + SCALED_SOMATIC.json.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MC_S200_DIR", os.environ.get("MC_SM_DIR", "/tmp/smodes"))
os.environ.setdefault("MC_S200_L", os.environ.get("MC_SM_L", "60000000"))
os.environ.setdefault("MC_S200_SHARDS", os.environ.get("MC_SM_SHARDS", "8"))
os.environ.setdefault("MC_S200_DEPTH", os.environ.get("MC_SM_DEPTH", "8"))
os.environ.setdefault("MC_S200_WIN", os.environ.get("MC_SM_WIN", "4000000"))

import scaled_calling_200mb as base  # noqa: E402  (env must be set first)

MODES = {
    "gvcf": {"ref_flags": ["-gvcf"], "cfg": {"gvcf": True},
             "artifact": "SCALED_GVCF.json"},
    "somatic": {"ref_flags": ["-somatic", "-filter"],
                "cfg": {"somatic": True, "apply_filter": True},
                "artifact": "SCALED_SOMATIC.json"},
}


def main():
    os.makedirs(base.DIR, exist_ok=True)
    fa = base.ensure_genome()

    from mapcaller_tpu.index.fmindex import (build_index, index_exists,
                                             load_index)
    idx_p = f"{base.DIR}/idx"
    if not index_exists(idx_p):
        build_index(fa, idx_p)
    idx = load_index(idx_p)

    fq1, fq2 = f"{base.DIR}/r1.fq", f"{base.DIR}/r2.fq"
    truth_p = f"{base.DIR}/truth.json"
    if not os.path.exists(truth_p):
        truth, _ = base.plant_and_read(idx.ref.codes)
        json.dump(truth, open(truth_p, "w"))
    truth = json.load(open(truth_p))

    # reference index (shared across modes)
    assert os.path.exists(base.REF_BIN), "run scripts/build_reference.sh"
    ref_idx = f"{base.DIR}/refidx"
    if not os.path.exists(ref_idx + ".sa"):
        subprocess.run([base.REF_BIN, "index", fa, ref_idx], check=True,
                       capture_output=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert len(jax.devices()) >= base.SHARDS, (
        f"set XLA_FLAGS=--xla_force_host_platform_device_count={base.SHARDS}")
    from mapcaller_tpu.config import Config
    from mapcaller_tpu.pipeline.stream import run_stream_mapping
    from mapcaller_tpu.runner import make_engine, run_calling

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = os.environ.get("MC_SM_ONLY")
    for mode, spec in MODES.items():
        if only and mode != only:
            continue
        out = {"mode": mode, "genome_bp": base.L, "shards": base.SHARDS,
               "depth": base.DEPTH, "window": [base.W0, base.W1],
               "n_truth": len(truth)}

        # ---- reference binary in this mode ----
        ref_vcf = f"{base.DIR}/ref_{mode}.vcf"
        if not os.path.exists(ref_vcf):
            t0 = time.time()
            subprocess.run([base.REF_BIN, "-i", ref_idx, "-t", "1",
                            "-f", fq1, "-f2", fq2, "-vcf", ref_vcf,
                            "-log", f"{base.DIR}/ref_{mode}.log"]
                           + spec["ref_flags"],
                           check=True, capture_output=True)
            out["ref_map_call_s"] = round(time.time() - t0, 1)

        # ---- sharded production pipeline in this mode ----
        cfg = Config(vcf_file=f"{base.DIR}/tpu_{mode}.vcf",
                     log_file=f"{base.DIR}/tpu_{mode}.log",
                     batch_size=4096, stream_batch_size=16384,
                     max_read_len=128, index_shards=base.SHARDS,
                     big_x64=True, **spec["cfg"])
        engine = make_engine(idx, cfg)
        cfg.read_files1, cfg.read_files2 = [fq1], [fq2]
        t0 = time.time()
        run_stream_mapping(engine, cfg, t0)
        out["tpu_map_s"] = round(time.time() - t0, 1)
        assert engine.backend.sharded_invocations > 0, \
            "sharded kernels never executed (routing escape)"
        engine.finalize()
        t0 = time.time()
        out["variant_counts"] = run_calling(engine, cfg, f"scaled-{mode}")
        out["tpu_call_s"] = round(time.time() - t0, 1)

        rv = base.vcf_records(ref_vcf)
        tv = base.vcf_records(cfg.vcf_file)
        out["n_ref_records"] = len(rv)
        out["n_tpu_records"] = len(tv)
        out["vcf_byte_identical"] = rv == tv
        if not out["vcf_byte_identical"]:
            sr, st_ = set(tv), set(rv)
            out["only_ref"] = [r for r in rv if r not in sr][:5]
            out["only_tpu"] = [r for r in tv if r not in st_][:5]
        called = {int(r.split("\t")[1]) for r in tv}
        out["truth_called"] = sum(
            1 for t in truth if {t["pos"], t["pos"] + 1, t["pos"] + 2} & called)
        with open(os.path.join(repo, spec["artifact"]), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
