"""Multi-host simulation: N engines map disjoint read shards, evidence
reduces by sum/merge, one calling pass — VCF equals the single-host run."""
import gzip
import os
import time

import pytest

from mapcaller_tpu.config import Config
from mapcaller_tpu.index.fmindex import build_index
from mapcaller_tpu.parallel.distributed import merge_engines
from mapcaller_tpu.pipeline.device_backend import DeviceBackend
from mapcaller_tpu.pipeline.engine import MappingEngine
from mapcaller_tpu.pipeline.stream import run_stream_mapping

DATA = os.path.join(os.path.dirname(__file__), "data", "subset")


@pytest.fixture(scope="module")
def toy_idx(toy_fasta):
    return build_index(toy_fasta)


def _split_fastq(path, out_paths):
    with gzip.open(path, "rt") as f:
        recs = f.read().splitlines()
    recs = [recs[i:i + 4] for i in range(0, len(recs), 4)]
    n = len(recs)
    k = len(out_paths)
    per = (n + k - 1) // k
    for i, op in enumerate(out_paths):
        with open(op, "w") as f:
            for r in recs[i * per:(i + 1) * per]:
                f.write("\n".join(r) + "\n")


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_sharded_mapping_merged_vcf_matches_single(toy_idx, tmp_path, n_hosts):
    r1_shards = [str(tmp_path / f"r1_{i}.fq") for i in range(n_hosts)]
    r2_shards = [str(tmp_path / f"r2_{i}.fq") for i in range(n_hosts)]
    _split_fastq(os.path.join(DATA, "sub_r1.fq.gz"), r1_shards)
    _split_fastq(os.path.join(DATA, "sub_r2.fq.gz"), r2_shards)

    def run_single():
        cfg = Config(vcf_file=str(tmp_path / "single.vcf"),
                     batch_size=256, stream_batch_size=256, max_read_len=128,
                     log_file=str(tmp_path / "s.log"))
        backend = DeviceBackend(toy_idx, cfg)
        engine = MappingEngine(toy_idx, cfg, backend=backend)
        cfg.read_files1 = [os.path.join(DATA, "sub_r1.fq.gz")]
        cfg.read_files2 = [os.path.join(DATA, "sub_r2.fq.gz")]
        run_stream_mapping(engine, cfg, time.time())
        engine.finalize()
        from mapcaller_tpu.runner import run_calling
        run_calling(engine, cfg, "x")
        return cfg.vcf_file

    def run_sharded():
        engines = []
        cfg = None
        for i in range(n_hosts):
            cfg = Config(vcf_file=str(tmp_path / "merged.vcf"),
                         batch_size=256, stream_batch_size=256,
                         max_read_len=128, log_file=str(tmp_path / "m.log"))
            backend = DeviceBackend(toy_idx, cfg)
            engine = MappingEngine(toy_idx, cfg, backend=backend)
            cfg.read_files1 = [r1_shards[i]]
            cfg.read_files2 = [r2_shards[i]]
            run_stream_mapping(engine, cfg, time.time())
            engines.append(engine)
        root = merge_engines(engines)
        from mapcaller_tpu.runner import run_calling
        run_calling(root, cfg, "x")
        return cfg.vcf_file

    single = run_single()
    merged = run_sharded()

    def body(p):
        return [l for l in open(p).read().splitlines()
                if not l.startswith("##")]

    assert body(merged) == body(single)
