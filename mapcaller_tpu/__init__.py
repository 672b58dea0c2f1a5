"""MapCaller-TPU: a TPU-native short-read mapper + variant caller.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hsinnan75/MapCaller (reference: /root/reference): BWT/FM-index seeding,
seed chaining, gapped extension, on-device evidence accumulation
(position-frequency matrix + indel/breakpoint event tables) and a
single-pass variant caller emitting VCF.

Layer map (mirrors SURVEY.md section 1):
  index/    — offline index construction + load     (ref: src/BWT_Index, bwt_index.cpp)
  io/       — FASTQ/FASTA input, SAM/VCF output     (ref: src/GetData.cpp, SamReport.cpp)
  ops/      — device kernels: FM-search, banded DP,
              PFM scatter-add                       (ref: src/bwt_search.cpp, nw_alignment.cpp,
                                                     ksw2_alignment.cpp, AlignmentProfile.cpp)
  pipeline/ — mapping engine: chaining, pairing,
              rescue, alignment production          (ref: src/ReadMapping.cpp, ReadAlignment.cpp,
                                                     AlignmentRescue.cpp, KmerAnalysis.cpp)
  calling/  — variant caller + SV detection         (ref: src/VariantCalling.cpp)
  parallel/ — device mesh, sharded PFM reduction    (TPU-native; reference is pthreads-only)
"""

__version__ = "0.1.0"


def tune_host_allocator() -> None:
    """Keep large numpy temporaries on the reusable glibc heap instead of
    fresh mmaps: first-touch page faults on this class of VM cost ~10x
    the actual compute of a genome-sized array pass."""
    import ctypes
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
    except Exception:
        pass


def enable_compilation_cache(path: str = "/root/.cache/jax_mc") -> None:
    """Persistent XLA compilation cache — first compiles on the tunneled
    TPU platform take minutes; cached reloads take seconds."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
