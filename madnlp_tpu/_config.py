"""Global JAX configuration for madnlp_tpu.

The interior-point method targets tol=1e-8 by default (same default as the
reference MadNLP.jl, src/IPM/options.jl:27), which requires float64
arithmetic for the KKT residuals.  On TPU float64 is emulated by XLA; the
performance-oriented paths (condensed KKT + mixed-precision iterative
refinement) run the factorization in float32 and refine in float64.

Importing this module enables x64 unless the user opts out via the
environment variable ``MADNLP_TPU_NO_X64=1``.
"""

import os

import jax

if os.environ.get("MADNLP_TPU_NO_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: whole-solver jits take minutes to compile
# through the remote TPU compile service; cache them across processes.
# TPU-only: CPU AOT cache entries are machine-feature-sensitive (risk of
# SIGILL when loaded under different CPU flags).
try:
    if getattr(jax.config, "jax_platforms", None) != "cpu":
        _cache_dir = os.environ.get("MADNLP_TPU_CACHE", "/tmp/madnlp_tpu_jax_cache")
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:  # older jax without these flags
    pass

# On TPU, XLA's DEFAULT precision lowers f32 matmuls to bfloat16 passes —
# fatal for the f32 KKT factorizations of the mixed-precision path (the
# factor loses ~8 mantissa bits and Richardson refinement stalls).  Force
# true-f32 matmul accumulation; the performance-critical kernels choose
# their own precision explicitly where relevant.
jax.config.update("jax_default_matmul_precision", "highest")
