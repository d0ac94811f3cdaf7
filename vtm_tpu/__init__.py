"""tpu-vvc: a TPU-native VVC (H.266) encode/decode engine.

Built from scratch in jax/XLA/Pallas against the behavior of the VVC
reference software (VTM 9.3, surveyed in SURVEY.md).  The normative sample
math lives in `vtm_tpu.ops` (batched JAX/Pallas kernels with exact-integer
numpy twins), the serial entropy layer in `vtm_tpu.bitstream` +
`vtm_tpu.decoder`/`vtm_tpu.encoder`, and multi-chip sharding in
`vtm_tpu.parallel`.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point XLA at an on-disk compilation cache (off: VTM_TPU_NO_JIT_CACHE).

    The fused whole-plane kernels (deblock/ALF chains, the batched RMD
    classes) cost tens of seconds to compile on small hosts; caching them
    across processes makes every CLI invocation after the first cheap.
    """
    import os

    if os.environ.get("VTM_TPU_NO_JIT_CACHE"):
        return
    try:
        import jax

        cache = os.environ.get(
            "VTM_TPU_JIT_CACHE", os.path.expanduser("~/.cache/vtm_tpu_xla")
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — cache is an optimization only
        pass


_enable_persistent_compile_cache()
