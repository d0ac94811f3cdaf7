"""tpu-vvc: a TPU-native VVC (H.266) encode/decode engine.

Built from scratch in jax/XLA/Pallas against the behavior of the VVC
reference software (VTM 9.3, surveyed in SURVEY.md).  The normative sample
math lives in `vtm_tpu.ops` (batched JAX/Pallas kernels with exact-integer
numpy twins), the serial entropy layer in `vtm_tpu.bitstream` +
`vtm_tpu.decoder`/`vtm_tpu.encoder`, and multi-chip sharding in
`vtm_tpu.parallel`.
"""

__version__ = "0.1.0"
