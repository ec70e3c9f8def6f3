"""Pure, jittable compute functions (the TPU-native engine).

Every function here maps ``jax.Array -> jax.Array`` with no hidden state, so
they serve both the eager object layer (puzzlelib_tpu.backend wraps them with
the mutable GPUArray surface) and the fused/jitted training path
(puzzlelib_tpu.parallel traces straight through them).
"""
