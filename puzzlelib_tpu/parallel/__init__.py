"""Parallelism substrate.

Tiers (all composable over one ``jax.sharding.Mesh``):
  * ``puzzlelib_tpu.fused.FusedStep(mesh=...)`` - the performant path: GSPMD
    data parallelism inside one jitted step (batch sharded over the mesh,
    state replicated, gradient all-reduce inserted by XLA over ICI);
    ``tensorParallelSpecs`` adds Megatron-style TP, ``zeroOptimizerSpecs``
    adds ZeRO-1 optimizer-state sharding.
  * ``puzzlelib_tpu.parallel.pipeline`` - GPipe pipeline parallelism
    (stage-sharded params, ``lax.scan`` schedule, ``ppermute`` handoff).
  * ``puzzlelib_tpu.parallel.seqparallel`` - Megatron-SP sequence-sharded
    activations between TP regions.
  * ``puzzlelib_tpu.parallel.moe`` - Switch top-1 expert parallelism.
  * ``puzzlelib_tpu.parallel.grid`` - API-compatible port of the reference's
    multi-process CUDA-IPC grid (/root/reference/Grid.py): thread-per-device
    nodes with mean-allreduce semantics, so reference multi-GPU scripts run
    unchanged on a TPU/CPU device set.
"""

from puzzlelib_tpu.parallel.grid import runGrid, NodeInfo
from puzzlelib_tpu.parallel.pipeline import stackStageParams, pipelineForward, pipelineGrad
from puzzlelib_tpu.parallel.seqparallel import seqParallelMLP
from puzzlelib_tpu.parallel.moe import stackExpertParams, moeForward
