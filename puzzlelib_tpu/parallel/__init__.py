"""Parallelism substrate.

Two tiers:
  * ``puzzlelib_tpu.fused.FusedStep(mesh=...)`` - the performant path: GSPMD
    data parallelism inside one jitted step (batch sharded over the mesh,
    state replicated, gradient all-reduce inserted by XLA over ICI).
  * ``puzzlelib_tpu.parallel.grid`` - API-compatible port of the reference's
    multi-process CUDA-IPC grid (/root/reference/Grid.py): thread-per-device
    nodes with mean-allreduce semantics, so reference multi-GPU scripts run
    unchanged on a TPU/CPU device set.
"""

from puzzlelib_tpu.parallel.grid import runGrid, NodeInfo
