"""puzzlelib_tpu - a TPU-native deep learning framework.

A ground-up JAX/XLA/Pallas rebuild of the PuzzleLib framework's capabilities:
the same imperative Modules/Containers/Cost/Optimizers/Handlers API, backed by
an immutable-array functional core that XLA compiles onto the MXU, with
mesh-based data parallelism replacing CUDA-IPC process grids.
"""

from puzzlelib_tpu import config as Config

__version__ = "0.1.0"
