"""Top-level grid alias (reference import path: ``from PuzzleLib.Grid import runGrid``)."""

from puzzlelib_tpu.parallel.grid import runGrid, NodeInfo, GridError
