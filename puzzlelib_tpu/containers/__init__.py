"""Container exports (parity with /root/reference/Containers/__init__.py)."""

from puzzlelib_tpu.containers.container import Container, ContainerError
from puzzlelib_tpu.containers.graph import Graph
from puzzlelib_tpu.containers.node import Node
from puzzlelib_tpu.containers.parallel import Parallel
from puzzlelib_tpu.containers.sequential import Sequential
