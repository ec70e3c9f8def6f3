"""Container exports (parity with /root/reference/Containers/__init__.py)."""

from puzzlelib_tpu.containers.container import Container, ContainerError
from puzzlelib_tpu.containers.graph import Graph
from puzzlelib_tpu.containers.node import Node
from puzzlelib_tpu.containers.parallel import Parallel
from puzzlelib_tpu.containers.pipeline import Pipeline
from puzzlelib_tpu.containers.sequential import Sequential


def __getattr__(name):
    # lazy re-export: switchmoe imports containers.container, so an eager
    # import here would be circular
    if name in ("SwitchMoE", "MoEGate"):
        from puzzlelib_tpu.modules import switchmoe
        return getattr(switchmoe, name)

    raise AttributeError("module %r has no attribute %r" % (__name__, name))
