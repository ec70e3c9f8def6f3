"""AOT inference-engine builder - the TPU-native answer to TensorRT/OpenVINO
(reference: /root/reference/Converter/TensorRT/BuildRTEngine.py).

Where the reference walks the net layer-by-layer into a TensorRT network and
serializes a CUDA engine, here the whole net is traced once in eval mode
(weights baked in as constants, exactly like a TRT engine freezes weights),
compiled by XLA, and serialized with ``jax.export`` - a portable StableHLO
artifact runnable from Python (``Engine``) or from the C++ PJRT host driver
(puzzlelib_tpu/converter/engine/src).
"""

import json
import os

import numpy as np


class DataType:
    float32 = "float32"
    float16 = "float16"
    bfloat16 = "bfloat16"


def _functionalForward(net):
    from puzzlelib_tpu.tensor import GPUArray

    def forward(x):
        out = net(GPUArray(x))
        net.reset()
        return out.jax

    return forward


def buildEngine(net, inshape, savepath, dtype=DataType.float32, name=None, returnEngine=True):
    """Trace + compile + serialize ``net`` for the given input shape.

    Produces ``<name>.<dtype>.engine`` (jax.export serialization, loadable by
    ``Engine``) plus ``<name>.<dtype>.stablehlo.mlir`` and a spec JSON for the
    C++ PJRT host driver.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if name is None:
        name = net.name or "net"

    net.evalMode()

    dtype = getattr(dtype, "value", dtype)
    dtype = np.dtype(jnp.bfloat16) if dtype == DataType.bfloat16 else np.dtype(dtype)

    forward = _functionalForward(net)

    def typedForward(x):
        # mixed-precision serving: compute in the engine dtype, return float32
        out = forward(x.astype(dtype))
        return out.astype(jnp.float32)

    spec = jax.ShapeDtypeStruct(tuple(inshape), jnp.float32)
    exported = jexport.export(jax.jit(typedForward))(spec)

    base = os.path.join(savepath, "%s.%s" % (name, np.dtype(dtype).name))

    enginepath = base + ".engine"
    with open(enginepath, "wb") as f:
        f.write(exported.serialize())

    with open(base + ".stablehlo.mlir", "w") as f:
        f.write(exported.mlir_module())

    outshape = net.dataShapeFrom(tuple(inshape))
    with open(base + ".spec.json", "w") as f:
        json.dump({
            "name": name,
            "dtype": np.dtype(dtype).name,
            "inshape": list(inshape),
            "outshape": list(outshape),
        }, f, indent=2)

    if returnEngine:
        from puzzlelib_tpu.converter.engine.engine import Engine
        return Engine(enginepath)

    return enginepath
