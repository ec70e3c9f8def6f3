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
    int8 = "int8"


def _quantizableModules(net):
    from puzzlelib_tpu.modules.linear import Linear
    from puzzlelib_tpu.modules.convnd import ConvND

    mods = []

    def walk(mod):
        children = getattr(mod, "modules", None)

        if isinstance(children, dict) and children:
            for child in children.values():
                walk(child)
        elif isinstance(mod, (Linear, ConvND)):
            mods.append(mod)

    walk(net)
    return mods


def _patchQuantized(modules, scales):
    """Swap each module's updateData for the int8 path; returns a restore fn.

    Weights are quantized per-output-channel ahead of time; the calibrated
    activation scale comes from ``scales[id(mod)]``.
    """
    import jax.numpy as jnp

    from puzzlelib_tpu.tensor import GPUArray
    from puzzlelib_tpu.modules.linear import Linear
    from puzzlelib_tpu.ops import quant

    originals = {}

    for mod in modules:
        originals[id(mod)] = mod.updateData
        xscale = scales[id(mod)]

        if isinstance(mod, Linear):
            w = np.asarray(mod.W.get())
            axis = 0 if mod.transpose else 1
            wq, wscale = quant.quantizeWeight(w, axis)

            bias = jnp.asarray(mod.b.get()) if mod.useBias else None

            def patched(data, mod=mod, wq=jnp.asarray(wq), wscale=jnp.asarray(wscale.reshape(-1)),
                        xscale=xscale, bias=bias):
                mod.data = GPUArray(quant.quantLinear(
                    data.jax, wq, wscale, xscale, bias, transpose=mod.transpose
                ))

        else:
            w = np.asarray(mod.W.get())
            wq, wscale = quant.quantizeWeight(w, axis=0)

            bias = jnp.asarray(mod.b.get().reshape(-1)) if mod.useBias else None

            def patched(data, mod=mod, wq=jnp.asarray(wq), wscale=jnp.asarray(wscale.reshape(-1)),
                        xscale=xscale, bias=bias):
                mod.data = GPUArray(quant.quantConvNd(
                    data.jax, wq, wscale, xscale, bias,
                    stride=tuple(mod.stride), pad=tuple(mod.pad), dilation=tuple(mod.dilation),
                    groups=mod.groups
                ))

        mod.updateData = patched

    def restore():
        for mod in modules:
            mod.updateData = originals[id(mod)]

    return restore


def _functionalForward(net):
    from puzzlelib_tpu.tensor import GPUArray

    def forward(x):
        out = net(GPUArray(x))
        net.reset()
        return out.jax

    return forward


def buildEngine(net, inshape, savepath, dtype=DataType.float32, name=None, returnEngine=True,
                calibrator=None):
    """Trace + compile + serialize ``net`` for the given input shape.

    Produces ``<name>.<dtype>.engine`` (jax.export serialization, loadable by
    ``Engine``) plus ``<name>.<dtype>.stablehlo.mlir`` and a spec JSON for the
    C++ PJRT host driver.

    ``dtype="int8"`` (with a ``DataCalibrator``) quantizes Linear/Conv weights
    per-output-channel and activations per-tensor with calibrated scales; the
    integer matmuls/convs run on the MXU's native int8 path
    (reference int8 mode: /root/reference/Converter/TensorRT/BuildRTEngine.py:181-193).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if name is None:
        name = net.name or "net"

    net.evalMode()

    dtype = getattr(dtype, "value", dtype)

    restore = None
    if dtype == DataType.int8:
        if calibrator is None:
            raise ValueError("int8 engines require a DataCalibrator for activation ranges")

        modules = _quantizableModules(net)
        scales = calibrator.calibrate(net, modules)
        restore = _patchQuantized(modules, scales)

        computeDtype = np.dtype(np.int8)                # spec label; I/O stays float32
        castInputTo = None
    else:
        computeDtype = np.dtype(jnp.bfloat16) if dtype == DataType.bfloat16 else np.dtype(dtype)
        castInputTo = None

        if computeDtype != np.dtype(np.float32):
            # half-precision engines: trace a calcMode-cast CLONE so the
            # user's f32 net keeps full-precision weights
            from puzzlelib_tpu import blueprint as _blueprint

            net = _blueprint.load(net.save(withBlueprint=True))
            net.evalMode()
            net.calcMode(computeDtype.type)
            castInputTo = computeDtype

    dtype = computeDtype

    forward = _functionalForward(net)

    def typedForward(x):
        # mixed-precision serving: compute in the engine dtype, return float32
        out = forward(x.astype(castInputTo) if castInputTo is not None else x)
        return out.astype(jnp.float32)

    try:
        spec = jax.ShapeDtypeStruct(tuple(inshape), jnp.float32)
        exported = jexport.export(jax.jit(typedForward))(spec)
    finally:
        if restore is not None:
            restore()

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
