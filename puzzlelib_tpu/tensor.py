"""Mutable ndarray surface over immutable ``jax.Array``.

The reference framework's entire object layer writes arrays in place
(``GPUArray.set/fill/__setitem__``, optimizer updates, ``SharedArray`` views of
one fused buffer; /root/reference/Cuda/Source/Core/Array.c,
/root/reference/Cuda/Utils.py:19-64).  JAX arrays are immutable, so we keep a
stable wrapper object holding a rebindable handle:

  * mutation rebinds ``_buf`` on the *root* wrapper (one functional update op);
  * views (reshape / ravel / basic indexing) are write-through: they recompute
    from their base lazily (version-tagged cache) and write back via
    ``jax.Array.at[...]`` - this is what makes the reference's
    ``Blas.toVectorAddVector(var.data.ravel(), ...)`` idiom and the fused
    ``SharedArray`` optimizer state work unchanged;
  * identity (``id``) of wrappers is stable, so modules that cache
    ``self.W = var.data`` observe optimizer updates, as on CUDA.

Everything here is eager; ops dispatch through JAX's per-shape compiled
primitive cache.  The fused training path (puzzlelib_tpu.parallel) bypasses
this layer entirely and traces pure functions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from puzzlelib_tpu import config as Config


def _traceAlloc(ary):
    # alloc-trace tier: no-op unless profiler.startTraceMalloc() is active
    from puzzlelib_tpu import profiler

    if profiler.tracingAllocs:
        profiler.recordAlloc(ary)


def _unwrap(value):
    return value.jax if isinstance(value, GPUArray) else value


class GPUArray:
    __slots__ = ("_buf", "_version", "__weakref__")

    def __init__(self, arr):
        self._buf = arr
        self._version = 0

    # -- storage protocol ---------------------------------------------------

    @property
    def jax(self):
        return self._buf

    @property
    def version(self):
        return self._version

    def _write(self, arr):
        self._buf = arr
        self._version += 1

    # -- metadata -----------------------------------------------------------

    @property
    def shape(self):
        return tuple(self.jax.shape)

    @property
    def dtype(self):
        return np.dtype(self.jax.dtype)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1

    @property
    def nbytes(self):
        return self.size * self.dtype.itemsize

    # -- host interchange ---------------------------------------------------

    def get(self, copy=True):
        return np.asarray(self.jax)

    def set(self, data):
        data = _unwrap(data)
        arr = jnp.asarray(data)

        if tuple(arr.shape) != self.shape:
            raise ValueError("Shape mismatch in set(): %s vs %s" % (tuple(arr.shape), self.shape))

        if arr.dtype != self.dtype:
            arr = arr.astype(self.dtype)

        self._write(arr)

    def fill(self, value):
        self._write(jnp.full(self.shape, value, self.dtype))

    # -- views (write-through) ---------------------------------------------

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])

        shape = _resolveShape(shape, self.size)

        return _ReshapeView(self, shape)

    def ravel(self):
        return self.reshape((self.size, ))

    def view(self):
        return _ReshapeView(self, self.shape)

    def __getitem__(self, idx):
        return _IndexView(self, idx)

    def __setitem__(self, idx, value):
        self._write(self.jax.at[idx].set(_unwrap(value)))

    # -- copies -------------------------------------------------------------

    def copy(self, allocator=None):
        return GPUArray(self.jax)

    def astype(self, dtype, allocator=None):
        return GPUArray(self.jax.astype(np.dtype(dtype)))

    # -- arithmetic (eager, returns fresh arrays) ---------------------------

    def __add__(self, other):
        return GPUArray(self.jax + _unwrap(other))

    __radd__ = __add__

    def __sub__(self, other):
        return GPUArray(self.jax - _unwrap(other))

    def __rsub__(self, other):
        return GPUArray(_unwrap(other) - self.jax)

    def __mul__(self, other):
        return GPUArray(self.jax * _unwrap(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return GPUArray(self.jax / _unwrap(other))

    def __rtruediv__(self, other):
        return GPUArray(_unwrap(other) / self.jax)

    def __neg__(self):
        return GPUArray(-self.jax)

    def __pow__(self, p):
        return GPUArray(self.jax ** _unwrap(p))

    def __iadd__(self, other):
        self._write(self.jax + _unwrap(other))
        return self

    def __isub__(self, other):
        self._write(self.jax - _unwrap(other))
        return self

    def __imul__(self, other):
        self._write(self.jax * _unwrap(other))
        return self

    def __itruediv__(self, other):
        self._write(self.jax / _unwrap(other))
        return self

    def __lt__(self, other):
        return GPUArray(self.jax < _unwrap(other))

    def __le__(self, other):
        return GPUArray(self.jax <= _unwrap(other))

    def __gt__(self, other):
        return GPUArray(self.jax > _unwrap(other))

    def __ge__(self, other):
        return GPUArray(self.jax >= _unwrap(other))

    def sum(self, axis=None):
        return GPUArray(jnp.sum(self.jax, axis=axis))

    def item(self):
        return self.jax.item()

    def __float__(self):
        return float(self.jax)

    def __int__(self):
        return int(self.jax)

    def __len__(self):
        return self.shape[0]

    def __repr__(self):
        return "GPUArray(shape=%s, dtype=%s)" % (self.shape, self.dtype)

    # -- constructors -------------------------------------------------------

    @classmethod
    def toGpu(cls, ary, allocator=None):
        out = cls(ary.jax) if isinstance(ary, GPUArray) else cls(jnp.asarray(ary))
        _traceAlloc(out)
        return out

    @classmethod
    def empty(cls, shape, dtype=np.float32, allocator=None):
        shape = (shape, ) if isinstance(shape, int) else tuple(shape)
        dtype = np.dtype(dtype)

        if Config.debugAllocator:
            import jax.numpy as _jnp
            poison = (np.nan if _jnp.issubdtype(dtype, _jnp.floating)
                      else np.iinfo(dtype).max if dtype.kind in "iu" else 0)
            out = cls(jnp.full(shape, poison, dtype))
        else:
            out = cls(jnp.zeros(shape, dtype))

        _traceAlloc(out)
        return out

    @classmethod
    def zeros(cls, shape, dtype=np.float32, allocator=None):
        shape = (shape, ) if isinstance(shape, int) else tuple(shape)
        out = cls(jnp.zeros(shape, np.dtype(dtype)))
        _traceAlloc(out)
        return out

    @staticmethod
    def min(ary):
        return GPUArray(jnp.min(ary.jax))

    @staticmethod
    def max(ary):
        return GPUArray(jnp.max(ary.jax))


def _resolveShape(shape, size):
    shape = tuple(int(s) for s in shape)

    if any(s == -1 for s in shape):
        known = int(np.prod([s for s in shape if s != -1], dtype=np.int64))
        shape = tuple(size // known if s == -1 else s for s in shape)

    if int(np.prod(shape, dtype=np.int64)) != size:
        raise ValueError("Cannot reshape array of size %d into shape %s" % (size, shape))

    return shape


class _View(GPUArray):
    __slots__ = ("_base", "_cache", "_cachev")

    def __init__(self, base):
        self._base = base
        self._cache = None
        self._cachev = -1

    @property
    def version(self):
        return self._base.version

    @property
    def jax(self):
        v = self._base.version

        if self._cachev != v:
            val = self._compute()

            # computing a view of a CONCRETE root inside an active jax trace
            # stages the op and yields a tracer; caching it would leak that
            # tracer into later traces (the root's version never changes, so
            # the stale tracer would be served forever) - recompute instead
            import jax as _jax
            if isinstance(val, _jax.core.Tracer) and not isinstance(self._base.jax, _jax.core.Tracer):
                return val

            self._cache = val
            self._cachev = v

        return self._cache

    def _compute(self):
        raise NotImplementedError()


class _ReshapeView(_View):
    __slots__ = ("_shape", )

    def __init__(self, base, shape):
        super().__init__(base)
        self._shape = shape

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._base.dtype

    def _compute(self):
        return self._base.jax.reshape(self._shape)

    def _write(self, arr):
        self._base._write(arr.reshape(self._base.shape))

    def __setitem__(self, idx, value):
        self._write(self.jax.at[idx].set(_unwrap(value)))


class _IndexView(_View):
    __slots__ = ("_idx", "_shape", "_dtype")

    def __init__(self, base, idx):
        super().__init__(base)

        self._idx = _unwrap(idx) if not isinstance(idx, tuple) else tuple(_unwrap(i) for i in idx)

        aval = jax.eval_shape(lambda a: a[self._idx], jax.ShapeDtypeStruct(base.shape, base.dtype))
        self._shape = tuple(aval.shape)
        self._dtype = np.dtype(aval.dtype)

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    def _compute(self):
        return self._base.jax[self._idx]

    def _write(self, arr):
        self._base._write(self._base.jax.at[self._idx].set(arr))

    def __setitem__(self, idx, value):
        self._write(self.jax.at[idx].set(_unwrap(value)))


class SharedArray:
    """One fused flat buffer per dtype with named write-through block views.

    TPU-native stand-in for the reference ``SharedArray``
    (/root/reference/Cuda/Utils.py:19-64): optimizers register every parameter
    (or gradient) once, ``build()`` materializes a single contiguous device
    array, and ``sh[name]`` hands back a reshaped slice view.  Because views
    write through to the root buffer, a single fused elementwise update (or a
    single ``pmean`` for data parallelism) covers every parameter at once.
    """

    GROUP_SIZE = 16  # byte alignment of blocks, mirrors the reference layout

    def __init__(self, dtype=np.float32, allocator=None):
        self.dtype = np.dtype(dtype)
        self.blocks = {}
        self.ary = None
        self._order = []

    def register(self, shape, dtype, name):
        if np.dtype(dtype) != self.dtype:
            raise ValueError("SharedArray dtype mismatch: %s vs %s" % (dtype, self.dtype))

        if name in self.blocks:
            raise ValueError("Block %r is already registered" % name)

        shape = (shape, ) if isinstance(shape, int) else tuple(shape)
        self.blocks[name] = shape
        self._order.append(name)

    def align(self, nelems):
        itemsize = self.dtype.itemsize
        grain = max(1, self.GROUP_SIZE // itemsize)
        return (nelems + grain - 1) // grain * grain

    def build(self):
        offsets, offset = {}, 0

        for name in self._order:
            shape = self.blocks[name]
            size = int(np.prod(shape, dtype=np.int64))
            offsets[name] = (offset, size, shape)
            offset += self.align(size)

        self.ary = GPUArray.zeros((offset, ), self.dtype)
        self._offsets = offsets

    def __getitem__(self, name):
        offset, size, shape = self._offsets[name]
        return self.ary[offset:offset + size].reshape(shape)


def dtypesSupported():
    """Dtypes with test tolerances, per backend — the reference defines these
    per backend too (/root/reference/Cuda/GPUBackend.py:218-220: fp32@1e-5,
    fp16@1e-2 on CUDA).  float16 mirrors the reference's half-float tier;
    bfloat16 is the TPU-native half type (wider exponent, coarser mantissa,
    hence the looser tolerance).  On the real TPU the f32 tier is 5e-5, not
    1e-5: VPU transcendentals (tanh etc.) are polynomial approximations with
    ~1.5e-5 max error (measured on v5e, 2026-08-20)."""
    import ml_dtypes
    import jax

    f32atol = 5e-5 if jax.devices()[0].platform != "cpu" else 1e-5
    return [(np.float32, f32atol), (np.float16, 1e-2), (np.dtype(ml_dtypes.bfloat16).type, 5e-2)]
