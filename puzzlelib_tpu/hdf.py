"""HDF5 checkpoint codec.

On-disk schema is byte-compatible with the reference framework
(/root/reference/Modules/Module.py:179-283, Containers/Container.py:138-202):

    params/<idx>   deduplicated parameter tensors (gzip by default)
    links/<path>   dotted module path + param name -> params index
    attrs/<path>   leaf-module attribute tensors ("<path>.<attr>")
    attrs.<name>/  container-level attribute group (container flavor)
    blueprint      JSON architecture description (optional)

The module layer orchestrates *what* to persist; this codec owns *how* —
opening stores from paths / bytes / open handles, identity-deduplicating
variables, and producing in-memory file images.
"""

import io
import json
import os

import numpy as np
import ml_dtypes  # noqa: F401  (registers bfloat16/fp8 dtype names with numpy)
import h5py


def openStore(target, mode):
    """Open an HDF5 store from a path, an in-memory image, an already-open
    handle, or nothing (fresh in-memory store).  Returns (file, owned):
    ``owned`` says whether the caller is responsible for closing it."""
    if target is None:
        return h5py.File(io.BytesIO(), mode), True

    if isinstance(target, (bytes, bytearray)):
        return h5py.File(io.BytesIO(target), "r"), True

    if isinstance(target, (str, os.PathLike)):
        parent = os.path.dirname(os.path.abspath(target))
        os.makedirs(parent, exist_ok=True)

        return h5py.File(target, mode, libver="earliest"), True

    return target, False


def snapshot(hdf):
    """Serialize an open store to bytes (reference parity: save() with no
    target returns a file image usable as a load() source)."""
    hdf.flush()
    return bytes(hdf.id.get_file_image())


def _writeDataset(grp, name, value, compress):
    """Create a dataset, tagging extension dtypes (bfloat16/fp8 - HDF5 has no
    native type for them, h5py round-trips opaque void) so fetch can restore
    the true dtype from the ``dtype`` attribute."""
    ds = grp.create_dataset(name, data=value, compression=compress)

    if value.dtype.kind == "V" and value.dtype.names is None:
        ds.attrs["dtype"] = value.dtype.name

    return ds


def _readDataset(ds):
    value = np.asarray(ds)
    tag = ds.attrs.get("dtype")

    if tag is not None and value.dtype.kind == "V":
        value = value.view(np.dtype(tag))

    return value


def storeParam(hdf, path, var, varlinks, compress="gzip"):
    """Write one variable under ``links/<path>``, deduplicating shared
    variables (tied weights) by object identity through ``varlinks``."""
    slot = varlinks.get(var)

    if slot is None:
        slot = len(varlinks)
        varlinks[var] = slot
        _writeDataset(hdf.require_group("params"), str(slot), var.data.get(), compress)

    hdf.require_group("links")[path] = slot


def fetchParam(hdf, path):
    """Resolve ``links/<path>`` to its parameter tensor."""
    slot = hdf["links"][path][()]
    return _readDataset(hdf["params"][str(slot)])


def storeAttrs(hdf, entries, compress="gzip", group="attrs"):
    """Write attribute tensors into ``group`` as {name: value} datasets."""
    if not entries:
        return

    grp = hdf.require_group(group)
    for name, value in entries.items():
        value = value.get() if hasattr(value, "get") else value
        _writeDataset(grp, name, value, compress)


def fetchAttr(hdf, name, group="attrs"):
    return _readDataset(hdf[group][name])


def storeBlueprint(hdf, blueprint):
    hdf.create_dataset("blueprint", (), dtype=h5py.special_dtype(vlen=str),
                       data=json.dumps(blueprint, indent=4, sort_keys=True))


def fetchBlueprint(hdf):
    return json.loads(hdf["blueprint"][()])
