"""Dataset loader base with HDF5 caching.

API parity target: /root/reference/Datasets/DataLoader.py — concrete loaders
parse raw archives once and memoize the tensors under ``cachename``.
"""

import os


def _nameList(datanames):
    if datanames is None:
        return ["data"]

    return list(datanames) if isinstance(datanames, (list, tuple)) else [datanames]


class DataLoader:
    def __init__(self, datanames=None, cachename=None):
        self.cachename = cachename
        self.datanames = _nameList(datanames)

    def clear(self):
        if self.cachename is not None and os.path.exists(self.cachename):
            os.remove(self.cachename)
