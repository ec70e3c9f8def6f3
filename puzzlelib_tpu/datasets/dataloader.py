"""Loader base with HDF5 caching (reference: /root/reference/Datasets/DataLoader.py)."""

import os


class DataLoader:
    def __init__(self, datanames=None, cachename=None):
        self.cachename = cachename

        if datanames is None:
            self.datanames = ["data"]
        elif isinstance(datanames, (list, tuple)):
            self.datanames = list(datanames)
        else:
            self.datanames = [datanames]

    def clear(self):
        if self.cachename is not None and os.path.exists(self.cachename):
            os.remove(self.cachename)
