"""Dataset loaders (parity with /root/reference/Datasets/__init__.py)."""

from puzzlelib_tpu.datasets.dataloader import DataLoader
from puzzlelib_tpu.datasets.mnistloader import MnistLoader
from puzzlelib_tpu.datasets.cifar10loader import Cifar10Loader
from puzzlelib_tpu.datasets.imdbloader import IMDBLoader
from puzzlelib_tpu.datasets.smallnorbloader import SmallNorbLoader
from puzzlelib_tpu.datasets.inputloader import InputLoader
from puzzlelib_tpu.datasets.pathloader import PathLoader
from puzzlelib_tpu.datasets.tarloader import TarLoader
from puzzlelib_tpu.datasets.ziploader import ZipLoader
