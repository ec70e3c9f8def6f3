"""Cost exports (parity with /root/reference/Cost/__init__.py)."""

from puzzlelib_tpu.cost.abs import Abs
from puzzlelib_tpu.cost.bce import BCE
from puzzlelib_tpu.cost.crossentropy import CrossEntropy
from puzzlelib_tpu.cost.ctc import CTC
from puzzlelib_tpu.cost.hinge import Hinge
from puzzlelib_tpu.cost.kldivergence import KLDivergence
from puzzlelib_tpu.cost.l1hinge import L1Hinge
from puzzlelib_tpu.cost.mse import MSE
from puzzlelib_tpu.cost.multi import Multi
from puzzlelib_tpu.cost.smoothl1 import SmoothL1
from puzzlelib_tpu.cost.svm import SVM
from puzzlelib_tpu.cost.cost import Cost, CostError
