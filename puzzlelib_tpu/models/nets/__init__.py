"""Model zoo builders (parity with /root/reference/Models/Nets/__init__.py)."""

from puzzlelib_tpu.models.nets.lenet import loadLeNet
from puzzlelib_tpu.models.nets.nin import loadNiNImageNet
from puzzlelib_tpu.models.nets.vgg import loadVGG
from puzzlelib_tpu.models.nets.resnet import loadResNet
from puzzlelib_tpu.models.nets.unet import loadUNet
from puzzlelib_tpu.models.nets.sentinet import loadSentiNet
from puzzlelib_tpu.models.nets.wavetoletter import loadW2L
from puzzlelib_tpu.models.nets.inception import loadInceptionBN, loadInceptionV3
from puzzlelib_tpu.models.nets.miniyolo import loadMiniYolo
from puzzlelib_tpu.models.nets.openposecoco import loadCOCO
from puzzlelib_tpu.models.nets.openposempi import loadMPI
