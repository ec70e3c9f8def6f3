from puzzlelib_tpu.models.misc.rbm import RBM
