"""Image I/O + filter visualization.

API parity target: /root/reference/Visual.py — load images into NCHW float
tensors, dump tensors/filters back to image files, ZCA/PCA whitening.
"""

import io
import os

import numpy as np
from PIL import Image


class VisualError(Exception):
    pass


# -- loading ----------------------------------------------------------------------


def loadImage(filename, shape=None, normalize=True, mapsToFront=True, contiguous=True):
    return imageToArray(Image.open(filename), shape, normalize, mapsToFront, contiguous)


def loadImageFromBytes(bytebuffer, shape=None, normalize=True, mapsToFront=True, contiguous=True):
    return imageToArray(Image.open(io.BytesIO(bytebuffer)), shape, normalize, mapsToFront, contiguous)


def imageToArray(img, shape=None, normalize=True, mapsToFront=True, contiguous=True):
    if shape is not None:
        img = img.resize(shape, Image.LANCZOS)

    pixels = np.asarray(img, dtype=np.uint8)

    if pixels.ndim == 3 and pixels.shape[-1] == 4:
        pixels = pixels[..., :3]  # drop alpha

    if mapsToFront:
        # HWC -> 1CHW (grayscale gets a singleton channel)
        chw = pixels[np.newaxis] if pixels.ndim == 2 else np.rollaxis(pixels, 2)
        pixels = chw[np.newaxis]
    elif pixels.ndim == 2:
        pixels = pixels[..., np.newaxis]

    if normalize:
        pixels = pixels.astype(np.float32)
        peak = pixels.max()

        if peak > 0.0:
            pixels *= 2.0 / peak

        pixels -= 1.0  # [-1, 1] range

    return np.ascontiguousarray(pixels) if contiguous else pixels


# -- dumping ----------------------------------------------------------------------


def normalizeImageInplace(img):
    img -= img.min()
    peak = img.max()

    if peak > 0.0:
        img /= peak


def imageToInt(img):
    return (img * 255.0).astype(np.uint8)


def showImage(img, filename, rollMaps=True):
    if img.ndim == 4:
        if img.shape[0] != 1:
            raise VisualError("Image tensor must be exactly one image")

        img = img[0]

    out = img
    if img.dtype == np.float32:
        out = img.copy()
        normalizeImageInplace(out)

        if rollMaps and out.ndim == 3 and out.shape[0] > 1:
            out = np.rollaxis(out, 0, 3)  # CHW -> HWC for PIL

        out = imageToInt(out)

    Image.fromarray(out.squeeze()).save(filename)


def showImageBatch(batch, filebase, ext="png", rollMaps=True):
    if batch.ndim != 4:
        raise VisualError("Imagebatch tensor must be 4d tensor")

    suffix = ext.lstrip(".")
    for i, img in enumerate(batch, start=1):
        showImage(img, "%s-%d.%s" % (filebase, i, suffix), rollMaps)


def showImageBatchInFolder(batch, foldername, basename, ext="png", rollMaps=True):
    os.makedirs(foldername, exist_ok=True)
    showImageBatch(batch, os.path.join(foldername, basename), ext, rollMaps)


def showFilters(filters, filename, offset=4, normalize=True):
    outmaps, inmaps, fh, fw = filters.shape

    # each (outmap, inmap) plane becomes one grayscale tile, inmaps per row
    planes = filters.reshape(outmaps * inmaps, 1, fh, fw)
    showImageBasedFilters(planes, filename, cols=inmaps, offset=offset, normalize=normalize)


def showImageBasedFilters(filters, filename, cols=16, offset=4, normalize=True):
    count, maps, fh, fw = filters.shape

    if fh == fw == 1:
        print("Aborting showing 1x1 filters in file %s ..." % filename)
        return

    rows = -(-count // cols)
    mosaic = np.zeros((rows * (fh + offset) + offset, cols * (fw + offset) + offset, maps), dtype=np.uint8)

    for index, tile in enumerate(filters):
        if normalize:
            tile = tile.copy()
            normalizeImageInplace(tile)

        top = offset + (index // cols) * (fh + offset)
        left = offset + (index % cols) * (fw + offset)

        mosaic[top:top + fh, left:left + fw] = np.moveaxis(imageToInt(tile), 0, 2)

    Image.fromarray(mosaic.squeeze()).save(filename)


# -- preprocessing -----------------------------------------------------------------


def whiten(batch, epsilon=1e-2, PCA=False):
    shape = batch.shape
    flat = batch.reshape(shape[0], -1)
    flat -= flat.mean(axis=0, keepdims=True)

    covariance = (flat.T @ flat) / flat.shape[0]
    U, S, V = np.linalg.svd(covariance.astype(np.float32))

    transform = U * (1.0 / np.sqrt(S + epsilon))  # == U @ diag(...)
    if not PCA:
        transform = transform @ V  # rotate back: ZCA

    return (flat @ transform).reshape(shape)
