"""Elementwise kernel dispatch (reference: /root/reference/Backend/Kernels/ElementWise.py).

Kernel factories keep the reference's ``ker(dtype)(out, in, ...)`` calling
convention: the returned callable computes one fused XLA op and writes the
result into the output wrapper.  ``slice=`` applies the op to a slice of the
flattened arrays (pass-through elsewhere), as the CUDA strided-slice
ElementwiseKernel variant did (/root/reference/Cuda/SourceModule.py:203).
"""

from puzzlelib_tpu.ops import elementwise as ew


def _applySliced(fn, out, inputs, args, slc):
    if slc is None:
        out._write(fn(*[i.jax for i in inputs], *args))
        return

    first = inputs[0].jax.ravel()
    rest = [i.jax.ravel()[slc] for i in inputs[1:]]

    result = first.at[slc].set(fn(first[slc], *rest, *args))
    out._write(result.reshape(out.shape))


def _unary(fn):
    def factory(dtype):
        def kernel(outdata, indata, *args, slice=None, stream=None):
            _applySliced(fn, outdata, (indata, ), args, slice)

        return kernel

    return factory


def _binary(fn):
    def factory(dtype):
        def kernel(ingrad, outgrad, outdata, *args, slice=None, stream=None):
            _applySliced(fn, ingrad, (outgrad, outdata), args, slice)

        return kernel

    return factory


sigmoidKer = _unary(ew.sigmoid)
sigmoidDerKer = _binary(ew.sigmoidDer)
tanhKer = _unary(ew.tanh)
tanhDerKer = _binary(ew.tanhDer)
reluKer = _unary(ew.relu)
reluDerKer = _binary(ew.reluDer)
leakyReluKer = _unary(ew.leakyRelu)
leakyReluDerKer = _binary(ew.leakyReluDer)
eluKer = _unary(ew.elu)
eluDerKer = _binary(ew.eluDer)
softPlusKer = _unary(ew.softPlus)
softPlusDerKer = _binary(ew.softPlusDer)
clipKer = _unary(ew.clip)
clipDerKer = _binary(ew.clipDer)
geluKer = _unary(ew.gelu)
geluDerKer = _binary(ew.geluDer)  # note: derives from *input* data, as in reference


def dropoutKer(dtype):
    def kernel(outdata, indata, b, v, p, slice=None, stream=None):
        if slice is None:
            outdata._write(ew.dropout(indata.jax, b.jax, v, p))
        else:
            xf, bf = indata.jax.ravel(), b.jax.ravel()
            outdata._write(xf.at[slice].set(ew.dropout(xf[slice], bf[slice], v, p)).reshape(outdata.shape))

    return kernel


def dropout2dKer(dtype):
    def kernel(outdata, indata, b, v, p, mapsize=None, slice=None, stream=None):
        outdata._write(ew.dropout2d(indata.jax, b.jax.reshape(indata.shape[:2]), v, p))

    return kernel


def rbmKer(outdata, indata, uni, stream=None):
    outdata._write(ew.rbm(indata.jax, uni.jax))


def absKer(outdata, indata, stream=None):
    outdata._write(ew.absval(indata.jax))


def toVectorAddVectorKer(dtype):
    def kernel(y, x, alpha, stream=None):
        y._write(ew.toVectorAddVector(y.jax, x.jax, alpha))

    return kernel


def addKer(dtype):
    def kernel(outdata, a, alpha, b, beta, slice=None, stream=None):
        if slice is None:
            outdata._write(ew.add(a.jax, alpha, b.jax, beta))
        else:
            af, bf = a.jax.ravel(), b.jax.ravel()
            outdata._write(af.at[slice].set(ew.add(af[slice], alpha, bf[slice], beta)).reshape(outdata.shape))

    return kernel


def mulKer(dtype):
    def kernel(outdata, a, b, slice=None, stream=None):
        if slice is None:
            outdata._write(ew.mul(a.jax, b.jax))
        else:
            af, bf = a.jax.ravel(), b.jax.ravel()
            outdata._write(af.at[slice].set(ew.mul(af[slice], bf[slice])).reshape(outdata.shape))

    return kernel


def linearKer(dtype):
    def kernel(outdata, indata, a, b, slice=None, stream=None):
        _applySliced(ew.linear, outdata, (indata, ), (a, b), slice)

    return kernel


def weightDecayKer(grad, param, rate, stream=None):
    grad._write(ew.weightDecay(grad.jax, param.jax, rate))


def gradClipKer(grad, maxnorm, stream=None):
    grad._write(ew.gradClipNorm(grad.jax, maxnorm))


def l1penaltyKer(outgrad, ingrad, data, a, stream=None):
    outgrad._write(ew.l1penalty(ingrad.jax, data.jax, a))


def l1gradKer(grad, pred, target, norm, stream=None):
    grad._write(ew.l1grad(pred.jax, target.jax, norm))


def castFP16toFP32(outdata, indata):
    import jax.numpy as jnp
    outdata._write(indata.jax.astype(jnp.float32))


def castFP32toFP16(outdata, indata):
    import jax.numpy as jnp
    outdata._write(indata.jax.astype(jnp.float16))


# -- fused optimizer steps ---------------------------------------------------

def classicMomSGDKer(dtype):
    def kernel(param, grad, mom, learnRate, momRate, stream=None):
        p, m = ew.classicMomSGD(param.jax, grad.jax, mom.jax, learnRate, momRate)
        param._write(p)
        mom._write(m)

    return kernel


def nesterovMomSGDKer(dtype):
    def kernel(param, grad, mom, learnRate, momRate, stream=None):
        p, m = ew.nesterovMomSGD(param.jax, grad.jax, mom.jax, learnRate, momRate)
        param._write(p)
        mom._write(m)

    return kernel


def adagradKer(dtype):
    def kernel(param, grad, h, learnRate, epsilon, stream=None):
        p, hh = ew.adagrad(param.jax, grad.jax, h.jax, learnRate, epsilon)
        param._write(p)
        h._write(hh)

    return kernel


def adadeltaKer(dtype):
    def kernel(param, grad, msg, msdx, rho, epsilon, stream=None):
        p, g, d = ew.adadelta(param.jax, grad.jax, msg.jax, msdx.jax, rho, epsilon)
        param._write(p)
        msg._write(g)
        msdx._write(d)

    return kernel


def adamKer(dtype):
    def kernel(param, grad, mg, ms, learnRate, fix1, fix2, epsilon, stream=None):
        p, g, s = ew.adam(param.jax, grad.jax, mg.jax, ms.jax, learnRate, fix1, fix2, epsilon)
        param._write(p)
        mg._write(g)
        ms._write(s)

    return kernel


def rmspropKer(dtype):
    def kernel(param, grad, ms, learnRate, factor, epsilon, stream=None):
        p, s = ew.rmsprop(param.jax, grad.jax, ms.jax, learnRate, factor, epsilon)
        param._write(p)
        ms._write(s)

    return kernel


def rmspropGravesKer(dtype):
    def kernel(param, grad, mg, ms, delta, learnRate, alpha, momRate, epsilon, stream=None):
        p, g, s, d = ew.rmspropGraves(param.jax, grad.jax, mg.jax, ms.jax, delta.jax,
                                      learnRate, alpha, momRate, epsilon)
        param._write(p)
        mg._write(g)
        ms._write(s)
        delta._write(d)

    return kernel


def smorms3Ker(dtype):
    def kernel(param, grad, mem, mg, ms, learnRate, epsilon, stream=None):
        p, m, g, s = ew.smorms3(param.jax, grad.jax, mem.jax, mg.jax, ms.jax, learnRate, epsilon)
        param._write(p)
        mem._write(m)
        mg._write(g)
        ms._write(s)

    return kernel
