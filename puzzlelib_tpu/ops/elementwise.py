"""Elementwise primitives: activations (value + derivative-from-output),
fused optimizer steps, and small vector ops.

Behavioral contracts follow the reference kernel set
(/root/reference/Backend/Kernels/ElementWise.py:4-43, formulas at
/root/reference/CPU/Kernels/ElementWise.py) - e.g. optimizer steps *add* the
update because costs produce descent-direction gradients.  Each is one fused
XLA computation (VPU work; scalar hyper-parameters stay dynamic so LR decay
never retraces).
"""

import jax
import jax.numpy as jnp


def _one(x):
    return jnp.asarray(1, x.dtype)


# -- activations: fwd(x, *args) and der(outgrad, outdata, *args) -------------

@jax.jit
def sigmoid(x):
    return jax.nn.sigmoid(x)


@jax.jit
def sigmoidDer(grad, out):
    return grad * out * (_one(out) - out)


@jax.jit
def tanh(x):
    return jnp.tanh(x)


@jax.jit
def tanhDer(grad, out):
    return grad * (_one(out) - out * out)


@jax.jit
def relu(x):
    return jnp.maximum(x, 0)


@jax.jit
def reluDer(grad, out):
    return grad * (out > 0).astype(grad.dtype)


@jax.jit
def leakyRelu(x, a):
    return jnp.where(x > 0, x, x * jnp.asarray(a, x.dtype))


@jax.jit
def leakyReluDer(grad, out, a):
    return grad * jnp.where(out > 0, _one(out), jnp.asarray(a, out.dtype))


@jax.jit
def elu(x, a):
    a = jnp.asarray(a, x.dtype)
    return jnp.where(x > 0, x, a * jnp.expm1(x))


@jax.jit
def eluDer(grad, out, a):
    a = jnp.asarray(a, out.dtype)
    return grad * jnp.where(out > 0, _one(out), out + a)


@jax.jit
def softPlus(x):
    return jnp.log1p(jnp.exp(x))


@jax.jit
def softPlusDer(grad, out):
    return grad * (_one(out) - jnp.exp(-out))


@jax.jit
def clip(x, a, b):
    return jnp.clip(x, jnp.asarray(a, x.dtype), jnp.asarray(b, x.dtype))


@jax.jit
def clipDer(grad, out, a, b):
    a, b = jnp.asarray(a, out.dtype), jnp.asarray(b, out.dtype)
    return grad * ((out > a) & (out < b)).astype(grad.dtype)


@jax.jit
def gelu(x):
    # tanh approximation, matching the reference CUDA kernel (Cuda/Backend.py gelu)
    f = jnp.asarray(0.7978845608028654, x.dtype)  # sqrt(2/pi)
    c = jnp.asarray(0.044715, x.dtype)
    half = jnp.asarray(0.5, x.dtype)
    return half * x * (_one(x) + jnp.tanh(f * (x + c * x * x * x)))


@jax.jit
def geluDer(grad, x):
    f = jnp.asarray(0.7978845608028654, x.dtype)
    c = jnp.asarray(0.044715, x.dtype)
    half = jnp.asarray(0.5, x.dtype)

    t = jnp.tanh(f * (x + c * x * x * x))
    dt = (_one(x) - t * t) * f * (_one(x) + 3 * c * x * x)
    return grad * (half * (_one(x) + t) + half * x * dt)


# -- dropout / noise ---------------------------------------------------------

@jax.jit
def dropout(x, b, v, p):
    keep = (b < v).astype(x.dtype)
    return x * keep / jnp.asarray(p, x.dtype)


@jax.jit
def dropout2d(x, b, v, p):
    # b has shape (batch, maps); broadcast over the spatial dims of x
    keep = (b < v).astype(x.dtype).reshape(b.shape + (1, ) * (x.ndim - b.ndim))
    return x * keep / jnp.asarray(p, x.dtype)


@jax.jit
def rbm(x, uni):
    return (uni < jax.nn.sigmoid(x)).astype(x.dtype)


# -- vector ops --------------------------------------------------------------

@jax.jit
def toVectorAddVector(y, x, alpha):
    return y + x * jnp.asarray(alpha, y.dtype)


@jax.jit
def add(a, alpha, b, beta):
    return jnp.asarray(alpha, a.dtype) * a + jnp.asarray(beta, b.dtype) * b


@jax.jit
def mul(a, b):
    return a * b


@jax.jit
def linear(x, a, b):
    return jnp.asarray(a, x.dtype) * x + jnp.asarray(b, x.dtype)


@jax.jit
def absval(x):
    return jnp.abs(x)


@jax.jit
def l1penalty(ingrad, data, a):
    return ingrad - jnp.asarray(a, data.dtype) * jnp.where(data >= 0, _one(data), -_one(data))


@jax.jit
def l1grad(pred, target, norm):
    norm = jnp.asarray(norm, pred.dtype)
    return jnp.where(pred > target, -norm, norm)


@jax.jit
def weightDecay(grad, param, rate):
    return grad - jnp.asarray(rate, grad.dtype) * param


@jax.jit
def gradClipNorm(grad, maxnorm):
    norm = jnp.sqrt(jnp.sum(jnp.square(grad.astype(jnp.float32))))
    scale = jnp.minimum(1.0, jnp.asarray(maxnorm, jnp.float32) / jnp.maximum(norm, 1e-12))
    return grad * scale.astype(grad.dtype)


# -- fused optimizer steps (all return updated tensors; all ADD the step) ----

@jax.jit
def classicMomSGD(param, grad, mom, learnRate, momRate):
    mom = jnp.asarray(momRate, mom.dtype) * mom + jnp.asarray(learnRate, grad.dtype) * grad
    return param + mom, mom


@jax.jit
def nesterovMomSGD(param, grad, mom, learnRate, momRate):
    lr, mr = jnp.asarray(learnRate, grad.dtype), jnp.asarray(momRate, mom.dtype)

    newmom = mr * mom + lr * grad
    param = param + mr * mr * mom + (1 + mr) * lr * grad
    return param, newmom


@jax.jit
def adagrad(param, grad, h, learnRate, epsilon):
    lr, eps = jnp.asarray(learnRate, grad.dtype), jnp.asarray(epsilon, grad.dtype)

    h = h + grad * grad
    param = param + lr * grad / (jnp.sqrt(h) + eps)
    return param, h


@jax.jit
def adadelta(param, grad, msg, msdx, rho, epsilon):
    rho, eps = jnp.asarray(rho, grad.dtype), jnp.asarray(epsilon, grad.dtype)

    msg = msg + (1 - rho) * (grad * grad - msg)
    dx = jnp.sqrt((msdx + eps) / (msg + eps)) * grad
    msdx = msdx + (1 - rho) * (dx * dx - msdx)
    return param + dx, msg, msdx


@jax.jit
def adam(param, grad, mg, ms, learnRate, fix1, fix2, epsilon):
    lr, eps = jnp.asarray(learnRate, grad.dtype), jnp.asarray(epsilon, grad.dtype)
    f1, f2 = jnp.asarray(fix1, grad.dtype), jnp.asarray(fix2, grad.dtype)

    mg = mg + f1 * (grad - mg)
    ms = ms + f2 * (grad * grad - ms)
    param = param + lr * mg / (jnp.sqrt(ms) + eps)
    return param, mg, ms


@jax.jit
def rmsprop(param, grad, ms, learnRate, factor, epsilon):
    lr, eps = jnp.asarray(learnRate, grad.dtype), jnp.asarray(epsilon, grad.dtype)
    f = jnp.asarray(factor, grad.dtype)

    ms = f * ms + (1 - f) * grad * grad
    param = param + lr * grad / (jnp.sqrt(ms) + eps)
    return param, ms


@jax.jit
def rmspropGraves(param, grad, mg, ms, delta, learnRate, alpha, momRate, epsilon):
    lr, eps = jnp.asarray(learnRate, grad.dtype), jnp.asarray(epsilon, grad.dtype)
    a, mr = jnp.asarray(alpha, grad.dtype), jnp.asarray(momRate, grad.dtype)

    ms = a * ms + (1 - a) * grad * grad
    mg = a * mg + (1 - a) * grad
    delta = mr * delta + lr * grad / jnp.sqrt(ms - mg * mg + eps)
    return param + delta, mg, ms, delta


@jax.jit
def smorms3(param, grad, mem, mg, ms, learnRate, epsilon):
    lr, eps = jnp.asarray(learnRate, grad.dtype), jnp.asarray(epsilon, grad.dtype)

    r = 1 / (mem + 1)
    mg = (1 - r) * mg + r * grad
    ms = (1 - r) * ms + r * grad * grad
    x = mg * mg / (ms + eps)

    mem = 1 + mem * (1 - x)
    param = param + grad * jnp.minimum(lr, x) / (jnp.sqrt(ms) + eps)
    return param, mem, mg, ms
