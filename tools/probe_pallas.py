"""Probe: does a Pallas TPU kernel compile+run over the axon tunnel?"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
print("backend", jax.default_backend(), jax.devices(), flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

@jax.jit
def f(x):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.ones((256, 256), jnp.float32)
t1 = time.time()
y = f(x)
y.block_until_ready()
print("pallas trivial ok, compile+run", round(time.time() - t1, 1), "s",
      float(y[0, 0]), flush=True)

# a stencil-ish kernel: shifted add along lanes via pltpu.roll
def stenc(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x + pltpu.roll(x, 1, 1) + pltpu.roll(x, -1, 1)

@jax.jit
def g(x):
    return pl.pallas_call(
        stenc,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

t1 = time.time()
z = g(x)
z.block_until_ready()
print("pallas roll-stencil ok", round(time.time() - t1, 1), "s",
      float(z[3, 3]), flush=True)
print("total", round(time.time() - t0, 1), "s", flush=True)
