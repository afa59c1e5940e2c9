"""Probe Mosaic's DMA slice alignment rules on the real chip.

Each probe is a minimal pallas_call; prints PASS/FAIL per probe.  Decides
the fused-kernel design for unaligned (window-offset) row shifts.
"""
from __future__ import annotations

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, CH, BR = 128, 256, 3, 32


def run(label, fn, *args):
    try:
        out = np.asarray(fn(*args))
        print(f"{label}: PASS (sum={out.sum():.1f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{label}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


# A: constant unaligned row offset DMA from HBM [CH, H, W].
def kernel_a(x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(3, BR), :], win, sem)
    cp.start()
    cp.wait()
    o_ref[...] = win[0]


def probe_a(x):
    return pl.pallas_call(
        kernel_a, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BR, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH, BR, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)


# B: dynamic row offset from SMEM, unaligned.
def kernel_b(off, x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(off[0], BR), :], win, sem)
    cp.start()
    cp.wait()
    o_ref[...] = win[0]


def probe_b(x, off):
    return pl.pallas_call(
        kernel_b, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BR, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH, BR, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(off, x)


# C: dynamic aligned row offset ((v//8)*8).
def kernel_c(off, x_hbm, o_ref, win, sem):
    al = (off[0] // 8) * 8
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(al, BR), :], win, sem)
    cp.start()
    cp.wait()
    o_ref[...] = win[0]


def probe_c(x, off):
    return pl.pallas_call(
        kernel_c, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BR, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH, BR, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(off, x)


# D: dynamic LANE offset DMA (rows aligned).
def kernel_d(off, x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(0, BR), pl.ds(off[0], 128)], win, sem)
    cp.start()
    cp.wait()
    o_ref[...] = win[0]


def probe_d(x, off):
    return pl.pallas_call(
        kernel_d, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH, BR, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(off, x)


# E: rows-outermost [H, CH, W]; dynamic row start (dim 0).
def kernel_e(off, x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off[0], BR)], win, sem)
    cp.start()
    cp.wait()
    o_ref[...] = win[:, 0, :]


def probe_e(x, off):
    return pl.pallas_call(
        kernel_e, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BR, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BR, CH, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(off, x)


# F: dynamic sublane roll of a VMEM value (pltpu.roll).
def kernel_f(off, x_ref, o_ref):
    r = pltpu.roll(x_ref[...], off[0], 0)
    o_ref[...] = r


def probe_f(x, off):
    return pl.pallas_call(
        kernel_f, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((BR, W), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BR, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
    )(off, x)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x3 = jax.random.uniform(key, (CH, H, W), jnp.float32)
    xe = jax.random.uniform(key, (H, CH, W), jnp.float32)
    x2 = jax.random.uniform(key, (BR, W), jnp.float32)
    off = jnp.asarray([3], jnp.int32)
    off128 = jnp.asarray([130], jnp.int32)
    run("A const-unaligned-row HBM DMA", jax.jit(probe_a), x3)
    run("B dyn-unaligned-row HBM DMA", jax.jit(probe_b), x3, off)
    run("C dyn-aligned-row ((v//8)*8) HBM DMA", jax.jit(probe_c), x3, off)
    run("D dyn-lane HBM DMA", jax.jit(probe_d), x3, off128)
    run("E rows-outermost dyn-row HBM DMA", jax.jit(probe_e), xe, off)
    run("F dynamic sublane roll (VMEM value)", jax.jit(probe_f), x2, off)


if __name__ == "__main__":
    main()
