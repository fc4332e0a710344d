"""Which Pallas forms compile AND run on this v5e (axon remote-compile)?
Each case is minimal and isolated; prints OK/FAIL + one-line reason.
Run:  python scripts/tpu_r2_pallas_forms.py [case ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
CASES = {}


def case(fn):
    CASES[fn.__name__] = fn
    return fn


def report(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        print(f"{name:40s} OK")
        return True
    except Exception as e:  # noqa
        msg = " | ".join(str(e).split(chr(10))[:2])[:180]
        print(f"{name:40s} FAIL {type(e).__name__}: {msg}")
        return False


@case
def minimal():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1
    x = jnp.zeros((8, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


@case
def grid_stream():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1
    x = jnp.zeros((2048 * 64, 128), I32)
    return pl.pallas_call(
        k, grid=(2048,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2048 * 64, 128), I32))(x)


@case
def taa_8x128():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 128, axis=1)
    t = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    ix = jnp.ones((8, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, ix)


@case
def taa_64x128():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 128, axis=1)
    t = jnp.arange(64 * 128, dtype=I32).reshape(64, 128)
    ix = jnp.ones((64, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, ix)


@case
def taa_8x256():
    def k(t_ref, i_ref, o_ref):
        g = jnp.take_along_axis(t_ref[:], i_ref[:] % 256, axis=1)
        o_ref[:] = g
    t = jnp.arange(8 * 256, dtype=I32).reshape(8, 256)
    ix = jnp.ones((8, 256), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 256), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, ix)


@case
def taa_axis0():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 8, axis=0)
    t = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    ix = jnp.ones((8, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, ix)


@case
def taa_axis0_32x128():
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % 32, axis=0)
    t = jnp.arange(32 * 128, dtype=I32).reshape(32, 128)
    ix = jnp.ones((32, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((32, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, ix)


@case
def roll_static():
    def k(x_ref, o_ref):
        acc = x_ref[:]
        for r in range(1, 4):
            acc = acc + pltpu.roll(x_ref[:], r, 1)
        o_ref[:] = acc
    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


@case
def masked_store():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        v = x_ref[:]
        pltpu.store(o_ref, v, mask=(v & 1) == 0)
    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


@case
def smem_cursor_dma():
    def k(x_ref, o_ref, cur, vbuf, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cur[0] = 0
        c = cur[0]
        vbuf[:] = x_ref[:] + 1
        dma = pltpu.make_async_copy(vbuf, o_ref.at[pl.ds(c, 8), :], sem)
        dma.start()
        dma.wait()
        cur[0] = c + 8

    x = jnp.ones((16 * 8, 128), I32)
    return pl.pallas_call(
        k, grid=(16,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((16 * 8 + 8, 128), I32),
        scratch_shapes=[pltpu.SMEM((1,), I32), pltpu.VMEM((8, 128), I32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x)


@case
def smem_cursor_dynamic_count():
    # dynamic store offset driven by data (true compacted-emit pattern)
    def k(x_ref, n_ref, o_ref, cur, vbuf, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cur[0] = 0
        c = cur[0]
        vbuf[:] = x_ref[:]
        dma = pltpu.make_async_copy(vbuf, o_ref.at[pl.ds(c, 8), :], sem)
        dma.start()
        dma.wait()
        cur[0] = c + n_ref[i]

    x = jnp.ones((16 * 8, 128), I32)
    n = jnp.full((16,), 4, I32)
    return pl.pallas_call(
        k, grid=(16,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((16 * 8 + 8, 128), I32),
        scratch_shapes=[pltpu.SMEM((1,), I32), pltpu.VMEM((8, 128), I32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x, n)


@case
def onehot_matmul():
    def k(b_ref, o_ref):
        b = b_ref[:].reshape(b_ref.shape[1], 1)
        onehot = (b == jax.lax.broadcasted_iota(I32, (b.shape[0], 256), 1)).astype(jnp.float32)
        o_ref[:] = jnp.sum(onehot, axis=0, keepdims=True).astype(I32)
    b = jnp.zeros((1, 1024), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1, 256), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(b)


@case
def cumsum_in_kernel():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)
    x = jnp.ones((8, 128), I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


@case
def dynamic_slice_lane():
    # dynamic start lane read within a vreg row
    def k(x_ref, s_ref, o_ref):
        s = s_ref[0]
        o_ref[:] = x_ref[:, pl.ds(s, 128)]
    x = jnp.arange(8 * 256, dtype=I32).reshape(8, 256)
    s = jnp.array([7], I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                    pl.BlockSpec(memory_space=pltpu.SMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, s)




@case
def dynamic_roll_lane():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 1)
    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    s = jnp.array([5], I32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.SMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, s)
    assert np.asarray(out)[0, 5] == 0, np.asarray(out)[0, :8]
    return out


@case
def dynamic_roll_sublane():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 0)
    x = jnp.arange(64 * 128, dtype=I32).reshape(64, 128)
    s = jnp.array([3], I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                    pl.BlockSpec(memory_space=pltpu.SMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, s)


@case
def dynamic_roll_2d_flat():
    # roll a (64,128) tile by a dynamic LANE amount as if flattened:
    # implement as lane-roll + conditional sublane shift of the wrapped part
    def k(x_ref, s_ref, o_ref):
        sh = s_ref[0]
        r = pltpu.roll(x_ref[:], sh, 1)
        rs = pltpu.roll(r, 1, 0)
        lane = jax.lax.broadcasted_iota(I32, r.shape, 1)
        o_ref[:] = jnp.where(lane < sh, rs, r)
    x = jnp.arange(64 * 128, dtype=I32).reshape(64, 128)
    s = jnp.array([5], I32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64, 128), I32),
                          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                    pl.BlockSpec(memory_space=pltpu.SMEM)],
                          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, s)


@case
def log_shift_cumsum():
    # in-kernel inclusive cumsum along 128 lanes via 7 static rolls
    def k(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(I32, v.shape, 1)
        for sh in (1, 2, 4, 8, 16, 32, 64):
            v = v + jnp.where(lane >= sh, pltpu.roll(v, sh, 1), 0)
        o_ref[:] = v
    x = jnp.ones((8, 128), I32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    assert np.asarray(out)[0, -1] == 128, np.asarray(out)[0, -5:]
    return out


@case
def scalar_prefetch_window_dma():
    # per-bucket dynamic window read: DMA in[start[b] : start[b]+8, :] per step
    def k(starts_ref, hbm_ref, o_ref, vbuf, sem):
        b = pl.program_id(0)
        st = starts_ref[b]
        dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(st, 8), :], vbuf, sem)
        dma.start()
        dma.wait()
        o_ref[:] = vbuf[:] + 1

    x = jnp.arange(128 * 128, dtype=I32).reshape(128, 128)
    starts = jnp.arange(16, dtype=I32) * 7
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(16,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), I32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(k, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((16 * 8, 128), I32))(starts, x)


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for nm in names:
        report(nm, CASES[nm])
