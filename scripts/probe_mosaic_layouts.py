"""Micro-probes for the Mosaic constraints behind the stream2 compile
failure (round 4): which DMA slice shapes and matmul operand orders
actually compile on the chip.

  dma64    HBM [4,640,64]  -> VMEM [640,64]   (current stream2 — expect
           the 'slice along dim 2 must be aligned to 128' failure)
  dma128   HBM [4,640,128] -> VMEM [640,128]  (K padded to a full lane
           tile)
  dmaT     HBM [4,64,640]  -> VMEM [64,640]   (K-major transposed layout
           — byte-compact AND lane-aligned)
  dotT     dot_general contracting lhs dim 0: [64,640]^T @ [64,128]
           (the matmul the transposed layout needs)
  dot128   jnp.dot([640,128] @ [128,128]) baseline

Each probe compiles in isolation and prints OK/FAIL + the error head.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(tag, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{tag}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:240]
        print(f"{tag}: FAIL {msg}", flush=True)
        return False


def dma_probe(hbm_shape, slot_shape):
    def kern(src, out, slot, sem):
        pltpu.make_async_copy(src.at[2], slot, sem).start()
        pltpu.make_async_copy(src.at[2], slot, sem).wait()
        out[...] = slot[...].astype(jnp.float32)[:8, :128]

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM(slot_shape, jnp.bfloat16),
                            pltpu.SemaphoreType.DMA],
        )(x)

    return run


def main():
    print("devices:", jax.devices(), flush=True)

    x64 = jnp.zeros((4, 640, 64), jnp.bfloat16)
    x128 = jnp.zeros((4, 640, 128), jnp.bfloat16)
    xT = jnp.zeros((4, 64, 640), jnp.bfloat16)

    probe("dma64", dma_probe((4, 640, 64), (640, 64)), x64)
    probe("dma128", dma_probe((4, 640, 128), (640, 128)), x128)
    probe("dmaT", dma_probe((4, 64, 640), (64, 640)), xT)

    def dotT_kern(a_ref, b_ref, o_ref):
        prod = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = prod[:, :128]

    def dotT(a, b):
        return pl.pallas_call(
            dotT_kern,
            out_shape=jax.ShapeDtypeStruct((640, 128), jnp.float32),
        )(a, b)

    probe("dotT", dotT, jnp.zeros((64, 640), jnp.bfloat16),
          jnp.zeros((64, 128), jnp.bfloat16))

    def dot128_kern(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    def dot128(a, b):
        return pl.pallas_call(
            dot128_kern,
            out_shape=jax.ShapeDtypeStruct((640, 128), jnp.float32),
        )(a, b)

    probe("dot128", dot128, jnp.zeros((640, 128), jnp.bfloat16),
          jnp.zeros((128, 128), jnp.bfloat16))


if __name__ == "__main__":
    main()
