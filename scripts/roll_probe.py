"""Isolate which lane-manipulation primitive crashes Mosaic on (M, 320)."""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, body, c=320, m=256):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...]).astype(o_ref.dtype)

    x = jnp.ones((m, c), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, c), jnp.bfloat16),
        )(x)
        out.block_until_ready()
        print(f"{name}: ok sum={float(jnp.sum(out.astype(jnp.float32))):.0f}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e).splitlines()[0][:100]}",
              flush=True)


def main():
    c = 320
    probe("roll64", lambda x: pltpu.roll(x, 64, 1))
    probe("roll256", lambda x: pltpu.roll(x, 256, 1))
    probe("roll128", lambda x: pltpu.roll(x, 128, 1))
    probe("slice0_64", lambda x: jnp.pad(x[:, 0:64], ((0, 0), (0, c - 64))))
    probe("slice64_128", lambda x: jnp.pad(x[:, 64:128], ((0, 0), (0, c - 64))))
    probe("slice128_192", lambda x: jnp.pad(x[:, 128:192], ((0, 0), (0, c - 64))))
    probe("pad_only", lambda x: jnp.pad(x[:, 0:64], ((0, 0), (0, c - 64))))
    probe("concat_heads", lambda x: jnp.concatenate(
        [x[:, 64 * h:64 * (h + 1)] for h in range(5)], axis=1))
    # bf16 vs f32 roll
    probe("roll64_f32", lambda x: pltpu.roll(x.astype(jnp.float32), 64, 1))
    print("done", flush=True)


if __name__ == "__main__":
    main()
