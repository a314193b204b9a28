"""Raw v5e VPU rate probe for the dense-align inner op sequence.

Measures a VMEM-resident Pallas loop doing exactly the dense-align pair op
(acc += min(t, |a*x - y|)) with NO HBM traffic in the loop — the
speed-of-light for the dense truncated-align objective on this chip. Also a
plain fma loop (acc += a*x + y) for the generic VPU ALU rate.

Usage:  python tools/exp_vpu_ceiling.py
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    S, LN = 256, 512           # resident tile: 256 sublane-groups x 512 lanes
    ITERS = 2000               # inner loop count

    def make(kind):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[...]
            y = y_ref[...]

            def body(i, acc):
                a = jnp.float32(1.0) + i * jnp.float32(1e-6)
                if kind == "align":
                    return acc + jnp.minimum(jnp.float32(1.0), jnp.abs(a * x - y))
                return acc + (a * x + y)

            o_ref[...] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, LN), jnp.float32))

        @jax.jit
        def run(x, y):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, LN), jnp.float32),
            )(x, y)

        return run

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, LN)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(S, LN)).astype(np.float32))
    scalar = lambda o: float(jnp.asarray(o).ravel()[0])

    for kind, ops_per in [("align", 5), ("fma", 3)]:
        run = make(kind)
        scalar(run(x, y))
        per = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = run(x, y)
            scalar(out)
            per.append((time.perf_counter() - t0) / 10)
        ms = min(per) * 1e3
        elems = S * LN * ITERS
        print(f"{kind:6s}: {ms:7.3f} ms for {elems/1e6:.0f} Melem-iters "
              f"-> {elems/ms/1e9:.2f} Telem/s ({elems*ops_per/ms/1e9:.2f} Top/s at {ops_per} ops/elem)",
              flush=True)


if __name__ == "__main__":
    main()
