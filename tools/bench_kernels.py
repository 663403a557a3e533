"""A/B harness: Pallas kernels vs plain-XLA equivalents (SURVEY.md §7 step 7:
kernels must justify themselves against the roofline — keep the winner).

Run on the real chip:  python tools/bench_kernels.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(jfn, *args, iters=20):
    import jax.numpy as jnp

    r = jfn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    rs = [jfn(*args) for _ in range(iters)]
    float(jnp.sum(rs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.pallas.dense_head import dense_head_pallas
    from roomnet_tpu.params import schema

    v = schema.unflatten_variables(dict(np.load("artifacts/roomnet_params.npz")))

    def xla_head(dense, x):
        h = x
        for li in range(3):
            h = B.relu6(B.dense(h, dense[li]["kernel"]))
            h = B.batch_norm(h, dense[li]["bn"])
        logits = B.relu6(B.dense(h, dense[3]["kernel"], dense[3]["bias"]))
        return jax.nn.softmax(logits, -1)

    xla_jit = jax.jit(xla_head)
    print("== dense head: pallas vs xla ==")
    for bsz in (8, 64, 256, 2048):
        x = jnp.asarray(np.random.RandomState(0).randn(bsz, 64).astype(np.float32))
        t_p = timeit(lambda x: dense_head_pallas(v["dense"], x), x)
        t_x = timeit(lambda x: xla_jit(v["dense"], x), x)
        keep = "PALLAS" if t_p < t_x else "XLA"
        print(f"batch {bsz:5d}: pallas {t_p:7.3f} ms | xla {t_x:7.3f} ms -> keep {keep}")


if __name__ == "__main__":
    main()
