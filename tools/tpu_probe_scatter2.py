"""Variants of the factorized one-hot matmul backward, to find the fast one.

V0  pure matmul ceiling: [600,16384]x[16384,1536] bf16 (no one-hot build)
V1  per-d loop, all bf16 (current scatter_free)
V2  single matmul, D folded into lanes: rhs [N, LO*D]
V3  V2 with one-hot built as int8->bf16
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HW, D, N = 307200, 3, 16384
LO = 512
HI = HW // LO


def timed(fn, carry, K=10, reps=4, probe=None):
    import jax

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    c = run(carry)
    float(np.asarray(probe(c) if probe else c))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(c)
        float(np.asarray(probe(c) if probe else c))
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu"
    results = {}

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, HW, jnp.int32)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)

    a_hi0 = jax.random.normal(key, (HI, N), jnp.bfloat16)
    r0 = jax.random.normal(key, (N, LO * D), jnp.bfloat16)

    # V0: matmul ceiling
    def v0(carry):
        acc, = carry
        out = jax.lax.dot_general(a_hi0, r0, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (acc + jnp.sum(out) * 1e-9,)

    ms = timed(v0, (jnp.zeros(()),), probe=lambda c: c[0])
    results["V0_matmul_ceiling_ms"] = round(ms, 3)
    log(f"V0 matmul ceiling: {ms:.3f} ms")

    # V1: per-d loop (current implementation)
    def dense_v1(idx, g):
        hi = idx // LO
        lo = idx % LO
        a_hi = (hi[None, :] == jnp.arange(HI, dtype=jnp.int32)[:, None]
                ).astype(jnp.bfloat16)
        a_lo = (lo[None, :] == jnp.arange(LO, dtype=jnp.int32)[:, None]
                ).astype(jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        planes = []
        for d in range(D):
            b_d = a_lo * gb[:, d][None, :]
            planes.append(jax.lax.dot_general(
                a_hi, b_d, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.stack(planes, axis=-1).reshape(HW, D)

    def v1(carry):
        acc, = carry
        out = dense_v1(idx, g)
        return (acc + jnp.sum(out) * 1e-9,)

    ms = timed(v1, (jnp.zeros(()),), probe=lambda c: c[0])
    results["V1_per_d_loop_ms"] = round(ms, 3)
    log(f"V1 per-d loop: {ms:.3f} ms")

    # V2: single matmul, rhs [N, LO*D]
    def dense_v2(idx, g):
        hi = idx // LO
        lo = idx % LO
        a_hi = (hi[None, :] == jnp.arange(HI, dtype=jnp.int32)[:, None]
                ).astype(jnp.bfloat16)
        onehot_lo = (lo[:, None] == jnp.arange(LO, dtype=jnp.int32)[None, :]
                     ).astype(jnp.bfloat16)  # [N, LO]
        gb = g.astype(jnp.bfloat16)
        rhs = (onehot_lo[:, :, None] * gb[:, None, :]).reshape(N, LO * D)
        out = jax.lax.dot_general(a_hi, rhs, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.reshape(HW, D)

    def v2(carry):
        acc, = carry
        out = dense_v2(idx, g)
        return (acc + jnp.sum(out) * 1e-9,)

    ms = timed(v2, (jnp.zeros(()),), probe=lambda c: c[0])
    results["V2_single_matmul_ms"] = round(ms, 3)
    log(f"V2 single matmul: {ms:.3f} ms")

    # correctness vs scatter
    dense_ref = jnp.zeros((HW, D)).at[idx].add(g)
    e1 = float(jnp.max(jnp.abs(dense_ref - dense_v1(idx, g))))
    e2 = float(jnp.max(jnp.abs(dense_ref - dense_v2(idx, g))))
    gmax = float(jnp.max(jnp.abs(dense_ref)))
    results["V1_err"] = e1
    results["V2_err"] = e2
    log(f"errs (max |dense|={gmax:.2f}): V1 {e1:.2e}  V2 {e2:.2e}")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
