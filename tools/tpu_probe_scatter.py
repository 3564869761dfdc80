"""Microbenchmark: gather backward (scatter-add) strategies on TPU.

The loss gathers ~17k descriptor rows per image from [HW=307200, D=3]; the
autodiff backward is a scatter-add, measured to dominate the loss cost.
Times per-iteration (10 iters per lax.scan dispatch) of value_and_grad of
sum(take(p, idx)) under different formulations:

  S1  one take of 16384 random rows            (baseline scatter-add bwd)
  S2  four takes of 4096 rows each             (does fusing scatters matter?)
  S3  one take of 16384 SORTED rows            (does sortedness help XLA?)
  S4  custom VJP: bwd = sort + cumsum + searchsorted (scatter-free)
  S5  crude dense matmul bwd: one-hot in bf16 tiles (reference point)
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HW, D, N = 307200, 3, 16384


def timed(fn, carry, K=10, reps=4):
    import jax

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    c = run(carry)
    float(np.asarray(c[1]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(c)
        float(np.asarray(c[1]))
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu"
    results = {}

    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (HW, D), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, HW, jnp.int32)
    idx_sorted = jnp.sort(idx)

    def grad_step(lf):
        def step(carry):
            x, acc = carry
            val, g = jax.value_and_grad(lf)(x)
            return x + 0.0 * g, acc + val
        return step

    # S1: one big take
    def lf1(x):
        return jnp.sum(jnp.take(x, idx, axis=0) ** 2)

    ms = timed(grad_step(lf1), (p, jnp.zeros(())))
    results["S1_take16k_ms"] = round(ms, 2)
    log(f"S1 one take 16k: {ms:.2f} ms")

    # S2: four takes
    idxs = idx.reshape(4, N // 4)

    def lf2(x):
        return sum(jnp.sum(jnp.take(x, idxs[i], axis=0) ** 2)
                   for i in range(4))

    ms = timed(grad_step(lf2), (p, jnp.zeros(())))
    results["S2_4x4k_ms"] = round(ms, 2)
    log(f"S2 four takes 4k: {ms:.2f} ms")

    # S3: sorted indices
    def lf3(x):
        return jnp.sum(jnp.take(x, idx_sorted, axis=0) ** 2)

    ms = timed(grad_step(lf3), (p, jnp.zeros(())))
    results["S3_take16k_sorted_ms"] = round(ms, 2)
    log(f"S3 sorted take 16k: {ms:.2f} ms")

    # S4: custom VJP, scatter-free backward
    @jax.custom_vjp
    def take_rows(x, i):
        return jnp.take(x, i, axis=0)

    def take_fwd(x, i):
        return jnp.take(x, i, axis=0), i

    def take_bwd(i, g):
        # sort (idx, g) by idx, cumsum, then per-output-row boundary diff
        order = jnp.argsort(i)
        si = jnp.take(i, order)
        sg = jnp.take(g, order, axis=0)
        csum = jnp.concatenate([jnp.zeros((1, g.shape[1]), g.dtype),
                                jnp.cumsum(sg, axis=0)], axis=0)
        rows = jnp.arange(HW, dtype=jnp.int32)
        lo = jnp.searchsorted(si, rows, side="left")
        hi = jnp.searchsorted(si, rows, side="right")
        gx = jnp.take(csum, hi, axis=0) - jnp.take(csum, lo, axis=0)
        return gx, None

    take_rows.defvjp(take_fwd, take_bwd)

    def lf4(x):
        return jnp.sum(take_rows(x, idx) ** 2)

    ms = timed(grad_step(lf4), (p, jnp.zeros(())))
    results["S4_customvjp_sortcumsum_ms"] = round(ms, 2)
    log(f"S4 custom vjp sort+cumsum: {ms:.2f} ms")

    # S5: factorized one-hot matmul backward (pdc_tpu.ops.scatter_free)
    from pdc_tpu.ops.scatter_free import take_rows as take_mm

    def lf5(x):
        return jnp.sum(take_mm(x, idx) ** 2)

    ms = timed(grad_step(lf5), (p, jnp.zeros(())))
    results["S5_factored_onehot_mm_ms"] = round(ms, 2)
    log(f"S5 factored one-hot matmul: {ms:.2f} ms")
    g5 = jax.grad(lf5)(p)
    g1b = jax.grad(lf1)(p)
    results["S5_max_abs_err"] = float(jnp.max(jnp.abs(g1b - g5)))
    log(f"S5 grad max err vs S1: {results['S5_max_abs_err']:.2e}")

    # S5v: vmapped over 8 pairs (the shape the loss actually runs)
    B = 8
    pb = jax.random.normal(jax.random.PRNGKey(3), (B, HW, D), jnp.float32)
    idxb = jax.random.randint(jax.random.PRNGKey(4), (B, N), 0, HW, jnp.int32)

    def lf5v(x):
        return jnp.sum(jax.vmap(lambda xx, ii: jnp.sum(take_mm(xx, ii) ** 2))(
            x, idxb))

    def lf1v(x):
        return jnp.sum(jax.vmap(
            lambda xx, ii: jnp.sum(jnp.take(xx, ii, axis=0) ** 2))(x, idxb))

    def grad_stepv(lf):
        def step(carry):
            x, acc = carry
            val, g = jax.value_and_grad(lf)(x)
            return x + 0.0 * g, acc + val
        return step

    ms = timed(grad_stepv(lf1v), (pb, jnp.zeros(())))
    results["S1v_take_vmap8_ms"] = round(ms, 2)
    log(f"S1v scatter vmap8: {ms:.2f} ms")
    ms = timed(grad_stepv(lf5v), (pb, jnp.zeros(())))
    results["S5v_mm_vmap8_ms"] = round(ms, 2)
    log(f"S5v matmul vmap8: {ms:.2f} ms")

    # sanity: S4 grad == S1 grad
    g1 = jax.grad(lf1)(p)
    g4 = jax.grad(lf4)(p)
    err = float(jnp.max(jnp.abs(g1 - g4)))
    results["S4_max_abs_err"] = err
    log(f"S4 grad max err vs S1: {err:.2e}")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
