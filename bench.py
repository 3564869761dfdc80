"""Benchmark: descriptor inference throughput at 640x480 (images/sec/chip).

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline value is the serving configuration: int8 PTQ convolutions
with STATIC calibrated activation scales (models/resnet.py ``Int8Conv`` —
s8 x s8 -> s32 on the MXU's 2x int8 path; the calibrated scales remove the
per-layer abs-max pass). Accuracy-neutral on the trained full-schedule
model — PCK parity artifacts committed under
trained_models/quantized_serving/ (static PCK@5 0.4054 vs bf16 0.3996).
The bf16 path is measured too and reported in the
``bf16_images_per_sec`` field (and stderr) — it is the number to compare
against rounds 1-2.

Timing notes:
  * the forward is fused with a scalar reduction and synchronized by fetching
    that scalar — ``block_until_ready`` alone does not reliably block through
    the axon TPU tunnel and reports physically-impossible numbers
  * bfloat16 float path, batch 256 (throughput-optimal on a single chip; the
    descriptor image stays bf16 through the x8 resize), 8 microbatches per
    dispatch via lax.scan — the steady-state serving shape (a per-iteration
    counter offset keeps XLA from hoisting the forward out of the loop)
  * MFU context printed to stderr: forward = 200.2 GFLOPs/image at 640x480
    (XLA cost analysis), v5e peak ~197 bf16 TFLOPS

``vs_baseline`` divides by the reference's implied forward throughput on its
own hardware: 3500 train iterations (2 forwards + 1 backward) in ~12-15 min
on a GTX 1080 Ti (BASELINE.md) => ~13 forward-equivalents/sec — the most
generous reading of the reference's single-image inference path.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 13.0  # reference forward throughput, GTX 1080 Ti


def verify_pallas_native():
    """Compile the Pallas kernels WITHOUT interpret mode on the current
    backend and check them against the XLA reference formulations (VERDICT
    r4 task 6: CI runs them interpret-only on CPU; this gate runs on the
    real chip every bench round, so a JAX upgrade that breaks the native
    lowering fails loudly). Returns a small report dict with ``ok``."""
    import jax
    import jax.numpy as jnp

    from pdc_tpu.losses.matrix_loss import pooled_non_match_loss_from_rows
    from pdc_tpu.ops.pallas_kernels import pallas_best_match
    from pdc_tpu.ops.pallas_loss import pooled_hinge

    report = {"ok": True, "checks": {}}

    # 1) streaming best-match (running min in VMEM) vs plain argmin
    for hw, q, d in ((3072, 16, 8), (5000, 4, 3)):
        k1, k2 = jax.random.split(jax.random.PRNGKey(hw))
        res_flat = jax.random.normal(k1, (hw, d))
        queries = jax.random.normal(k2, (q, d))
        idx, dist = pallas_best_match(res_flat, queries, interpret=False)
        d2 = np.asarray(
            jnp.sum((res_flat[:, None, :] - queries[None, :, :]) ** 2, -1))
        true_min = d2.min(0)
        # tie-tolerant argmin check: the chosen pixel's TRUE fp32 distance
        # must equal the true minimum (which pixel wins a near-tie is not a
        # correctness property)
        chosen = d2[np.asarray(idx), np.arange(q)]
        idx_bad = int((np.abs(chosen - true_min) > 1e-5).sum())
        dist_err = float(np.abs(np.asarray(dist)
                                - np.sqrt(true_min)).max())
        ok = idx_bad == 0 and dist_err < 1e-3
        report["checks"][f"best_match_{hw}x{q}x{d}"] = {
            "ok": ok, "bad_idx": idx_bad, "dist_err": dist_err}
        report["ok"] &= ok

    # 2) fused pooled-hinge fwd + grads vs the XLA reference formulation
    rng = np.random.default_rng(0)
    Nm, P, D, W_IMG = 700, 256, 3, 64
    da = jnp.asarray(rng.standard_normal((Nm, D)), jnp.float32) * 0.3
    db = jnp.asarray(rng.standard_normal((P, D)), jnp.float32) * 0.3
    uv_b = jnp.asarray(np.stack([rng.integers(0, W_IMG, Nm),
                                 rng.integers(0, 48, Nm)], 1), jnp.float32)
    mvalid = jnp.asarray(rng.random(Nm) < 0.8)
    pool_b = jnp.asarray(rng.integers(0, W_IMG * 48, P), jnp.int32)
    pvalid = jnp.asarray(rng.random(P) < 0.8)
    pu = (pool_b % W_IMG).astype(jnp.float32)
    pv = (pool_b // W_IMG).astype(jnp.float32)

    def f_ref(da, db):
        return pooled_non_match_loss_from_rows(
            da, db, uv_b, mvalid, pool_b, pvalid, W_IMG, M=0.5)[0]

    def f_pal(da, db):
        return pooled_hinge(
            da, db, uv_b[:, 0], uv_b[:, 1], mvalid.astype(jnp.float32),
            pu, pv, pvalid.astype(jnp.float32), 0.5, False, 50.0, False)[0]

    (l_ref, g_ref) = jax.value_and_grad(f_ref, argnums=(0, 1))(da, db)
    (l_pal, g_pal) = jax.value_and_grad(f_pal, argnums=(0, 1))(da, db)
    loss_err = abs(float(l_pal) - float(l_ref)) / max(abs(float(l_ref)), 1e-9)
    g_err = max(float(np.abs(np.asarray(gp) - np.asarray(gr)).max())
                for gp, gr in zip(g_pal, g_ref))
    ok = loss_err < 1e-4 and g_err < 1e-4
    report["checks"]["pooled_hinge_fwd_bwd"] = {
        "ok": ok, "loss_rel_err": loss_err, "grad_abs_err": g_err}
    report["ok"] &= ok
    report["ok"] = bool(report["ok"])
    return report


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.utils.compilation_cache import enable

    enable()  # persistent compile cache: first bench run pays the ~10 min
    # tunnel compile once; later runs (and the driver's) reuse it
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    import dataclasses
    import sys

    H, W, D = 480, 640, 3
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_backbone(
        {"descriptor_dimension": D,
         "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"}},
        dtype=dtype,
    )

    B = 256 if on_tpu else 1
    x = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # Steady-state serving shape: K microbatches per dispatch (lax.scan), so
    # the measurement reflects device throughput rather than per-call host
    # dispatch latency (which a pipelined server overlaps with compute; the
    # axon tunnel serializes it at ~0.3 s/call). The scalar fetch at the end
    # is still a hard sync across all K batches.
    K = 8 if on_tpu else 1
    imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))
    n_reps = 5 if on_tpu else 2

    def measure(net):
        @jax.jit
        def fwd_sum(variables, imgs):
            def body(c, _):
                out = net.apply(variables, imgs + c, train=False)
                return c + jnp.float32(1e-6), jnp.sum(out.astype(jnp.float32))
            _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return jnp.sum(sums)

        float(fwd_sum(variables, x))  # warmup/compile (scalar fetch = sync)
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            float(fwd_sum(variables, imgs))
            times.append(time.perf_counter() - t0)
        return B * K / min(times)

    bf16_ips = measure(model)
    # serving path: int8 PTQ convs with static calibrated activation scales
    # (accuracy-neutral, see module docstring). Only the headline on TPU —
    # the CPU backend has no int8 MXU path.
    int8_ips = None
    if on_tpu:
        mq = dataclasses.replace(model, quant_int8=True, quant_static=True)
        # calibration: one mutable pass populates the quant_scales collection
        _, mutated = mq.apply({**variables, "quant_scales": {}}, imgs[:8],
                              train=False, mutable=["quant_scales"])
        variables = {**variables, "quant_scales": mutated["quant_scales"]}
        int8_ips = measure(mq)
    images_per_sec = int8_ips if int8_ips else bf16_ips

    pallas_native = None
    if on_tpu:
        mfu = bf16_ips * 200.2e9 / 197e12  # fwd GFLOPs / v5e bf16 peak
        print(f"bf16: {bf16_ips:.0f} img/s (MFU {mfu:.1%}); "
              f"int8 static-PTQ serving: {int8_ips:.0f} img/s", file=sys.stderr)
        # native (non-interpret) Pallas regression gate: fail the round's
        # bench loudly if the native lowering broke (CI is interpret-only)
        pallas_native = verify_pallas_native()
        print(f"pallas native check: {pallas_native}", file=sys.stderr)
        assert pallas_native["ok"], pallas_native
    result = {
        "metric": "descriptor_inference_images_per_sec_per_chip_640x480",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }
    if int8_ips:
        result["bf16_images_per_sec"] = round(bf16_ips, 2)
        result["note"] = "value = int8 static-PTQ serving path (accuracy-neutral; trained_models/quantized_serving/)"
    if pallas_native is not None:
        result["pallas_native_ok"] = pallas_native["ok"]
    print(json.dumps(result))


if __name__ == "__main__":
    import os
    import sys

    try:
        main()
    except RuntimeError as e:
        # the axon tunnel occasionally stalls/drops for minutes (CLAUDE.md
        # gotcha); backend-init failure is cached in-process, so retry via
        # re-exec with a bounded attempt counter
        attempts = int(os.environ.get("PDC_BENCH_ATTEMPT", "0"))
        if "Unable to initialize backend" in str(e) and attempts < 4:
            print(f"bench: TPU backend unavailable "
                  f"(attempt {attempts + 1}/5), retrying in 90 s: {e}",
                  file=sys.stderr)
            time.sleep(90)
            os.environ["PDC_BENCH_ATTEMPT"] = str(attempts + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
