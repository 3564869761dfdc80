"""Native-mode (non-interpret) Pallas regression gate — VERDICT r4 task 6.

The CI suite exercises the Pallas kernels in interpret mode only (the suite
forces CPU); this probe compiles `pallas_best_match` and the fused
pooled-hinge WITHOUT ``interpret=True`` on the real chip and checks them
against the XLA reference formulations. Run during any TPU window:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_probe_pallas_native.py

Writes trained_models/pallas_native_check.json (the committed artifact) and
exits non-zero on any mismatch. bench.py runs the same checks inline every
round (`verify_pallas_native`), so a JAX upgrade that breaks the native
lowering fails the round's benchmark loudly.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import verify_pallas_native  # noqa: E402


def main():
    import jax

    from pdc_tpu.utils.compilation_cache import enable

    enable()
    platform = jax.devices()[0].platform
    report = verify_pallas_native()
    report["platform"] = platform
    report["jax_version"] = jax.__version__
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "trained_models",
        "pallas_native_check.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
