"""Regenerate tests/fixtures/resnet18_8s_convert_golden.npz — the committed
golden output of the torch->flax weight conversion (see
tests/test_torch_import_numerics.py). Run after INTENTIONAL changes to the
converter or the ResNetFCN architecture; the torch cross-check test must
still pass against the new fixture."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_torch_import_numerics import (
        H, MODELS, W, fixture_path, make_state_dict, net_config,
        torch_dilated_resnet_forward)

    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
    from pdc_tpu.models.torch_import import convert_reference_dcn

    for resnet_name, stage_sizes in sorted(MODELS.items()):
        dcn = DenseCorrespondenceNetwork.from_config(net_config(resnet_name))
        sd = make_state_dict(dcn.variables,
                             prefix=f"fcn.{resnet_name.lower()}.",
                             stage_sizes=stage_sizes)
        dcn.variables = convert_reference_dcn(sd, dcn.variables)
        rng = np.random.RandomState(1)
        x = rng.rand(1, H, W, 3).astype(np.float32)
        res = np.asarray(dcn.module.apply(dcn.variables, x, train=False))

        # sanity: the fixture must agree with torch before it is written
        sd_stripped = {k.split(".", 2)[-1]: v for k, v in sd.items()}
        res_torch = np.transpose(torch_dilated_resnet_forward(
            sd_stripped, np.transpose(x, (0, 3, 1, 2)), (H, W),
            stage_sizes=stage_sizes), (0, 2, 3, 1))
        scale = np.abs(res_torch).max()
        np.testing.assert_allclose(res / scale, res_torch / scale, atol=2e-5)

        fixture = fixture_path(resnet_name)
        os.makedirs(os.path.dirname(fixture), exist_ok=True)
        np.savez_compressed(fixture, input=x, output=res)
        print(f"wrote {fixture}: output range "
              f"[{res.min():.4f}, {res.max():.4f}]")


if __name__ == "__main__":
    main()
