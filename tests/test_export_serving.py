"""StableHLO serving export: weights-baked inference artifact round-trips
and matches the live network."""

import numpy as np
import pytest

from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

W, H, D = 64, 48, 3


@pytest.fixture(scope="module")
def dcn():
    return DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        "descriptor_dimension": D, "image_width": W, "image_height": H})


def test_export_roundtrip_matches_live_network(dcn, tmp_path):
    import jax.numpy as jnp

    from pdc_tpu.apps.export_serving import (
        export_inference, load_exported, save_exported)

    exported = export_inference(dcn, batch_size=2)
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)

    out_direct = np.asarray(exported.call(jnp.asarray(rgb)))
    assert out_direct.shape == (2, H, W, D)

    # live-network reference: same normalize + forward
    live = np.stack([np.asarray(dcn.forward_on_img(rgb[i])) for i in range(2)])
    np.testing.assert_allclose(out_direct, live, rtol=1e-4, atol=1e-4)

    # serialize -> file -> deserialize -> identical serving results
    path = str(tmp_path / "net.stablehlo")
    nbytes = save_exported(exported, path)
    assert nbytes > 1e6  # weights are baked in (ResNet-18 ~ 45 MB fp32)
    reloaded = load_exported(path)
    out_reloaded = np.asarray(reloaded.call(jnp.asarray(rgb)))
    np.testing.assert_allclose(out_reloaded, out_direct, rtol=1e-6, atol=1e-6)


def test_export_cross_platform_tpu_lowering(dcn):
    """TPU-targeted lowering serializes from a CPU-only host (the artifact
    then runs on TPU serving hosts)."""
    from pdc_tpu.apps.export_serving import export_inference

    exported = export_inference(dcn, batch_size=1, platforms=["tpu"])
    assert exported.platforms == ("tpu",)
    data = exported.serialize()
    assert len(data) > 1e6


def test_export_model_folder(dcn, tmp_path):
    from pdc_tpu.apps.export_serving import export_model_folder, load_exported

    folder = tmp_path / "net"
    folder.mkdir()
    dcn.save_checkpoint(str(folder / "000100.ckpt"))
    from pdc_tpu.utils.yaml_io import save_yaml

    save_yaml({"dense_correspondence_network": dict(dcn.config)},
              str(folder / "training.yaml"))
    out = str(tmp_path / "served.stablehlo")
    n = export_model_folder(str(folder), out, batch_size=1)
    assert n > 1e6
    art = load_exported(out)
    res = np.asarray(art.call(np.zeros((1, H, W, 3), np.uint8)))
    assert res.shape == (1, H, W, D) and np.isfinite(res).all()


def test_export_int8_serving_program(dcn, tmp_path):
    """The int8 PTQ serving program (DCN.quantized) exports, round-trips,
    and stays descriptor-space-close to the float artifact."""
    import jax.numpy as jnp

    from pdc_tpu.apps.export_serving import (
        export_inference, load_exported, save_exported)

    exported = export_inference(dcn.quantized(), batch_size=1)
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (1, H, W, 3), dtype=np.uint8)

    path = str(tmp_path / "net_int8.stablehlo")
    save_exported(exported, path)
    out_q = np.asarray(load_exported(path).call(jnp.asarray(rgb)))
    assert out_q.shape == (1, H, W, D) and np.isfinite(out_q).all()

    out_f = np.asarray(dcn.forward_on_img(rgb[0]))[None]
    cos = float((out_q * out_f).sum() /
                (np.linalg.norm(out_q) * np.linalg.norm(out_f) + 1e-9))
    assert cos > 0.99


def test_export_int8_static_program(dcn, tmp_path):
    """The calibrated static-scale serving program exports with the scales
    baked in and round-trips."""
    import jax.numpy as jnp

    from pdc_tpu.apps.export_serving import (
        export_inference, load_exported, save_exported)

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(3)]
    q = dcn.calibrate_quantization(frames, batch_size=2)
    exported = export_inference(q, batch_size=1)
    path = str(tmp_path / "net_int8s.stablehlo")
    save_exported(exported, path)
    rgb = frames[0][None]
    out_q = np.asarray(load_exported(path).call(jnp.asarray(rgb)))
    out_f = np.asarray(dcn.forward_on_img(frames[0]))[None]
    cos = float((out_q * out_f).sum() /
                (np.linalg.norm(out_q) * np.linalg.norm(out_f) + 1e-9))
    assert cos > 0.99, cos
