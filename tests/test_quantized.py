"""int8 PTQ serving path: checkpoint compatibility, accuracy, train-mode
gradient safety (pdc_tpu/models/resnet.py Int8Conv)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.models.resnet import ResNet18_8s, ResNetFCN


@pytest.fixture(scope="module")
def tiny():
    m = ResNetFCN(num_classes=3, stage_sizes=(1, 1, 1, 1))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 48, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, v, x


def test_param_tree_identical(tiny):
    m, v, x = tiny
    mq = dataclasses.replace(m, quant_int8=True)
    vq = mq.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vq)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_quantized_close_to_float(tiny):
    m, v, x = tiny
    mq = dataclasses.replace(m, quant_int8=True)
    yf = m.apply(v, x, train=False)
    yq = mq.apply(v, x, train=False)
    cos = float((yf * yq).sum()
                / (jnp.linalg.norm(yf) * jnp.linalg.norm(yq) + 1e-12))
    assert cos > 0.995, cos


def test_quantized_resnet18_best_match_agreement():
    """Descriptor argmin (the eval/serving hot query) must agree between the
    float and int8 paths for the overwhelming majority of query pixels."""
    m = ResNet18_8s(3)
    mq = dataclasses.replace(m, quant_int8=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 64, 48, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    ra, rb = m.apply(v, x, train=False)
    qa, qb = mq.apply(v, x, train=False)

    ra, rb, qa, qb = (np.asarray(t, np.float32) for t in (ra, rb, qa, qb))

    def dists(res_a, res_b, uv):
        d = res_b.reshape(-1, 3) - res_a[uv[1], uv[0]]
        return (d * d).sum(-1)

    # a random-init network produces near-uniform descriptor images, so the
    # exact argmin is a near-tie lottery; the property that matters for
    # serving is that the int8 pick is (a) usually identical and (b) always
    # a near-tie under the FLOAT distance field.
    exact, spread = 0, np.ptp(rb.reshape(-1, 3), axis=0).max()
    queries = [(rng.randint(48), rng.randint(64)) for _ in range(50)]
    for u, v_ in queries:
        df = dists(ra, rb, (u, v_))
        dq = dists(qa, qb, (u, v_))
        bf_, bq_ = int(df.argmin()), int(dq.argmin())
        exact += bf_ == bq_
        # < 0.5% of the squared-distance range counts as a tie at random init
        assert df[bq_] - df[bf_] <= 5e-3 * spread ** 2, (
            f"int8 best match is not a near-tie: {df[bq_]} vs {df[bf_]}")
    assert exact >= 15, f"only {exact}/50 exact argmin agreements"
    # trained-model PCK parity is measured on TPU
    # (examples/quantized_serving_eval.py; BENCHMARKS.md int8 section)


def test_train_mode_keeps_float_path_and_gradients(tiny):
    m, v, x = tiny
    mq = dataclasses.replace(m, quant_int8=True)

    def loss(params):
        y, _ = mq.apply({"params": params, "batch_stats": v["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])
        return (y.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v["params"])
    gnorm = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0  # round() would zero these

    # and train output equals the unquantized train output exactly
    y1, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    y2, _ = mq.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_build_backbone_flag():
    from pdc_tpu.models.dcn import build_backbone

    cfg = {"descriptor_dimension": 3,
           "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
           "quant_int8": True}
    fcn = build_backbone(cfg)
    assert fcn.quant_int8 is True
    cfg.pop("quant_int8")
    assert build_backbone(cfg).quant_int8 is False


def test_quantized_unet():
    """The UNet backbone shares the Int8Conv serving path: identical param
    trees, close descriptors, float train mode."""
    from pdc_tpu.models.unet import UNet

    m = UNet(num_classes=3, base_features=8)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 48, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    mq = dataclasses.replace(m, quant_int8=True)
    vq = mq.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)

    yf = m.apply(v, x, train=False)
    yq = mq.apply(v, x, train=False)
    cos = float((yf * yq).sum()
                / (jnp.linalg.norm(yf) * jnp.linalg.norm(yq) + 1e-12))
    assert cos > 0.99, cos

    # train mode always runs the float convs (round() has zero gradient)
    yt, _ = mq.apply(v, x, train=True, mutable=["batch_stats"])
    yt_f, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yt_f), rtol=0, atol=0)


def test_dcn_quantized_unet():
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Unet"},
        "descriptor_dimension": 3, "image_width": 48, "image_height": 32})
    q = dcn.quantized()
    rgb = np.random.RandomState(2).randint(0, 255, (32, 48, 3), np.uint8)
    rf = np.asarray(dcn.forward_on_img(rgb))
    rq = np.asarray(q.forward_on_img(rgb))
    cos = float((rf * rq).sum()
                / (np.linalg.norm(rf) * np.linalg.norm(rq) + 1e-9))
    assert cos > 0.99, cos


def test_static_calibration():
    """calibrate_quantization populates per-layer scales; the static clone
    stays descriptor-space-close to the float path and needs no per-call
    abs-max (scales come from the quant_scales collection)."""
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        "descriptor_dimension": 3, "image_width": 48, "image_height": 32})

    with pytest.raises(ValueError):
        dcn.quantized(static=True)  # no scales yet

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (32, 48, 3), np.uint8) for _ in range(5)]
    q = dcn.calibrate_quantization(frames, batch_size=2)

    scales = q.variables["quant_scales"]
    leaves = jax.tree_util.tree_leaves(scales)
    assert leaves and all(float(s) > 0 for s in leaves)

    rgb = frames[0]
    rf = np.asarray(dcn.forward_on_img(rgb))
    rq = np.asarray(q.forward_on_img(rgb))
    cos = float((rf * rq).sum()
                / (np.linalg.norm(rf) * np.linalg.norm(rq) + 1e-9))
    assert cos > 0.99, cos

    # headroom scales up uniformly
    q2 = dcn.calibrate_quantization(frames, batch_size=2, headroom=2.0)
    for a, b in zip(jax.tree_util.tree_leaves(scales),
                    jax.tree_util.tree_leaves(q2.variables["quant_scales"])):
        np.testing.assert_allclose(float(b), 2 * float(a), rtol=1e-6)
