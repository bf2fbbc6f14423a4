"""Parity of the space-to-depth U-Net fast forward vs the flax module.

apply_unet_s2d rewrites level 0 (conv3x3 1->32, conv3x3 32->32, maxpool 2x2)
into space-to-depth layout; the math is identical up to f32 conv
reassociation, so prob/dist must agree to float tolerance on random inputs
(reference forward: models/unet.StarDistUNet, architecture per SURVEY.md
section 2.2.3 / CAE_improved_modeltrain.py:118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cell_image_analysis_tpu.models.unet import (
    StarDistUNet,
    apply_unet_s2d,
    init_unet,
    unet_apply,
)


@pytest.fixture(scope="module")
def unet():
    return init_unet(jax.random.PRNGKey(3), size=64)


def test_s2d_matches_flax_apply(unet):
    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    prob, dist = apply_unet_s2d(model, variables, x)
    assert prob.shape == prob_ref.shape and dist.shape == dist_ref.shape
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_tail_matches_flax_apply(unet):
    """The optional s2d decoder tail (level 1 + heads at H/4 via up-kernel /
    s2d-kernel convs, env CIA_UNET_S2D_TAIL) is exact vs the flax module up
    to f32 conv reassociation."""
    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    prob, dist = apply_unet_s2d(model, variables, x, tail_s2d=True)
    assert prob.shape == prob_ref.shape and dist.shape == dist_ref.shape
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-5, atol=1e-5)


def test_unet_apply_dispatches_to_flax_for_odd_shapes(unet):
    model, variables = unet
    # odd spatial dims can't space-to-depth; must still run (flax path)
    x = jnp.zeros((1, 66, 64, 1), jnp.float32)
    prob, dist = unet_apply(model, variables, x)
    assert prob.shape == (1, 33, 32)


def test_s2d_matches_on_synthetic_weights(unet):
    """Same check through the committed production weights (the bench/CLI
    backend), on a frame-shaped input."""
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    variables = load_synthetic_unet_variables()
    model = StarDistUNet()
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(1, 128, 128, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    prob, dist = apply_unet_s2d(model, variables, x)
    # s2d vs flax differ only by f32 reassociation; the r4 dense-regime
    # artifact grazed the old 2e-6 bound (1/4096 px at 2.12e-6)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-4)


def test_late_dist_head_matches_full_dist(unet):
    """`unet_apply_late` + `dist_head_rows` on gathered rows == the full
    dist map at those pixels (models/stardist.py's late-dist candidate
    path; same 1x1 contraction as a (K, F) matmul)."""
    from cell_image_analysis_tpu.models.unet import dist_head_rows, unet_apply_late

    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    late = unet_apply_late(model, variables, x)
    assert late is not None
    prob, feat = late
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=2e-6)
    idx = jnp.asarray([0, 7, 100, 1535, 999])          # arbitrary pixels
    rows = dist_head_rows(variables, feat[0].reshape(-1, feat.shape[-1])[idx])
    ref_rows = np.asarray(dist_ref[0]).reshape(-1, dist_ref.shape[-1])[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(rows), ref_rows, rtol=1e-5, atol=1e-5)


def test_late_dist_none_for_odd_shapes(unet):
    from cell_image_analysis_tpu.models.unet import unet_apply_late

    model, variables = unet
    assert unet_apply_late(model, variables, jnp.zeros((1, 65, 64, 1))) is None


def test_standard_lvl0_matches_flax_exactly(unet):
    """lvl0_s2d=False computes level 0 in the standard layout — on CPU it
    must be BIT-equal to the flax forward (no s2d reassociation), for both
    the full and late-dist paths, and with a lvl0 precision override."""
    from cell_image_analysis_tpu.models.unet import apply_unet_s2d

    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    for p0 in (None, "default"):
        m = StarDistUNet(lvl0_s2d=False, lvl0_precision=p0)
        prob, dist = apply_unet_s2d(m, variables, x)
        np.testing.assert_array_equal(np.asarray(prob), np.asarray(prob_ref))
        np.testing.assert_array_equal(np.asarray(dist), np.asarray(dist_ref))
    prob, feat = apply_unet_s2d(StarDistUNet(lvl0_s2d=False), variables, x,
                                late_dist=True)
    np.testing.assert_array_equal(np.asarray(prob), np.asarray(prob_ref))
    assert feat.shape == (2, 32, 48, 128)


@pytest.mark.parametrize("mode", ["jax", "pallas"])
def test_winograd_matches_flax_apply(unet, mode):
    """apply_unet_s2d with winograd enabled == model.apply to the Winograd
    reassociation tolerance.  Every 3x3 conv whose precision resolves to
    "high" dispatches through ops/winograd (on CPU, Precision.HIGH products
    are true f32, so the only deviation is transform reassociation);
    mode="pallas" exercises the off-TPU fallback to the jax formulation
    (ADVICE r2: the Pallas TPU kernel has no CPU lowering)."""
    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    m = StarDistUNet(winograd=mode)
    prob, dist = apply_unet_s2d(m, variables, x)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-4)


def test_winograd_tail_and_late_dist(unet):
    """Winograd dispatch through the s2d decoder tail and the late-dist
    path (the production fused-graph branches)."""
    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    m = StarDistUNet(winograd="jax")
    prob, dist = apply_unet_s2d(m, variables, x, tail_s2d=True)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-4)
    prob, feat = apply_unet_s2d(m, variables, x, late_dist=True)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=1e-5)
    assert feat.shape == (2, 32, 48, 128)


def test_winograd_odd_shape_falls_back_to_direct(unet):
    """Odd spatial dims can't tile F(2,3); the dispatch must fall back to
    the direct conv inside the flax path (via unet_apply) and still run."""
    model, variables = unet
    m = StarDistUNet(winograd="jax")
    x = jnp.zeros((1, 66, 64, 1), jnp.float32)
    prob, dist = unet_apply(m, variables, x)
    assert prob.shape == (1, 33, 32)


def test_winograd_hbm_gate():
    """The "jax" formulation is HBM-gated: above the Winograd-domain byte
    budget it resolves to "pallas" on TPU / direct conv elsewhere (ADVICE
    r2: ungated it OOMs exactly the production layers it targets)."""
    from cell_image_analysis_tpu.models.unet import _WINO_JAX_HBM_BUDGET, _wino_mode

    small = _wino_mode("jax", (2, 64, 96, 1), (3, 3, 4, 128))
    assert small == "jax"
    # the production level-0 s2d conv: (8, 512, 512, 128) x (3,3,128,128)
    big = _wino_mode("jax", (8, 512, 512, 128), (3, 3, 128, 128))
    assert big in ("pallas", "off")
    if jax.default_backend() == "tpu":
        assert big == "pallas"
    else:
        assert big == "off"
    # explicit sanity: the gated tensor really exceeds the budget
    assert 16 * 8 * 256 * 256 * (128 + 128) * 4 > _WINO_JAX_HBM_BUDGET


@pytest.mark.parametrize("mode", ["auto", "all"])
def test_hilo_matches_flax_apply(unet, mode):
    """apply_unet_s2d with the hi/lo channel-packed convs == model.apply.
    On CPU the default conv is true f32, so the packed decomposition's only
    deviation is the dropped x_lo@W_lo term (~2^-16 relative)."""
    model, variables = unet
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(variables, x, train=False)
    m = StarDistUNet(hilo=mode)
    prob, dist = apply_unet_s2d(m, variables, x)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-4)


def test_hilo_op_matches_high_conv():
    """ops/hilo_conv.hilo_conv3x3 == the precision=HIGH direct conv (on CPU
    both decompose over exact f32 products; the shared terms match to the
    dropped-lo term's magnitude)."""
    from cell_image_analysis_tpu.ops.hilo_conv import hilo_conv3x3

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))
    W = jnp.asarray((rng.normal(size=(3, 3, 64, 32)) /
                     np.sqrt(9 * 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    y = hilo_conv3x3(x, W, b)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(y - ref).max()) / scale < 5e-5


@pytest.mark.parametrize("mode", ["pack", "split"])
def test_wb16_matches_flax_apply(unet, mode):
    """apply_unet_s2d with the bf16-exact-kernel 2-pass convs == model.apply
    ON THE ROUNDED ARTIFACT (the wb16 model contract: kernels are rounded at
    artifact build and every backend runs the same rounded weights).  On CPU
    the default conv is true f32, so the only deviation is x's two-term bf16
    representation (~2^-17 relative)."""
    from cell_image_analysis_tpu.ops.hilo_conv import round_kernels_bf16

    model, variables = unet
    rounded = {"params": round_kernels_bf16(
        jax.tree.map(np.asarray, variables["params"]))}
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(2, 64, 96, 1)).astype(np.float32)
    )
    prob_ref, dist_ref = model.apply(rounded, x, train=False)
    m = StarDistUNet(wb16=mode)
    prob, dist = apply_unet_s2d(m, rounded, x)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref),
                               rtol=1e-4, atol=1e-4)


def test_wb16_op_matches_highest_conv():
    """ops/hilo_conv.wb16_conv on a bf16-exact kernel == the precision=
    HIGHEST direct conv to x's 16-bit representation error."""
    from cell_image_analysis_tpu.ops.hilo_conv import wb16_conv, wb16_conv_split

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))
    W = np.asarray((rng.normal(size=(3, 3, 64, 32)) /
                    np.sqrt(9 * 64)).astype(np.float32))
    W = jnp.asarray(W.astype("bfloat16").astype(np.float32))  # bf16-exact
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    scale = float(jnp.abs(ref).max())
    for impl in (wb16_conv, wb16_conv_split):
        y = impl(x, W, b)
        assert float(jnp.abs(y - ref).max()) / scale < 2e-5, impl.__name__


def test_wb16_auto_resolution():
    """resolve_wb16: 'auto' -> 'pack' on a rounded artifact, 'off' on raw
    f32 weights; explicit modes pass through."""
    from cell_image_analysis_tpu.models.unet import resolve_wb16
    from cell_image_analysis_tpu.ops.hilo_conv import (
        kernels_bf16_exact,
        round_kernels_bf16,
    )
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    variables = load_synthetic_unet_variables()
    params = jax.tree.map(np.asarray, variables["params"])
    rounded = {"params": round_kernels_bf16(params)}
    assert kernels_bf16_exact(rounded["params"])
    assert resolve_wb16("auto", rounded) == "pack"
    assert resolve_wb16("off", rounded) == "off"
    assert resolve_wb16("split", rounded) == "split"
    # raw trained f32 weights are (generically) not bf16-exact
    if not kernels_bf16_exact(params):
        assert resolve_wb16("auto", {"params": params}) == "off"


def test_hilo_knob_flows_through_config():
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    cfg = SegConfig(unet_hilo="auto")
    b = StarDistBackend(load_synthetic_unet_variables(), cfg)
    assert b.model.hilo == "auto"


def test_winograd_knob_flows_through_config():
    """SegConfig.unet_winograd reaches the backend's StarDistUNet."""
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    cfg = SegConfig(unet_winograd="pallas")
    b = StarDistBackend(load_synthetic_unet_variables(), cfg)
    assert b.model.winograd == "pallas"


def test_lvl0_knobs_flow_through_config():
    """SegConfig.unet_lvl0_* reach the backend's StarDistUNet."""
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    cfg = SegConfig(unet_lvl0_precision="default", unet_lvl0_s2d=False)
    b = StarDistBackend(load_synthetic_unet_variables(), cfg)
    assert b.model.lvl0_precision == "default"
    assert b.model.lvl0_s2d is False
