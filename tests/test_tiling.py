"""Overlap-tiled inference: exact blend math and model consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.resize import nearest_upsample
from sisr_tpu.parallel.tiling import TiledSR, tile_positions


def test_tile_positions_cover():
    starts = tile_positions(100, 32, 8)
    assert starts[0] == 0 and starts[-1] == 100 - 32
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s:s + 32] = True
    assert covered.all()


def test_tile_positions_small_input():
    assert tile_positions(16, 32, 8) == [0]


@pytest.mark.parametrize("chunk", [1, 3])
def test_blend_is_exact_for_shift_invariant_model(chunk):
    """With a pointwise-upsampling 'model', tiled output must equal the whole-
    image result bit-exactly — validates gather/scatter/weight-map logic."""
    def fake_apply(variables, x):
        return nearest_upsample(x * 2.0 + variables["b"], 4)

    variables = {"b": jnp.float32(0.25)}
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((70, 53, 3), dtype=np.float32))

    runner = TiledSR(fake_apply, scale=4, tile=32, overlap=8, chunk=chunk)
    out = np.asarray(runner(variables, img))
    ref = np.asarray(fake_apply(variables, img[None])[0] if False else
                     nearest_upsample((img * 2.0 + 0.25)[None], 4)[0])
    assert out.shape == (280, 212, 3)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_tiled_matches_whole_on_exact_tile():
    """A tile-sized image must match the whole-image forward exactly."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR

    model = HiTSIR(is_mult_size_conv_feat_extract=False, is_channel_spatial_attn=False,
                   is_fusion=False, embed_dim=16, depths=(1,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=1.0, upsampler="pixelshuffledirect",
                   upscale=4, hier_win_ratios=(1,))
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[None])

    runner = TiledSR(lambda v, x: model.apply(v, x), scale=4, tile=16, overlap=4)
    tiled = np.asarray(runner(variables, img))
    whole = np.asarray(model.apply(variables, img[None])[0])
    # jit-under-scan vs standalone apply: fusion reassociation differences only
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_sharded_tiling_matches_single_device():
    """Tile-sharded inference on the 8-device CPU mesh must equal the
    single-device tiled result exactly."""
    from sisr_tpu.parallel.mesh import make_mesh

    def fake_apply(variables, x):
        return nearest_upsample(x * 1.5 + variables["b"], 4)

    variables = {"b": jnp.float32(0.125)}
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((70, 53, 3), dtype=np.float32))

    runner = TiledSR(fake_apply, scale=4, tile=32, overlap=8, chunk=1)
    single = np.asarray(runner(variables, img))

    mesh = make_mesh(min(8, jax.device_count()), axis_name="tile")
    sharded = np.asarray(runner.sharded_call(variables, img, mesh))
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_overlap_blend_seam_quality():
    """Tiled-with-overlap output of a real window-attention model must stay
    close to the whole-image forward (seams only at blend boundaries)."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR
    from sisr_tpu.ops.metrics import psnr

    model = HiTSIR(is_mult_size_conv_feat_extract=False, is_channel_spatial_attn=False,
                   is_fusion=False, embed_dim=16, depths=(2,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=1.0, upsampler="pixelshuffledirect",
                   upscale=4, hier_win_ratios=(1, 2))
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((40, 40, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[None])

    runner = TiledSR(lambda v, x: model.apply(v, x), scale=4, tile=16, overlap=4)
    tiled = np.asarray(runner(variables, img))
    whole = np.asarray(model.apply(variables, img[None])[0])
    # different window context at tile borders -> bounded differences (a
    # random-init model maximizes context sensitivity; trained models seam
    # far less)
    assert psnr(tiled, whole, data_range=float(whole.max() - whole.min())) > 25.0


def test_tiled_small_image_padding():
    """Images smaller than the tile get padded and cropped back."""
    def fake_apply(variables, x):
        return nearest_upsample(x, 4)

    runner = TiledSR(fake_apply, scale=4, tile=32, overlap=8)
    img = jnp.asarray(np.random.default_rng(2).random((20, 24, 3), dtype=np.float32))
    out = np.asarray(runner({}, img))
    assert out.shape == (80, 96, 3)
    np.testing.assert_allclose(out, np.asarray(nearest_upsample(img[None], 4)[0]),
                               atol=1e-6)


def test_rect_strip_tiles_blend_exact():
    """Rectangular (strip) tiles: blend must stay exact and cover the image,
    including a strip wider than the image (padded then cropped)."""
    def fake_apply(variables, x):
        return nearest_upsample(x * 2.0 + variables["b"], 4)

    variables = {"b": jnp.float32(0.25)}
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((70, 64, 3), dtype=np.float32))
    ref = np.asarray(nearest_upsample((img * 2.0 + 0.25)[None], 4)[0])

    # full-width strips: only vertical tiling
    runner = TiledSR(fake_apply, scale=4, tile=(16, 64), overlap=8)
    out = np.asarray(runner(variables, img))
    assert out.shape == (280, 256, 3)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # the strip runner compiled exactly ceil over one axis positions
    assert len(runner._positions(70, 64)) == len(tile_positions(70, 16, 8))

    # strip wider than the image: pad right, crop back
    runner_w = TiledSR(fake_apply, scale=4, tile=(16, 96), overlap=8)
    out_w = np.asarray(runner_w(variables, img))
    assert out_w.shape == (280, 256, 3)
    np.testing.assert_allclose(out_w, ref, atol=1e-6)


@pytest.mark.parametrize("hw,band", [
    ((20, 16), 8),    # stacked-ys path (divisor 4 of 20 near the target)
    ((26, 12), 16),   # canvas path (h > band + halos; 26 has no 4-mult divisor)
    ((16, 20), 16),   # single whole-image call (h <= band + halos)
    ((6, 12), 8),
])
def test_banded_head_matches_whole(hw, band):
    """BandedHeadSR (body whole, x4 head streamed over feature-row bands with
    a 2-row halo) must reproduce the plain whole-image forward: the head's
    receptive radius is exactly 2 feature rows, so banding is value-identical
    — including images whose height is not a band multiple (zero-pad + crop)
    and images shorter than the band."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR
    from sisr_tpu.parallel.tiling import BandedHeadSR

    model = HiTSIR(is_mult_size_conv_feat_extract=False,
                   is_channel_spatial_attn=False, is_fusion=False,
                   embed_dim=16, depths=(1,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=1.0,
                   upsampler="nearest+conv", num_feat=8,
                   upscale=4, hier_win_ratios=(1,))
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((*hw, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[None])

    whole = np.asarray(model.apply(variables, img[None])[0])
    banded = np.asarray(BandedHeadSR(model, band_rows=band)(variables, img))
    assert banded.shape == whole.shape
    np.testing.assert_allclose(banded, whole, atol=1e-5)


def test_sharded_banded_head_matches_single_device():
    """Band-sharded BandedHeadSR on the 8-device CPU mesh (body replicated,
    x4-head bands split across the mesh axis, psum blend) must equal the
    single-device banded forward — including a band count that doesn't
    divide the device count (masked pad slots)."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR
    from sisr_tpu.parallel.mesh import make_mesh
    from sisr_tpu.parallel.tiling import BandedHeadSR

    model = HiTSIR(is_mult_size_conv_feat_extract=False,
                   is_channel_spatial_attn=False, is_fusion=False,
                   embed_dim=16, depths=(1,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=1.0,
                   upsampler="nearest+conv", num_feat=8,
                   upscale=4, hier_win_ratios=(1,))
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((24, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[None])

    runner = BandedHeadSR(model, band_rows=4)   # 6 bands over 8 devices
    single = np.asarray(runner(variables, img))
    mesh = make_mesh(min(8, jax.device_count()), axis_name="band")
    sharded = np.asarray(runner.sharded_call(variables, img, mesh))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_rect_strip_model_matches_square_tiling():
    """A real attention model through strip tiles must match square tiles
    where both see identical context (strip == whole image width)."""
    from sisr_tpu.models.hit_sir_pro import HiTSIR

    model = HiTSIR(is_mult_size_conv_feat_extract=False, is_channel_spatial_attn=False,
                   is_fusion=False, embed_dim=16, depths=(1,), num_heads=(2,),
                   base_win_size=(4, 4), mlp_ratio=1.0, upsampler="pixelshuffledirect",
                   upscale=4, hier_win_ratios=(1,))
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((16, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[None])

    whole = np.asarray(model.apply(variables, img[None])[0])
    runner = TiledSR(lambda v, x: model.apply(v, x), scale=4, tile=(16, 32),
                     overlap=4)
    strip = np.asarray(runner(variables, img))
    np.testing.assert_allclose(strip, whole, atol=1e-5)
