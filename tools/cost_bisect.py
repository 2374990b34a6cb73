"""Bisect XLA bytes-accessed across single-block window configs."""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config  # noqa: E402


def analyze(name, model, shape):
    x = jnp.zeros(shape, jnp.float32)
    v = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    f = jax.jit(lambda v, x: model.apply(v, x).sum())
    ca = f.lower(v, x).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"{name}: flops={ca.get('flops',0)/1e9:.1f}G "
          f"bytes={ca.get('bytes accessed',0)/1e9:.3f}GB", flush=True)


if __name__ == "__main__":
    shape = (1, 192, 192, 3)
    for ratio in (0.5, 1, 2, 4, 6, 8):
        cfg = flagship_config(depths=(1,), num_heads=(6,), hier_win_ratios=(ratio,),
                              is_fusion=False, is_mult_size_conv_feat_extract=False,
                              upsampler="pixelshuffledirect")
        analyze(f"1 block win{int(8*ratio)}", HiTSIR(**cfg, dtype=jnp.bfloat16), shape)
    # SCA contribution at one window
    cfg = flagship_config(depths=(1,), num_heads=(6,), hier_win_ratios=(1,),
                          is_channel_spatial_attn=False,
                          is_fusion=False, is_mult_size_conv_feat_extract=False,
                          upsampler="pixelshuffledirect")
    analyze("1 block win8 noSCA", HiTSIR(**cfg, dtype=jnp.bfloat16), shape)
    # heads and fusion pieces
    cfg = flagship_config(depths=(1,), num_heads=(6,), hier_win_ratios=(1,),
                          upsampler="pixelshuffledirect")
    analyze("1 block win8 +msce+fusion", HiTSIR(**cfg, dtype=jnp.bfloat16), shape)
