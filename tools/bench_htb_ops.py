"""Standalone A/B of the fused HTB ops vs their XLA compositions.

Chains many executions per timing (tools/tpu_timer) — individual calls are
sub-ms and meaningless through the tunnel.  Judge final variants at the
whole-model level (tools/bench_ffn_ab.py); this script is for fast iteration
on kernel variants.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from tools.tpu_timer import device_time  # noqa: E402


def bench_tail(dtype=jnp.bfloat16, h=192, w=192, c=180, ch=360):
    from sisr_tpu.ops.pallas.ffn import _htb_tail_pallas, htb_tail_reference

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3,
                                dtype=dtype)
    args = (mk(1, h, w, c), mk(1, h, w, c), mk(c), mk(c), mk(c, ch), mk(ch),
            mk(5, 5, ch), mk(ch), mk(ch, c), mk(c), mk(c), mk(c))
    t_ref = device_time(lambda *a: htb_tail_reference(*a).sum(), *args, n=30)
    t_ker = device_time(lambda *a: _htb_tail_pallas(*a).sum(), *args, n=30)
    print(f"htb_tail   xla={t_ref*1e3:.3f} ms  pallas={t_ker*1e3:.3f} ms",
          flush=True)


def bench_scc(win, dtype=jnp.bfloat16, tile=192, c=180, heads=6, with_sca=True):
    from sisr_tpu.ops.pallas.scc_attention import (
        blockdiag_kgen, head_mask, pooling_matrix)
    from sisr_tpu.ops.pallas.scc_block import (_scc_block_pallas,
                                               scc_block_reference)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3,
                                dtype=dtype)
    d = c // (2 * heads)
    bh = bw = min(win, 8)
    rh = win // bh
    x = mk(1, tile, tile, c)
    sca = (mk(9, c), mk(c), mk(9, c), mk(c), mk(1, 1, 1, c), mk(1, 1, 1, c)) \
        if with_sca else None
    w1, w2, bb = blockdiag_kgen(mk(d, d), mk(d), mk(d, d), mk(d), heads)
    pmat, pb = pooling_matrix(mk(rh * rh, 1), mk(1), win, win, bh, bw, dtype)
    pb = pb.astype(jnp.float32)
    mask = head_mask(heads, bh * bw, c // 2, dtype)
    bias = mk(win * win, heads * bh * bw)
    args = (x, sca, w1, w2, bb, pmat, pb, mask, bias, mk(c, c), mk(c),
            heads, (win, win))
    t_ref = device_time(lambda x: scc_block_reference(x, *args[1:]).sum(),
                        x, n=20)
    t_ker = device_time(lambda x: _scc_block_pallas(x, *args[1:]).sum(),
                        x, n=20)
    print(f"scc win{win:<3d} xla={t_ref*1e3:.3f} ms  pallas={t_ker*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tail"):
        bench_tail()
    if which in ("all", "scc"):
        for win in (8, 16, 32, 48, 64):
            bench_scc(win)
