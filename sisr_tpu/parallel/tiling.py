"""Overlap-tiled arbitrary-resolution inference.

The reference always runs whole images through the model
(test_experiment.py:75) and only ships overlap tiling as a pattern
(KAIR main_test_swinir.py:256-284: stride = tile - overlap, last index
snapped to h - tile, outputs accumulated into E with a ones-mask W, final
E / W).  Here tiling is first-class and TPU-shaped:

  * ONE compiled program per (H, W, tile) — the model runs inside a
    ``lax.scan`` over chunks of tile positions, so compile time is one model
    instance regardless of tile count and all shapes are static.
  * tiles are gathered/scattered with dynamic slices on device; the blend
    weight map is a trace-time numpy constant (duplicated positions from
    chunk padding are counted, keeping the average exact).
  * ``chunk`` tiles run as one batch through the model to fill the MXU.
  * a fixed tile size that divides every hierarchical window (default 192 =
    lcm of the 4..64 window ladder) makes every attention block padding-free.

Images smaller than the tile are padded up, run, and cropped.
"""

from __future__ import annotations

from typing import Callable, List, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp


def tile_positions(length: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, length) with `tile`-sized windows."""
    if length <= tile:
        return [0]
    stride = tile - overlap
    starts = list(range(0, length - tile, stride))
    starts.append(length - tile)
    return starts


class TiledSR:
    """Callable running ``model_apply`` over overlapping tiles of one image.

    model_apply: (variables, (k,th,tw,3) NHWC) -> (k, th*s, tw*s, 3)

    ``tile`` may be an int (square tiles) or an (th, tw) pair — rectangular
    strip tiles (e.g. (192, 1920) for 1080p frames, where 1920 = 10*192 is
    already a window-ladder multiple) cut the overlap-redundant compute from
    ~17% to ~7% and run 6 kernel launches per frame instead of 66.
    """

    def __init__(self, model_apply: Callable, scale: int,
                 tile: Union[int, Tuple[int, int]] = 192,
                 overlap: int = 16, chunk: int = 1, out_dtype=jnp.float32):
        self.model_apply = model_apply
        self.scale = scale
        self.tile = tile
        self.tile_h, self.tile_w = ((tile, tile) if isinstance(tile, int)
                                    else (int(tile[0]), int(tile[1])))
        self.overlap = overlap
        self.chunk = chunk
        self.out_dtype = out_dtype
        self._compiled = {}

    def _positions(self, h: int, w: int) -> np.ndarray:
        pos = np.asarray([(y, x)
                          for y in tile_positions(h, self.tile_h, self.overlap)
                          for x in tile_positions(w, self.tile_w, self.overlap)],
                         dtype=np.int32)
        # pad to a chunk multiple by repeating the last tile; the weight map
        # counts duplicates so the overlap average stays exact
        pad = (-len(pos)) % self.chunk
        if pad:
            pos = np.concatenate([pos, np.repeat(pos[-1:], pad, axis=0)])
        return pos

    def _weight_map(self, h: int, w: int, pos: np.ndarray) -> np.ndarray:
        s, th, tw = self.scale, self.tile_h, self.tile_w
        wmap = np.zeros((h * s, w * s, 1), dtype=np.float32)
        for y, x in pos:
            wmap[y * s:(y + th) * s, x * s:(x + tw) * s] += 1.0
        return 1.0 / wmap

    def _build(self, h: int, w: int):
        s, c = self.scale, self.chunk
        th, tw = self.tile_h, self.tile_w
        pos = self._positions(h, w)
        inv_w = jnp.asarray(self._weight_map(h, w, pos))
        pos_chunks = pos.reshape(-1, c, 2)

        @jax.jit
        def run(variables, img):
            out = jnp.zeros((h * s, w * s, 3), dtype=self.out_dtype)

            def body(acc, yx):
                patches = jnp.stack([
                    jax.lax.dynamic_slice(img, (yx[i, 0], yx[i, 1], 0),
                                          (th, tw, 3))
                    for i in range(c)])
                sr = self.model_apply(variables, patches).astype(self.out_dtype)
                for i in range(c):
                    y, x = yx[i, 0] * s, yx[i, 1] * s
                    cur = jax.lax.dynamic_slice(acc, (y, x, 0),
                                                (th * s, tw * s, 3))
                    acc = jax.lax.dynamic_update_slice(acc, cur + sr[i], (y, x, 0))
                return acc, None

            out, _ = jax.lax.scan(body, out, jnp.asarray(pos_chunks))
            return out * inv_w

        return run

    def _build_sharded(self, h: int, w: int, mesh, axis: str = "tile"):
        """Multi-chip variant: tiles shard across the mesh ``axis``; each
        device accumulates a local canvas and one psum blends them (the
        SURVEY §2e 'spatial-shard' parallelism — embarrassingly parallel,
        halo only at blend time)."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        s, c = self.scale, self.chunk
        th, tw = self.tile_h, self.tile_w
        n_dev = mesh.shape[axis]
        pos = self._positions(h, w)
        # pad positions to n_dev * chunk granularity (duplicates are counted
        # by the weight map, keeping the average exact)
        per = -(-len(pos) // (n_dev * c)) * c
        pad = per * n_dev - len(pos)
        if pad:
            pos = np.concatenate([pos, np.repeat(pos[-1:], pad, axis=0)])
        inv_w = jnp.asarray(self._weight_map(h, w, pos))

        def local_fn(variables, img, pos_local):
            # pos_local: (1, per, 2) — this device's tile positions
            out = jnp.zeros((h * s, w * s, 3), dtype=self.out_dtype)
            # the scan carry becomes device-varying once sharded positions
            # mix in — mark the replicated zeros accordingly
            if hasattr(jax.lax, "pcast"):
                out = jax.lax.pcast(out, (axis,), to="varying")

            def body(acc, yx):
                patches = jnp.stack([
                    jax.lax.dynamic_slice(img, (yx[i, 0], yx[i, 1], 0),
                                          (th, tw, 3))
                    for i in range(c)])
                sr = self.model_apply(variables, patches).astype(self.out_dtype)
                for i in range(c):
                    y, x = yx[i, 0] * s, yx[i, 1] * s
                    cur = jax.lax.dynamic_slice(acc, (y, x, 0),
                                                (th * s, tw * s, 3))
                    acc = jax.lax.dynamic_update_slice(acc, cur + sr[i], (y, x, 0))
                return acc, None

            out, _ = jax.lax.scan(body, out, pos_local[0].reshape(-1, c, 2))
            return jax.lax.psum(out, axis)

        sharded = shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=P())

        pos_arr = jnp.asarray(pos.reshape(n_dev, per, 2))

        @jax.jit
        def run(variables, img):
            return sharded(variables, img, pos_arr) * inv_w

        return run

    def sharded_call(self, variables, img: jnp.ndarray, mesh,
                     axis: str = "tile") -> jnp.ndarray:
        """Tile-sharded multi-chip inference: img (H, W, 3) -> (H*s, W*s, 3)."""
        h, w = img.shape[:2]
        ph = max(0, self.tile_h - h)
        pw = max(0, self.tile_w - w)
        if ph or pw:
            mode = "reflect" if (ph < h and pw < w) else "symmetric"
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        hh, ww = img.shape[:2]
        key = ("sharded", hh, ww, id(mesh))
        if key not in self._compiled:
            self._compiled[key] = self._build_sharded(hh, ww, mesh, axis)
        out = self._compiled[key](variables, img)
        if ph or pw:
            out = out[: h * self.scale, : w * self.scale]
        return out

    def __call__(self, variables, img: jnp.ndarray) -> jnp.ndarray:
        """img: (H, W, 3) in [0,1] -> (H*scale, W*scale, 3)."""
        h, w = img.shape[:2]
        ph = max(0, self.tile_h - h)
        pw = max(0, self.tile_w - w)
        if ph or pw:
            # reflect requires pad < dim; fall back to symmetric for tiny inputs
            mode = "reflect" if (ph < h and pw < w) else "symmetric"
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        hh, ww = img.shape[:2]
        key = (hh, ww)
        if key not in self._compiled:
            self._compiled[key] = self._build(hh, ww)
        out = self._compiled[key](variables, img)
        if ph or pw:
            out = out[: h * self.scale, : w * self.scale]
        return out


class BandedHeadSR:
    """Whole-image forward with the x4 reconstruction head streamed over
    feature-row bands.

    The reference's eval/serving protocol is a whole-image forward
    (test_experiment.py:75).  The transformer body is row-banded everywhere
    (Pallas band kernels) so HBM scales with the feature map, but the
    nearest+conv head materializes 2x and 4x-res activations — ~18 GB for a
    1080p frame, past the 16 GB of one v5e.  This runner executes the body
    whole (`stage='features'`), then streams the head (`stage='head'`) over
    feature-row bands of ``band_rows`` + a 2-row halo inside one jitted
    ``lax.scan``; with the head's total receptive radius of exactly 2
    feature rows (3x3 convs at scales 1, 2, 4, 4) the banded output is
    value-identical to the whole forward.

    Image borders must land exactly ON band edges (the first/last band get
    no halo): the head zero-pads its 2x/4x-res intermediates at the image
    boundary, and a zero-padded *feature* halo would synthesize nonzero
    values there.  Interior bands ride real-feature halos, so band starts
    snap like ``tile_positions`` (last start = h - band - 2*halo) and kept
    regions overlap-overwrite, both exact.

    ``band_rows`` must be a multiple of 4 (keeps every band-kernel gate of
    the head engaged: the packed convs need even row tiles).  It is a
    *target*: when some 4-multiple divisor of the feature height lies near
    it, that divisor is used instead and the scan emits the kept bands as
    stacked ``ys`` reshaped to the frame — no carried SR canvas (190 MB of
    bf16 at 1080p), no per-band ``dynamic_update_slice``.  Non-divisible
    heights keep the canvas + overlap-overwrite form.
    """

    HALO = 2  # feature rows = the head's receptive radius (1 + 1/2 + 1/4 + 1/4)

    def __init__(self, model, band_rows: int = 120, out_dtype=jnp.float32,
                 align: int = 0):
        assert model.upsampler == "nearest+conv", model.upsampler
        assert band_rows % 4 == 0, band_rows
        self.model = model
        self.band_rows = band_rows
        self.out_dtype = out_dtype
        # reflect-pad the input to `align` multiples before the forward
        # (serving knob): un-aligned heights make every attention block pad
        # and crop the ~750 MB feature map around its window partition
        # (1080p: blocks at windows 16..64 each pad 1080 -> 1088+); align=64
        # keeps all but the 48-window blocks pad-free for the flagship
        # ladder.  Changes border context like any padding — same semantics
        # class as the experiment's eval_bucket (~1e-2 dB).
        self.align = align
        self._compiled = {}

    def _build(self, h: int, w: int):
        import os
        s = self.model.upscale
        nf = self.model.num_feat
        halo = self.HALO
        tb = self.band_rows
        rows = tb + 2 * halo  # uniform band-input height

        # group-packed head output (B, rows*s, w*s/G, G*C): keeps the head's
        # per-band writes and the blend slices at nominal size instead of the
        # 42x lane-padded (..., 3) layout, and fills conv_last's MXU N axis
        # (ops/pallas/conv3x3.py packed-tail comment).  The packed bands
        # reassemble into the frame with ONE final reshape — value-identical.
        from sisr_tpu.ops.pallas.conv3x3 import tail_pack_group
        packed = ((s * w) % tail_pack_group() == 0
                  and self.model.upsampler == "nearest+conv"
                  and os.environ.get("SISR_HEAD_PACK", "1") == "1")
        hmodel = (self.model.clone(head_packed=True)
                  if packed and not self.model.head_packed else self.model)

        @jax.jit
        def run_single(variables, img):
            feat = self.model.apply(variables, img[None], stage="features")
            out = hmodel.apply(variables, feat, stage="head")[0]
            return out.reshape(s * img.shape[0], s * img.shape[1], -1)

        if h <= rows:
            return run_single

        # prefer a 4-multiple divisor of h near the target band size: kept
        # regions then tile [0, h) exactly and the scan can emit stacked ys
        divs = [d for d in range(4, h - 2 * halo + 1, 4)
                if h % d == 0 and tb // 2 <= d <= 2 * tb]
        tbe = min(divs, key=lambda d: (abs(d - tb), -d)) if divs else None

        # scan unroll: >1 lets XLA software-pipeline consecutive band
        # programs (DMA of band i+1 under compute of band i) at the cost of
        # keeping that many bands' head intermediates live (~2.3 GB each at
        # 1080p — keep unroll*2.3 GB well under HBM).  Measured r5 at 1080p:
        # unroll 1/2/4 = 1700.3/1688.1/1689.1 ms median, bit-identical — 2
        # is the shipped default.
        unroll = int(os.environ.get("SISR_HEAD_UNROLL", "2"))

        if tbe is not None:
            rows_e = tbe + 2 * halo
            kbs = list(range(0, h, tbe))
            starts = [min(max(kb - halo, 0), h - rows_e) for kb in kbs]
            pos = jnp.asarray([(st, s * (kb - st))
                               for st, kb in zip(starts, kbs)], dtype=jnp.int32)

            @jax.jit
            def run_stacked(variables, img):
                feat = self.model.apply(variables, img[None], stage="features")

                def body(_, st_off):
                    band = jax.lax.dynamic_slice(
                        feat, (0, st_off[0], 0, 0), (1, rows_e, w, nf))
                    sr = hmodel.apply(variables, band, stage="head")
                    kept = jax.lax.dynamic_slice(
                        sr, (0, st_off[1], 0, 0),
                        (1, s * tbe, sr.shape[2], sr.shape[-1]))
                    return None, kept[0].astype(self.out_dtype)

                _, bands = jax.lax.scan(body, None, pos, unroll=unroll)
                # packed bands (nb, s*tbe, s*w/G, G*C) flatten to the frame
                # in the same row-major order as the plain layout
                return bands.reshape(s * h, s * w, -1)

            return run_stacked

        # kept-region starts (kb) tile [0, h) in tb steps, last snapped to
        # h - tb; band-input starts clamp the halo inside the image, so the
        # first/last band's conv zero-padding IS the image-border padding
        kbs = list(range(0, h - tb, tb)) + [h - tb]
        starts = [min(max(kb - halo, 0), h - rows) for kb in kbs]
        pos = jnp.asarray([(st, kb) for st, kb in zip(starts, kbs)],
                          dtype=jnp.int32)

        out_ch = self.model.in_chans
        pk = tail_pack_group() if packed else 1

        @jax.jit
        def run(variables, img):
            feat = self.model.apply(variables, img[None], stage="features")
            canvas = jnp.zeros((1, s * h, s * w // pk, pk * out_ch),
                               self.out_dtype)

            def body(acc, st_kb):
                st, kb = st_kb[0], st_kb[1]
                band = jax.lax.dynamic_slice(
                    feat, (0, st, 0, 0), (1, rows, w, nf))
                sr = hmodel.apply(variables, band, stage="head")
                kept = jax.lax.dynamic_slice(
                    sr, (0, s * (kb - st), 0, 0),
                    (1, s * tb, sr.shape[2], sr.shape[-1])).astype(self.out_dtype)
                return jax.lax.dynamic_update_slice(
                    acc, kept, (0, s * kb, 0, 0)), None

            canvas, _ = jax.lax.scan(body, canvas, pos, unroll=unroll)
            return canvas[0].reshape(s * h, s * w, out_ch)

        return run

    def _build_sharded(self, h: int, w: int, mesh, axis: str):
        """Multi-chip banded head: the transformer body runs replicated (its
        output is needed whole by every band), and the x4 head's feature-row
        bands shard across the mesh ``axis`` — each device head-upscales its
        share of bands into a local canvas and ONE psum blends them, exactly
        like ``TiledSR._build_sharded`` (SURVEY §2e spatial-shard story).

        Band layout: a 4-multiple divisor band height (h is a multiple of 4
        for any aligned input) makes the kept regions tile [0, h) exactly, so
        the canvases are disjoint and read-add-write accumulation + psum is
        order-independent and exact.  Device slots beyond the real band count
        re-run band 0 with a zero validity mask."""
        import os
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        s = self.model.upscale
        nf = self.model.num_feat
        halo = self.HALO
        assert h % 4 == 0, ("sharded banded head needs a 4-multiple feature "
                            "height; set align=4 or larger", h)
        from sisr_tpu.ops.pallas.conv3x3 import tail_pack_group
        packed = ((s * w) % tail_pack_group() == 0
                  and self.model.upsampler == "nearest+conv"
                  and os.environ.get("SISR_HEAD_PACK", "1") == "1")
        hmodel = (self.model.clone(head_packed=True)
                  if packed and not self.model.head_packed else self.model)
        pk = tail_pack_group() if packed else 1
        out_ch = self.model.in_chans

        # largest 4-multiple divisor of h no bigger than the target
        divs = [d for d in range(4, h + 1, 4)
                if h % d == 0 and d <= max(self.band_rows, 4)]
        tbe = max(divs)
        rows_e = min(tbe + 2 * halo, h)
        kbs = list(range(0, h, tbe))
        n_dev = mesh.shape[axis]
        per = -(-len(kbs) // n_dev)
        pos = [(min(max(kb - halo, 0), h - rows_e), kb, 1) for kb in kbs]
        pos += [(pos[0][0], pos[0][1], 0)] * (per * n_dev - len(pos))
        pos_arr = jnp.asarray(pos, jnp.int32).reshape(n_dev, per, 3)

        def local_fn(variables, img, pos_local):
            feat = self.model.apply(variables, img[None], stage="features")
            canvas = jnp.zeros((1, s * h, s * w // pk, pk * out_ch),
                               self.out_dtype)
            if hasattr(jax.lax, "pcast"):
                canvas = jax.lax.pcast(canvas, (axis,), to="varying")

            def body(acc, st_kb_v):
                st, kb, valid = st_kb_v[0], st_kb_v[1], st_kb_v[2]
                band = jax.lax.dynamic_slice(
                    feat, (0, st, 0, 0), (1, rows_e, w, nf))
                sr = hmodel.apply(variables, band, stage="head")
                kept = jax.lax.dynamic_slice(
                    sr, (0, s * (kb - st), 0, 0),
                    (1, s * tbe, sr.shape[2], sr.shape[-1]))
                kept = (kept * valid.astype(kept.dtype)).astype(self.out_dtype)
                cur = jax.lax.dynamic_slice(
                    acc, (0, s * kb, 0, 0), kept.shape)
                return jax.lax.dynamic_update_slice(
                    acc, cur + kept, (0, s * kb, 0, 0)), None

            canvas, _ = jax.lax.scan(body, canvas, pos_local[0])
            return jax.lax.psum(canvas, axis)

        sharded = shard_map(local_fn, mesh=mesh,
                            in_specs=(P(), P(), P(axis)), out_specs=P())

        @jax.jit
        def run(variables, img):
            return sharded(variables, img, pos_arr)[0].reshape(
                s * h, s * w, out_ch)

        return run

    def sharded_call(self, variables, img: jnp.ndarray, mesh,
                     axis: str = "band") -> jnp.ndarray:
        """Band-sharded multi-chip whole-image SR: (H, W, 3) -> (H*s, W*s, 3).
        Value-identical to ``__call__`` up to blend-accumulation dtype."""
        h, w = img.shape[:2]
        align = max(self.align, 4)
        ph = (-h) % align
        pw = (-w) % align
        if ph or pw:
            mode = "reflect" if (ph < h and pw < w) else "symmetric"
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        hh, ww = img.shape[:2]
        key = ("sharded", hh, ww, id(mesh), axis)
        if key not in self._compiled:
            self._compiled[key] = self._build_sharded(hh, ww, mesh, axis)
        out = self._compiled[key](variables, img)
        if ph or pw:
            out = out[: h * self.model.upscale, : w * self.model.upscale]
        return out

    def __call__(self, variables, img: jnp.ndarray) -> jnp.ndarray:
        """img: (H, W, 3) in [0,1] -> (H*scale, W*scale, 3)."""
        h, w = img.shape[:2]
        ph = (-h) % self.align if self.align else 0
        pw = (-w) % self.align if self.align else 0
        if ph or pw:
            mode = "reflect" if (ph < h and pw < w) else "symmetric"
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode=mode)
        hh, ww = img.shape[:2]
        key = (hh, ww)
        if key not in self._compiled:
            self._compiled[key] = self._build(hh, ww)
        out = self._compiled[key](variables, img)
        if ph or pw:
            out = out[: h * self.model.upscale, : w * self.model.upscale]
        return out
