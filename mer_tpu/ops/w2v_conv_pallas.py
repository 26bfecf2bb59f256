"""Fused Pallas TPU kernels for the wav2vec2 conv feature extractor —
MEASURED NEGATIVES, kept as tested alternatives.

The reference's conv frontend is torchaudio's 7-layer temporal conv stack
(audio_wav2vec2/model.py:9 -> WAV2VEC2_BASE; k/s = 10/5, 3/2 x4, 2/2 x2,
512 ch, GroupNorm(512,512) after layer 0 only, exact GELU). XLA's lowering
runs it at 29.1% of bf16 peak (scripts/profile_w2v_conv.py, v5e) and the
cost decomposes (scripts/probe_w2v_layer0.py) as: layer-0 conv + global
GroupNorm ~5.1 ms (0.7% of FLOPs, ~4x its bandwidth floor), stride-2 tail
~6.2 ms (99% of FLOPs at ~51% of peak).

Verdict from the chip (v5e, 32x4s bf16, XLA baseline 10.97 ms/batch):
every Pallas formulation here measured SLOWER —

  conv_stack_fused   (layers 1-6, one VMEM-resident region)   12.30 ms
  conv_stack_l0fused (layer-0 two-pass + XLA tail)            13.52 ms
  conv_stack_gnfused (GN+GELU two-pass only)                  13.17 ms
  gn_gelu_pallas standalone vs the XLA GN chain            7.16 vs 4.43 ms

The GN pair's 7.16 ms against a ~1.6 ms traffic floor (and flat across
tile sizes 1024-3328, i.e. NOT grid overhead) says Mosaic's streaming of
these bandwidth-bound elementwise/reduce shapes loses to XLA's fusion
pipeline on this toolchain — consistent with ops/logmel_pallas' device
kernel row (logmel_kernel_device_speedup 0.84). What actually shipped is
the XLA-level rewrite the probes surfaced: ConvFeatureExtractor
``fused_glue`` (layer-0 strided-window GEMM + one-pass GroupNorm stats,
stack 11.36 -> 10.46 ms, models/wav2vec2.py).

The kernels stay: equality-tested (tests/test_w2v_conv_pallas.py), they
document the Mosaic capability envelope (see the probe scripts), and the
balance may flip on other TPU generations.

Design notes for conv_stack_fused — layers 1..6 as ONE fused region: a
tile of the final output (TILE frames) is produced from its full
receptive field in layer-1 input (TILE*64 + 15 frames) without any
intermediate leaving VMEM.

Key structural facts the kernel exploits:

- Every fused layer has stride 2, so folding row pairs into lanes —
  r = x.reshape(n/2, 2C), i.e. r[t] = [x[2t] | x[2t+1]] — turns each conv
  into contiguous MXU GEMMs with zero wasted FLOPs:
      k=2:  out[t] = x[2t] W0 + x[2t+1] W1            = r[t] @ [[W0],[W1]]
      k=3:  out[t] = ... + x[2t+2] W2                 = r[t] @ [[W0],[W1]]
                                                      + r[t+1, :C] @ W2
  Mosaic rejects strided sublane slices (x[0::2] fails to lower: "Shape
  mismatch in input, indices and output") but supports exactly this
  minor-dims fold (scripts/probe_pallas_strided.py: probe b OK, probes
  a/a' FAIL); the remaining slices are lane-aligned ([:, :512]) or
  unit-offset sublane slices.
- The receptive-field halo across all 6 layers is only 15 input frames, so
  tiles are near-disjoint: the input is read once, not re-read per layer.
- Layer 0 (k=10, s=5, c_in=1) is 0.7% of the FLOPs and purely
  bandwidth-bound (it writes the [B, 12799, 512] layer-1 input); it stays in
  XLA together with the GroupNorm (global time-axis statistics) and fuses
  with the kernel-input padding.

Halo mechanics: the padded layer-1 input is passed TWICE with different
BlockSpecs — a [TILE*64, C] main block at tile index i and a [128, C] halo
block starting exactly where the main block ends (index 16*TILE/32... the
index map multiplies out to start = (i+1)*TILE*64). The kernel concatenates
main + first 16 halo rows and runs the chain.

Numerics: GEMMs accumulate in f32 on the MXU (preferred_element_type), GELU
(exact, erf) applied in f32, activations re-cast to bf16 between layers —
same placement as the XLA path, equality-tested to bf16 tolerance in
tests/test_w2v_conv_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mer_tpu.models.wav2vec2 import Wav2Vec2Config

# fused geometry (layers 1..6 of the base config) — asserted at call time
_FUSED_KERNELS = (3, 3, 3, 3, 2, 2)
_FUSED_STRIDES = (2, 2, 2, 2, 2, 2)
_STRIDE_PROD = 64  # prod(_FUSED_STRIDES)
_HALO = 16         # receptive-field halo is 15 rows; 16 keeps slices even
_C = 512


def _erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz-Stegun 7.1.26 (|eps| <= 1.5e-7, i.e. f32-accurate):
    Mosaic has no erf lowering ("Unimplemented primitive ... erf"), and the
    kernel's GELU error budget is bf16 resolution (~4e-3) anyway."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_poly(x * np.float32(1.0 / np.sqrt(2.0))))


def _fold_pairs(x):
    """[n, C] -> [ceil(n/2), 2C] with row t = [x[2t] | x[2t+1]] (zero row
    appended first when n is odd — callers never read the pad half)."""
    n = x.shape[0]
    if n % 2:
        x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return x.reshape(-1, 2 * _C)


def _conv_chain(x, w3_ref, w2_ref, dtype):
    """Run conv1..conv6 on a [n, C] tile held in VMEM (or as a traced value,
    under interpret mode / the reference jnp path)."""
    for j in range(4):  # k=3, s=2
        w = w3_ref[j]
        m = (x.shape[0] - 3) // 2 + 1
        r = _fold_pairs(x)
        acc = jnp.dot(r[:m], w[: 2 * _C], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            r[1 : m + 1, :_C], w[2 * _C :], preferred_element_type=jnp.float32
        )
        x = _gelu_exact(acc).astype(dtype)
    for j in range(2):  # k=2, s=2
        m = (x.shape[0] - 2) // 2 + 1
        r = _fold_pairs(x)
        acc = jnp.dot(r[:m], w2_ref[j], preferred_element_type=jnp.float32)
        x = _gelu_exact(acc).astype(dtype)
    return x


def _kernel(main_ref, halo_ref, w3_ref, w2_ref, out_ref, *, dtype):
    x = jnp.concatenate([main_ref[0], halo_ref[0][:_HALO]], axis=0)
    out_ref[0] = _conv_chain(x, w3_ref, w2_ref, dtype).astype(out_ref.dtype)


def _stack_weights(params: dict, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """conv_1..conv_4 -> [4, 3*C, C]; conv_5..conv_6 -> [2, 2*C, C]
    (tap-major rows, matching kernel.reshape(k*cin, cout))."""
    w3 = jnp.stack(
        [params[f"conv_{i}"]["kernel"].reshape(3 * _C, _C) for i in range(1, 5)]
    ).astype(dtype)
    w2 = jnp.stack(
        [params[f"conv_{i}"]["kernel"].reshape(2 * _C, _C) for i in range(5, 7)]
    ).astype(dtype)
    return w3, w2


def _layer0(params: dict, waveforms: jnp.ndarray, cfg: Wav2Vec2Config, dtype) -> jnp.ndarray:
    """Layer 0 conv + GroupNorm(C, C) + exact GELU, XLA-side (matches
    ConvFeatureExtractor / conv_stack_gemm placement: f32 GN statistics)."""
    x = waveforms[:, :, None].astype(dtype)
    kernel = params["conv_0"]["kernel"].astype(dtype)  # [10, 1, C]
    x = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(cfg.conv_stride[0],), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    gp = params["group_norm"]
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=1, keepdims=True)
    var = xf.var(axis=1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    x = (xf * gp["scale"] + gp["bias"]).astype(jnp.float32)
    # XLA-side: true erf (the polynomial is only needed inside the kernel)
    x = 0.5 * x * (1.0 + jax.lax.erf(x * np.float32(1.0 / np.sqrt(2.0))))
    return x.astype(dtype)


def _l0_phase_gemms(re_ref, ro_ref, w_ref, half):
    """The two phase GEMMs of the folded layer-0 conv for one tile.

    re/ro blocks are [1, half//8, 128]: 8 zero-padded 16-wide fold rows per
    128-lane row (lane-aligned HBM blocks). Mosaic cannot shape-cast lanes
    below 128 ([half//8,128]->[half,16] fails "unsupported shape cast"), so
    instead of unpacking the folds we GEMM the packed rows directly against
    a block-diagonal [128, 8C] tap matrix (row block j holds the taps for
    fold slot j): one [half//8,128]x[128,8C] MXU pass computes all 8 folds
    per row, and the output unpacks with a lane-PRESERVING reshape
    [half//8, 8C] -> [half, C] (probe d). The zero blocks cost 6.4x the
    useful FLOPs — 27 vs 4.2 GF on the 32x4s batch, ~0.14 ms at peak —
    irrelevant next to the ~2 GB of HBM glue this kernel removes."""
    r_e = re_ref[0]
    r_o = ro_ref[0]
    w = w_ref[...]
    c = w.shape[1] // 8
    e = jnp.dot(r_e, w, preferred_element_type=jnp.float32).reshape(half, c)
    o = jnp.dot(r_o, w, preferred_element_type=jnp.float32).reshape(half, c)
    return e, o


def _l0_stats_kernel(re_ref, ro_ref, w_ref, sum_ref, sq_ref, *, half, t0):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        sum_ref[0] = jnp.zeros_like(sum_ref[0])
        sq_ref[0] = jnp.zeros_like(sq_ref[0])

    e, o = _l0_phase_gemms(re_ref, ro_ref, w_ref, half)
    # fold row m holds output frames t=2m (even) / t=2m+1 (odd); mask frames
    # beyond T0 so the zero-padded tail doesn't pollute the GroupNorm stats
    m = ti * half + jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
    e = jnp.where(2 * m < t0, e, 0.0)
    o = jnp.where(2 * m + 1 < t0, o, 0.0)
    s = jnp.sum(e, axis=0) + jnp.sum(o, axis=0)
    sq = jnp.sum(e * e, axis=0) + jnp.sum(o * o, axis=0)
    sum_ref[0] += jnp.broadcast_to(s[None], sum_ref[0].shape)
    sq_ref[0] += jnp.broadcast_to(sq[None], sq_ref[0].shape)


def _l0_apply_kernel(re_ref, ro_ref, w_ref, sum_ref, sq_ref, g_ref, b_ref,
                     out_ref, *, half, t0, eps, dtype):
    e, o = _l0_phase_gemms(re_ref, ro_ref, w_ref, half)
    # interleave even/odd frames: row m = [e_m | o_m] -> rows 2m, 2m+1
    x = jnp.concatenate([e, o], axis=1).reshape(2 * half, e.shape[1])
    n = jnp.float32(t0)
    mean = sum_ref[0, 0, :] / n
    var = sq_ref[0, 0, :] / n - mean * mean
    xn = (x - mean[None]) * jax.lax.rsqrt(var[None] + eps)
    xn = xn * g_ref[0, 0, :][None] + b_ref[0, 0, :][None]
    out_ref[0] = _gelu_exact(xn).astype(out_ref.dtype)


def layer0_gn_pallas(
    params: dict,
    waveforms: jnp.ndarray,
    cfg: Wav2Vec2Config,
    dtype=jnp.bfloat16,
    tile: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Layer-0 conv (k=10, s=5, c_in=1) + GroupNorm(512, 512) + exact GELU as
    two fused Pallas passes with conv recompute.

    Why: scripts/probe_w2v_layer0.py (v5e, 32x4s bf16) puts this chain at
    ~5.1 ms of the conv stack's 11.3 — 0.7% of the FLOPs but ~45% of the
    time, because XLA materializes the [B, 12799, 512] conv output and makes
    ~4 more passes over it for the global GroupNorm + GELU (~2.1 GB of HBM
    traffic). GroupNorm needs full-time statistics, so a single streaming
    pass is impossible — instead the conv is computed TWICE (4.2 GF, free on
    the MXU): pass 1 accumulates per-(batch, channel) sum/sumsq across tiles
    (probe f), pass 2 recomputes each tile, normalizes, applies GELU and
    writes the only full-size HBM array once.

    The conv itself is two phase GEMMs over a [T/10, 10] fold of the wave
    (stride 5 = half the kernel: even frames read fold row m exactly, odd
    frames read the wave 5 samples later = the same fold of wave[5:]), taps
    zero-padded 10->16.

    Reference chain: torchaudio WAV2VEC2_BASE feature extractor layer 0
    (audio_wav2vec2/model.py:9); numerics match ConvFeatureExtractor
    (models/wav2vec2.py): bf16 GEMMs accumulated f32, f32 GN stats, exact
    GELU, bf16 out.
    """
    if cfg.conv_kernel[0] != 10 or cfg.conv_stride[0] != 5 or cfg.conv_dim[0] != _C:
        raise ValueError("layer0_gn_pallas supports the base layer-0 geometry only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, l = waveforms.shape
    t0 = (l - cfg.conv_kernel[0]) // cfg.conv_stride[0] + 1
    half = tile // 2
    assert half % 8 == 0
    n_even = (t0 + 1) // 2
    n_tiles = math.ceil(n_even / half)
    n_pad = n_tiles * half

    wave = waveforms.astype(dtype)
    wave = jnp.pad(wave, ((0, 0), (0, 10 * n_pad + 15 - l)))
    # [B, n_pad, 10] folds, taps padded to 16, packed 8 rows per 128 lanes
    r_e = jnp.pad(wave[:, : 10 * n_pad].reshape(b, n_pad, 10), ((0, 0), (0, 0), (0, 6)))
    r_o = jnp.pad(wave[:, 5 : 5 + 10 * n_pad].reshape(b, n_pad, 10), ((0, 0), (0, 0), (0, 6)))
    r_e = r_e.reshape(b, n_pad // 8, 128)
    r_o = r_o.reshape(b, n_pad // 8, 128)
    # block-diagonal tap matrix: slot j of a packed 128-lane row multiplies
    # taps 16j..16j+9 into output channels Cj..C(j+1)
    w16 = jnp.pad(params["conv_0"]["kernel"].reshape(10, _C), ((0, 6), (0, 0)))
    wbig = jnp.zeros((128, 8 * _C), w16.dtype)
    for j in range(8):
        wbig = jax.lax.dynamic_update_slice(wbig, w16, (16 * j, _C * j))
    wbig = wbig.astype(dtype)
    gp = params["group_norm"]
    gamma = jnp.broadcast_to(gp["scale"].astype(jnp.float32)[None, None], (1, 8, _C))
    beta = jnp.broadcast_to(gp["bias"].astype(jnp.float32)[None, None], (1, 8, _C))

    grid = (b, n_tiles)
    fold_spec = pl.BlockSpec((1, half // 8, 128), lambda bi, ti: (bi, ti, 0))
    w_spec = pl.BlockSpec((128, 8 * _C), lambda bi, ti: (0, 0))
    stat_spec = pl.BlockSpec((1, 8, _C), lambda bi, ti: (bi, 0, 0))
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    stats_sum, stats_sq = pl.pallas_call(
        functools.partial(_l0_stats_kernel, half=half, t0=t0),
        grid=grid,
        in_specs=[fold_spec, fold_spec, w_spec],
        out_specs=[stat_spec, stat_spec],
        out_shape=[jax.ShapeDtypeStruct((b, 8, _C), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=cparams,
    )(r_e, r_o, wbig)

    x1 = pl.pallas_call(
        functools.partial(
            _l0_apply_kernel, half=half, t0=t0, eps=cfg.layer_norm_eps, dtype=dtype
        ),
        grid=grid,
        in_specs=[fold_spec, fold_spec, w_spec, stat_spec, stat_spec,
                  pl.BlockSpec((1, 8, _C), lambda bi, ti: (0, 0, 0)),
                  pl.BlockSpec((1, 8, _C), lambda bi, ti: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, tile, _C), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, _C), dtype),
        interpret=interpret,
        compiler_params=cparams,
    )(r_e, r_o, wbig, stats_sum, stats_sq, gamma, beta)
    return x1[:, :t0]


def _gn_stats_kernel(x_ref, sum_ref, sq_ref, *, tile, t_valid):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        sum_ref[0] = jnp.zeros_like(sum_ref[0])
        sq_ref[0] = jnp.zeros_like(sq_ref[0])

    x = x_ref[0].astype(jnp.float32)  # [tile, C]
    row = ti * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(row < t_valid, x, 0.0)
    sum_ref[0] += jnp.broadcast_to(jnp.sum(x, axis=0)[None], sum_ref[0].shape)
    sq_ref[0] += jnp.broadcast_to(jnp.sum(x * x, axis=0)[None], sq_ref[0].shape)


def _gn_apply_kernel(x_ref, sum_ref, sq_ref, g_ref, b_ref, out_ref, *, t_valid, eps):
    x = x_ref[0].astype(jnp.float32)
    n = jnp.float32(t_valid)
    mean = sum_ref[0, 0, :] / n
    var = sq_ref[0, 0, :] / n - mean * mean
    xn = (x - mean[None]) * jax.lax.rsqrt(var[None] + eps)
    xn = xn * g_ref[0, 0, :][None] + b_ref[0, 0, :][None]
    out_ref[0] = _gelu_exact(xn).astype(out_ref.dtype)


def gn_gelu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    t_valid: int,
    eps: float,
    tile: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """GroupNorm(C groups, C channels) over the time axis + exact GELU as a
    two-pass Pallas pair on a [B, T_pad, C] activation (rows >= t_valid are
    pad and excluded from the statistics; their outputs are garbage for the
    caller to slice off).

    One stats pass accumulates sum AND sumsq together (one read of x), then
    one apply pass normalizes + GELUs (one read, one write): 3 passes over
    the activation vs XLA's ~5 for the same chain (jnp.var alone is a mean
    pass plus a squared-deviation pass; probe_w2v_layer0 times the XLA chain
    at ~4 ms on [32,12799,512] vs a ~1.6 ms bandwidth floor).  T_pad must be
    a multiple of ``tile`` — for conv outputs, pad the conv INPUT so the
    output lands tile-divisible (a wave pad is KBs; padding the activation
    would copy the full 419 MB)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_pad, c = x.shape
    assert t_pad % tile == 0, "pad upstream so T_pad is tile-divisible"
    n_tiles = t_pad // tile
    gamma = jnp.broadcast_to(scale.astype(jnp.float32)[None, None], (1, 8, c))
    beta = jnp.broadcast_to(bias.astype(jnp.float32)[None, None], (1, 8, c))

    grid = (b, n_tiles)
    x_spec = pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0))
    stat_spec = pl.BlockSpec((1, 8, c), lambda bi, ti: (bi, 0, 0))
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    stats_sum, stats_sq = pl.pallas_call(
        functools.partial(_gn_stats_kernel, tile=tile, t_valid=t_valid),
        grid=grid,
        in_specs=[x_spec],
        out_specs=[stat_spec, stat_spec],
        out_shape=[jax.ShapeDtypeStruct((b, 8, c), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=cparams,
    )(x)

    return pl.pallas_call(
        functools.partial(_gn_apply_kernel, t_valid=t_valid, eps=eps),
        grid=grid,
        in_specs=[x_spec, stat_spec, stat_spec,
                  pl.BlockSpec((1, 8, c), lambda bi, ti: (0, 0, 0)),
                  pl.BlockSpec((1, 8, c), lambda bi, ti: (0, 0, 0))],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        interpret=interpret,
        compiler_params=cparams,
    )(x, stats_sum, stats_sq, gamma, beta)


def conv_stack_gnfused(
    params: dict,
    waveforms: jnp.ndarray,
    cfg: Wav2Vec2Config,
    dtype=jnp.bfloat16,
    tile: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """ConvFeatureExtractor forward with ONLY the GroupNorm+GELU glue fused
    (gn_gelu_pallas); every conv stays in XLA.  The wave is zero-padded so
    conv_0's output length is tile-divisible — the pad frames are excluded
    from GN statistics and dropped before conv_1 (VALID convs never read
    them).  Drop-in for the module's apply on the same params tree."""
    if cfg.conv_dim[0] != _C:
        raise ValueError("conv_stack_gnfused supports C=512 stacks only")
    b, l = waveforms.shape
    k0, s0 = cfg.conv_kernel[0], cfg.conv_stride[0]
    t0 = (l - k0) // s0 + 1
    t_pad = math.ceil(t0 / tile) * tile
    l_pad = s0 * (t_pad - 1) + k0

    x = jnp.pad(waveforms.astype(dtype), ((0, 0), (0, l_pad - l)))[:, :, None]
    x = jax.lax.conv_general_dilated(
        x, params["conv_0"]["kernel"].astype(dtype), window_strides=(s0,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
    )
    gp = params["group_norm"]
    x = gn_gelu_pallas(x, gp["scale"], gp["bias"], t0, cfg.layer_norm_eps,
                       tile=tile, interpret=interpret)[:, :t0]
    for i in range(1, len(cfg.conv_dim)):
        kernel = params[f"conv_{i}"]["kernel"].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(cfg.conv_stride[i],), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.gelu(x, approximate=False)
    return x


def conv_stack_l0fused(
    params: dict,
    waveforms: jnp.ndarray,
    cfg: Wav2Vec2Config,
    dtype=jnp.bfloat16,
    tile: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """ConvFeatureExtractor forward with the layer-0 chain as the fused
    Pallas pair (layer0_gn_pallas) and layers 1..6 in XLA — the measured
    division of labor: XLA runs the stride-2 tail at ~51% of bf16 peak
    (rest16_xla, probe_w2v_layer0), while the Pallas fusion removes layer
    0's ~2.1 GB of HBM glue. Drop-in for the module's apply."""
    x = layer0_gn_pallas(params, waveforms, cfg, dtype=dtype, tile=tile,
                         interpret=interpret)
    for i in range(1, len(cfg.conv_dim)):
        kernel = params[f"conv_{i}"]["kernel"].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(cfg.conv_stride[i],), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.gelu(x, approximate=False)
    return x


def conv_stack_fused(
    params: dict,
    waveforms: jnp.ndarray,
    cfg: Wav2Vec2Config,
    dtype=jnp.bfloat16,
    tile: int = 32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """ConvFeatureExtractor forward with layers 1..6 as one fused Pallas
    region. Drop-in for the module's apply on the same params tree.

    ``tile``: output frames produced per kernel invocation (VMEM working set
    scales linearly; 32 fits comfortably). ``interpret``: force interpret
    mode (defaults to on for non-TPU backends so tests run on CPU).
    """
    if (tuple(cfg.conv_kernel[1:]), tuple(cfg.conv_stride[1:])) != (
        _FUSED_KERNELS,
        _FUSED_STRIDES,
    ) or cfg.conv_dim != (512,) * 7:
        raise ValueError("conv_stack_fused supports the base conv geometry only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    x1 = _layer0(params, waveforms, cfg, dtype)  # [B, T1, C]
    b, t1, c = x1.shape
    lengths = t1
    for k, s in zip(_FUSED_KERNELS, _FUSED_STRIDES):
        lengths = (lengths - k) // s + 1
    t_out = lengths

    n_tiles = math.ceil(t_out / tile)
    main = tile * _STRIDE_PROD
    t_pad = n_tiles * main + 128  # one full halo block past the last tile
    x1 = jnp.pad(x1, ((0, 0), (0, t_pad - t1), (0, 0)))

    w3, w2 = _stack_weights(params, dtype)
    kernel = functools.partial(_kernel, dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, main, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 128, c), lambda bi, ti: (bi, ti * (main // 128) + (main // 128), 0)),
            pl.BlockSpec((4, 3 * _C, _C), lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((2, 2 * _C, _C), lambda bi, ti: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c), dtype),
        interpret=interpret,
        # the default 16 MB scoped-VMEM budget caps tile at 16, which leaves
        # the deepest layers' GEMMs at m=16..63 rows — MXU-starved. Raising
        # the budget buys tile>=64 (m>=64 everywhere but the last layer).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x1, x1, w3, w2)
    return out[:, :t_out, :]
