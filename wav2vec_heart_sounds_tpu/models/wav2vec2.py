"""Wav2Vec 2.0 encoder in Flax, TPU-first.

From-scratch implementation of the wav2vec2-base architecture the reference consumes through
HF ``transformers`` (reference src/mpcg_wav2vec/classify/wav2vec.py:26-90): 7-layer strided
conv feature encoder (group-norm variant), feature projection, weight-normed positional
convolution, and a 12-layer post-norm transformer encoder. Design choices for TPU:

* a ``compute_dtype`` (bfloat16 by default on TPU) threads through every block; parameters and
  softmax/layer-norm statistics stay float32, so matmuls hit the MXU at bf16 with f32
  accumulation (``preferred_element_type``);
* attention over the ~100-200 tokens a 2-4 s heart-sound window produces is a single fused
  einsum chain — no KV paging or masking machinery (sequences are fixed-length by design);
* optional LoRA adapters on the q/v projections (r=8, alpha=16 — the reference's peft config,
  wav2vec.py:54-57) add a rank-8 bypass without touching the frozen base kernels;
* SpecAugment-style time masking (mask_prob 0.05, span 10) is applied in training mode via an
  explicit PRNG key, matching HF's default fine-tuning behavior.

Weights port from the HF checkpoint via :mod:`.hf_port`; random init follows HF's normal(0.02)
scheme so ``--random-init`` runs are distribution-equivalent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

HIDDEN = 768  # wav2vec2-base hidden size


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = HIDDEN
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    lora_rank: int = 0          # 0 disables LoRA; reference uses r=8
    lora_alpha: float = 16.0
    lora_dropout: float = 0.05
    remat: bool = False         # rematerialise encoder layers (memory <- FLOPs trade)
    remat_conv: bool = False    # rematerialise the conv feature encoder in backward
    time_align: int = 8         # pad all time axes to multiples of this (0 = exact lengths)

    @classmethod
    def tiny(cls, **kw) -> "Wav2Vec2Config":
        """Small config for tests (matches a scaled-down HF Wav2Vec2Config)."""
        base = dict(conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
                    hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                    pos_conv_kernel=16, pos_conv_groups=2)
        base.update(kw)
        return cls(**base)

    def feat_extract_output_length(self, input_length: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            input_length = (input_length - k) // s + 1
        return input_length



def _dropout(mod: nn.Module, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """Dropout that uses the hardware-PRNG Pallas kernel on TPU (threefry bit generation
    for the encoder's big masks profiles at ~17 ms/step otherwise); flax Dropout on CPU."""
    if deterministic or rate <= 0.0:
        return x
    import os

    if jax.default_backend() != "cpu" and os.environ.get("W2VHS_NO_FLASH") != "1":
        from ..ops.pallas.dropout import prng_dropout

        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max)
        return prng_dropout(x, seed, rate)
    return nn.Dropout(rate, deterministic=False)(x)


class ChannelGroupNorm(nn.Module):
    """Per-channel GroupNorm over time (num_groups == channels), dtype-mixed.

    Statistics accumulate in float32; the normalize+affine arithmetic runs in the compute
    dtype so XLA can fuse it into the following GELU without materialising a float32 copy of
    the [B, T', 512] conv activation (the flax GroupNorm path writes one — measured as part
    of the conv-encoder's 43 ms/step HBM traffic). Param names match nn.GroupNorm so HF
    checkpoints port unchanged.

    ``valid_len`` supports tile-aligned padded inputs: frames beyond ``valid_len`` are
    masked out of the statistic sums (they may hold partial-window garbage), so the
    statistics are identical to the unpadded computation; the normalized pad frames are
    don't-care values masked downstream.
    """
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    valid_len: int = 0           # 0 = all frames are real
    fuse_gelu: bool = False      # emit gelu(norm(x)) via the recompute-in-backward VJP

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        denom = float(self.valid_len or x.shape[1])
        xf = x.astype(jnp.float32)
        if self.valid_len and self.valid_len != x.shape[1]:
            frame = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
            xf = jnp.where(frame < self.valid_len, xf, 0.0)
        mean = jnp.sum(xf, axis=1, keepdims=True) / denom                # [B, 1, C]
        var = jnp.sum(jnp.square(xf), axis=1, keepdims=True) / denom - jnp.square(mean)
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale[None, None, :]).astype(self.dtype)
        if self.fuse_gelu:
            return _gn_gelu_ew(x.astype(self.dtype), mean.astype(self.dtype), inv,
                               bias[None, None, :].astype(self.dtype))
        return (x.astype(self.dtype) - mean.astype(self.dtype)) * inv \
            + bias[None, None, :].astype(self.dtype)


def _cascade_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU for the conv-cascade activations: exact erf, or (opt-in via
    ``W2VHS_FAST_GELU=1``) the tanh approximation when running in bfloat16.

    The cascade evaluates ~1.26B GELUs per B=96 step (fwd, plus their gradients in bwd)
    over [B, T', 512] tensors; the erf rational approximation makes those elementwise
    fusions VPU-compute-bound rather than HBM-bound (the 9.8 ms GN+GELU fusion runs 2.1x
    above its pure-bandwidth cost). The tanh form's |error| vs erf is < 1e-3 — below one
    bf16 ulp at unit magnitude — so bf16 outputs are unchanged to working precision;
    f32 (CPU/parity) paths always use exact erf. Measured: 515.0 -> 559.9 w/s at B=96
    (together with the GroupNorm recompute VJP). ``W2VHS_FAST_GELU=0`` restores erf."""
    import os

    if x.dtype == jnp.bfloat16 and os.environ.get("W2VHS_FAST_GELU", "1") == "1":
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


def _gn_gelu_primal(x: jnp.ndarray, mean: jnp.ndarray, inv: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """Normalize + affine + GELU given precomputed per-(batch, channel) statistics."""
    return _cascade_gelu((x - mean) * inv + bias)


@jax.custom_vjp
def _gn_gelu_ew(x, mean, inv, bias):
    """:func:`_gn_gelu_primal` with a recompute-in-backward VJP.

    Plain autodiff saves both the pre-GELU GroupNorm output and the GELU output of the
    [B, T', 512] conv_0 activation — a double full-size HBM write in the forward (traced
    at 9.8 ms / 3.8 GB accessed at B=96). This custom VJP saves only the inputs: ``x`` is
    conv_0's output (already materialised for the conv backward) and the statistics are
    [B, 1, C]. The backward re-linearises the elementwise chain via ``jax.vjp`` — pure
    elementwise work that XLA fuses into the gradient pass that reads ``x`` anyway, with
    numerics identical to standard autodiff. No ``jax.checkpoint``: its optimization
    barriers measured 486.6 vs 515.0 w/s (they also pull the statistics reductions out of
    conv_0's fusion); a custom VJP leaves XLA free to fuse on both sides."""
    return _gn_gelu_primal(x, mean, inv, bias)


def _gn_gelu_ew_fwd(x, mean, inv, bias):
    return _gn_gelu_primal(x, mean, inv, bias), (x, mean, inv, bias)


def _gn_gelu_ew_bwd(res, g):
    _, vjp = jax.vjp(_gn_gelu_primal, *res)
    return vjp(g)


_gn_gelu_ew.defvjp(_gn_gelu_ew_fwd, _gn_gelu_ew_bwd)


def conv_time_plan(t: int, kernels, strides, align: int, fused=None):
    """Static padding plan for a tile-aligned strided-conv cascade.

    Returns ``(padded_input, padded_lens, real_lens)``. Layers flagged in ``fused`` run as
    the Pallas conv+GELU kernel; their padded output length must admit a time block
    (:func:`...ops.pallas.conv.pick_bt`: a [64, 512] multiple-of-16 divisor) and their
    padded *input* must reserve the kernel's 8-row halo (``P_in >= stride * P_out + 8``).
    Non-fused layers only need the phase-matmul bound
    (``P_in >= s * (P_out + ceil(k/s) - 1)``). Keeping the halo requirement out of
    non-fused layers and the alignment at 16 rather than the block size holds total
    padding to ~1-2% (a blanket 128-aligned ``P_in >= 2P + 8`` cascade measured ~8.6%
    extra length at every layer — it cost more than the kernel won).

    Real output frames only ever read real (or zero-padded-waveform) inputs because VALID
    windows are forward-looking: frame ``t`` of layer ``i`` reads inputs
    ``s*t .. s*t+k-1 <= real_in - 1``.
    """
    from ..ops.pallas.conv import pick_bt

    real = []
    n = t
    for k, s in zip(kernels, strides):
        n = (n - k) // s + 1
        real.append(n)
    fused = list(fused) if fused else [False] * len(real)
    aligns = [16 if f else align for f in fused]
    ceil_to = lambda v, m: -(-v // m) * m

    def settle(p, i, lower):
        """Round layer i's padded length up until every static constraint holds."""
        while (p < lower
               or (i + 1 < len(real) and p % strides[i + 1])
               or (fused[i] and not pick_bt(p))):
            p += aligns[i]
        return p

    padded = [0] * len(real)
    p = settle(ceil_to(real[-1], aligns[-1]), len(real) - 1, real[-1])
    for i in reversed(range(len(real))):
        k, s = kernels[i], strides[i]
        padded[i] = p
        need = s * p + (8 if fused[i] else s * (-(-k // s) - 1))
        if i > 0:
            p = settle(ceil_to(max(real[i - 1], need), aligns[i - 1]), i - 1, need)
    pad_input = ceil_to(max(t, need), strides[0])
    return pad_input, padded, real


class FusedDenseGeluDropout(nn.Module):
    """``dropout(gelu(Dense(x)))`` with the fused Pallas activation pass on TPU training.

    Keeps the forward matmul's epilogue free of transcendental work (the erf-GELU epilogue
    XLA otherwise fuses into the dot measured it at ~86 TF/s vs 162-190 for the clean
    backward dots) and folds the dropout mask, GELU gradient and the bias-grad column sums
    into one backward pass (ops/pallas/ffn.py). Param names/shapes match ``nn.Dense``
    ("kernel"/"bias") so init and checkpoints are unchanged; eval/CPU paths use the plain
    Dense + exact GELU + dropout composition.

    Accepted numerics mismatch: in bf16 the fused training path defaults to the tanh
    GELU (ops/pallas/ffn._tanh_act; |err| < 1e-3, below one bf16 ulp at unit scale)
    while this eval/CPU fallback keeps exact erf, matching the HF reference's
    ``hidden_act='gelu'`` — so a model trained with tanh is evaluated with a very
    slightly different activation. That mismatch is intentional: eval numerics stay
    pinned to the HF goldens, and the train-time delta is below bf16 resolution.
    ``W2VHS_FFN_TANH=0`` removes it entirely.
    """
    features: int
    rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        import os

        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(), (cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        if (not deterministic and self.rate > 0.0 and jax.default_backend() != "cpu"
                and os.environ.get("W2VHS_NO_FLASH") != "1"
                and os.environ.get("W2VHS_NO_FFNFUSE") != "1"):
            from ..ops.pallas.ffn import dense_gelu_dropout

            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      jnp.iinfo(jnp.int32).max)
            lead = x.shape[:-1]
            y = dense_gelu_dropout(x.reshape(-1, cin), w, b, seed, self.rate)
            return y.reshape(*lead, self.features)
        h = jnp.dot(x, w.astype(self.dtype)) + b.astype(self.dtype)
        h = nn.gelu(h, approximate=False)
        return _dropout(self, h, self.rate, deterministic)


class FastLayerNorm(nn.Module):
    """LayerNorm with float32 statistics but compute-dtype input/output tensors.

    ``nn.LayerNorm(dtype=float32)`` on a bf16 stream materialises float32 activations and
    standalone convert ops around every norm (profiled ~10 ms/step across the 12 encoder
    layers at B=96). Computing the stats in f32 *inline* and emitting the compute dtype
    keeps every materialised tensor bf16 while preserving flax's exact statistics formula
    (mean-of-squares minus squared-mean), so f32-mode parity tests are unchanged.
    Param names/shapes match ``nn.LayerNorm`` ("scale"/"bias", [D]) for checkpoint port.
    """
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return _ln_apply(x, scale, bias, self.epsilon, self.dtype)


def _ln_apply(x, scale, bias, eps, dtype):
    """FastLayerNorm math as a function (shared with the fused residual-tail path)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


class _LnParams(nn.Module):
    """FastLayerNorm-compatible params (scale/bias at the same path/initializers), so the
    encoder layers can route the ``dropout -> add -> norm`` tail through the fused Pallas
    op while keeping the checkpoint tree identical."""

    @nn.compact
    def __call__(self, d: int):
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return scale, bias


def _resid_tail(mod: nn.Module, h: jnp.ndarray, x: jnp.ndarray, scale, bias,
                rate: float, eps: float, dtype, deterministic: bool) -> jnp.ndarray:
    """``LayerNorm(x + dropout(h))`` — fused Pallas op on TPU training, XLA otherwise."""
    import os

    if (not deterministic and rate > 0.0 and jax.default_backend() != "cpu"
            and os.environ.get("W2VHS_NO_FLASH") != "1"
            and os.environ.get("W2VHS_NO_RESIDFUSE") != "1"):
        from ..ops.pallas.resid import dropout_add_layernorm

        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max)
        return dropout_add_layernorm(h, x, scale, bias, seed, rate, eps)
    h = _dropout(mod, h, rate, deterministic)
    return _ln_apply(x + h, scale, bias, eps, dtype)


def _conv_fuse_enabled() -> bool:
    """Opt-in gate for the Pallas conv+GELU kernel (``W2VHS_CONVFUSE=1``).

    Off by default: measured a net loss in-model in two configurations (see
    ops/pallas/conv.py STATUS) — XLA fuses the GELU and its backward into the conv
    kernels while the custom-vjp boundary forces extra HBM materialisations."""
    import os

    return (os.environ.get("W2VHS_CONVFUSE") == "1"
            and os.environ.get("W2VHS_NO_FLASH") != "1")


class FusedConvGelu(nn.Module):
    """``gelu(VALID strided conv)``: XLA conv + exact GELU by default; the fused Pallas
    kernel when opted in (see :func:`_conv_fuse_enabled`) and supported (kernel 3 /
    stride 2 / 128-multiple channels). Param name/shape (``kernel`` [k, in, out]) matches
    nn.Conv so HF ports are unchanged."""
    features: int
    kernel: int
    stride: int
    out_len: int
    use_kernel: bool = False   # planner intent: only layers whose plan reserved the halo
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from ..ops.pallas.conv import conv_gelu, conv_gelu_supported

        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        if (self.use_kernel and _conv_fuse_enabled()
                and conv_gelu_supported(x.shape, self.kernel, self.stride, x.shape[-1],
                                        self.features, self.out_len)):
            return conv_gelu(x, w.astype(self.dtype), self.out_len)
        if (os.environ.get("W2VHS_CONV_IMPL") == "phase"
                and x.shape[1] % self.stride == 0):
            # Phase-split matmul path: XLA's conv fusions on these shapes profile at only
            # ~32% MFU (implicit-matmul conv scheduling); explicit dots lower as plain
            # MXU matmuls, and autodiff gives transposed dots with the GELU gradient
            # fused as an elementwise prologue.
            k, s, cin = self.kernel, self.stride, x.shape[-1]
            b, t = x.shape[0], x.shape[1]
            f = x.reshape(b, t // s, s * cin)
            y = None
            for g in range(-(-k // s)):
                kk = min(s, k - g * s)
                wg = w[g * s:g * s + kk].reshape(kk * cin, self.features)
                seg = jax.lax.slice(f, (0, g, 0), (b, g + self.out_len, kk * cin))
                part = seg @ wg.astype(self.dtype)
                y = part if y is None else y + part
            return _cascade_gelu(y)
        wk = w.astype(self.dtype)
        if (self.kernel == 3 and self.stride == 2
                and os.environ.get("W2VHS_CONV_K4") == "1"):
            # Experiment (opt-in, measured 477 vs 493 w/s — a net loss): zero-pad the
            # kernel to k=4 hoping even kernels hit the k=2 layers' faster lowering;
            # XLA's k=4 path was not faster here. Numerically identical (zero tap).
            wk = jnp.pad(wk, ((0, 1), (0, 0), (0, 0)))

        def conv(xc, o):
            y = jax.lax.conv_general_dilated(xc, wk, window_strides=(self.stride,),
                                             padding="VALID",
                                             dimension_numbers=("NWC", "WIO", "NWC"))
            return _cascade_gelu(y[:, :o])

        if (self.kernel == 3 and self.stride == 2 and self.out_len >= 4096
                and self.out_len % 2 == 0
                and os.environ.get("W2VHS_CONV_SPLIT") != "0"):
            # Halve the time axis into two conv_2-geometry convolutions: XLA lowers the
            # [B,~6k,512] shape at 135-160 TF/s but the [B,~13k,512] conv_1 shape at only
            # 63-81 TF/s — and autodiff splits the backward the same way. Measured
            # 493.1 -> 516.5 w/s at B=96. The input slices fuse into the conv reads;
            # one output concat. Seam: right frame j reads rows 2*O1+2j .. 2*O1+2j+2.
            o1 = self.out_len // 2
            o2 = self.out_len - o1
            left = conv(x[:, :2 * o1 + 2], o1)
            right = conv(x[:, 2 * o1:2 * o1 + 2 * o2 + 2], o2)
            return jnp.concatenate([left, right], axis=1)
        return conv(x, self.out_len)


class FeatureEncoder(nn.Module):
    """Strided conv stack: raw waveform [B, T] -> latent frames [B, T'(, padded), conv_dim[-1]].

    Group-norm variant: only the first conv is followed by a (channel-wise) GroupNorm.
    With ``config.time_align > 0`` every intermediate time axis is padded to a tile-aligned
    length (real frames bit-exact; pad frames are don't-care values masked downstream), so
    XLA's [B, T, C] <-> [B*T, C] matmul collapses are free bitcasts, and the big k=3/s=2
    conv layers run as fused phase-matmul + GELU Pallas kernels (the plan reserves their
    halo rows and picks lengths admitting a divisor time block). ``time_align = 0`` keeps
    the exact-length nn.Conv path.
    """
    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if not cfg.time_align:
            h = x[:, :, None].astype(self.dtype)               # [B, T, 1]
            for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                                cfg.conv_stride)):
                h = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                            use_bias=False, dtype=self.dtype, name=f"conv_{i}")(h)
                if i == 0:
                    h = ChannelGroupNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                         name="group_norm")(h)
                h = nn.gelu(h, approximate=False)
            return h

        cin = (1,) + cfg.conv_dim[:-1]
        fuse_on = _conv_fuse_enabled()
        # r >= 4096: only the longest k=3/s=2 layer (conv_1) — XLA's conv fusions run at
        # ~63 TF/s there but 135-160 TF/s on the shorter layers (B=96 trace), so fusing
        # the short layers is a measured net loss while conv_1 has ~2x headroom.
        fused = [fuse_on and (k == 3 and s == 2 and ci % 128 == 0 and d % 128 == 0
                              and r >= 4096)
                 for (d, k, s, ci, r) in zip(cfg.conv_dim, cfg.conv_kernel,
                                             cfg.conv_stride, cin,
                                             _real_lens(x.shape[1], cfg))]
        pad_in, padded, real = conv_time_plan(x.shape[1], cfg.conv_kernel, cfg.conv_stride,
                                              cfg.time_align, fused=fused)
        if pad_in != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, pad_in - x.shape[1])))
        h = x[:, :, None].astype(self.dtype)
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            if i == 0:
                h = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                            use_bias=False, dtype=self.dtype, name=f"conv_{i}")(h)
                # Truncate to the plan length; the slice fuses into the GroupNorm mask.
                h = h[:, :padded[i]]
                import os as _os
                fuse = _os.environ.get("W2VHS_NO_GNFUSE") != "1"
                h = ChannelGroupNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                     valid_len=real[0], fuse_gelu=fuse,
                                     name="group_norm")(h)
                if not fuse:
                    h = _cascade_gelu(h)
            else:
                h = FusedConvGelu(dim, k, s, padded[i], use_kernel=fused[i],
                                  dtype=self.dtype, name=f"conv_{i}")(h)
        return h


def _real_lens(t: int, cfg: Wav2Vec2Config) -> list[int]:
    lens = []
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
        lens.append(t)
    return lens


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = FastLayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype,
                          name="layer_norm")(x)
        x = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                     name="projection")(x.astype(self.dtype))
        return _dropout(self, x, self.config.feat_proj_dropout, deterministic)


class _PatchDotGroupedConv(nn.Module):
    """Grouped conv lowered as per-group patch-matmuls — gated A/B vs XLA's grouped conv.

    Same param names/shapes as ``nn.Conv(feature_group_count=g)`` (kernel ``[k, C/g, C]``,
    bias ``[C]``) so checkpoints are interchangeable. Each group's conv becomes one dot
    ``[B*T, k*(C/g)] @ [k*(C/g), C/g]`` (contraction depth k*C/g, e.g. 6144 for
    wav2vec2-base) over patches extracted per group, sequenced with ``lax.map`` so only
    one group's patch tensor is live at a time. Arithmetic predicts this LOSES to XLA's
    grouped conv: the per-group N=C/g=48 output pads to the 128-lane MXU tile (2.67x
    padded-FLOP floor ≈ 2.4 ms fwd at B=96 vs XLA's measured 1.8 ms) plus the patch
    materialisation traffic — the gate exists to close the round-4 verdict's pos_conv
    lever with a measured A/B rather than arithmetic alone.
    """
    features: int
    kernel: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, g, c = self.kernel, self.groups, self.features
        ci = c // g
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, ci, c),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        b, t, _ = x.shape
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (k // 2, k // 2), (0, 0)))
        # [g, B, Tp, ci] group-major so lax.map sequences one group at a time.
        xg = jnp.moveaxis(xp.reshape(b, xp.shape[1], g, ci), 2, 0)
        wg = jnp.moveaxis(kernel.reshape(k, ci, g, ci), 2, 0)       # [g, k, ci, ci]

        def one_group(args):
            xi, wi = args                                           # [B, Tp, ci], [k, ci, ci]
            patches = jax.lax.conv_general_dilated_patches(
                xi, (k,), (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"))
            # Patch channels are channel-major (row = ci_in * k + tap), so the weight
            # rows must follow the same order.
            w2 = wi.transpose(1, 0, 2).reshape(k * ci, ci)
            return jax.lax.dot_general(
                patches, w2.astype(self.dtype),
                (((2,), (0,)), ((), ())))                           # [B, T_out, ci]

        out = jax.lax.map(one_group, (xg, wg.astype(self.dtype)))   # [g, B, T_out, ci]
        out = jnp.moveaxis(out, 0, 2).reshape(b, -1, c)[:, :t + (k % 2 == 0)]
        return out + bias.astype(self.dtype)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16, same-ish padding)."""
    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.pos_conv_kernel
        if os.environ.get("W2VHS_POSCONV") == "patchdot":
            h = _PatchDotGroupedConv(cfg.hidden_size, k, cfg.pos_conv_groups,
                                     dtype=self.dtype, name="conv")(x)
        else:
            h = nn.Conv(cfg.hidden_size, kernel_size=(k,), padding=[(k // 2, k // 2)],
                        feature_group_count=cfg.pos_conv_groups, dtype=self.dtype,
                        name="conv")(x.astype(self.dtype))
        if k % 2 == 0:                       # even kernel: drop the trailing extra frame
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class LoraDense(nn.Module):
    """Dense layer with an optional rank-r LoRA bypass: y = xW + b + (alpha/r) * drop(x) A B.

    The base kernel/bias use the same param names as a plain Dense so HF weights port
    unchanged; LoRA params (`lora_a` zeros-init on B per peft convention) are additive.
    """
    features: int
    rank: int = 0
    alpha: float = 16.0
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.Dense(self.features, dtype=self.dtype, name="base")(x)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.he_uniform(), (x.shape[-1], self.rank))
            b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
            h = x
            if self.lora_dropout > 0 and not deterministic:
                h = nn.Dropout(self.lora_dropout, deterministic=False)(h)
            bypass = (h.astype(self.dtype) @ a.astype(self.dtype)) @ b.astype(self.dtype)
            y = y + (self.alpha / self.rank) * bypass
        return y


class _DenseParams(nn.Module):
    """``nn.Dense``-compatible params (kernel/bias) without the matmul.

    Declaring the params separately from the compute lets the attention block fuse the
    q/k/v projections into one dot while keeping the checkpoint tree bit-identical to
    three ``nn.Dense``/:class:`LoraDense` modules (same param paths, shapes, and default
    initializers, so init RNG streams and HF ports are unchanged)."""
    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(), (cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LoraParams(nn.Module):
    """:class:`LoraDense`-compatible params: base kernel/bias + optional lora_a/lora_b."""
    features: int
    rank: int = 0

    @nn.compact
    def __call__(self, cin: int):
        k, b = _DenseParams(self.features, name="base")(cin)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.he_uniform(), (cin, self.rank))
            bb = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
            return k, b, a, bb
        return k, b, None, None


class SelfAttention(nn.Module):
    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    valid_len: int = 0           # mask key frames >= valid_len (0 = all real)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_heads
        hd = d // nh
        t_eff = self.valid_len or x.shape[1]
        x = x.astype(self.dtype)
        dt = self.dtype

        cin = x.shape[-1]
        wq, bq, aq, abq = _LoraParams(d, cfg.lora_rank, name="q_proj")(cin)
        wk, bk = _DenseParams(d, name="k_proj")(cin)
        wv, bv, av, abv = _LoraParams(d, cfg.lora_rank, name="v_proj")(cin)

        def bypass(a, bb):
            h = x
            if cfg.lora_dropout > 0 and not deterministic:
                h = nn.Dropout(cfg.lora_dropout, deterministic=False)(h)
            return (cfg.lora_alpha / cfg.lora_rank) * (
                (h.astype(dt) @ a.astype(dt)) @ bb.astype(dt))

        import os

        use_flash = (jax.default_backend() != "cpu"
                     and os.environ.get("W2VHS_NO_FLASH") != "1")
        # Fused QKV: one [cin, 3D] dot instead of three (fewer, larger MXU launches; one
        # head transpose of the packed tensor instead of three; the packed kernel reads
        # q/k/v from the same buffer via head-offset index maps — no slice copies).
        use_packed = ((use_flash and os.environ.get("W2VHS_NO_QKVFUSE") != "1"
                       and os.environ.get("W2VHS_ATTN_LAYOUT") != "bthd")
                      or os.environ.get("W2VHS_QKVFUSE") == "1")
        if use_packed:
            from ..ops.pallas.attention import flash_attention_qkv

            wqkv = jnp.concatenate([w.astype(dt) for w in (wq, wk, wv)], axis=1)
            bqkv = jnp.concatenate([b.astype(dt) for b in (bq, bk, bv)])
            qkv = x @ wqkv + bqkv                          # [B, T, 3D]
            if cfg.lora_rank > 0:
                zq, zv = bypass(aq, abq), bypass(av, abv)
                qkv = qkv + jnp.concatenate([zq, jnp.zeros_like(zq), zv], axis=-1)
            qkv = jnp.swapaxes(qkv.reshape(x.shape[0], x.shape[1], 3 * nh, hd), 1, 2)
            rate = 0.0 if deterministic else cfg.attention_dropout
            seed = jnp.zeros((), jnp.int32)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max)
            # out_layout="bthd": the kernel emits [B, T, H, hd] directly — the
            # post-kernel transpose disappears (fwd + the cotangent's twin in bwd) and
            # the out-projection reshape becomes a free bitcast. Targets the trace's
            # 17.5 ms layout bucket (round-4; gated until the full-step A/B lands —
            # W2VHS_ATTN_OUT=bthd enables).
            out_bthd = os.environ.get("W2VHS_ATTN_OUT", "bhtd") == "bthd"
            out = flash_attention_qkv(qkv, seed, rate, t_eff,
                                      jax.default_backend() == "cpu",
                                      "bthd" if out_bthd else "bhtd")
            if not out_bthd:
                out = jnp.swapaxes(out, 1, 2)              # [B, T, H, hd]
            out = out.astype(dt).reshape(out.shape[0], out.shape[1], d)
            return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)

        def dense(w, b_):
            return x @ w.astype(dt) + b_.astype(dt)

        q, k, v = dense(wq, bq), dense(wk, bk), dense(wv, bv)
        if cfg.lora_rank > 0:
            q = q + bypass(aq, abq)
            v = v + bypass(av, abv)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd)

        q, k, v = split(q), split(k), split(v)

        if use_flash:
            # Fused Pallas attention: no [B, H, T, T] tensors in HBM, dropout in-kernel
            # (profiled as the single hottest component of the train step otherwise).
            from ..ops.pallas.attention import flash_attention

            rate = 0.0 if deterministic else cfg.attention_dropout
            seed = jnp.zeros((), jnp.int32)
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max)
            if os.environ.get("W2VHS_ATTN_LAYOUT") == "bthd":
                # Transpose-free variant: the kernel swaps head/time axes in VMEM. On
                # hardware this measured SLOWER than paying the XLA transposes (in-kernel
                # relayouts of all-heads blocks cost more than the ~9 ms they save), so
                # the default stays bhtd; kept as a gated experiment.
                out = flash_attention(q, k, v, seed, rate, t_eff,
                                      False, "bthd").astype(self.dtype)
            else:
                to_heads = lambda x: jnp.swapaxes(x, 1, 2)    # [B, H, T, hd]
                out = flash_attention(to_heads(q), to_heads(k), to_heads(v), seed, rate,
                                      t_eff)
                out = jnp.swapaxes(out, 1, 2).astype(self.dtype)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) \
                / jnp.sqrt(hd).astype(jnp.float32)
            if t_eff != x.shape[1]:                # mask padded key frames
                col = jnp.arange(x.shape[1])[None, None, None, :]
                scores = jnp.where(col < t_eff, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_dropout, deterministic=deterministic)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(out.shape[0], out.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-norm transformer block (wav2vec2-base: do_stable_layer_norm = False)."""
    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    valid_len: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        attn = SelfAttention(cfg, dtype=self.dtype, valid_len=self.valid_len,
                             name="attention")(x, deterministic)
        sc1, b1 = _LnParams(name="layer_norm")(cfg.hidden_size)
        x = _resid_tail(self, attn, x, sc1, b1, cfg.hidden_dropout,
                        cfg.layer_norm_eps, self.dtype, deterministic)
        import os

        if (not deterministic and jax.default_backend() != "cpu"
                and os.environ.get("W2VHS_NO_FLASH") != "1"
                and os.environ.get("W2VHS_FFN_MEGA", "1") == "1"):
            # FFN-sublayer megakernel (round-5 spike -> default): one Pallas program
            # computes W1 -> GELU -> act-dropout -> W2 -> hidden-dropout -> residual
            # -> LayerNorm with both weight matrices VMEM-resident (standalone A/B:
            # 6.07 -> 3.06 ms/layer fwd at B=96 shapes; grads pinned against
            # masked-XLA autodiff on hardware, scripts/megakernel_spike.py --verify).
            # Param paths/initializers are identical to the decomposed modules below,
            # so checkpoints, init RNG streams and HF ports are unchanged.
            from ..ops.pallas.megakernel import ffn_block

            d = cfg.hidden_size
            w1m, b1m = _DenseParams(cfg.intermediate_size, name="intermediate_dense")(d)
            w2m, b2m = _DenseParams(d, name="output_dense")(cfg.intermediate_size)
            sc2, bi2 = _LnParams(name="final_layer_norm")(d)
            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      jnp.iinfo(jnp.int32).max)
            lead = x.shape[:-1]
            y = ffn_block(x.reshape(-1, d).astype(self.dtype), w1m, b1m, w2m, b2m,
                          sc2, bi2, seed, cfg.activation_dropout, cfg.hidden_dropout,
                          cfg.layer_norm_eps)
            return y.reshape(*lead, d)
        h = FusedDenseGeluDropout(cfg.intermediate_size, cfg.activation_dropout,
                                  dtype=self.dtype,
                                  name="intermediate_dense")(x, deterministic)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)
        sc2, b2 = _LnParams(name="final_layer_norm")(cfg.hidden_size)
        return _resid_tail(self, h, x, sc2, b2, cfg.hidden_dropout,
                           cfg.layer_norm_eps, self.dtype, deterministic)


class Wav2Vec2Model(nn.Module):
    """Raw waveform [B, T] -> contextual representations [B, T', hidden]."""
    config: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 mask_key: jax.Array | None = None) -> jnp.ndarray:
        cfg = self.config
        real_len = cfg.feat_extract_output_length(x.shape[1])
        fe_cls = nn.remat(FeatureEncoder) if cfg.remat_conv else FeatureEncoder
        h = fe_cls(cfg, dtype=self.dtype, name="feature_encoder")(x)
        padded = h.shape[1] != real_len            # tile-aligned pad frames present
        h = FeatureProjection(cfg, dtype=self.dtype,
                              name="feature_projection")(h, deterministic=not train)

        # Created unconditionally so pretrained checkpoints port cleanly; used only when a
        # mask key is supplied in training (HF SpecAugment default behavior).
        mask_embed = self.param("masked_spec_embed", nn.initializers.uniform(scale=1.0),
                                (cfg.hidden_size,))
        if train and mask_key is not None and cfg.mask_time_prob > 0:
            mask = _sample_time_mask(mask_key, h.shape[0], h.shape[1],
                                     cfg.mask_time_prob, cfg.mask_time_length,
                                     valid_len=real_len)
            h = jnp.where(mask[:, :, None], mask_embed.astype(h.dtype)[None, None, :], h)

        if padded:
            # Zero the pad frames so the positional conv's window over the last real frames
            # sees exactly the zeros the unpadded computation would (conv pads with zeros).
            frame = jnp.arange(h.shape[1], dtype=jnp.int32)[None, :, None]
            h = jnp.where(frame < real_len, h, jnp.zeros((), h.dtype))
        pos = PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv_embed")(h)
        h = h + pos
        h = FastLayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                          name="layer_norm")(h)
        h = _dropout(self, h, cfg.hidden_dropout, not train)
        layer_cls = nn.remat(EncoderLayer, static_argnums=(2,)) if cfg.remat else EncoderLayer
        vl = real_len if padded else 0
        for i in range(cfg.num_layers):
            h = layer_cls(cfg, dtype=self.dtype, valid_len=vl, name=f"layers_{i}")(
                h, not train)
        return h[:, :real_len] if padded else h


def _sample_time_mask(key: jax.Array, batch: int, length: int, prob: float,
                      span: int, valid_len: int = 0) -> jnp.ndarray:
    """SpecAugment-style boolean time mask ``[B, T']``: ~prob*T' span starts, each ``span`` long.

    ``valid_len`` (when the time axis is tile-align padded) restricts both the span count and
    the start positions to the real frames, matching the unpadded sampling distribution.
    """
    real = valid_len or length
    num_spans = max(1, int(prob * real))
    starts = jax.random.randint(key, (batch, num_spans), 0, max(1, real - span))
    pos = jnp.arange(length)[None, None, :]
    hit = (pos >= starts[:, :, None]) & (pos < starts[:, :, None] + span)
    return jnp.any(hit, axis=1)
