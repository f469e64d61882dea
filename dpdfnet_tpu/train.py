"""Training utilities: losses and a sharded train step.

The reference ships no training loop (SURVEY.md §0); this module goes one
step beyond capability parity because the framework's forward is a pure,
differentiable function.  It provides the loss family the DPDFNet /
DeepFilterNet papers train with — compressed-spectral MSE, multi-resolution
STFT loss, SI-SNR, and the LSNR auxiliary — plus an optax train step that
shards the batch over a device mesh.

Note: the fused Pallas GRU kernel is inference-only (no VJP); the train
step forces the differentiable XLA scan path for its own trace
(``pallas_gru.force_disabled``), so it works on any backend without
configuration.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models import state as state_lib
from .models.dpdfnet import forward_spec
from .ops import stft as stft_ops
from .ops.windows import vorbis_window

Array = jax.Array


# --------------------------------------------------------------------------- #
# Losses
# --------------------------------------------------------------------------- #

def spectral_loss(
    est: Array, ref: Array, compression: float = 0.6,
    factor_complex: float = 1.0, factor_magnitude: float = 1.0,
    eps: float = 1e-8,
) -> Array:
    """Compressed spectral loss (DeepFilterNet2 Eq. 2 family).

    est/ref: [B, T, F, 2].  Magnitude term on |X|^c, complex term on the
    phase-preserving compressed spectrum X |X|^(c-1).
    """
    def mag(x):
        return jnp.sqrt(jnp.square(x[..., 0]) + jnp.square(x[..., 1]) + eps)

    me, mr = mag(est), mag(ref)
    me_c, mr_c = me ** compression, mr ** compression
    loss_m = jnp.mean(jnp.square(me_c - mr_c))
    ce = est * (me_c / jnp.maximum(me, eps))[..., None]
    cr = ref * (mr_c / jnp.maximum(mr, eps))[..., None]
    loss_c = jnp.mean(jnp.square(ce - cr))
    return factor_magnitude * loss_m + factor_complex * loss_c


def multi_res_spectral_loss(
    est_wav: Array, ref_wav: Array,
    fft_sizes: Sequence[int] = (512, 1024, 2048), compression: float = 0.6,
) -> Array:
    """Multi-resolution STFT loss over Hann windows of several sizes."""
    total = 0.0
    for n_fft in fft_sizes:
        w = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        se = stft_ops.stft(est_wav, w, n_fft // 4, center=True)
        sr = stft_ops.stft(ref_wav, w, n_fft // 4, center=True)
        total = total + spectral_loss(se, sr, compression=compression)
    return total / len(fft_sizes)


def si_snr_loss(est: Array, ref: Array, eps: float = 1e-8) -> Array:
    """Negative SI-SNR (dB) over [B, S] waveforms."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    alpha = jnp.sum(est * ref, -1, keepdims=True) / (
        jnp.sum(ref * ref, -1, keepdims=True) + eps)
    target = alpha * ref
    noise = est - target
    snr = 10.0 * jnp.log10(
        (jnp.sum(target ** 2, -1) + eps) / (jnp.sum(noise ** 2, -1) + eps))
    return -jnp.mean(snr)


def lsnr_loss(lsnr_pred: Array, clean_spec: Array, noise_spec: Array,
              cfg: ModelConfig) -> Array:
    """MSE between the model's LSNR head and the frame-level SNR target."""
    from .ops.extras import LocalSnrTarget

    tgt = LocalSnrTarget(fft_size=cfg.n_fft, hop_size=cfg.hop,
                         sr=cfg.sample_rate, ws=20, db=True,
                         target_snr_range=(cfg.lsnr_min, cfg.lsnr_max))
    target = tgt(clean_spec, noise_spec)
    n = min(lsnr_pred.shape[1], target.shape[1])
    return jnp.mean(jnp.square(lsnr_pred[:, :n] - target[:, :n]))


# --------------------------------------------------------------------------- #
# Train step
# --------------------------------------------------------------------------- #

def enhancement_loss(
    params, cfg: ModelConfig, noisy_wav: Array, clean_wav: Array,
    *, factor_lsnr: float = 5e-4,
) -> Tuple[Array, Dict[str, Array]]:
    """Full forward + loss: compressed spectral + LSNR auxiliary."""
    window = jnp.asarray(vorbis_window(cfg.win_len))
    spec_n = stft_ops.stft(noisy_wav, window, cfg.hop, center=True) * cfg.wnorm
    spec_c = stft_ops.stft(clean_wav, window, cfg.hop, center=True) * cfg.wnorm
    st = state_lib.init_state(cfg, batch=noisy_wav.shape[0])
    out, _, lsnr = forward_spec(params, cfg, spec_n, st)
    # The model output at frame t is the enhanced INPUT frame t-4: the
    # 2-frame lookahead delay plus the deep filter's 2-frame coefficient
    # delay (same 4-frame total the offline path trims as 2*win_len and
    # audio.ATTN_LIMIT_NOISY_FRAME_OFFSET encodes).  Aligning with only
    # the lookahead would train the DF stage as a 2-frame-ahead predictor.
    delay = cfg.lookahead + 2
    out_al = out[:, delay:]
    tgt = spec_c[:, : out_al.shape[1]]
    l_spec = spectral_loss(out_al, tgt)
    l_lsnr = lsnr_loss(lsnr, spec_c, spec_n - spec_c, cfg)
    loss = l_spec + factor_lsnr * l_lsnr
    return loss, {"spec": l_spec, "lsnr": l_lsnr}


_FROZEN_KEYS = ("erb_fb", "erb_inv_fb")   # constant filterbank buffers


def _freeze_buffers(grads):
    g = dict(grads)
    for k in _FROZEN_KEYS:
        if k in g:
            g[k] = jax.tree_util.tree_map(jnp.zeros_like, g[k])
    return g


def make_train_step(cfg: ModelConfig, optimizer, mesh=None):
    """Build a jitted (optionally batch-sharded) optax train step.

    The ERB filterbank buffers are frozen (they are model constants, and a
    trained-negative band would feed log10 a negative power).
    """

    def step(params, opt_state, noisy, clean):
        # The fused Pallas kernels are inference-only (no VJP); force the
        # differentiable XLA scan path for this trace, so the step works
        # on TPU without the caller touching DPDFNET_TPU_PALLAS.
        from .ops import pallas_gru

        with pallas_gru.force_disabled():
            (loss, aux), grads = jax.value_and_grad(
                enhancement_loss, has_aux=True)(params, cfg, noisy, clean)
        grads = _freeze_buffers(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # Freeze the UPDATES too: decoupled weight decay (optax.adamw)
        # contributes -lr*wd*params to the update regardless of the zeroed
        # gradient, which would still shrink the constant filterbanks.
        updates = _freeze_buffers(updates)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", None))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, data),
        out_shardings=(repl, repl, repl, repl),
    )
