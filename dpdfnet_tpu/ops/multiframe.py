"""Multi-frame filtering: deep filtering, Wiener, MVDR, complex ratio mask.

JAX equivalents of `/root/reference/model/multiframe.py` /
`/root/reference/onnx_model/multiframe.py`.  The shipped DPDFNet models use
only deep filtering (integrated, vectorised, in ``models.dpdfnet``); the
multi-frame Wiener filter and MVDR beamformer are carried here for
capability parity — they operate on externally estimated (inverse)
correlation matrices and inter-frame correlation vectors.

Complex quantities are represented as ``[..., 2]`` real/imag stacks, like
the rest of the framework (complex dtypes block some TPU fusions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# --------------------------------------------------------------------------- #
# complex helpers on [..., 2] stacks
# --------------------------------------------------------------------------- #

def _c(x: Array) -> Array:
    return jax.lax.complex(x[..., 0], x[..., 1])


def _r(x: Array) -> Array:
    return jnp.stack([x.real, x.imag], axis=-1)


def spec_unfold(spec: Array, frame_size: int, lookahead: int = 0) -> Array:
    """Pad + unfold a spectrogram over time.

    spec: [B, T, F, 2] -> [B, T, N, F, 2] where window n covers frame
    ``t - (N-1-lookahead) + n`` (reference MultiFrameModule.spec_unfold with
    ConstantPad (N-1-lookahead, lookahead)).
    """
    B, T, F, _ = spec.shape
    pad_l = frame_size - 1 - lookahead
    ext = jnp.pad(spec, ((0, 0), (pad_l, lookahead), (0, 0), (0, 0)))
    return jnp.stack([ext[:, n: n + T] for n in range(frame_size)], axis=2)


def df(spec_unfolded: Array, coefs: Array) -> Array:
    """Deep filtering: complex MAC over the frame axis.

    spec_unfolded: [B, T, N, F, 2]; coefs: [B, T, N, F, 2] -> [B, T, F, 2].
    """
    s = _c(spec_unfolded)
    c = _c(coefs)
    return _r(jnp.sum(s * c, axis=2))


def psd(x: Array, n: int) -> Array:
    """Correlation matrices over an n-frame causal unfold.

    x: [B, T, F, 2] -> Rxx [B, T, F, N, N, 2] with
    Rxx[m, n] = x_n * conj(x_m) — the per-frame outer product (no
    summation), matching the reference's einsum
    (`/root/reference/model/multiframe.py` psd).
    """
    xu = _c(spec_unfold(x, n, lookahead=0))             # [B,T,N,F]
    xu = jnp.moveaxis(xu, 2, -1)                        # [B,T,F,N]
    r = jnp.einsum("...n,...m->...mn", xu, jnp.conj(xu))
    return _r(r)


def tik_reg(mat: Array, reg: float = 1e-7, eps: float = 1e-8) -> Array:
    """Tikhonov regularisation on the real part of the diagonal
    (torchaudio's `_tik_reg`, reference multiframe.py:436-452)."""
    m = _c(mat)
    n = m.shape[-1]
    trace = jnp.trace(m, axis1=-2, axis2=-1).real[..., None, None]
    eye = jnp.eye(n, dtype=m.dtype)
    return _r(m + (trace * reg + eps) * eye)


def crm(spec: Array, coefs: Array) -> Array:
    """Complex ratio mask: per-bin complex multiply (reference CRM)."""
    return _r(_c(spec) * _c(coefs))


def mf_wiener(
    spec: Array, ifc: Array, irxx: Array,
    *, frame_size: int, num_freqs: int, lookahead: int = 0,
    inverse: bool = True, eps: float = 1e-8, dload: float = 1e-7,
) -> Array:
    """Multi-frame Wiener filter (reference MfWf.forward).

    Args:
        spec: noisy spectrogram [B, T, F, 2].
        ifc: inter-frame speech correlation vector [B, T, F', N, 2].
        irxx: (inverse) noisy covariance [B, T, F', N, N, 2]; when
            ``inverse=False`` it is a plain covariance and the weights are
            obtained by solving the regularised system instead.

    Returns:
        Filtered spectrogram [B, T, F, 2]; bins >= num_freqs pass through.
    """
    su = _c(spec_unfold(spec, frame_size, lookahead))    # [B,T,N,F]
    su = jnp.moveaxis(su, 2, -1)[..., :num_freqs, :]     # [B,T,F',N]
    a = _c(irxx)
    v = _c(ifc)
    if inverse:
        w = jnp.einsum("...nm,...m->...n", a, v)
    else:
        a = _c(tik_reg(_r(a), dload, eps))
        w = jnp.linalg.solve(a, v[..., None])[..., 0]
    out = jnp.einsum("...n,...n->...", su, w)            # [B,T,F']
    return spec.at[:, :, :num_freqs, :].set(_r(out))


def mf_mvdr(
    spec: Array, ifc: Array, irnn: Array,
    *, frame_size: int, num_freqs: int, lookahead: int = 0,
    inverse: bool = True, eps: float = 1e-8, dload: float = 1e-7,
) -> Array:
    """Multi-frame MVDR beamformer (reference MfMvdr.forward)."""
    su = _c(spec_unfold(spec, frame_size, lookahead))
    su = jnp.moveaxis(su, 2, -1)[..., :num_freqs, :]
    a = _c(irnn)
    v = _c(ifc)
    if inverse:
        num = jnp.einsum("...nm,...m->...n", a, v)
    else:
        a = _c(tik_reg(_r(a), dload, eps))
        num = jnp.linalg.solve(a, v[..., None])[..., 0]
    den = jnp.einsum("...n,...n->...", jnp.conj(v), num)
    scale = jnp.conj(v[..., -1:])
    w = num * scale / (den.real[..., None] + eps)
    out = jnp.einsum("...n,...n->...", su, w)
    return spec.at[:, :, :num_freqs, :].set(_r(out))
