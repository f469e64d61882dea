"""Analysis/synthesis windows and scaling.

Vorbis window `sin(pi/2 * sin^2(pi/2*(n+0.5)/half))` satisfies the COLA
(constant overlap-add) identity `w[n]^2 + w[n+hop]^2 == 1` at 50% overlap,
which the streaming engine relies on to commit exactly one hop per frame
(reference: `/root/reference/model/utils.py:153-167`,
`/root/reference/package/src/dpdfnet/stream.py:144-153`).
"""

from __future__ import annotations

import numpy as np


def vorbis_window(window_len: int) -> np.ndarray:
    half = window_len / 2.0
    n = np.arange(window_len, dtype=np.float64)
    s = np.sin(0.5 * np.pi * (n + 0.5) / half)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


def get_wnorm(window_len: int, hop: int) -> float:
    return 1.0 / (window_len ** 2 / (2.0 * hop))
