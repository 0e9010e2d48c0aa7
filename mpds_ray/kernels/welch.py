"""Welch PSD + peak pitch (reference getPitch.m:10-18, audio path).

``pwelch(data, hamming(NFFT), [], NFFT, fs)``: Hamming-windowed segments of
length NFFT with 50% overlap (MATLAB default), periodogram per segment,
averaged one-sided PSD. ``getPitch`` then takes the largest local maximum
(``findpeaks`` -> max peak) and converts its index to Hz via
``indx/length(out)*(fs/2)``.

Pinned conventions (engine == oracle; documented, not bit-matched to MATLAB):
one-sided PSD of length NFFT/2+1; a signal shorter than NFFT is processed as a
single zero-padded segment; ``findpeaks`` = strict interior local maxima.
"""

from __future__ import annotations

import numpy as np


def hamming(n: int) -> np.ndarray:
    """MATLAB symmetric Hamming window."""
    if n == 1:
        return np.ones(1)
    k = np.arange(n)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))


def pwelch(x, nfft: int, fs: float) -> np.ndarray:
    """One-sided Welch PSD, Hamming window of length nfft, 50% overlap."""
    x = np.asarray(x, dtype=np.float64).ravel()
    win = hamming(nfft)
    u = float(np.dot(win, win))  # window power normalization
    step = nfft // 2
    if x.size < nfft:
        seg = np.zeros(nfft)
        seg[: x.size] = x
        segs = seg[None, :]
    else:
        n_seg = 1 + (x.size - nfft) // step
        idx = np.arange(nfft)[None, :] + step * np.arange(n_seg)[:, None]
        segs = x[idx]
    spec = np.fft.rfft(segs * win[None, :], n=nfft, axis=1)
    psd = (np.abs(spec) ** 2) / (fs * u)
    psd[:, 1:-1] *= 2.0  # one-sided
    return psd.mean(axis=0)


def find_peaks(v: np.ndarray) -> np.ndarray:
    """Indices of strict interior local maxima (MATLAB findpeaks default)."""
    v = np.asarray(v, dtype=np.float64).ravel()
    if v.size < 3:
        return np.empty(0, dtype=np.int64)
    mask = (v[1:-1] > v[:-2]) & (v[1:-1] > v[2:])
    return np.nonzero(mask)[0] + 1


def get_pitch(data, fs: float, nfft: int = 10240) -> float:
    """Dominant PSD peak in Hz (getPitch.m:10-18). NaN if no interior peak."""
    out = pwelch(data, nfft, fs)
    locs = find_peaks(out)
    if locs.size == 0:
        return float("nan")
    pks = out[locs]
    idx_max = locs[pks == pks.max()]
    # MATLAB is 1-indexed: pitch = indx/length(out)*(fs/2)
    return float((idx_max[0] + 1) / out.size * (fs / 2.0))
