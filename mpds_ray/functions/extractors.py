"""Per-session feature extractors — NumPy ports of the mpds extractor family.

Each returns ``(header: list[str], feature: np.ndarray)`` exactly like the
reference convention (``[header, feature] = extractXxx(data)``):

- :func:`extract_accel_features`  <- extractAccelTestV2.m (126 stat + 27 cross)
- :func:`extract_tap_features`    <- extractTapTestV2.m   (151 features)
- :func:`extract_react_features`  <- extractReactTestV1.m (15 features)
- :func:`extract_audio_features`  <- extractAudioTestV1.m (17 features)

Reconstructed reference gaps (FIXTURES.md, SURVEY.md §2.12): ``rmgravity`` =
subtract per-column mean; ``roundn(x,2)`` = round to nearest 100;
``getStatFeatures`` = the 18-stat block x given axes (incl. dfc via
Lomb–Scargle on the given timestamps); ``getCrossFeatures`` = the 3
cross-features (xcorr/mi/xEn) on a 2-column matrix.

These run inside ``groupby(session).map_groups`` stages in the engine; they
are deliberately single-session functions (one window each, bounded size).
"""

from __future__ import annotations

import numpy as np

from ..kernels import (
    CROSS_KERNELS,
    STAT_KERNELS,
    dominant_frequency,
    fastdfa,
    get_pitch,
    prctile,
    w_std,
)

# the reference's canonical 18-stat order (extractAccelTestV2.m:49-51)
_STATS18 = [
    "mean", "std", "q1", "q3", "iqr", "median", "mode", "range",
    "s", "k", "mse", "En", "zcr", "dfc", "dfc_amp", "meanTKEO", "ar1", "dfa",
]
# tap stay/move block: no spectral / zcr stats (extractTapTestV2.m:58-59)
_STATS15_TAP = [
    "mean", "std", "q1", "q3", "iqr", "median", "mode", "range",
    "s", "k", "mse", "En", "meanTKEO", "ar1", "dfa",
]
# react block (extractReactTestV1.m:51-52)
_STATS15_REACT = [
    "sum", "mean", "std", "q1", "q3", "iqr", "median", "mode", "range",
    "s", "k", "mse", "En", "meanTKEO", "dfa",
]


def _stat_block(a: np.ndarray, t: np.ndarray | None, stats: list[str]) -> list[float]:
    """Evaluate a named stat list over one channel; dfc/dfc_amp need t."""
    out: list[float] = []
    dfc = dfc_amp = None
    for name in stats:
        if name in ("dfc", "dfc_amp"):
            if dfc is None:
                if t is None:
                    raise ValueError("dfc stats require timestamps")
                dfc, dfc_amp = dominant_frequency(t, a)
            out.append(dfc if name == "dfc" else dfc_amp)
        else:
            out.append(STAT_KERNELS[name](a))
    return out


def get_stat_features(
    a: np.ndarray, t: np.ndarray | None, axes: list[str], stats: list[str] | None = None
) -> tuple[list[str], np.ndarray]:
    """Reconstructed ``getStatFeatures`` (extractTapTestV2.m:178-184): the
    stat block crossed over the columns of ``a``, headers ``axis_stat``."""
    stats = stats or _STATS18
    header = [f"{ax}_{st}" for ax in axes for st in stats]
    feats: list[float] = []
    for j in range(a.shape[1] if a.ndim == 2 else 1):
        col = a[:, j] if a.ndim == 2 else a
        feats.extend(_stat_block(np.asarray(col, dtype=np.float64), t, stats))
    return header, np.array(feats, dtype=np.float64)


def get_cross_features(a: np.ndarray, prefix: str) -> tuple[list[str], np.ndarray]:
    """Reconstructed ``getCrossFeatures`` (extractTapTestV2.m:186-188):
    xcorr/mi/xEn between the two columns of ``a``."""
    header = [f"{prefix}_{k}" for k in CROSS_KERNELS]
    if a.shape[0] < 2:
        return header, np.full(len(header), np.nan)
    x, y = a[:, 0].astype(np.float64), a[:, 1].astype(np.float64)
    return header, np.array([fn(x, y) for fn in CROSS_KERNELS.values()])


def _cart2sph(x, y, z):
    """MATLAB cart2sph: azimuth, elevation, radius."""
    az = np.arctan2(y, x)
    hxy = np.hypot(x, y)
    el = np.arctan2(z, hxy)
    r = np.hypot(hxy, z)
    return az, el, r


def extract_accel_features(data: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Accelerometer session features (extractAccelTestV2.m:10-143).

    ``data``: (n, 4) matrix of ``time, x, y, z`` samples. Produces the 18-stat
    block over 7 channels (gravity-ordered x/y/z de-meaned, magnitude,
    spherical a/e/r) = 126 features + 9 channel pairs x 3 cross features = 27.
    """
    data = np.asarray(data, dtype=np.float64)
    t = data[:, 0]
    xyz = data[:, 1:4]
    # axis reorder by abs(mean) descending (gravity first), :28-36
    order = np.argsort(-np.abs(xyz.mean(axis=0)), kind="stable")
    g = xyz[:, order]
    # rmgravity(...,'mean') reconstructed: subtract per-column mean, :39
    g = g - g.mean(axis=0)
    # magnitude of the ORIGINAL signal + spherical transform, :41-45
    mag = np.sqrt((xyz * xyz).sum(axis=1))
    az, el, r = _cart2sph(data[:, 1], data[:, 2], data[:, 3])
    A = np.column_stack([g[:, 0], g[:, 1], g[:, 2], mag, az, el, r])
    axes = ["x", "y", "z", "acc", "a", "e", "r"]
    header, feats = get_stat_features(A, t, axes, _STATS18)
    # cross features on (x,y,z,acc) pairs then (a,e,r) pairs, :103-143
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)]
    cross_parts: list[np.ndarray] = []
    for i, j in pairs:
        ch, cf = get_cross_features(A[:, [i, j]], f"{axes[i]}_{axes[j]}")
        header.extend(ch)
        cross_parts.append(cf)
    return header, np.concatenate([feats] + cross_parts)


def tap_sessionize(tsp: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sign-change sessionization (extractTapTestV2.m:26-49): alternating
    stay/move durations from sign changes of x about the screen midline."""
    mid = (x.max() - x.min()) / 2.0 + x.min()
    s = 0.0
    start = 0.0
    prev = 0.0
    stay: list[float] = []
    move: list[float] = []
    for i in range(tsp.size):
        new_sign = np.sign(x[i] - mid)
        if s == 0:
            s = new_sign
            start = tsp[i]
        elif new_sign != s:
            stay.append(prev - start)
            move.append(tsp[i] - prev)
            start = tsp[i]
            s = new_sign
        prev = tsp[i]
    return np.array(stay), np.array(move)


def extract_tap_features(data: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Tap session features (extractTapTestV2.m:10-199): ntaps + stay/move
    15-stat blocks + cross + scaled-x/y 18-stat blocks + cross + left/right
    splits + their cross features = 151 features."""
    data = np.asarray(data, dtype=np.float64)
    tsp = data[:, 0] - data[0, 0]
    x = data[:, 1]
    y = data[:, 2]
    stay, move = tap_sessionize(tsp, x)
    ntaps = stay.size
    # roundn(max(x),2) reconstructed: round to nearest 100, :52-54
    scaler = np.round(x.max() / 100.0) * 100.0
    sx = x / scaler
    sy = y / scaler

    A = np.column_stack([stay, move])
    header, feats = _stats_and_cross(A, None, ["stay", "move"], _STATS15_TAP, "t")
    A2 = np.column_stack([sx, sy])
    header2, feats2 = _stats_and_cross(A2, tsp, ["scaled_x", "scaled_y"], _STATS18, "scaled_xy")

    mid = (x.max() - x.min()) / 2.0 + x.min()
    left = x < mid
    right = x > mid
    hl, fl = get_stat_features(A2[left], tsp[left], ["scaled_x_left", "scaled_y_left"])
    hr, fr = get_stat_features(A2[right], tsp[right], ["scaled_x_right", "scaled_y_right"])
    hcl, fcl = get_cross_features(A2[left], "scaled_xy_left")
    hcr, fcr = get_cross_features(A2[right], "scaled_xy_right")

    full_header = ["ntaps"] + header + header2 + hl + hr + hcl + hcr
    full = np.concatenate([[float(ntaps)], feats, feats2, fl, fr, fcl, fcr])
    return full_header, full


def _stats_and_cross(A, t, axes, stats, cross_prefix):
    header, feats = get_stat_features(A, t, axes, stats)
    ch, cf = get_cross_features(A, cross_prefix)
    return header + ch, np.concatenate([feats, cf])


def react_lags(tsp: np.ndarray, visible: np.ndarray, pressed: np.ndarray) -> np.ndarray:
    """Mismatch-episode lag scan (extractReactTestV1.m:27-47)."""
    lags: list[float] = []
    mismatch = False
    start_tsp = 0.0
    for i in range(tsp.size):
        if mismatch:
            if visible[i] == pressed[i]:
                lags.append(tsp[i] - start_tsp)
                mismatch = False
        elif visible[i] != pressed[i]:
            mismatch = True
            start_tsp = tsp[i]
    return np.array(lags)


def extract_react_features(data: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Reaction-test features (extractReactTestV1.m:10-85): 15 stats over the
    per-episode mismatch lags. ``data`` columns: time, _, _, btn_visiable,
    btn_pressed (cols 4,5 in MATLAB 1-indexing)."""
    data = np.asarray(data, dtype=np.float64)
    lags = react_lags(data[:, 0], data[:, 3], data[:, 4])
    header = [f"touch_{s}" for s in _STATS15_REACT]
    if lags.size == 0:
        return header, np.full(len(header), np.nan)
    return header, np.array(_stat_block(lags, None, _STATS15_REACT))


def audio_voice_segments(amp: np.ndarray, frame_secs: float = 0.5):
    """Threshold+gap voice segmentation (extractAudioTestV1.m:38-59):
    amplitude threshold (q90 - min)/4 + min; contiguous above-threshold frame
    runs become segments; an open run at the end is closed inclusively."""
    amp_t = (prctile(amp, 90.0) - amp.min()) / 4.0 + amp.min()
    segs: list[dict] = []
    start_f = 0  # 1-indexed like the reference; 0 = closed
    nframes = amp.size
    for i in range(1, nframes + 1):
        if amp[i - 1] > amp_t:
            if start_f == 0:
                start_f = i
        elif start_f != 0:
            segs.append({"start": start_f, "end": i, "len": (i - start_f) * frame_secs})
            start_f = 0
    if start_f != 0:
        segs.append(
            {"start": start_f, "end": nframes, "len": (nframes - start_f + 1) * frame_secs}
        )
    return segs


def extract_audio_features(data: np.ndarray, fs: float) -> tuple[list[str], np.ndarray]:
    """Audio session features (extractAudioTestV1.m:10-107): frame into 0.5 s
    windows, find voice segments, keep the longest, trim to its middle half,
    then 17 amplitude/pitch features (means, trends, DFA, Welch pitch)."""
    data = np.asarray(data, dtype=np.float64).ravel()
    frame_secs = 0.5
    frame = int(fs * frame_secs)
    nframes = data.size // frame
    frames = data[: nframes * frame].reshape(nframes, frame)
    amp = np.abs(frames).max(axis=1)

    header = [
        "length", "amp_mean", "amp_std", "amp_p1_1", "amp_p1_0",
        "amp_p2_2", "amp_p2_1", "amp_p2_0", "amp_dfa",
        "pitch", "pitch_std", "pitch_p1_1", "pitch_p1_0",
        "pitch_p2_2", "pitch_p2_1", "pitch_p2_0", "pitch_dfa",
    ]
    segs = audio_voice_segments(amp, frame_secs)
    if not segs:
        return header, np.full(len(header), np.nan)
    v = max(segs, key=lambda s: s["len"])  # longest voice, :64-70
    rng = v["end"] - v["start"] + 1  # trim to middle half, :72-75
    start = v["start"] + rng // 4
    end = v["end"] - rng // 4

    idx = np.arange(start, end + 1)  # 1-indexed frame ids
    a = amp[start - 1 : end]
    amp_p1 = np.polyfit(idx, a, 1)
    amp_p2 = np.polyfit(idx, a, 2)
    v_data = data[(start - 1) * frame : end * frame]
    pitch_series = np.array([get_pitch(frames[i - 1], fs, 10240) for i in idx])
    pitch_total = get_pitch(v_data, fs, 10240)
    pitch_p1 = np.polyfit(idx, pitch_series, 1)
    pitch_p2 = np.polyfit(idx, pitch_series, 2)

    feature = np.concatenate(
        [
            [v["len"], a.mean(), w_std(a)],
            amp_p1,
            amp_p2,
            [fastdfa(a), pitch_total, w_std(pitch_series)],
            pitch_p1,
            pitch_p2,
            [fastdfa(pitch_series)],
        ]
    )
    return header, feature
