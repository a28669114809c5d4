"""Audio log-power STFT matching the reference's librosa preprocessing
(``data/preprocess.py:276-304``): n_fft=511 (→256 freq bins), hann window of
10 ms, hop 5 ms, centered with zero padding, ``log(|S|² + 1e-6)``.

Two implementations with identical outputs (tested against each other and against
librosa's definition):

* :func:`stft_numpy` — host-side, for the offline preprocessing CLI;
* :func:`stft_jax` — XLA FFT, jit-compiled, for on-device/batched pipelines (the
  TPU-native replacement for librosa's C FFT, SURVEY §2.3).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

N_FFT = 511
EPS = 1e-6


def _hann(win_length: int) -> np.ndarray:
    """Periodic (fftbins) Hann, scipy.signal.get_window('hann', n) equivalence."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def _padded_window(win_length: int, n_fft: int = N_FFT) -> np.ndarray:
    """librosa centers a short window inside n_fft."""
    w = _hann(win_length)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, np.float64)
    out[lpad : lpad + win_length] = w
    return out


def stft_params(sample_rate: int, window_ms: float = 10.0, hop_ms: float = 5.0):
    win_length = int(round(window_ms * sample_rate / 1e3))
    hop_length = int(round(hop_ms * sample_rate / 1e3))
    return win_length, hop_length


def stft_numpy(
    samples: np.ndarray, sample_rate: int = 24000, n_fft: int = N_FFT
) -> np.ndarray:
    """(num_samples,) float → (n_fft//2+1, num_frames) log-power spectrogram."""
    win_length, hop_length = stft_params(sample_rate)
    window = _padded_window(win_length, n_fft)
    half = n_fft // 2
    x = np.pad(samples.astype(np.float64), (half, half), mode="constant")
    num_frames = 1 + (len(x) - n_fft) // hop_length
    strided = np.lib.stride_tricks.as_strided(
        x,
        shape=(num_frames, n_fft),
        strides=(x.strides[0] * hop_length, x.strides[0]),
    )
    spec = np.fft.rfft(strided * window, n=n_fft, axis=1).T  # (freq, time)
    power = np.real(spec * np.conj(spec))
    return np.log(power + EPS).astype(np.float32)


@partial(jax.jit, static_argnames=("sample_rate", "n_fft"))
def stft_jax(samples: jax.Array, sample_rate: int = 24000, n_fft: int = N_FFT) -> jax.Array:
    """XLA version of :func:`stft_numpy`; identical math, jit-compiled."""
    win_length, hop_length = stft_params(sample_rate)
    window = jnp.asarray(_padded_window(win_length, n_fft), jnp.float32)
    half = n_fft // 2
    x = jnp.pad(samples.astype(jnp.float32), (half, half))
    num_frames = 1 + (x.shape[0] - n_fft) // hop_length
    idx = jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = x[idx] * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=1).T
    power = jnp.real(spec * jnp.conj(spec))
    return jnp.log(power + EPS)
