"""Causal IIR (biquad) filtering as a parallel first-order associative scan.

The reference applies SciPy-designed Butterworth coefficients causally with torchaudio's
``lfilter`` (reference src/mpcg_wav2vec/signalproc/torchproc.py:32-53). A serial recurrence is
hostile to TPUs, so each biquad is partial-fractioned **on the host in float64** into a direct
term plus two first-order complex-pole recurrences

    H(w) = C + r1 / (1 - p1 w) + r2 / (1 - p2 w),      w = z^-1

and each first-order system  y[n] = p*y[n-1] + r*x[n]  is evaluated with
``jax.lax.associative_scan`` over the scalar affine maps (a, b) -> (a1*a2, b1*a2 + b2).
Scalar pole powers |p|^k decay monotonically, so the float32 scan is numerically stable even
for the ECG band's near-unit-circle poles — unlike a 2x2 state-matrix scan, whose repeated
squarings of a nearly-defective matrix cancel catastrophically in float32.

Complex arithmetic is carried as explicit (re, im) float pairs for TPU friendliness. For a
conjugate pole pair only one scan runs and the output takes 2*Re(.). Zero initial state
matches ``scipy.signal.sosfilt`` / ``lfilter`` defaults, so outputs track the NumPy oracle
within the equivalence bar.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps


@lru_cache(maxsize=None)
def design_butter(cutoff: float, fs: float, btype: str, order: int = 2):
    """Host-side Butterworth design with the paper's fs-normalised cutoff convention.

    Returns a tuple of second-order sections as plain floats (hashable, jit-constant).
    """
    sos = sps.butter(order, cutoff / fs, btype=btype, output="sos")
    return tuple(tuple(float(v) for v in section) for section in np.asarray(sos))


@lru_cache(maxsize=None)
def _partial_fractions(section):
    """Split one normalised biquad into (C, p1, r1, p2, r2) in complex128 (host math).

    Returns None when the section is not a proper two-pole system (then the caller falls back
    to the exact sequential scan).
    """
    b0, b1, b2, a0, a1, a2 = (np.float64(v) for v in section)
    if a0 != 1.0:
        b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
    poles = np.roots([1.0, a1, a2]).astype(np.complex128)
    if len(poles) != 2 or a2 == 0.0:
        return None
    p1, p2 = poles
    if abs(p1 - p2) < 1e-9 * max(1.0, abs(p1)):
        return None  # defective (repeated pole): no clean partial fraction
    C = b2 / a2
    num = lambda w: b0 + b1 * w + b2 * w * w
    r1 = num(1.0 / p1) / (1.0 - p2 / p1)
    r2 = num(1.0 / p2) / (1.0 - p1 / p2)
    conj_pair = bool(abs(np.conj(p1) - p2) < 1e-9 * max(1.0, abs(p1)))
    return float(C.real), complex(p1), complex(r1), complex(p2), complex(r2), conj_pair


def _first_order_scan(x: jnp.ndarray, p: complex, r: complex) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run y[n] = p*y[n-1] + r*x[n] along the last axis; returns (re, im) of y."""
    pr = jnp.asarray(p.real, dtype=x.dtype)
    pi = jnp.asarray(p.imag, dtype=x.dtype)
    br = r.real * x
    bi = r.imag * x
    ar = jnp.broadcast_to(pr, x.shape)
    ai = jnp.broadcast_to(pi, x.shape)

    def combine(left, right):
        a1r, a1i, b1r, b1i = left
        a2r, a2i, b2r, b2i = right
        return (
            a1r * a2r - a1i * a2i,
            a1r * a2i + a1i * a2r,
            b1r * a2r - b1i * a2i + b2r,
            b1r * a2i + b1i * a2r + b2i,
        )

    _, _, yr, yi = jax.lax.associative_scan(combine, (ar, ai, br, bi), axis=-1)
    return yr, yi


def _biquad(x: jnp.ndarray, section) -> jnp.ndarray:
    pf = _partial_fractions(section)
    if pf is None:
        return _biquad_sequential(x, section)
    C, p1, r1, p2, r2, conj_pair = pf
    if conj_pair:
        yr, _ = _first_order_scan(x, p1, r1)
        return C * x + 2.0 * yr
    y1r, _ = _first_order_scan(x, p1, r1)
    y2r, _ = _first_order_scan(x, p2, r2)
    return C * x + y1r + y2r


def sosfilt(x: jnp.ndarray, sos) -> jnp.ndarray:
    """Cascade of biquad sections along the last axis (zero initial conditions)."""
    for section in sos:
        x = _biquad(x, section)
    return x


def lowpass(x: jnp.ndarray, fs: float, cutoff: float, order: int = 2) -> jnp.ndarray:
    return sosfilt(x, design_butter(cutoff, fs, "lowpass", order))


def highpass(x: jnp.ndarray, fs: float, cutoff: float, order: int = 2) -> jnp.ndarray:
    return sosfilt(x, design_butter(cutoff, fs, "highpass", order))


def bandpass_cascade(x: jnp.ndarray, fs: float, low: float, high: float,
                     order: int = 2) -> jnp.ndarray:
    """Causal LP at the high edge then HP at the low edge (the PCG/ECG preprocessing band)."""
    return highpass(lowpass(x, fs, high, order=order), fs, low, order=order)


def biquad_dynamic(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """One biquad with **traced** coefficients ``b=[b0,b1,b2]``, ``a=[1,a1,a2]``.

    Used by the on-device random parametric EQ, whose band edges are drawn from a PRNG key
    inside jit (so the partial-fraction split must also be traced). Poles come from the
    quadratic formula with a complex-safe discriminant; the two first-order scans then run in
    explicit (re, im) arithmetic. Requires ``a2 != 0`` (true for any band-pass section).
    """
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]
    disc = a1 * a1 - 4.0 * a2
    sq_re = jnp.sqrt(jnp.maximum(disc, 0.0))
    sq_im = jnp.sqrt(jnp.maximum(-disc, 0.0))
    # p1 = (-a1 + sq)/2, p2 = (-a1 - sq)/2 in complex form
    p1 = ((-a1 + sq_re) * 0.5, sq_im * 0.5)
    p2 = ((-a1 - sq_re) * 0.5, -sq_im * 0.5)

    def cdiv(n, d):
        nr, ni = n
        dr, di = d
        den = dr * dr + di * di + 1e-30
        return ((nr * dr + ni * di) / den, (ni * dr - nr * di) / den)

    def cmul(u, v):
        ur, ui = u
        vr, vi = v
        return (ur * vr - ui * vi, ur * vi + ui * vr)

    def num_at_inv(p):
        w = cdiv((jnp.ones_like(p[0]), jnp.zeros_like(p[0])), p)     # w = 1/p
        w2 = cmul(w, w)
        return (b0 + b1 * w[0] + b2 * w2[0], b1 * w[1] + b2 * w2[1])

    one = (jnp.ones_like(a1), jnp.zeros_like(a1))
    r1 = cdiv(num_at_inv(p1), (one[0] - cdiv(p2, p1)[0], -cdiv(p2, p1)[1]))
    r2 = cdiv(num_at_inv(p2), (one[0] - cdiv(p1, p2)[0], -cdiv(p1, p2)[1]))
    C = b2 / (a2 + jnp.where(a2 == 0, 1e-30, 0.0))

    def scan_pair(p, r):
        pr = jnp.broadcast_to(p[0], x.shape).astype(x.dtype)
        pi = jnp.broadcast_to(p[1], x.shape).astype(x.dtype)
        br = (r[0] * x).astype(x.dtype)
        bi = (r[1] * x).astype(x.dtype)

        def combine(left, right):
            a1r, a1i, b1r, b1i = left
            a2r, a2i, b2r, b2i = right
            return (
                a1r * a2r - a1i * a2i,
                a1r * a2i + a1i * a2r,
                b1r * a2r - b1i * a2i + b2r,
                b1r * a2i + b1i * a2r + b2i,
            )

        _, _, yr, _ = jax.lax.associative_scan(combine, (pr, pi, br, bi), axis=-1)
        return yr

    return C * x + scan_pair(p1, r1) + scan_pair(p2, r2)


def butter1_bandpass_coeffs(low: jnp.ndarray, high: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Traced 1st-order Butterworth band-pass design (scipy ``butter(1, [l,h], 'band')``).

    ``low``/``high`` are Nyquist-normalised edges in (0, 1). Closed-form bilinear transform of
    the band-transformed prototype H(s) = Bw*s / (s^2 + Bw*s + Wo^2) with fs = 2.
    """
    w1 = 4.0 * jnp.tan(jnp.pi * low / 2.0)
    w2 = 4.0 * jnp.tan(jnp.pi * high / 2.0)
    bw = w2 - w1
    wo2 = w1 * w2
    a0 = 16.0 + 4.0 * bw + wo2
    b = jnp.stack([4.0 * bw, jnp.zeros_like(bw), -4.0 * bw]) / a0
    a = jnp.stack([jnp.ones_like(bw), (2.0 * wo2 - 32.0) / a0, (16.0 - 4.0 * bw + wo2) / a0])
    return b, a


def _biquad_sequential(x: jnp.ndarray, section) -> jnp.ndarray:
    """Exact O(T) serial biquad via ``lax.scan`` (transposed direct-form II)."""
    b0, b1, b2, _a0, a1, a2 = section
    c = jnp.asarray([b1 - a1 * b0, b2 - a2 * b0], dtype=x.dtype)
    A = jnp.asarray([[-a1, 1.0], [-a2, 0.0]], dtype=x.dtype)

    def step(s, xt):
        y = b0 * xt + s[..., 0]
        s = jnp.einsum("ij,...j->...i", A, s) + c * xt[..., None]
        return s, y

    s0 = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
    _, y = jax.lax.scan(step, s0, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def sosfilt_sequential(x: jnp.ndarray, sos) -> jnp.ndarray:
    """Serial cascade (numerics cross-checks / fallback for degenerate sections)."""
    for section in sos:
        x = _biquad_sequential(x, section)
    return x
