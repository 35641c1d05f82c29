"""Intensity normalisation: histogram matching and variance normalisation.

Replicates multivariate_histogram_normalization and variance_normalise
(reg_tools.cpp:745-844): 256-bin histograms per feature row over included
(non-excluded) vertices, CDF matching of the input row onto the reference
row, and Welford-style variance normalisation that rewrites only included
entries.
"""
from __future__ import annotations

import numpy as np

NUMBINS = 256


def _hist_cdf(values: np.ndarray, include: np.ndarray):
    v = values[include]
    if v.size == 0:
        return None
    lo, hi = v.min(), v.max()
    if hi <= lo:
        hi = lo + 1e-12
    edges = np.linspace(lo, hi, NUMBINS + 1)
    hist, _ = np.histogram(v, bins=edges)
    cdf = np.cumsum(hist).astype(np.float64)
    cdf /= cdf[-1]
    return edges, cdf


def histogram_match_row(src: np.ndarray, ref: np.ndarray,
                        incl_src: np.ndarray, incl_ref: np.ndarray) -> np.ndarray:
    """Map src values so their (included) histogram matches ref's. All src
    entries are transformed through the matching function; only included
    entries shape the histograms."""
    hs = _hist_cdf(src, incl_src)
    hr = _hist_cdf(ref, incl_ref)
    if hs is None or hr is None:
        return src.copy()
    edges_s, cdf_s = hs
    edges_r, cdf_r = hr
    centers_s = 0.5 * (edges_s[:-1] + edges_s[1:])
    centers_r = 0.5 * (edges_r[:-1] + edges_r[1:])
    # u = CDF_src(value)
    u = np.interp(src, centers_s, cdf_s, left=0.0, right=1.0)
    # value' = CDF_ref^{-1}(u)
    return np.interp(u, cdf_r, centers_r, left=centers_r[0], right=centers_r[-1])


def multivariate_histogram_normalization(data_in: np.ndarray, data_ref: np.ndarray,
                                         excl_in: np.ndarray | None = None,
                                         excl_ref: np.ndarray | None = None) -> np.ndarray:
    """Per-row histogram matching of data_in (D,N) onto data_ref (D,M)
    (reg_tools.cpp:745-802). Exclusion masks: nonzero == included. Returns a
    new (D,N) array."""
    d = data_in.shape[0]
    out = data_in.copy()
    for k in range(d):
        incl_in = np.ones(data_in.shape[1], bool) if excl_in is None else (
            np.atleast_2d(excl_in)[min(k, np.atleast_2d(excl_in).shape[0] - 1)] != 0)
        incl_ref = np.ones(data_ref.shape[1], bool) if excl_ref is None else (
            np.atleast_2d(excl_ref)[min(k, np.atleast_2d(excl_ref).shape[0] - 1)] != 0)
        out[k] = histogram_match_row(data_in[k], data_ref[k], incl_in, incl_ref)
    return out


def variance_normalise(data: np.ndarray, excl: np.ndarray | None = None) -> np.ndarray:
    """Per-row standardisation over included entries; excluded entries keep
    their original values (reg_tools.cpp:804-844). data (D,N) -> new (D,N)."""
    out = data.copy()
    incl = np.ones(data.shape[1], bool) if excl is None else (excl != 0)
    for k in range(data.shape[0]):
        v = data[k][incl]
        if v.size < 2:
            continue
        mean = v.mean()
        var = v.var(ddof=1)
        nv = v - mean
        if var > 0:
            nv = nv / np.sqrt(var)
        out[k][incl] = nv
    return out
