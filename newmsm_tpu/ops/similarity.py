"""Similarity reductions over padded patch vectors.

Discrete-cost measures of the reference sparsesimkernel (similarities.h:48-58,
similarities.cpp:129-253), vectorised over arbitrary leading batch dims with
an explicit validity mask replacing variable-length vectors:

  1 = SSD            sqrt(sum w (a-b)^2) / n_valid
  2 = Pearson        1 - (1 + r_w) / 2
  4 = DICE           1 - 2|A∩B| / (|A|+|B|) on top-percentile masks
  5 = genDICE        size-normalised DICE variant

`mask` marks valid entries (padding has mask 0); `n` is the valid count,
matching the reference's use of the true vector length.
"""
from __future__ import annotations

import jax.numpy as jnp

SIM_SSD = 1
SIM_CORR = 2
SIM_DICE = 4
SIM_GENDICE = 5


def _count(mask):
    return jnp.maximum(jnp.sum(mask, axis=-1), 1.0)


def weighted_ssd(a, b, w, mask):
    """(similarities.cpp:179-188): sqrt(sum w (a-b)^2) / n."""
    prod = jnp.sum(w * mask * (a - b) ** 2, axis=-1)
    return jnp.sqrt(prod) / _count(mask)


def weighted_corr(a, b, w, mask):
    """Weighted Pearson correlation (similarities.cpp:129-158); returns r."""
    wm = w * mask
    s = jnp.sum(wm, axis=-1)
    safe_s = jnp.where(s > 0, s, 1.0)
    mean_a = jnp.sum(wm * a, axis=-1) / safe_s
    mean_b = jnp.sum(wm * b, axis=-1) / safe_s
    mean_a = jnp.where(s > 0, mean_a, jnp.sum(wm * a, axis=-1))
    mean_b = jnp.where(s > 0, mean_b, jnp.sum(wm * b, axis=-1))
    da = a - mean_a[..., None]
    db = b - mean_b[..., None]
    prod = jnp.sum(wm * da * db, axis=-1)
    var_a = jnp.sum(wm * da * da, axis=-1)
    var_b = jnp.sum(wm * db * db, axis=-1)
    prod = jnp.where(s > 0, prod / safe_s, prod)
    var_a = jnp.where(s > 0, var_a / safe_s, var_a)
    var_b = jnp.where(s > 0, var_b / safe_s, var_b)
    denom = jnp.sqrt(var_a) * jnp.sqrt(var_b)
    return jnp.where((var_a == 0) | (var_b == 0), 0.0, prod / jnp.where(denom > 0, denom, 1.0))


def _percentile_threshold(x, mask, percentile):
    """Value at floor(percentile * n) rank among valid entries, matching the
    reference's sorted-index lookup (similarities.cpp:201-226). Padding is
    pushed to +inf so the valid prefix of the sort matches."""
    n_total = x.shape[-1]
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask > 0, x, big), axis=-1)
    nvalid = jnp.sum(mask, axis=-1).astype(jnp.int32)
    idx = jnp.clip((percentile * nvalid).astype(jnp.int32), 0, n_total - 1)
    return jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]


def dice(a, b, mask, percentile=0.75, generalised=False):
    """DICE / genDICE on top-percentile masks (similarities.cpp:201-253).
    Returns 1 - overlap score (a cost)."""
    thr_a = _percentile_threshold(a, mask, percentile)
    thr_b = _percentile_threshold(b, mask, percentile)
    in_a = (a >= thr_a[..., None]) & (mask > 0)
    in_b = (b >= thr_b[..., None]) & (mask > 0)
    size_a = jnp.sum(in_a, axis=-1).astype(a.dtype)
    size_b = jnp.sum(in_b, axis=-1).astype(a.dtype)
    common = jnp.sum(in_a & in_b, axis=-1).astype(a.dtype)
    denom = jnp.where(size_a + size_b > 0, size_a + size_b, 1.0)
    if generalised:
        sb2 = jnp.where(size_b > 0, size_b**2, 1.0)
        return 1.0 - 2.0 * (common / sb2) / (denom / sb2)
    return 1.0 - 2.0 * common / denom


def sim_for_min(a, b, w, mask, simval: int, percentile: float = 0.75):
    """Dispatch matching get_sim_for_min (similarities.h:48-58)."""
    if simval == SIM_SSD:
        return weighted_ssd(a, b, w, mask)
    if simval == SIM_CORR:
        return 1.0 - (1.0 + weighted_corr(a, b, w, mask)) * 0.5
    if simval == SIM_DICE:
        return dice(a, b, mask, percentile)
    if simval == SIM_GENDICE:
        return dice(a, b, mask, percentile, generalised=True)
    raise ValueError(f"unknown similarity metric {simval}")
