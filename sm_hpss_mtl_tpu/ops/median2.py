"""Shared-sort sliding median (block suffix/prefix decomposition).

The selection-network sliding median (``hpss_pallas.median_network``)
costs ~2·|network| VPU ops per output (182 for width 21) and shares no
work between overlapping windows.  This module implements the classic
two-block decomposition:

- partition the axis into blocks of ``w``; a window starting at offset
  ``i`` inside block ``b`` is ``block_b[i:] ∪ block_{b+1}[:i]``;
- incrementally maintain the sorted *lowest k+2* elements of every
  block suffix (descending insertion) and prefix (ascending insertion),
  where ``k = w//2`` is the median rank — ranks above k+1 can never be
  the median of the union;
- select the median with the min-max split identity: with ``Ap = [-inf,
  A...]`` and ``Bp = [-inf, B...]`` (+inf padded), the k-th smallest of
  the union is ``min_j max(Ap[j], Bp[k+1-j])``.

Per-output cost drops ~2.6x vs the network (measured op counts); every
step is a vectorized min/max over (rows, n_blocks) planes, so it maps
onto the VPU exactly like the network does.  All loops are static
(unrolled over w offsets and k+2 ranks).

Status (v5e, measured): the algorithm is bit-exact and ~2.6x cheaper in
VPU element-ops than the network, but it does NOT pay inside the Pallas
kernels, so both kernel flags that once selected it were removed:

- round-1 spectral layout (freq sublane, time lane): the (F, n_blocks)
  planes have ~19 lanes — 15% VPU lane utilization — and Mosaic rejects
  the (F, T) -> (F, n_blocks, w) LANE-axis reshape that would fix it;
  measured only ~5% faster than the network at tile_t=364.
- round-2 fused-frontend layout (time sublane, freq lane): the planes
  become (n_blocks, F) with full 128-lane occupancy, but Mosaic fails
  to compile the SUBLANE-axis reshape ((n_blocks*w, Fpad) ->
  (n_blocks, w, Fpad)) at production shapes.

This file stays as the tested XLA-path implementation of the algorithm
(it jits fine outside Pallas) and the record of those experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def _insert_bounded(lists: list, x, max_len: int):
    """Insert plane ``x`` into the ascending sorted list of planes,
    keeping only the lowest ``max_len`` planes.  2*min(len,max_len) ops."""
    new = x
    out = []
    for r in range(len(lists)):
        lo = jnp.minimum(new, lists[r])
        hi = jnp.maximum(new, lists[r])
        out.append(lo)
        new = hi
    if len(out) < max_len:
        out.append(new)
    return out


def _select_union_kth(A: list, B: list, k: int):
    """k-th smallest (0-indexed) of the union of two ascending sorted
    plane-lists via the min-max split identity.  A/B may be shorter than
    k+1; missing entries act as +inf."""
    def get(lst, idx):
        if idx < 0:
            return None  # -inf sentinel: max() ignores it
        if idx >= len(lst):
            return _INF
        return lst[idx]

    best = None
    for j in range(0, k + 2):
        a_idx = j - 1          # Ap[j] = A[j-1], Ap[0] = -inf
        b_idx = k - j          # Bp[k+1-j] = B[k-j]
        av = get(A, a_idx)
        bv = get(B, b_idx)
        if av is None and bv is None:
            continue
        cand = av if bv is None else (bv if av is None
                                      else jnp.maximum(av, bv))
        best = cand if best is None else jnp.minimum(best, cand)
    return best


def sliding_median_ext(x_ext: jnp.ndarray, w: int, out_len: int,
                       axis: int = -1) -> jnp.ndarray:
    """Sliding median over pre-extended input: ``x_ext`` has
    ``out_len + w - 1`` entries along ``axis`` (the caller supplies the
    halo/boundary), outputs windows starting at 0..out_len-1.

    ``axis`` must be -1 or -2; both forms avoid transposes so the same
    code runs on VPU tiles inside the Pallas kernel.
    """
    assert w % 2 == 1
    assert axis in (-1, -2)
    k = w // 2
    keep = k + 2

    total = out_len + w - 1
    assert x_ext.shape[axis] == total, (x_ext.shape, axis, total)
    nb = -(-total // w) + 1  # + spill block so block b+1 always exists

    if axis == -1:
        pad = [(0, 0)] * (x_ext.ndim - 1) + [(0, nb * w - total)]
        xp = jnp.pad(x_ext, pad, constant_values=_INF)
        blocks = xp.reshape(x_ext.shape[:-1] + (nb, w))

        def plane(i):                      # (..., nb)
            return blocks[..., i]

        def assemble(outs):                # w x (..., nb) -> (..., out_len)
            out = jnp.stack(outs, axis=-1)
            out = out.reshape(x_ext.shape[:-1] + (nb * w,))
            return out[..., :out_len]
    else:
        pad = ([(0, 0)] * (x_ext.ndim - 2)
               + [(0, nb * w - total), (0, 0)])
        xp = jnp.pad(x_ext, pad, constant_values=_INF)
        blocks = xp.reshape(x_ext.shape[:-2] + (nb, w, x_ext.shape[-1]))

        def plane(i):                      # (..., nb, C)
            return blocks[..., i, :]

        def assemble(outs):
            out = jnp.stack(outs, axis=-2)     # (..., nb, w, C)
            out = out.reshape(x_ext.shape[:-2]
                              + (nb * w, x_ext.shape[-1]))
            return out[..., :out_len, :]

    # Suffix lists per offset (descending build), prefix lists (ascending).
    suf_at = [None] * w   # suf_at[i] = sorted lowest-`keep` of block[i:]
    cur: list = []
    for i in range(w - 1, -1, -1):
        cur = _insert_bounded(cur, plane(i), keep)
        suf_at[i] = list(cur)
    pre_at = [None] * w   # pre_at[i] = sorted lowest-`keep` of block[:i]
    cur = []
    pre_at[0] = []
    for i in range(1, w):
        cur = _insert_bounded(cur, plane(i - 1), keep)
        pre_at[i] = list(cur)

    # Prefix lists of the NEXT block: shift left by one block.
    blk_axis = -1 if axis == -1 else -2

    def shift(p):
        if blk_axis == -1:
            return jnp.concatenate(
                [p[..., 1:], jnp.full_like(p[..., :1], _INF)], axis=-1)
        return jnp.concatenate(
            [p[..., 1:, :], jnp.full_like(p[..., :1, :], _INF)], axis=-2)

    outs = []
    for i in range(w):
        A = suf_at[i]
        B = [shift(p) for p in pre_at[i]]
        outs.append(_select_union_kth(A, B, k))
    return assemble(outs)


def sliding_median_shared(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Sliding median of odd width ``w`` along the LAST axis with
    'symmetric' boundary, shape-preserving — same contract as
    ``hpss._sliding_median``."""
    k = w // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(k, k)]
    xp = jnp.pad(x, pad, mode="symmetric")
    return sliding_median_ext(xp, w, x.shape[-1], axis=-1)
