"""Mean-shift maxima search in the continuous 3D voting space, batched.

Reference: voting/voting_mean_shift.cpp.  Semantics preserved:
  * Seeds from grid binning with cell size (2*bandwidth)/sqrt(2); a bin key is
    floor(pos/size + 0.5) and the seed sits at key*size; every occupied bin
    seeds (minBin = 1) (voting_mean_shift.cpp:431-481).
  * Iterate x <- sum_j g(u_j) w_j x_j / sum_j g(u_j) w_j over votes within the
    bandwidth, u = d^2/b^2, g = -kernelDerivative (Gaussian profile
    exp(-u/2), derivative -0.5 exp(-u/2); Uniform: 1) until the shift is
    <= threshold or maxIter iterations (voting_mean_shift.cpp:201-376).
    Seeds whose window is empty are dropped.
  * Density of a position = sum kernel(u_j) w_j over in-bandwidth votes
    (voting_mean_shift.cpp:247-285).
  * Maxima post-processing: weighted averaging of neighbor maxima then
    greedy non-max suppression within the bandwidth
    (maxima_handler.cpp:51-157).
  * Final per-maximum density computation *sequentially reweights* the votes
    it touches (voting_mean_shift.cpp:289-328) -- order-dependent when
    maxima windows overlap; replicated with a scan.

TPU formulation: everything carries a leading class/batch axis; each
iteration is one masked [S, V] distance product; convergence is a batched
``lax.while_loop`` that freezes converged seeds.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .neighbors import pairwise_sqdist


def seeds_range(bandwidth: float) -> float:
    """Cube edge fitting into the bandwidth sphere (voting_mean_shift.cpp:33-37)."""
    return (bandwidth * 2.0) / jnp.sqrt(2.0)


def create_seeds(
    votes: jnp.ndarray,     # [V, 3]
    weights: jnp.ndarray,   # [V]
    valid: jnp.ndarray,     # [V]
    bin_size: jnp.ndarray,  # scalar (may be traced)
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grid binning seed creation.  Returns (seed positions [S,3],
    seed weights [S], seed mask [S]).  Seed = bin key * bin_size for every
    occupied bin; weight = sum of vote weights in the bin."""
    key = jnp.floor(votes / bin_size + 0.5).astype(jnp.int32)
    key = jnp.where(valid[:, None], key, jnp.iinfo(jnp.int32).max)

    order = jnp.lexsort((key[:, 0], key[:, 1], key[:, 2]))
    skey = key[order]
    svalid = valid[order]
    sweights = weights[order]

    is_new = jnp.concatenate([
        jnp.array([True]),
        jnp.any(skey[1:] != skey[:-1], axis=1),
    ]) & svalid
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg = jnp.where(svalid, seg, capacity)

    n_bins = capacity + 1
    wsum = jax.ops.segment_sum(jnp.where(svalid, sweights, 0.0), seg, n_bins)[:capacity]
    count = jax.ops.segment_sum(svalid.astype(jnp.int32), seg, n_bins)[:capacity]
    # seed position: the bin key scaled back; take the key of the first member
    first_idx = jax.ops.segment_min(
        jnp.arange(votes.shape[0]), seg, n_bins)[:capacity]
    first_idx = jnp.clip(first_idx, 0, votes.shape[0] - 1)
    seed_pos = skey[first_idx].astype(votes.dtype) * bin_size
    seed_mask = count >= 1
    seed_pos = jnp.where(seed_mask[:, None], seed_pos, 0.0)
    return seed_pos, jnp.where(seed_mask, wsum, 0.0), seed_mask


def _kernel(u: jnp.ndarray, kernel: str) -> jnp.ndarray:
    if kernel == "Gaussian":
        return jnp.exp(-0.5 * u)
    return jnp.ones_like(u)  # Uniform


def _kernel_derivative_neg(u: jnp.ndarray, kernel: str) -> jnp.ndarray:
    """-kernelDerivative(u): Gaussian -> 0.5 exp(-u/2); Uniform -> -1
    (the reference returns +1 as the 'derivative', so g = -1; the sign
    cancels in the normalized mean, matching voting_mean_shift.cpp:409-417)."""
    if kernel == "Gaussian":
        return 0.5 * jnp.exp(-0.5 * u)
    return -jnp.ones_like(u)


def mean_shift(
    seeds: jnp.ndarray,       # [S, 3]
    seed_mask: jnp.ndarray,   # [S]
    votes: jnp.ndarray,       # [V, 3]
    weights: jnp.ndarray,     # [V]
    valid: jnp.ndarray,       # [V]
    bandwidth: jnp.ndarray,   # scalar
    threshold: float = 1e-3,
    max_iter: int = 1000,
    kernel: str = "Gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run mean-shift to convergence for all seeds at once.

    Returns (cluster centers [S,3], alive mask [S]).  A seed dies if its
    window is ever empty (reference: computeMeanShift returning false)."""
    b2 = bandwidth * bandwidth

    def shift_once(pos):
        d2 = pairwise_sqdist(pos, votes)
        in_r = (d2 <= b2) & valid[None, :]
        u = d2 / b2
        g = jnp.where(in_r, _kernel_derivative_neg(u, kernel) * weights[None, :], 0.0)
        denom = jnp.sum(g, axis=1)
        num = g @ votes
        ok = denom != 0
        has_nbr = jnp.any(in_r, axis=1)
        new = jnp.where((ok & has_nbr)[:, None],
                        num / jnp.where(ok, denom, 1.0)[:, None], pos)
        return new, has_nbr

    def cond(state):
        pos, alive, active, it = state
        return (it < max_iter) & jnp.any(active & alive)

    def body(state):
        pos, alive, active, it = state
        new, has_nbr = shift_once(pos)
        alive = alive & (has_nbr | ~active)  # only active seeds can die
        diff = jnp.linalg.norm(new - pos, axis=1)
        moved = jnp.where(active & alive, diff, 0.0)
        pos = jnp.where((active & alive)[:, None], new, pos)
        active = active & (moved > threshold) & alive
        return pos, alive, active, it + 1

    init = (seeds, seed_mask, seed_mask, jnp.asarray(0, jnp.int32))
    pos, alive, _, _ = jax.lax.while_loop(cond, body, init)
    return pos, alive & seed_mask


def estimate_density(
    positions: jnp.ndarray,   # [M, 3]
    votes: jnp.ndarray,       # [V, 3]
    weights: jnp.ndarray,     # [V]
    valid: jnp.ndarray,       # [V]
    bandwidth: jnp.ndarray,
    kernel: str = "Gaussian",
) -> jnp.ndarray:
    """Density of each position: sum of kernel-weighted vote weights within
    the bandwidth (voting_mean_shift.cpp:247-285)."""
    b2 = bandwidth * bandwidth
    d2 = pairwise_sqdist(positions, votes)
    in_r = (d2 <= b2) & valid[None, :]
    k = _kernel(d2 / b2, kernel)
    return jnp.sum(jnp.where(in_r, k * weights[None, :], 0.0), axis=1)


def density_and_reweight(
    positions: jnp.ndarray,   # [M, 3] final maxima (ordered)
    pos_mask: jnp.ndarray,    # [M]
    votes: jnp.ndarray,       # [V, 3]
    weights: jnp.ndarray,     # [V]
    valid: jnp.ndarray,       # [V]
    bandwidth: jnp.ndarray,
    kernel: str = "Gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequential estimateDensityAndReweightVotes over maxima: each maximum
    reweights the votes inside its window *in place* (kernel * weight), so a
    later maximum with an overlapping window sees updated weights
    (voting_mean_shift.cpp:158-176, 289-328).

    Returns (densities [M], final vote weights [V], membership [M, V]).
    """
    b2 = bandwidth * bandwidth

    def step(w, inputs):
        pos, ok = inputs
        d2 = jnp.sum((votes - pos[None, :]) ** 2, axis=1)
        in_r = (d2 <= b2) & valid & ok
        k = _kernel(d2 / b2, kernel)
        new_w = jnp.where(in_r, k * w, w)
        density = jnp.sum(jnp.where(in_r, new_w, 0.0))
        return new_w, (density, in_r)

    final_w, (densities, membership) = jax.lax.scan(
        step, weights, (positions, pos_mask))
    return densities, final_w, membership


def average_neighbor_maxima(
    centers: jnp.ndarray,    # [M, 3]
    mask: jnp.ndarray,       # [M]
    densities: jnp.ndarray,  # [M]
    radius: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy density-weighted neighbor averaging
    (maxima_handler.cpp:94-157): scan in index order; each not-yet-absorbed
    center absorbs later centers within the radius and is replaced by the
    density-weighted average of the group."""
    m = centers.shape[0]
    d = jnp.sqrt(pairwise_sqdist(centers, centers))
    close = (d < radius) & mask[None, :] & mask[:, None]

    def body(k, owner):
        # center k absorbs all later centers that are close and unowned
        can_own = (owner == jnp.arange(m))  # not absorbed yet
        i_am_free = can_own[k]
        later = jnp.arange(m) > k
        absorb = close[k] & later & can_own & i_am_free
        return jnp.where(absorb, k, owner)

    owner = jax.lax.fori_loop(0, m, body, jnp.arange(m))
    owner = jnp.where(mask, owner, m)  # invalid -> dump segment

    wsum = jax.ops.segment_sum(jnp.where(mask, densities, 0.0), owner, m + 1)[:m]
    psum = jax.ops.segment_sum(
        jnp.where(mask[:, None], centers * densities[:, None], 0.0), owner, m + 1)[:m]
    is_owner = (owner == jnp.arange(m)) & mask
    avg = psum / jnp.maximum(wsum, 1e-30)[:, None]
    out = jnp.where(is_owner[:, None], avg, 0.0)
    return out, is_owner


def suppress_neighbor_maxima(
    centers: jnp.ndarray,    # [M, 3]
    mask: jnp.ndarray,       # [M]
    densities: jnp.ndarray,  # [M]
    radius: jnp.ndarray,
) -> jnp.ndarray:
    """Greedy density-ordered non-max suppression within radius
    (maxima_handler.cpp:51-92).  Returns a keep mask."""
    m = centers.shape[0]
    d = jnp.sqrt(pairwise_sqdist(centers, centers))
    close = d < radius

    def body(state):
        work, keep = state
        idx = jnp.argmax(work)
        keep = keep.at[idx].set(True)
        work = jnp.where(close[idx], -jnp.inf, work)
        return work, keep

    def cond(state):
        work, _ = state
        return jnp.any(jnp.isfinite(work) & (work > -jnp.inf))

    work = jnp.where(mask, densities, -jnp.inf)
    keep = jnp.zeros(m, bool)
    work, keep = jax.lax.while_loop(cond, body, (work, keep))
    return keep & mask
