"""Batched conformer refinement ON the accelerator.

The reference generates conformers on the host with RDKit's C++ force
fields (/root/reference/data/conformer.py:102-154); this repo's
self-contained replacement (chem/conformer.py `_refine`, csrc/mmchem.cpp)
kept that host placement — and measurement showed it is THE sustained
serving bottleneck on a small host: the device forward is ~5.5k mols/s
while host featurization caps the pipeline two orders of magnitude lower
(docs/PERF.md).  A conformer force field is a batch of tiny independent
physics problems — exactly what an accelerator wants — so this module runs
the SAME energy model (bond springs k=1, 1-3 angle-distance springs k=0.6,
soft nonbonded repulsion below 2.2 A, momentum 0.8, lr 0.05 decaying 10x,
per-iteration recentering) as one jit'd `lax.fori_loop` over a whole batch
of molecules:

  * bond/angle terms arrive as padded index/target arrays; padding rows are
    (0, 0) self-pairs whose displacement is exactly zero, so they
    contribute zero force without any masking arithmetic;
  * the nonbonded term needs NO precomputed pair list (the host path's
    O(n^2) enumeration / Verlet pruning): the kernel computes the full
    [Np, Np] pair distances — trivial work on the VPU — and masks out the
    diagonal, padded rows, and the bonded/1-3 pairs scattered from the term
    indices.  Summing the full antisymmetric force matrix over j reproduces
    the pair-list's +f/-f accumulation exactly;
  * everything is float32 (the host reference refines in float64; the
    energy model is dissipative — momentum decay + lr decay — so both land
    in the same minimum basin; equivalence is asserted on the resulting
    distance matrices and energies, not bitwise).

Batched across M molecules and vmapped, the whole 300-iteration refinement
of a 64-molecule batch is one device dispatch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NB_FLOOR = 2.2   # soft lower bound for nonbonded pairs (Angstrom)
LR0 = 0.05
MOMENTUM = 0.8
BOND_K = 1.0
ANGLE_K = 0.6


def _incidence(idx, np_):
    """Signed incidence matrix S [T, Np] with +1 at idx[:,0], -1 at idx[:,1].

    TPU-critical representation: per-iteration gather (x[i] - x[j]) becomes
    `S @ x` and scatter-accumulation of the +f/-f endpoint forces becomes
    `S.T @ f` — two small matmuls the MXU eats, instead of T scatters that
    XLA:TPU serializes (measured: the scatter formulation ran the
    300-iteration refinement of a 64x192 batch in 20.5 s; this one in
    ~tens of ms).  Padded (0,0) rows give a zero S row, so they contribute
    zero displacement AND zero force with no masking arithmetic.  Returns
    (S, O0, O1) — the one-sided one-hots feed the exclusion-mask matmul.
    """
    o0 = jax.nn.one_hot(idx[:, 0], np_, dtype=jnp.float32)
    o1 = jax.nn.one_hot(idx[:, 1], np_, dtype=jnp.float32)
    return o0 - o1, o0, o1


def _nb_exclusion_mask(atom_mask, pair_counts):
    """[Np,Np] float32: 1 where the nonbonded repulsion applies — both atoms
    real, i != j, pair not bonded and not 1-3 (both orders).

    pair_counts [Np,Np] counts (i0, i1) term occurrences (from the one-hot
    outer products) — nonzero anywhere a bond/1-3 term covers the pair."""
    np_ = atom_mask.shape[0]
    m = atom_mask[:, None] * atom_mask[None, :]
    m = m * (1.0 - jnp.eye(np_, dtype=m.dtype))
    covered = pair_counts + pair_counts.T
    return m * (covered == 0).astype(m.dtype)


def _refine_one(coords0, atom_mask, bond_idx, bond_len, ang_idx, ang_len,
                iters: int):
    """One molecule's full refinement (vmapped over the batch)."""
    np_ = coords0.shape[0]
    s_b, ob0, ob1 = _incidence(bond_idx, np_)
    s_a, oa0, oa1 = _incidence(ang_idx, np_)
    nb_mask = _nb_exclusion_mask(atom_mask, ob0.T @ ob1 + oa0.T @ oa1)

    def spring_grad(x, s, target, k):
        d = s @ x                                            # [T,3]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1)) + 1e-9
        f = (k * 2.0 * (dist - target) / dist)[:, None] * d  # [T,3]
        return s.T @ f                                       # [Np,3]
    n_real = jnp.maximum(jnp.sum(atom_mask), 1.0)
    # single-atom molecules skip recentering in the host reference (n > 1);
    # recentering a single real atom would pin it to the origin — same
    # result, so no special case is needed beyond the mask mean.

    def body(it, carry):
        x, vel = carry
        lr = LR0 * (1.0 - 0.9 * it.astype(jnp.float32) / float(iters))
        grad = spring_grad(x, s_b, bond_len, BOND_K)
        grad = grad + spring_grad(x, s_a, ang_len, ANGLE_K)
        # nonbonded: full pair matrix, masked.  Each ordered pair (i,j)
        # contributes c*(x_i - x_j) to grad[i]; the (j,i) entry supplies the
        # equal-and-opposite force on j — identical accumulation to the
        # host pair list's +f/-f.
        diff = x[:, None, :] - x[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) + 1e-9
        pen = jnp.maximum(NB_FLOOR - dist, 0.0) * nb_mask
        c = -0.3 * 2.0 * pen / dist
        grad = grad + jnp.sum(c[:, :, None] * diff, axis=1)
        vel = MOMENTUM * vel - lr * grad
        x = x + vel
        center = jnp.sum(x * atom_mask[:, None], axis=0) / n_real
        x = x - center[None, :]
        return x, vel

    x, _ = jax.lax.fori_loop(
        0, iters, body, (coords0, jnp.zeros_like(coords0))
    )
    return x


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_conformers(
    coords0: jnp.ndarray,     # [M, Np, 3] float32 initial coordinates
    n_atoms: jnp.ndarray,     # [M] int32 real-atom counts (mask built here)
    bond_idx: jnp.ndarray,    # [M, NB, 2] int, (0,0)-padded (i16 on the wire)
    bond_len: jnp.ndarray,    # [M, NB] float32 ideal bond lengths
    ang_idx: jnp.ndarray,     # [M, NA, 2] int, (0,0)-padded (i16 on the wire)
    ang_len: jnp.ndarray,     # [M, NA] float32 ideal 1-3 distances
    iters: int = 300,
) -> jnp.ndarray:
    """Refine a batch of molecules in one compiled program; returns the
    refined [M, Np, 3] coordinates (padded rows are meaningless).

    Wire-size notes (the axon tunnel moves ~20-50 MB/s, so upload bytes are
    real latency): callers pass int16 index arrays and the [M] atom counts;
    the int32 casts and the [M, Np] mask construction happen device-side —
    numerically identical to shipping the wide forms."""
    np_ = coords0.shape[1]
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (coords0.shape[0], np_), 1)
        < n_atoms.astype(jnp.int32)[:, None]
    ).astype(jnp.float32)
    return jax.vmap(_refine_one, in_axes=(0, 0, 0, 0, 0, 0, None))(
        coords0.astype(jnp.float32),
        mask,
        bond_idx.astype(jnp.int32),
        bond_len.astype(jnp.float32),
        ang_idx.astype(jnp.int32),
        ang_len.astype(jnp.float32),
        iters,
    )


def refine_energy(coords, atom_mask, bond_idx, bond_len, ang_idx, ang_len):
    """The scalar energy the refinement descends (per molecule, [M]).

    Used by tests to assert the device refinement reaches the same quality
    as the host float64 reference (the trajectories are not bitwise
    comparable; the minimum basin is)."""
    def one(x, am, bi, bl, ai, al):
        def term(idx, target, k):
            d = jnp.take(x, idx[:, 0], axis=0) - jnp.take(x, idx[:, 1], axis=0)
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1)) + 1e-9
            # padded (0,0) rows: dist ~ 1e-9, (dist-target)^2 would count —
            # mask by displacement being exactly zero
            real = (jnp.sum(jnp.abs(d), axis=-1) > 0).astype(x.dtype)
            return jnp.sum(k * (dist - target) ** 2 * real)

        e = term(bi, bl, BOND_K) + term(ai, al, ANGLE_K)
        np_ = x.shape[0]
        _, ob0, ob1 = _incidence(bi, np_)
        _, oa0, oa1 = _incidence(ai, np_)
        nb_mask = _nb_exclusion_mask(am, ob0.T @ ob1 + oa0.T @ oa1)
        diff = x[:, None, :] - x[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) + 1e-9
        pen = jnp.maximum(NB_FLOOR - dist, 0.0)
        # full matrix counts each unordered pair twice -> halve
        e = e + 0.5 * 0.3 * jnp.sum(pen * pen * nb_mask)
        return e

    return jax.vmap(one)(
        coords.astype(jnp.float32), atom_mask.astype(jnp.float32),
        bond_idx.astype(jnp.int32), bond_len.astype(jnp.float32),
        ang_idx.astype(jnp.int32), ang_len.astype(jnp.float32),
    )


def pad_counts(n: int, *, minimum: int = 8) -> int:
    """Bucket a count to limit distinct compiled shapes: next power of two
    (>= minimum) below 128, then multiples of 64."""
    b = minimum
    while b < n and b < 128:
        b *= 2
    if b >= n:
        return b
    return -(-n // 64) * 64


Terms = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
