"""Host-side conformer generation and Uni-Mol-style featurization.

Reference pipeline (/root/reference/data/conformer.py): RDKit
EmbedMolecule(seed) + MMFF optimize -> 2D fallback -> zeros fallback, then
``coords2unimol`` (BOS/EOS-wrapped atom tokens, mean-centered coordinates,
full pairwise distance matrix, edge types ``tok_i * V + tok_j``,
max_atoms=256 random crop).

This module keeps that behavior surface with two coordinate providers:
  * RDKit (when importable): byte-compatible fallback ladder with the
    reference (3D embed -> MMFF -> 2D -> zeros).
  * built-in: a deterministic force-field refinement (bond springs, 1-3 angle
    distances, nonbonded repulsion) over the parsed molecular graph -- no
    external chemistry dependency.  A C++ implementation of the same energy
    model is used when csrc/libmmchem.so is built (see
    mmdti_tpu.chem.native).

Featurization numerics (centering, zero BOS/EOS rows, distance matrix, edge
types) are identical to the reference.
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mmdti_tpu.chem.dictionary import Dictionary
from mmdti_tpu.chem.smiles import Molecule, SmilesError, parse_smiles
from mmdti_tpu.utils.logger import logger

try:  # optional exact-reference path
    from rdkit import Chem  # type: ignore
    from rdkit.Chem import AllChem  # type: ignore
    from rdkit import RDLogger  # type: ignore

    RDLogger.DisableLog("rdApp.*")
    _HAVE_RDKIT = True
except Exception:  # pragma: no cover
    Chem = AllChem = None
    _HAVE_RDKIT = False

# single-bond covalent radii (Angstrom)
_COV_RADII: Dict[str, float] = {
    "H": 0.31, "B": 0.84, "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57,
    "Si": 1.11, "P": 1.07, "S": 1.05, "Cl": 1.02, "Br": 1.20, "I": 1.39,
    "Na": 1.66, "K": 2.03, "Li": 1.28, "Mg": 1.41, "Ca": 1.76, "Al": 1.21,
    "Fe": 1.32, "Zn": 1.22, "Cu": 1.32, "Mn": 1.39, "Se": 1.20, "As": 1.19,
    "Sn": 1.39, "Hg": 1.32, "Au": 1.36, "Pt": 1.36, "Cr": 1.39, "*": 0.76,
}
_DEFAULT_RADIUS = 1.2
_ORDER_SCALE = {1.0: 1.0, 1.5: 0.93, 2.0: 0.87, 3.0: 0.78, 4.0: 0.78}


def _ideal_bond_length(s1: str, s2: str, order: float) -> float:
    r = _COV_RADII.get(s1, _DEFAULT_RADIUS) + _COV_RADII.get(s2, _DEFAULT_RADIUS)
    return r * _ORDER_SCALE.get(order, 1.0)


def _bond_angle_terms(mol: Molecule):
    """Bond + 1-3 angle-distance spring terms (shared by the host refiners,
    which add the O(n^2) nonbonded enumeration via _build_terms, and the
    device refiner, which masks nonbonded pairs on the accelerator and
    needs no pair list — ops/device_refine.py).

    Returns (bidx [NB,2] int32, blen [NB] f32, aidx [NA,2] int32,
    alen [NA] f32, seen13 set of sorted pairs)."""
    n = mol.num_atoms()
    syms = [a.symbol for a in mol.atoms]

    bidx, blen = [], []
    order_of = {}
    for b in mol.bonds:
        bidx.append((b.a1, b.a2))
        blen.append(_ideal_bond_length(syms[b.a1], syms[b.a2], b.order))
        order_of[(b.a1, b.a2)] = b.order
        order_of[(b.a2, b.a1)] = b.order

    # 1-3 terms via every center atom
    aidx, alen = [], []
    seen13 = set()
    for j in range(n):
        nb = mol.neighbors(j)
        if len(nb) < 2:
            continue
        center = mol.atoms[j]
        max_order = max(order_of[(j, k)] for k in nb)
        if max_order >= 3.0 or (len(nb) == 2 and max_order >= 2.0 and all(order_of[(j, k)] >= 2.0 for k in nb)):
            theta = np.pi  # sp: linear
        elif center.aromatic or max_order >= 2.0 or (center.symbol in ("B",)):
            theta = np.deg2rad(120.0)
        else:
            theta = np.deg2rad(109.47)
        cos_t = np.cos(theta)
        for x in range(len(nb)):
            for y in range(x + 1, len(nb)):
                i, k = nb[x], nb[y]
                key = (min(i, k), max(i, k))
                if key in seen13:
                    continue
                seen13.add(key)
                d1 = _ideal_bond_length(syms[i], syms[j], order_of[(i, j)])
                d2 = _ideal_bond_length(syms[k], syms[j], order_of[(k, j)])
                d13 = np.sqrt(max(d1 * d1 + d2 * d2 - 2 * d1 * d2 * cos_t, 1e-6))
                aidx.append((i, k))
                alen.append(d13)

    return (
        np.array(bidx, dtype=np.int32).reshape(-1, 2),
        np.array(blen, dtype=np.float32),
        np.array(aidx, dtype=np.int32).reshape(-1, 2),
        np.array(alen, dtype=np.float32),
        seen13,
    )


def _build_terms(mol: Molecule):
    """Precompute (bond, angle-13, nonbonded) index/target arrays."""
    n = mol.num_atoms()
    bidx, blen, aidx, alen, seen13 = _bond_angle_terms(mol)

    # nonbonded: all pairs at graph distance >= 3 (plus cross-fragment pairs)
    bonded = {tuple(sorted(p)) for p in bidx.tolist()} | set(seen13)
    nidx = []
    for i in range(n):
        for k in range(i + 1, n):
            if (i, k) not in bonded:
                nidx.append((i, k))

    return (
        bidx, blen, aidx, alen,
        np.array(nidx, dtype=np.int32).reshape(-1, 2),
    )


def _refine(coords: np.ndarray, terms, iters: int = 300) -> np.ndarray:
    """Gradient descent with momentum on the spring/repulsion energy."""
    bidx, blen, aidx, alen, nidx = terms
    x = coords.astype(np.float64)
    vel = np.zeros_like(x)
    n = len(x)
    nb_floor = 2.2  # soft lower bound for nonbonded pairs (Angstrom)
    lr0 = 0.05
    for it in range(iters):
        lr = lr0 * (1.0 - 0.9 * it / iters)
        grad = np.zeros_like(x)
        if len(bidx):
            d = x[bidx[:, 0]] - x[bidx[:, 1]]
            dist = np.linalg.norm(d, axis=1) + 1e-9
            f = (2.0 * (dist - blen) / dist)[:, None] * d  # k=1
            np.add.at(grad, bidx[:, 0], f)
            np.add.at(grad, bidx[:, 1], -f)
        if len(aidx):
            d = x[aidx[:, 0]] - x[aidx[:, 1]]
            dist = np.linalg.norm(d, axis=1) + 1e-9
            f = (0.6 * 2.0 * (dist - alen) / dist)[:, None] * d
            np.add.at(grad, aidx[:, 0], f)
            np.add.at(grad, aidx[:, 1], -f)
        if len(nidx):
            d = x[nidx[:, 0]] - x[nidx[:, 1]]
            dist = np.linalg.norm(d, axis=1) + 1e-9
            pen = np.maximum(nb_floor - dist, 0.0)
            f = (-0.3 * 2.0 * pen / dist)[:, None] * d
            np.add.at(grad, nidx[:, 0], f)
            np.add.at(grad, nidx[:, 1], -f)
        vel = 0.8 * vel - lr * grad
        x = x + vel
        if n > 1:
            x -= x.mean(axis=0, keepdims=True)
    return x.astype(np.float32)


def _strip_hs(atoms: Sequence[str], coords: np.ndarray):
    """Drop hydrogen rows (single definition for every provider's
    remove_hs path)."""
    idx = [i for i, a in enumerate(atoms) if a != "H"]
    return [atoms[i] for i in idx], coords[idx]


def builtin_smi2coords(
    smi: str, seed: int = 42, remove_hs: bool = False
) -> Tuple[List[str], np.ndarray]:
    """Built-in provider: parse -> add explicit H -> embed -> refine."""
    mol = parse_smiles(smi).add_hydrogens()
    n = mol.num_atoms()
    atoms = [a.symbol for a in mol.atoms]
    rng = np.random.RandomState(seed if seed >= 0 else None)
    scale = max(1.5, 0.8 * n ** (1.0 / 3.0) * 2.0)
    coords = rng.randn(n, 3).astype(np.float32) * scale
    try:
        from mmdti_tpu.chem import native

        # Preferred: graph->terms->refine fully in C++ (embed); next: native
        # refine over Python-built terms; last: pure numpy.
        refined = native.embed_coords(mol, coords)
        if refined is None:
            refined = native.refine_coords(mol, coords)
        if refined is not None:
            coords = refined
        else:
            coords = _refine(coords, _build_terms(mol))
    except Exception:
        coords = _refine(coords, _build_terms(mol))
    if remove_hs:
        return _strip_hs(atoms, coords)
    return atoms, coords


def rdkit_smi2coords(smi, seed=42, mode="fast", remove_hs=False):
    """RDKit provider: byte-compatible fallback ladder with the reference
    (/root/reference/data/conformer.py:102-154)."""
    mol = Chem.MolFromSmiles(smi)
    if mol is None:
        # catchable by serving / strict readers; the validity filter
        # (is_valid_smiles) applies RDKit rules too, so filtered pipelines
        # never reach this
        raise SmilesError(f"RDKit could not parse SMILES: {smi!r}")
    mol = AllChem.AddHs(mol)
    atoms = [atom.GetSymbol() for atom in mol.GetAtoms()]
    assert len(atoms) > 0, f"SMILES parsed to an empty molecule: {smi}"
    try:
        res = AllChem.EmbedMolecule(mol, randomSeed=seed)
        if res == 0:
            try:
                AllChem.MMFFOptimizeMolecule(mol)
            except Exception:
                pass
            coordinates = mol.GetConformer().GetPositions().astype(np.float32)
        elif res == -1 and mode == "heavy":
            AllChem.EmbedMolecule(mol, maxAttempts=5000, randomSeed=seed)
            try:
                AllChem.MMFFOptimizeMolecule(mol)
                coordinates = mol.GetConformer().GetPositions().astype(np.float32)
            except Exception:
                AllChem.Compute2DCoords(mol)
                coordinates = mol.GetConformer().GetPositions().astype(np.float32)
        else:
            AllChem.Compute2DCoords(mol)
            coordinates = mol.GetConformer().GetPositions().astype(np.float32)
    except Exception:
        logger.info("RDKit conformer generation failed; substituting zero coordinates.")
        coordinates = np.zeros((len(atoms), 3), dtype=np.float32)
    assert len(atoms) == len(coordinates), f"atom/coordinate count mismatch for {smi}"
    if remove_hs:
        return _strip_hs(atoms, coordinates)
    return atoms, coordinates


def smi2coords(smi: str, seed: int = 42, mode: str = "fast", remove_hs: bool = False):
    if _HAVE_RDKIT:
        return rdkit_smi2coords(smi, seed=seed, mode=mode, remove_hs=remove_hs)
    try:
        return builtin_smi2coords(smi, seed=seed, remove_hs=remove_hs)
    except SmilesError:
        raise
    except Exception:
        # zeros fallback mirrors the reference ladder's last rung
        mol = parse_smiles(smi).add_hydrogens()
        atoms = [a.symbol for a in mol.atoms]
        coords = np.zeros((len(atoms), 3), dtype=np.float32)
        if remove_hs:
            return _strip_hs(atoms, coords)
        return atoms, coords


def inner_coords(atoms: Sequence[str], coordinates, remove_hs: bool = True):
    """Optionally strip hydrogens (reference: data/conformer.py:156-180)."""
    assert len(atoms) == len(coordinates), "atom/coordinate count mismatch"
    coordinates = np.array(coordinates, dtype=np.float32)
    if remove_hs:
        return _strip_hs(list(atoms), coordinates)
    return list(atoms), coordinates


def coords2unimol(
    atoms: Sequence[str],
    coordinates,
    dictionary: Dictionary,
    max_atoms: int = 256,
    remove_hs: bool = False,
    crop_rng: Optional[np.random.RandomState] = None,
    crop_seed: Optional[int] = None,
    pair_feats: bool = True,
    **_,
) -> Dict[str, np.ndarray]:
    """Tokens / centered coords / distance matrix / edge types
    (reference numerics: data/conformer.py:182-219).

    ``crop_seed`` defers RandomState construction to the (rare) crop branch —
    same draws as passing ``crop_rng=np.random.RandomState(crop_seed)``."""
    atoms, coordinates = inner_coords(atoms, coordinates, remove_hs=remove_hs)
    atoms = np.array(atoms)
    coordinates = np.array(coordinates, dtype=np.float32)
    if len(atoms) > max_atoms:
        if crop_rng is None and crop_seed is not None:
            crop_rng = np.random.RandomState(crop_seed)
        rng = crop_rng if crop_rng is not None else np.random
        idx = rng.choice(len(atoms), max_atoms, replace=False)
        atoms = atoms[idx]
        coordinates = coordinates[idx]
    src_tokens = np.array(
        [dictionary.bos()] + [dictionary.index(a) for a in atoms] + [dictionary.eos()]
    )
    src_coord = coordinates - coordinates.mean(axis=0)
    src_coord = np.concatenate(
        [np.zeros((1, 3), dtype=np.float32), src_coord, np.zeros((1, 3), dtype=np.float32)],
        axis=0,
    )
    if not pair_feats:
        # device-side pair featurization (ops/pair_feats.py): the consumer
        # reconstructs distance/edge from tokens+coords inside the jit, so
        # skip the O(N^2) host arrays entirely (smaller cache entries, no
        # host distance work)
        return {
            "src_tokens": src_tokens.astype(np.int64),
            "src_coord": src_coord.astype(np.float32),
        }
    src_distance = None
    try:
        from mmdti_tpu.chem import native

        src_distance = native.distance_matrix(src_coord)
    except Exception:
        pass
    if src_distance is None:
        diff = src_coord[:, None, :] - src_coord[None, :, :]
        src_distance = np.sqrt((diff * diff).sum(-1))
    vocab = len(dictionary)
    src_edge_type = src_tokens.reshape(-1, 1) * vocab + src_tokens.reshape(1, -1)
    return {
        "src_tokens": src_tokens.astype(np.int64),
        "src_distance": src_distance.astype(np.float32, copy=False),
        "src_coord": src_coord.astype(np.float32),
        "src_edge_type": src_edge_type.astype(np.int64),
    }


def resolve_coord_provider(provider: str = "auto") -> str:
    """Where the force-field refinement runs ('host' or 'device').

    'auto' -> 'device' only when RDKit is absent (RDKit keeps reference
    byte-compatibility) AND the jax backend is a TPU.  Shared by
    ConformerGen and the conformer-cache fingerprint (data/hub.py) so a
    cache built with one provider can never serve the other."""
    if provider in ("host", "device"):
        return provider
    if _HAVE_RDKIT:
        return "host"
    try:
        import jax

        return "device" if jax.default_backend() == "tpu" else "host"
    except Exception:
        return "host"


class ConformerGen:
    """SMILES list -> list of featurized molecule dicts.

    API parity with the reference ConformerGen (data/conformer.py:28-99):
    ``transform(smiles_list)`` and ``transform_raw(atoms_list, coords_list)``,
    with failure-rate logging.  Parallelism uses a thread pool (the heavy math
    is numpy / C++, which releases the GIL) sized by ``num_workers``.
    """

    def __init__(self, **params):
        self.seed = params.get("seed", 42)
        self.max_atoms = params.get("max_atoms", 256)
        self.data_type = params.get("data_type", "molecule")
        self.method = params.get("method", "rdkit_random")
        self.mode = params.get("mode", "fast")
        self.remove_hs = params.get("remove_hs", False)
        self.num_workers = params.get("num_workers", 0) or 0
        # 'auto' | 'host' | 'device': where the force-field refinement runs.
        # 'device' batches whole SMILES lists through one accelerator
        # dispatch (chem/device_conformer.py) — the host refine is the
        # measured sustained-serving bottleneck.  'auto' resolves to device
        # only when (a) RDKit is absent (RDKit keeps reference
        # byte-compatibility) and (b) the jax backend is a TPU.  Resolution
        # happens at the first transform (or at the conformer-cache
        # fingerprint check, data/hub.py — cached features are only valid
        # for the provider that WOULD run), never at construction.
        self.coord_provider = params.get("coord_provider", "auto")
        if self.coord_provider not in ("auto", "host", "device"):
            raise ValueError(
                f"coord_provider must be auto|host|device, got "
                f"{self.coord_provider!r}"
            )
        # below this total atom count (incl. H) the device provider routes a
        # molecule to the host refiner anyway — a per-molecule deterministic
        # rule (see device_conformer.device_smi2coords_batch)
        self.device_refine_min_atoms = int(
            params.get("device_refine_min_atoms", 48)
        )
        self._resolved_provider: Optional[str] = (
            None if self.coord_provider == "auto" else self.coord_provider
        )
        # False: skip the O(N^2) host distance/edge arrays (consumer
        # reconstructs them on device, ops/pair_feats.py)
        self.pair_feats = bool(params.get("pair_feats", True))
        dict_path = params.get("dict_path", None)
        unimol_dir = params.get("unimol_dir", "") or ""
        if dict_path is None and unimol_dir:
            cand = os.path.join(os.path.dirname(unimol_dir), "mol.dict.txt")
            dict_path = cand if os.path.exists(cand) else None
        self.dictionary = Dictionary.load(dict_path)
        self.dictionary.add_symbol("[MASK]", is_special=True)
        logger.info(
            "ConformerGen initialized: method=%s seed=%s max_atoms=%s remove_hs=%s rdkit=%s",
            self.method, self.seed, self.max_atoms, self.remove_hs, _HAVE_RDKIT,
        )

    def resolved_provider(self) -> str:
        """Resolve coord_provider='auto' (lazily, once)."""
        if self._resolved_provider is None:
            self._resolved_provider = resolve_coord_provider(self.coord_provider)
        return self._resolved_provider

    def single_process(self, smiles: str) -> Dict[str, np.ndarray]:
        if self.resolved_provider() == "device":
            # route through the batch path so a molecule's coordinates are
            # identical whether it arrives alone or in a list
            return self._transform_device([smiles])[0]
        atoms, coordinates = smi2coords(
            smiles, seed=self.seed, mode=self.mode, remove_hs=self.remove_hs
        )
        return coords2unimol(
            atoms, coordinates, self.dictionary, self.max_atoms, remove_hs=self.remove_hs,
            crop_seed=self.seed, pair_feats=self.pair_feats,
        )

    def _transform_device(self, smiles_list: Sequence[str]):
        from mmdti_tpu.chem.device_conformer import device_smi2coords_batch

        pairs = device_smi2coords_batch(
            smiles_list, seed=self.seed, remove_hs=self.remove_hs,
            min_atoms=self.device_refine_min_atoms,
        )
        return [
            coords2unimol(
                atoms, coords, self.dictionary, self.max_atoms,
                remove_hs=self.remove_hs, crop_seed=self.seed,
                pair_feats=self.pair_feats,
            )
            for atoms, coords in pairs
        ]

    def transform_raw(self, atoms_list, coordinates_list):
        return [
            coords2unimol(a, c, self.dictionary, self.max_atoms, remove_hs=self.remove_hs,
                          pair_feats=self.pair_feats)
            for a, c in zip(atoms_list, coordinates_list)
        ]

    def transform(self, smiles_list: Sequence[str]):
        logger.info("Start generating conformers for %d molecules...", len(smiles_list))
        if self.resolved_provider() == "device":
            inputs = self._transform_device(smiles_list)
            return self._log_failures(inputs)
        if self.num_workers and self.num_workers > 1:
            with _fut.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                inputs = list(pool.map(self.single_process, smiles_list))
        else:
            inputs = [self.single_process(s) for s in smiles_list]
        return self._log_failures(inputs)

    @staticmethod
    def _log_failures(inputs):
        if inputs:
            failed = float(np.mean([(item["src_coord"] == 0.0).all() for item in inputs]))
            failed_3d = float(np.mean([(item["src_coord"][:, 2] == 0.0).all() for item in inputs]))
            logger.info("Failed to generate conformers for %.2f%% of molecules.", failed * 100)
            logger.info("Failed to generate 3d conformers for %.2f%% of molecules.", failed_3d * 100)
        return inputs
