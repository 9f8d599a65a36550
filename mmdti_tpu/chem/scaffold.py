"""Bemis-Murcko scaffold extraction.

Reference behavior: RDKit ``MurckoScaffold.MurckoScaffoldSmiles`` with
chirality (/root/reference/data/datareader.py:156-167,
/root/reference/tasks/split.py:75-84); on failure the raw SMILES is returned.

When RDKit is available we call it for byte-identical scaffold strings.
Otherwise the built-in implementation computes the same *graph*: ring systems
plus linker atoms (iteratively pruning acyclic terminal atoms) plus atoms
attached by multiple bonds to that core, and returns a canonical
Weisfeiler-Lehman key for the scaffold graph.  Scaffolds are only ever used as
*grouping keys* (scaffold splits / group columns), so a canonical key is
functionally equivalent to a canonical SMILES; the exact string differs from
RDKit's (documented deviation when RDKit is absent).
"""

from __future__ import annotations

import hashlib
from typing import Set

from mmdti_tpu.chem.smiles import Molecule, SmilesError, parse_smiles
from mmdti_tpu.utils.logger import logger

_WARNED_CHIRALITY = False

try:  # optional exact-RDKit path
    from rdkit.Chem.Scaffolds import MurckoScaffold  # type: ignore

    _HAVE_RDKIT = True
except Exception:  # pragma: no cover - environment without rdkit
    MurckoScaffold = None
    _HAVE_RDKIT = False


def _murcko_atom_set(mol: Molecule) -> Set[int]:
    ring_atoms = {i for i, a in enumerate(mol.atoms) if a.in_ring}
    if not ring_atoms:
        return set()
    keep = set(range(mol.num_atoms()))
    # iteratively prune terminal atoms that are not in rings -> rings + linkers
    changed = True
    while changed:
        changed = False
        for i in list(keep):
            if i in ring_atoms:
                continue
            deg = sum(1 for j in mol.neighbors(i) if j in keep)
            if deg <= 1:
                keep.discard(i)
                changed = True
    # re-attach atoms multiple-bonded to the core (e.g. exocyclic =O)
    extra = set()
    for b in mol.bonds:
        if b.order >= 2.0 and not b.aromatic:
            if b.a1 in keep and b.a2 not in keep:
                extra.add(b.a2)
            elif b.a2 in keep and b.a1 not in keep:
                extra.add(b.a1)
    return keep | extra


def _wl_canonical_key(mol: Molecule, atom_set: Set[int], include_chirality: bool = True) -> str:
    """Canonical Weisfeiler-Lehman refinement hash of the induced subgraph.

    include_chirality is accepted for API symmetry but has no effect here:
    the built-in parser does not retain @/@@ marks, so enantiomeric
    scaffolds share one key (RDKit with includeChirality=True keeps them
    apart — documented deviation, warned once in murcko_scaffold)."""
    if not atom_set:
        return ""
    idxs = sorted(atom_set)
    pos = {a: k for k, a in enumerate(idxs)}
    labels = []
    for a in idxs:
        at = mol.atoms[a]
        labels.append(f"{at.symbol}|{int(at.aromatic)}|{at.charge}")
    adj = [[] for _ in idxs]
    for b in mol.bonds:
        if b.a1 in atom_set and b.a2 in atom_set:
            lbl = "ar" if b.aromatic else str(b.order)
            adj[pos[b.a1]].append((pos[b.a2], lbl))
            adj[pos[b.a2]].append((pos[b.a1], lbl))
    cur = labels
    for _ in range(max(3, len(idxs).bit_length() + 1)):
        nxt = []
        for v in range(len(idxs)):
            neigh = sorted(f"{lbl}:{cur[u]}" for u, lbl in adj[v])
            nxt.append(hashlib.sha1((cur[v] + "|" + ";".join(neigh)).encode()).hexdigest()[:16])
        cur = nxt
    digest = hashlib.sha1("|".join(sorted(cur)).encode()).hexdigest()
    return f"scaffold:{digest}"


def murcko_scaffold(smiles: str, include_chirality: bool = True) -> str:
    """Scaffold grouping key for a SMILES string.

    RDKit present  -> RDKit's canonical scaffold SMILES (exact reference parity).
    RDKit absent   -> canonical WL key of the scaffold graph ('' for acyclic);
                      chirality-blind (stereo marks are not retained), so
                      enantiomeric scaffolds merge into one group — a
                      grouping deviation from includeChirality=True splits.
    On any failure -> the input SMILES (matches reference smi2scaffold except
    clause, /root/reference/data/datareader.py:164-167).
    """
    global _WARNED_CHIRALITY
    if _HAVE_RDKIT:
        try:
            return MurckoScaffold.MurckoScaffoldSmiles(
                smiles=smiles, includeChirality=include_chirality
            )
        except Exception:
            return smiles
    try:
        if include_chirality and not _WARNED_CHIRALITY and ("@" in smiles):
            _WARNED_CHIRALITY = True
            logger.warning(
                "Built-in scaffold keys are chirality-blind (RDKit absent): "
                "enantiomeric scaffolds will share one split group."
            )
        mol = parse_smiles(smiles)
        return _wl_canonical_key(mol, _murcko_atom_set(mol), include_chirality)
    except SmilesError:
        return smiles
    except Exception:
        return smiles
