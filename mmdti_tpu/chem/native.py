"""ctypes binding to the native C++ chemistry kernels (csrc/libmmchem.so).

The native library accelerates the host-side hot loop the reference runs
through RDKit's C++ core (/root/reference/data/conformer.py:90-145): conformer
refinement and pairwise-distance featurization.  Falls back to the numpy
implementation in mmdti_tpu.chem.conformer when the library is not built.

Build with:  make -C csrc
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.environ.get("MMCHEM_LIB", ""),
        os.path.join(here, "csrc", "libmmchem.so"),
        os.path.join(os.path.dirname(__file__), "libmmchem.so"),
    ):
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.mmchem_refine.restype = ctypes.c_int
                lib.mmchem_refine.argtypes = [
                    ctypes.c_int,                    # n atoms
                    ctypes.POINTER(ctypes.c_float),  # coords [n,3] in/out
                    ctypes.c_int,                    # n bond terms
                    ctypes.POINTER(ctypes.c_int),    # bond idx [nb,2]
                    ctypes.POINTER(ctypes.c_float),  # bond len [nb]
                    ctypes.c_int,                    # n angle terms
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,                    # n nonbonded
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int,                    # iters
                ]
                lib.mmchem_distance_matrix.restype = None
                lib.mmchem_distance_matrix.argtypes = [
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                ]
                try:
                    # Combined graph->terms->refine entry; absent from
                    # pre-round-3 builds of the library, and gated on the
                    # ABI version so a stale build cannot be miscalled.
                    # (v2 and v3 share the mmchem_embed signature; v3 adds
                    # mmchem_terms for the device-refine provider.)
                    lib.mmchem_abi_version.restype = ctypes.c_int
                    abi = lib.mmchem_abi_version()
                    if abi not in (2, 3, 4):
                        raise AttributeError("mmchem ABI mismatch")
                    lib.mmchem_embed.restype = ctypes.c_int
                    lib.mmchem_embed.argtypes = [
                        ctypes.c_int,                     # n atoms
                        ctypes.POINTER(ctypes.c_float),   # coords [n,3] in/out
                        ctypes.c_int,                     # n bonds
                        ctypes.POINTER(ctypes.c_int),     # bonds [nb,2]
                        ctypes.POINTER(ctypes.c_double),  # orders [nb]
                        ctypes.POINTER(ctypes.c_double),  # bond lengths [nb]
                        ctypes.POINTER(ctypes.c_int),     # flags [n]
                        ctypes.c_int,                     # iters
                    ]
                    if abi >= 3:
                        lib.mmchem_terms.restype = ctypes.c_int
                        lib.mmchem_terms.argtypes = [
                            ctypes.c_int,                     # n atoms
                            ctypes.c_int,                     # n bonds
                            ctypes.POINTER(ctypes.c_int),     # bonds [nb,2]
                            ctypes.POINTER(ctypes.c_double),  # orders [nb]
                            ctypes.POINTER(ctypes.c_double),  # bond lens [nb]
                            ctypes.POINTER(ctypes.c_int),     # flags [n]
                            ctypes.c_int,                     # cap_na
                            ctypes.POINTER(ctypes.c_int),     # out aidx
                            ctypes.POINTER(ctypes.c_float),   # out alen
                        ]
                    else:
                        lib._mmdti_no_terms = True
                    if abi >= 4:
                        lib.mmchem_parse.restype = ctypes.c_int
                        lib.mmchem_parse.argtypes = [
                            ctypes.c_char_p,                  # smiles
                            ctypes.c_int,                     # cap_atoms
                            ctypes.POINTER(ctypes.c_char),    # sym_out [cap*3]
                            ctypes.POINTER(ctypes.c_int),     # flags_out
                            ctypes.c_int,                     # cap_bonds
                            ctypes.POINTER(ctypes.c_int),     # bonds_out
                            ctypes.POINTER(ctypes.c_double),  # orders_out
                            ctypes.POINTER(ctypes.c_int),     # n_bonds_out
                        ]
                    else:
                        lib._mmdti_no_parse = True
                except AttributeError:
                    lib._mmdti_no_embed = True
                    lib._mmdti_no_terms = True
                    lib._mmdti_no_parse = True
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _lib() is not None


def embed_available() -> bool:
    """True when the combined mmchem_embed entry (ABI v2) can be used."""
    lib = _lib()
    return lib is not None and not getattr(lib, "_mmdti_no_embed", False)


def terms_available() -> bool:
    """True when the mmchem_terms entry (ABI v3) can be used."""
    lib = _lib()
    return lib is not None and not getattr(lib, "_mmdti_no_terms", False)


def parse_available() -> bool:
    """True when the mmchem_parse entry (ABI v4) can be used."""
    lib = _lib()
    return lib is not None and not getattr(lib, "_mmdti_no_parse", False)


def parse_graph(smiles: str):
    """Native SMILES parse + implicit-H expansion.

    Returns (symbols list[str], flags int32 [n], bonds int32 [nb,2],
    orders float64 [nb]) — the exact graph `parse_smiles(s).add_hydrogens()`
    produces (same atom order: heavy atoms in parse order, hydrogens
    appended per heavy atom) — or None when the entry is unavailable or the
    parse fails (callers fall back to the Python parser, which raises the
    detailed SmilesError)."""
    if not parse_available():
        return None
    lib = _lib()
    raw = smiles.encode("utf-8", errors="ignore")
    # generous caps: atoms <= len(smiles)*? — every atom needs >=1 char, and
    # H expansion adds at most 4 per heavy atom; retry once bigger on -1 is
    # pointless since -1 also means parse error — size from the string.
    cap_atoms = 8 * max(len(raw), 4) + 8
    cap_bonds = cap_atoms + cap_atoms // 2 + 8
    sym = ctypes.create_string_buffer(3 * cap_atoms)
    flags = np.empty(cap_atoms, dtype=np.int32)
    bonds = np.empty((cap_bonds, 2), dtype=np.int32)
    orders = np.empty(cap_bonds, dtype=np.float64)
    nb_out = ctypes.c_int(0)
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    n = lib.mmchem_parse(
        raw, cap_atoms, sym, flags.ctypes.data_as(ip),
        cap_bonds, bonds.ctypes.data_as(ip), orders.ctypes.data_as(dp),
        ctypes.byref(nb_out),
    )
    if n < 0:
        return None
    nb = int(nb_out.value)
    blob = sym.raw
    syms = [
        blob[3 * i : 3 * i + 3].rstrip(b"\x00").decode() for i in range(n)
    ]
    return syms, flags[:n].copy(), bonds[:nb].copy(), orders[:nb].copy()


def _marshal_graph(mol):
    """Per-atom flags + per-bond index/order/ideal-length arrays (the only
    Python work on the native paths; bond lengths come from
    conformer._ideal_bond_length so the constants stay single-sourced)."""
    from mmdti_tpu.chem.conformer import _ideal_bond_length

    syms = [a.symbol for a in mol.atoms]
    flags = np.array(
        [(1 if a.aromatic else 0) | (2 if s == "B" else 0)
         for a, s in zip(mol.atoms, syms)],
        dtype=np.int32,
    )
    bonds = np.ascontiguousarray(
        np.array([[b.a1, b.a2] for b in mol.bonds], dtype=np.int32).reshape(-1, 2)
    )
    orders = np.array([b.order for b in mol.bonds], dtype=np.float64)
    blens = np.array(
        [_ideal_bond_length(syms[b.a1], syms[b.a2], b.order) for b in mol.bonds],
        dtype=np.float64,
    )
    return flags, bonds, orders, blens


def angle_terms_from_arrays(n, bonds, orders, blens, flags):
    """mmchem_terms over pre-marshalled arrays: (aidx int32 [NA,2],
    alen f32 [NA]) or None (entry unavailable / overflow / bad input)."""
    if not terms_available():
        return None
    lib = _lib()
    bonds = np.ascontiguousarray(bonds, dtype=np.int32)
    orders = np.ascontiguousarray(orders, dtype=np.float64)
    blens = np.ascontiguousarray(blens, dtype=np.float64)
    flags = np.ascontiguousarray(flags, dtype=np.int32)
    cap = max(16, 8 * int(n))
    aidx = np.empty((cap, 2), dtype=np.int32)
    alen = np.empty(cap, dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    na = lib.mmchem_terms(
        int(n), len(orders), bonds.ctypes.data_as(ip),
        orders.ctypes.data_as(dp), blens.ctypes.data_as(dp),
        flags.ctypes.data_as(ip),
        cap, aidx.ctypes.data_as(ip), alen.ctypes.data_as(fp),
    )
    if na < 0:
        return None
    return aidx[:na].copy(), alen[:na].copy()


def bond_angle_terms(mol):
    """Native twin of conformer._bond_angle_terms (minus the seen13 set):
    (bidx int32 [NB,2], blen f32, aidx int32 [NA,2], alen f32), or None when
    the mmchem_terms entry is unavailable or overflows the cap.  Bit-exact
    with the Python builder (same double math, f32 casts)."""
    if not terms_available():
        return None
    flags, bonds, orders, blens = _marshal_graph(mol)
    out = angle_terms_from_arrays(mol.num_atoms(), bonds, orders, blens, flags)
    if out is None:
        return None
    aidx, alen = out
    return bonds, blens.astype(np.float32), aidx, alen


def embed_coords(mol, coords: np.ndarray, iters: int = 300) -> Optional[np.ndarray]:
    """Term building + refinement fully native: only the O(n+nb) graph
    marshalling stays in Python (vs the O(n^2) pure-Python nonbonded
    enumeration in conformer._build_terms).  Returns None when the library
    (or the mmchem_embed entry) is unavailable.
    """
    if not embed_available():
        return None
    lib = _lib()

    n = mol.num_atoms()
    if coords.shape[0] != n:
        raise ValueError(
            f"coords rows ({coords.shape[0]}) != mol atoms ({n}); refusing to "
            "hand mismatched buffers to the native kernel"
        )
    flags, bonds, orders, blens = _marshal_graph(mol)
    x = np.ascontiguousarray(coords, dtype=np.float32).copy()
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.mmchem_embed(
        n,
        x.ctypes.data_as(fp),
        len(orders),
        bonds.ctypes.data_as(ip),
        orders.ctypes.data_as(dp),
        blens.ctypes.data_as(dp),
        flags.ctypes.data_as(ip),
        iters,
    )
    if rc != 0:
        return None
    return x


def refine_coords(mol, coords: np.ndarray, iters: int = 300) -> Optional[np.ndarray]:
    """Run the C++ refinement; returns None when the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    from mmdti_tpu.chem.conformer import _build_terms

    if coords.shape[0] != mol.num_atoms():
        raise ValueError(
            f"coords rows ({coords.shape[0]}) != mol atoms ({mol.num_atoms()}); "
            "refusing to hand mismatched buffers to the native kernel"
        )
    bidx, blen, aidx, alen, nidx = _build_terms(mol)
    x = np.ascontiguousarray(coords, dtype=np.float32).copy()
    bidx = np.ascontiguousarray(bidx, dtype=np.int32)
    blen = np.ascontiguousarray(blen, dtype=np.float32)
    aidx = np.ascontiguousarray(aidx, dtype=np.int32)
    alen = np.ascontiguousarray(alen, dtype=np.float32)
    nidx = np.ascontiguousarray(nidx, dtype=np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    rc = lib.mmchem_refine(
        x.shape[0],
        x.ctypes.data_as(fp),
        len(blen), bidx.ctypes.data_as(ip), blen.ctypes.data_as(fp),
        len(alen), aidx.ctypes.data_as(ip), alen.ctypes.data_as(fp),
        len(nidx), nidx.ctypes.data_as(ip),
        iters,
    )
    if rc != 0:
        return None
    return x


def distance_matrix(coords: np.ndarray) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(coords, dtype=np.float32)
    n = x.shape[0]
    out = np.empty((n, n), dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.mmchem_distance_matrix(n, x.ctypes.data_as(fp), out.ctypes.data_as(fp))
    return out
