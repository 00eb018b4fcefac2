"""Atom-selection mini-language.

Covers the subset of the MDAnalysis selection DSL exercised by the
reference test-suite and docs: keyword filters (``name O``,
``resname WAT``, ``resid 1-10``; reference test_velocityautocorr.py:29),
boolean composition (``and`` / ``or`` / ``not``, parentheses), ``all`` /
``none``, ``protein`` / ``backbone``, index/mass filters, and the
geometric ``around R <sel>`` used to build UpdatingAtomGroups
(test_velocityautocorr.py:140).

Selections evaluate to boolean masks over all atoms vectorized with
numpy — no per-atom Python loop.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

from ..utils.errors import SelectionError

_PROTEIN_RESNAMES = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "HSD", "HSE", "HSP", "HID", "HIE", "HIP", "CYX", "ASH", "GLH", "ACE",
    "NME", "NMA",
}
_BACKBONE_NAMES = {"N", "CA", "C", "O"}

_KEYWORDS = {
    "and", "or", "not", "all", "none", "name", "resname", "resid", "resnum",
    "type", "segid", "element", "index", "bynum", "id", "mass", "charge",
    "around", "protein", "backbone", "prop", "(", ")", "to",
}

_PROP_OPS = {
    "<": np.less,
    "<=": np.less_equal,
    ">": np.greater,
    ">=": np.greater_equal,
    "==": np.equal,
    "!=": np.not_equal,
}


def _tokenize(sel: str) -> List[str]:
    sel = sel.replace("(", " ( ").replace(")", " ) ")
    tokens = sel.split()
    if not tokens:
        raise SelectionError("empty selection string")
    return tokens


class _Parser:
    def __init__(self, universe, tokens: List[str]):
        self.u = universe
        self.tokens = tokens
        self.pos = 0

    def peek(self) -> Optional[str]:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SelectionError("unexpected end of selection")
        self.pos += 1
        return tok

    # expr := and_expr ('or' and_expr)*
    def parse_expr(self) -> np.ndarray:
        mask = self.parse_and()
        while self.peek() == "or":
            self.next()
            mask = mask | self.parse_and()
        return mask

    def parse_and(self) -> np.ndarray:
        mask = self.parse_not()
        while self.peek() == "and":
            self.next()
            mask = mask & self.parse_not()
        return mask

    def parse_not(self) -> np.ndarray:
        if self.peek() == "not":
            self.next()
            return ~self.parse_not()
        return self.parse_primary()

    def parse_primary(self) -> np.ndarray:
        tok = self.next()
        n = self.u._topology.n_atoms
        if tok == "(":
            mask = self.parse_expr()
            if self.next() != ")":
                raise SelectionError("missing closing parenthesis")
            return mask
        if tok == "all":
            return np.ones(n, bool)
        if tok == "none":
            return np.zeros(n, bool)
        if tok == "protein":
            resnames = self.u._topology.get_atom_values("resnames")
            return np.isin(resnames, list(_PROTEIN_RESNAMES))
        if tok == "backbone":
            resnames = self.u._topology.get_atom_values("resnames")
            names = self.u._topology.get_atom_values("names")
            return np.isin(resnames, list(_PROTEIN_RESNAMES)) & np.isin(
                names, list(_BACKBONE_NAMES)
            )
        if tok in ("name", "resname", "type", "segid", "element"):
            attr = {
                "name": "names",
                "resname": "resnames",
                "type": "types",
                "segid": "segids",
                "element": "elements",
            }[tok]
            values = self._collect_values()
            return self._string_match(attr, values)
        if tok in ("resid", "resnum"):
            attr = "resids" if tok == "resid" else "resnums"
            target = self.u._topology.get_atom_values(attr)
            return self._int_ranges(target)
        if tok in ("index", "bynum", "id"):
            target = np.arange(n, dtype=np.int64)
            if tok == "bynum":  # 1-based in MDAnalysis
                target = target + 1
            return self._int_ranges(target)
        if tok in ("mass", "charge"):
            attr = "masses" if tok == "mass" else "charges"
            target = self.u._topology.get_atom_values(attr)
            return self._float_ranges(target)
        if tok == "around":
            radius = float(self.next())
            inner = self.parse_not()
            return self._around(radius, inner)
        if tok == "prop":
            return self._prop()
        raise SelectionError(f"unknown selection keyword {tok!r}")

    # --- helpers -----------------------------------------------------------
    def _collect_values(self) -> List[str]:
        values = []
        while self.peek() is not None and self.peek() not in _KEYWORDS:
            values.append(self.next())
        if not values:
            raise SelectionError("keyword expects at least one value")
        return values

    def _string_match(self, attr: str, values: List[str]) -> np.ndarray:
        target = self.u._topology.get_atom_values(attr)
        mask = np.zeros(len(target), bool)
        for v in values:
            if "*" in v or "?" in v:
                pat = re.compile(
                    "^" + re.escape(v).replace(r"\*", ".*").replace(r"\?", ".")
                    + "$"
                )
                mask |= np.array([bool(pat.match(t)) for t in target])
            else:
                mask |= target == v
        return mask

    def _int_ranges(self, target: np.ndarray) -> np.ndarray:
        mask = np.zeros(len(target), bool)
        got = False
        while True:
            tok = self.peek()
            if tok is None or (tok in _KEYWORDS and tok != "to"):
                break
            self.next()
            m = re.match(r"^(-?\d+)[-:](-?\d+)$", tok)
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
                mask |= (target >= lo) & (target <= hi)
            elif self.peek() == "to":
                self.next()
                hi = int(self.next())
                mask |= (target >= int(tok)) & (target <= hi)
            else:
                mask |= target == int(tok)
            got = True
        if not got:
            raise SelectionError("numeric keyword expects values")
        return mask

    def _float_ranges(self, target: np.ndarray) -> np.ndarray:
        mask = np.zeros(len(target), bool)
        got = False
        while True:
            tok = self.peek()
            if tok is None or tok in _KEYWORDS:
                break
            self.next()
            m = re.match(r"^(-?[\d.eE+]+):(-?[\d.eE+]+)$", tok)
            if m:
                lo, hi = float(m.group(1)), float(m.group(2))
                mask |= (target >= lo) & (target <= hi)
            else:
                mask |= target == float(tok)
            got = True
        if not got:
            raise SelectionError("numeric keyword expects values")
        return mask

    def _prop(self) -> np.ndarray:
        """``prop [abs] <x|y|z|mass|charge> <op> <value>`` comparisons
        on per-atom properties (MDAnalysis 'prop' keyword subset)."""
        tok = self.next()
        use_abs = tok == "abs"
        if use_abs:
            tok = self.next()
        if tok in ("x", "y", "z"):
            axis = {"x": 0, "y": 1, "z": 2}[tok]
            values = self.u.trajectory.ts.positions[:, axis].astype(
                np.float64
            )
        elif tok in ("mass", "charge"):
            values = self.u._topology.get_atom_values(
                "masses" if tok == "mass" else "charges"
            ).astype(np.float64)
        else:
            raise SelectionError(f"prop: unknown property {tok!r}")
        op_tok = self.next()
        if op_tok not in _PROP_OPS:
            raise SelectionError(f"prop: unknown operator {op_tok!r}")
        rhs = float(self.next())
        if use_abs:
            values = np.abs(values)
        return _PROP_OPS[op_tok](values, rhs)

    def _around(self, radius: float, inner: np.ndarray) -> np.ndarray:
        """Atoms strictly within ``radius`` of any atom in ``inner``,
        excluding ``inner`` itself (MDAnalysis ``around`` semantics,
        minimum-image-free brute force)."""
        pos = self.u.trajectory.ts.positions
        ref = pos[inner]
        if len(ref) == 0:
            return np.zeros(len(inner), bool)
        d2 = np.sum(
            (pos[:, None, :].astype(np.float64) - ref[None, :, :]) ** 2,
            axis=-1,
        )
        mask = (d2 <= radius * radius).any(axis=1)
        return mask & ~inner


def select(universe, selection: str, subset=None) -> np.ndarray:
    """Evaluate ``selection`` → sorted array of atom indices."""
    parser = _Parser(universe, _tokenize(selection))
    mask = parser.parse_expr()
    if parser.peek() is not None:
        raise SelectionError(
            f"trailing tokens in selection: {parser.tokens[parser.pos:]}"
        )
    indices = np.flatnonzero(mask)
    if subset is not None:
        indices = indices[np.isin(indices, subset)]
    return indices
