"""
Minimal mmCIF/PDBx reader producing :class:`AtomArray` objects.

Covers the ``atom_site`` loop category — the part needed to load
structures for ENM analysis (the reference gallery loads structures via
``biotite.structure.io.pdbx``, cf. ``doc/examples/scripts/basic_nma.py``).
Handles multi-model files, quoted values, comments, rows wrapping over
multiple lines, and ``;``-delimited text fields; everything beyond
``atom_site`` is ignored.
"""

from __future__ import annotations

import gzip

import numpy as np

from .atoms import AtomArray

__all__ = ["CIFFile", "get_structure_cif", "load_structure_cif"]


def _tokenize(line):
    """Split an mmCIF data line.  Per the CIF spec a quote only opens a
    quoted string at the *start* of a token (so unquoted primed atom
    names like C1' stay intact), and closes it only when followed by
    whitespace/end."""
    if "'" not in line and '"' not in line:
        return line.split()
    tokens = []
    i, n = 0, len(line)
    while i < n:
        while i < n and line[i].isspace():
            i += 1
        if i >= n:
            break
        quote = line[i] if line[i] in "'\"" else None
        if quote:
            j = i + 1
            while j < n:
                if line[j] == quote and (j + 1 >= n or line[j + 1].isspace()):
                    break
                j += 1
            tokens.append(line[i + 1:j])
            i = j + 1
        else:
            j = i
            while j < n and not line[j].isspace():
                j += 1
            tokens.append(line[i:j])
            i = j
    return tokens


class CIFFile:
    """Parsed ``atom_site`` records of an mmCIF file."""

    def __init__(self, columns, rows):
        self._columns = columns
        self._rows = rows

    @staticmethod
    def read(path):
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt") as f:
            lines = f.read().splitlines()

        columns = []
        rows = []
        pending = []  # tokens of a row spanning multiple lines
        in_loop_header = False
        in_atom_site = False
        i, n_lines = 0, len(lines)
        while i < n_lines:
            raw = lines[i]
            # ';'-delimited text field: opens with ';' in column 1 and
            # runs (including blank lines) until a line starting with
            # ';'.  Inside atom_site the whole block is one value; in
            # any other category it is consumed and ignored so its
            # content cannot confuse the state machine.
            if raw.startswith(";"):
                text = [raw[1:]]
                i += 1
                while i < n_lines and not lines[i].startswith(";"):
                    text.append(lines[i])
                    i += 1
                if i >= n_lines:
                    raise ValueError(
                        "Unterminated ';'-delimited text field"
                    )
                i += 1  # closing ';'
                if in_atom_site and not in_loop_header:
                    pending.append("\n".join(text).strip())
                    if len(pending) == len(columns):
                        rows.append(pending)
                        pending = []
                continue
            stripped = raw.strip()
            i += 1
            if not stripped or stripped.startswith("#"):
                if in_atom_site and rows and not pending:
                    in_atom_site = False
                continue
            if stripped == "loop_":
                in_loop_header = True
                columns = []
                in_atom_site = False
                continue
            if in_loop_header and stripped.startswith("_"):
                tag = stripped.split(".", 1)
                if tag[0] == "_atom_site":
                    columns.append(tag[1].split()[0])
                    in_atom_site = True
                else:
                    in_atom_site = False
                continue
            in_loop_header = False
            if in_atom_site:
                if stripped.startswith(("_", "loop_", "data_")):
                    in_atom_site = False
                    continue
                pending.extend(_tokenize(stripped))
                if len(pending) == len(columns):
                    rows.append(pending)
                    pending = []
                elif len(pending) > len(columns):
                    raise ValueError(
                        f"atom_site row has {len(pending)} values for "
                        f"{len(columns)} columns: {stripped[:60]!r}"
                    )
        if pending:
            raise ValueError(
                f"Incomplete final atom_site row: {len(pending)} values "
                f"for {len(columns)} columns"
            )
        return CIFFile(columns, rows)

    def get_model_count(self):
        idx = self._column_index("pdbx_PDB_model_num")
        if idx is None:
            return 1
        return len({row[idx] for row in self._rows})

    def _column_index(self, name):
        try:
            return self._columns.index(name)
        except ValueError:
            return None

    def get_structure(self, model=None):
        return get_structure_cif(self, model=model)


def _pick(cif, *names):
    for name in names:
        idx = cif._column_index(name)
        if idx is not None:
            return idx
    return None


def get_structure_cif(cif, model=None):
    """Build an :class:`AtomArray` from a :class:`CIFFile` (1-based
    `model`, defaulting to the first)."""
    model_idx = cif._column_index("pdbx_PDB_model_num")
    rows = cif._rows
    if model_idx is not None:
        model_ids = sorted(
            {row[model_idx] for row in rows}, key=lambda v: int(v)
        )
        wanted = model_ids[(model or 1) - 1]
        rows = [row for row in rows if row[model_idx] == wanted]
    elif model not in (None, 1):
        raise ValueError(f"Model {model} does not exist in this file")
    if not rows:
        raise ValueError("No atom_site records found")

    # Alternate locations (label_alt_id): first altloc ID per residue
    # wins; blank-altloc ('.'/'?') atoms always kept — mirrors the PDB
    # reader so .cif and .pdb of the same structure load identically.
    alt_idx = cif._column_index("label_alt_id")
    if alt_idx is not None:
        chain_ix = _pick(cif, "auth_asym_id", "label_asym_id")
        seq_ix = _pick(cif, "auth_seq_id", "label_seq_id")
        residue_altloc = {}
        for row in rows:
            alt = row[alt_idx]
            if alt not in (".", "?", ""):
                key = (row[chain_ix] if chain_ix is not None else "",
                       row[seq_ix] if seq_ix is not None else "")
                residue_altloc.setdefault(key, alt)
        if residue_altloc:
            rows = [
                row for row in rows
                if row[alt_idx] in (".", "?", "")
                or row[alt_idx] == residue_altloc[(
                    row[chain_ix] if chain_ix is not None else "",
                    row[seq_ix] if seq_ix is not None else "",
                )]
            ]

    ix = {
        "chain": _pick(cif, "auth_asym_id", "label_asym_id"),
        "res_id": _pick(cif, "auth_seq_id", "label_seq_id"),
        "res_name": _pick(cif, "auth_comp_id", "label_comp_id"),
        "atom_name": _pick(cif, "auth_atom_id", "label_atom_id"),
        "element": _pick(cif, "type_symbol"),
        "x": _pick(cif, "Cartn_x"),
        "y": _pick(cif, "Cartn_y"),
        "z": _pick(cif, "Cartn_z"),
        "record": _pick(cif, "group_PDB"),
    }
    for required in ("x", "y", "z", "atom_name", "res_name"):
        if ix[required] is None:
            raise ValueError(f"atom_site is missing required column "
                             f"for '{required}'")

    n = len(rows)
    atoms = AtomArray(n)
    coord = np.empty((n, 3), dtype=np.float32)
    chain_id = np.empty(n, dtype="<U4")
    res_id = np.empty(n, dtype=np.int64)
    res_name = np.empty(n, dtype="<U5")
    atom_name = np.empty(n, dtype="<U6")
    element = np.empty(n, dtype="<U2")
    hetero = np.empty(n, dtype=bool)

    for i, row in enumerate(rows):
        coord[i] = (float(row[ix["x"]]), float(row[ix["y"]]),
                    float(row[ix["z"]]))
        chain_id[i] = row[ix["chain"]] if ix["chain"] is not None else "A"
        raw_res = row[ix["res_id"]] if ix["res_id"] is not None else "0"
        res_id[i] = int(raw_res) if raw_res not in (".", "?") else 0
        res_name[i] = row[ix["res_name"]]
        atom_name[i] = row[ix["atom_name"]]
        element[i] = (row[ix["element"]].upper()
                      if ix["element"] is not None else "")
        hetero[i] = (row[ix["record"]] == "HETATM"
                     if ix["record"] is not None else False)

    atoms.coord = coord
    atoms.set_annotation("chain_id", chain_id)
    atoms.set_annotation("res_id", res_id)
    atoms.set_annotation("res_name", res_name)
    atoms.set_annotation("atom_name", atom_name)
    atoms.set_annotation("element", element)
    atoms.add_annotation("hetero", bool)
    atoms.set_annotation("hetero", hetero)
    return atoms


def load_structure_cif(path, model=None):
    return get_structure_cif(CIFFile.read(path), model=model)
