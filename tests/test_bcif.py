"""
BinaryCIF reader tests: codec chains (ByteArray, FixedPoint, Delta,
RunLength, IntegerPacking, StringArray), mask semantics, and end-to-end
``load_structure`` / ``load_ensemble`` on synthesized .bcif files that
exercise every codec the PDB's encoder emits for atom_site.
"""

import gzip

import numpy as np
import pytest

from springcraft_tpu.structure import load_ensemble, load_structure
from springcraft_tpu.structure.bcif import (
    _decode_data,
    _pack,
    read_bcif_as_cif,
)

# --------------------------------------------------------------------
# Fixture-side encoders (inverse of the production decoders)
# --------------------------------------------------------------------

_BYTE_TYPES = {"i1": 1, "i2": 2, "i4": 3, "u1": 4, "u2": 5, "u4": 6,
               "f4": 32, "f8": 33}


def byte_array(values, dtype="i4"):
    data = np.asarray(values).astype(np.dtype(dtype).newbyteorder("<"))
    return data.tobytes(), [{"kind": "ByteArray",
                             "type": _BYTE_TYPES[dtype]}]


def fixed_point(values, factor=1000, dtype="i4"):
    ints = np.round(np.asarray(values, dtype=np.float64) * factor)
    data, enc = byte_array(ints, dtype)
    return data, [{"kind": "FixedPoint", "factor": factor,
                   "srcType": 33}] + enc


def delta(values, dtype="i1"):
    arr = np.asarray(values, dtype=np.int64)
    origin = int(arr[0])
    diffs = np.diff(arr, prepend=origin)
    diffs[0] = 0
    data, enc = byte_array(diffs, dtype)
    return data, [{"kind": "Delta", "origin": origin,
                   "srcType": 3}] + enc


def run_length(values, dtype="i4"):
    arr = np.asarray(values, dtype=np.int64)
    pairs = []
    i = 0
    while i < len(arr):
        j = i
        while j < len(arr) and arr[j] == arr[i]:
            j += 1
        pairs += [int(arr[i]), j - i]
        i = j
    data, enc = byte_array(pairs, dtype)
    return data, [{"kind": "RunLength", "srcType": 3,
                   "srcSize": len(arr)}] + enc


def integer_packing(values, byte_count=1):
    arr = np.asarray(values, dtype=np.int64)
    upper = (1 << (8 * byte_count - 1)) - 1
    lower = -(1 << (8 * byte_count - 1))
    packed = []
    for v in arr:
        v = int(v)
        while v >= upper:
            packed.append(upper)
            v -= upper
        while v <= lower:
            packed.append(lower)
            v -= lower
        packed.append(v)
    data, enc = byte_array(packed, f"i{byte_count}")
    return data, [{"kind": "IntegerPacking", "byteCount": byte_count,
                   "isUnsigned": False, "srcSize": len(arr)}] + enc


def string_array(values):
    values = [str(v) for v in values]
    unique = sorted(set(values))
    lookup = {s: i for i, s in enumerate(unique)}
    string_data = "".join(unique)
    offsets = [0]
    for s in unique:
        offsets.append(offsets[-1] + len(s))
    idx_data, idx_enc = byte_array([lookup[s] for s in values], "i4")
    off_data, off_enc = byte_array(offsets, "i4")
    return idx_data, [{
        "kind": "StringArray",
        "dataEncoding": idx_enc,
        "stringData": string_data,
        "offsetEncoding": off_enc,
        "offsets": off_data,
    }]


def column(name, data_enc, mask=None):
    data, encoding = data_enc
    col = {"name": name, "data": {"data": data, "encoding": encoding},
           "mask": None}
    if mask is not None:
        mdata, menc = byte_array(mask, "u1")
        col["mask"] = {"data": mdata, "encoding": menc}
    return col


def make_bcif(columns, row_count):
    return _pack({
        "version": "0.3.0",
        "encoder": "springcraft_tpu test fixture",
        "dataBlocks": [{
            "header": "TEST",
            "categories": [{
                "name": "_atom_site",
                "rowCount": row_count,
                "columns": columns,
            }],
        }],
    })


# --------------------------------------------------------------------
# Codec unit tests
# --------------------------------------------------------------------

def test_codec_round_trips():
    rng = np.random.RandomState(0)
    floats = rng.randn(40) * 123.0
    data, enc = fixed_point(floats, factor=1000)
    out = _decode_data(data, enc)
    assert np.allclose(out, np.round(floats * 1000) / 1000)

    ints = np.cumsum(rng.randint(0, 3, 50)) + 7
    data, enc = delta(ints, "i1")
    assert np.array_equal(_decode_data(data, enc), ints)

    rl = np.repeat([4, 9, 4], [5, 2, 7])
    data, enc = run_length(rl)
    assert np.array_equal(_decode_data(data, enc), rl)

    big = np.asarray([0, 127, 128, -129, 300, -5, 1000])
    data, enc = integer_packing(big, byte_count=1)
    assert np.array_equal(_decode_data(data, enc), big)

    strs = ["CA", "CB", "CA", "N", ""]
    data, enc = string_array(strs)
    assert list(_decode_data(data, enc)) == strs


def test_composed_chain_delta_runlength():
    # res_id-style column: RunLength of the deltas, as real encoders emit
    res_id = np.repeat(np.arange(1, 21), 4)
    diffs = np.diff(res_id, prepend=int(res_id[0]))
    diffs[0] = 0
    data, enc = run_length(diffs)
    chain = [{"kind": "Delta", "origin": int(res_id[0]),
              "srcType": 3}] + enc
    assert np.array_equal(_decode_data(data, chain), res_id)


# --------------------------------------------------------------------
# End-to-end structure loading
# --------------------------------------------------------------------

def _synthetic_doc(n_res=8, n_models=2):
    rng = np.random.RandomState(1)
    n = n_res * n_models
    coords = rng.randn(n, 3) * 20.0
    res_id = np.tile(np.arange(1, n_res + 1), n_models)
    model = np.repeat(np.arange(1, n_models + 1), n_res)
    names = (["ALA", "GLY", "SER", "TRP"] * n)[:n]
    cols = [
        column("group_PDB", string_array(["ATOM"] * n)),
        column("type_symbol", string_array(["C"] * n)),
        column("label_atom_id", string_array(["CA"] * n)),
        column("label_comp_id", string_array(names)),
        column("label_asym_id", string_array(["A"] * n)),
        column("label_seq_id", delta(res_id, "i1")),
        column("label_alt_id", string_array(["x"] * n),
               mask=[1] * n),  # masked -> '.'
        column("Cartn_x", fixed_point(coords[:, 0])),
        column("Cartn_y", fixed_point(coords[:, 1])),
        column("Cartn_z", fixed_point(coords[:, 2])),
        column("pdbx_PDB_model_num", run_length(model)),
    ]
    return make_bcif(cols, n), coords, res_id, names


def test_load_structure_bcif(tmp_path):
    doc, coords, res_id, names = _synthetic_doc()
    path = tmp_path / "test.bcif"
    path.write_bytes(doc)

    atoms = load_structure(str(path))  # model 1 by default
    assert atoms.array_length() == 8
    assert np.allclose(atoms.coord, np.round(coords[:8] * 1000) / 1000,
                       atol=1e-6)
    assert list(atoms.res_id) == list(res_id[:8])
    assert list(atoms.res_name) == names[:8]
    assert set(atoms.atom_name) == {"CA"}
    assert set(atoms.chain_id) == {"A"}

    atoms2 = load_structure(str(path), model=2)
    assert np.allclose(atoms2.coord,
                       np.round(coords[8:] * 1000) / 1000, atol=1e-6)


def test_load_structure_bcif_gz(tmp_path):
    doc, coords, _, _ = _synthetic_doc()
    path = tmp_path / "test.bcif.gz"
    path.write_bytes(gzip.compress(doc))
    atoms = load_structure(str(path))
    assert atoms.array_length() == 8
    assert np.allclose(atoms.coord, np.round(coords[:8] * 1000) / 1000,
                       atol=1e-6)


def test_load_ensemble_bcif(tmp_path):
    doc, coords, _, _ = _synthetic_doc(n_res=6, n_models=3)
    path = tmp_path / "multi.bcif"
    path.write_bytes(doc)
    atoms, batch = load_ensemble(str(path))
    assert batch.shape == (3, 6, 3)
    assert np.allclose(batch.reshape(-1, 3),
                       np.round(coords * 1000) / 1000, atol=1e-4)


def test_bcif_matches_text_cif_loader(tmp_path):
    """The same structure through the .bcif and .cif paths must load
    identically (shared downstream logic)."""
    doc, coords, res_id, names = _synthetic_doc(n_res=8, n_models=1)
    bcif_path = tmp_path / "x.bcif"
    bcif_path.write_bytes(doc)

    lines = [
        "data_TEST", "loop_", "_atom_site.group_PDB",
        "_atom_site.type_symbol", "_atom_site.label_atom_id",
        "_atom_site.label_comp_id", "_atom_site.label_asym_id",
        "_atom_site.label_seq_id", "_atom_site.label_alt_id",
        "_atom_site.Cartn_x", "_atom_site.Cartn_y",
        "_atom_site.Cartn_z", "_atom_site.pdbx_PDB_model_num",
    ]
    q = np.round(coords * 1000) / 1000
    for i in range(8):
        lines.append(
            f"ATOM C CA {names[i]} A {res_id[i]} . "
            f"{q[i, 0]:.3f} {q[i, 1]:.3f} {q[i, 2]:.3f} 1"
        )
    cif_path = tmp_path / "x.cif"
    cif_path.write_text("\n".join(lines) + "\n")

    a = load_structure(str(bcif_path))
    b = load_structure(str(cif_path))
    assert np.allclose(a.coord, b.coord, atol=1e-5)
    for ann in ("chain_id", "res_id", "res_name", "atom_name",
                "element"):
        assert list(getattr(a, ann)) == list(getattr(b, ann))


def test_bcif_without_atom_site_errors(tmp_path):
    doc = _pack({"version": "0.3.0", "encoder": "t", "dataBlocks": [
        {"header": "X", "categories": [
            {"name": "_cell", "rowCount": 1, "columns": []}]}]})
    path = tmp_path / "bad.bcif"
    path.write_bytes(doc)
    with pytest.raises(ValueError, match="atom_site"):
        read_bcif_as_cif(str(path))


def test_unknown_encoding_kind_errors():
    with pytest.raises(ValueError, match="Unknown BinaryCIF encoding"):
        _decode_data(b"", [{"kind": "Bogus"}])
