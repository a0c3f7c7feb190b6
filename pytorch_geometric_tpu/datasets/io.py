"""Raw-format readers for mesh/superpixel datasets (host-side, cold
path).

Reference counterparts: torch_geometric.io.read_off / read_ply and the
torch-serialised tuples of PyG's MNISTSuperpixels raw files (reference
usage: examples/pointnet++.py:13 ModelNet OFF archives,
examples/faust.py:25 FAUST PLY registrations, ConvexPruning.py:515
MNISTSuperpixels .pt).  Pure-numpy text parsing for OFF; PLY supports
ascii and binary_little_endian vertex/face elements; .pt loading uses
the baked-in CPU torch only inside the loader (never on the compute
path).
"""

import os.path as osp
import zipfile

import numpy as np


def read_off(path_or_lines):
    """Parse an OFF mesh -> (pos (V, 3) float32, face (3, F) int64)."""
    if isinstance(path_or_lines, (str, bytes)) and osp.exists(
            path_or_lines):
        with open(path_or_lines, "r") as fh:
            raw = fh.read()
    elif isinstance(path_or_lines, bytes):
        raw = path_or_lines.decode()
    else:
        raw = path_or_lines
    tokens = []
    for line in raw.splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            tokens.extend(line.split())
    assert tokens[0].startswith("OFF"), "not an OFF file"
    # some ModelNet files glue counts onto the OFF line: "OFF490 518 0"
    if tokens[0] != "OFF":
        tokens = [tokens[0][3:]] + tokens[1:]
    else:
        tokens = tokens[1:]
    nv, nf = int(tokens[0]), int(tokens[1])
    ptr = 3
    pos = np.asarray(tokens[ptr: ptr + 3 * nv],
                     dtype=np.float32).reshape(nv, 3)
    ptr += 3 * nv
    faces = []
    for _ in range(nf):
        k = int(tokens[ptr])
        idx = [int(t) for t in tokens[ptr + 1: ptr + 1 + k]]
        ptr += 1 + k
        for i in range(1, k - 1):        # fan-triangulate polygons
            faces.append((idx[0], idx[i], idx[i + 1]))
    face = (np.asarray(faces, dtype=np.int64).T if faces
            else np.zeros((3, 0), np.int64))
    return pos, face


_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path_or_bytes):
    """Parse a PLY mesh -> (pos (V, 3) float32, face (3, F) int64).

    Supports ascii and binary_little_endian; vertex properties x/y/z
    plus a face list property (vertex_indices / vertex_index).
    """
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    else:
        blob = path_or_bytes
    end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:end].decode("ascii").splitlines()
    body = blob[end:]

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype, list_count_dtype)])
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(
                    (parts[4], _PLY_DTYPES[parts[3]],
                     _PLY_DTYPES[parts[2]]))
            else:
                elements[-1][2].append(
                    (parts[2], _PLY_DTYPES[parts[1]], None))

    pos, face = None, np.zeros((3, 0), np.int64)
    if fmt == "ascii":
        tokens = body.decode("ascii").split()
        ptr = 0
        for name, count, props in elements:
            if name == "vertex":
                width = len(props)
                arr = np.asarray(tokens[ptr: ptr + count * width],
                                 dtype=np.float32).reshape(count, width)
                cols = [p[0] for p in props]
                pos = arr[:, [cols.index("x"), cols.index("y"),
                              cols.index("z")]]
                ptr += count * width
            elif name == "face":
                faces = []
                for _ in range(count):
                    k = int(tokens[ptr])
                    idx = [int(t) for t in tokens[ptr + 1: ptr + 1 + k]]
                    ptr += 1 + k
                    for i in range(1, k - 1):
                        faces.append((idx[0], idx[i], idx[i + 1]))
                face = np.asarray(faces, np.int64).T if faces else face
            else:  # skip unknown fixed-width element
                ptr += count * len(props)
    elif fmt == "binary_little_endian":
        off = 0
        for name, count, props in elements:
            if name == "vertex" and all(p[2] is None for p in props):
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                arr = np.frombuffer(body, dt, count, off)
                pos = np.stack([arr["x"], arr["y"], arr["z"]],
                               axis=1).astype(np.float32)
                off += dt.itemsize * count
            elif name == "face":
                faces = []
                for _ in range(count):
                    cnt_dt = np.dtype("<" + props[0][2])
                    k = int(np.frombuffer(body, cnt_dt, 1, off)[0])
                    off += cnt_dt.itemsize
                    idx_dt = np.dtype("<" + props[0][1])
                    idx = np.frombuffer(body, idx_dt, k, off)
                    off += idx_dt.itemsize * k
                    for i in range(1, k - 1):
                        faces.append((int(idx[0]), int(idx[i]),
                                      int(idx[i + 1])))
                face = np.asarray(faces, np.int64).T if faces else face
            else:
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                off += dt.itemsize * count
    else:
        raise ValueError(f"unsupported PLY format {fmt!r}")
    return pos, face


def load_torch_tuple(path):
    """Load a torch-serialised object (PyG raw .pt files) as numpy.

    torch (CPU build, baked into the image) is imported lazily so the
    compute path never depends on it.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, torch.Tensor):
            return x.numpy()
        if isinstance(x, (list, tuple)):
            return type(x)(to_np(v) for v in x)
        return x

    return to_np(obj)


def iter_zip_members(zip_path, suffix):
    """Yield (name, bytes) for members of a zip archive with suffix.

    macOS-built archives (the official ModelNet10/40 zips among them)
    carry ``__MACOSX/`` resource-fork mirrors and ``._*`` AppleDouble
    entries whose names match real members' suffixes but whose bytes
    are not the advertised format; skip them unconditionally.
    """
    with zipfile.ZipFile(zip_path) as zf:
        for name in sorted(zf.namelist()):
            base = name.rsplit("/", 1)[-1]
            if name.startswith("__MACOSX/") or base.startswith("._"):
                continue
            if name.endswith(suffix):
                yield name, zf.read(name)
