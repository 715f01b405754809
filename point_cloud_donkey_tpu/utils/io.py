"""Point-cloud IO and file-list parsing.

Honors the reference's CLI data conventions so experiment setups port
unchanged:
  * `.pcd` / `.ply` point-cloud files (reference loads via PCL,
    implicit_shape_model.cpp:213-249).
  * file lists with a `# train|test [inst|detection]` header followed by
    `path label [instance]` lines, `#`-prefixed lines are comments
    (reference: eval_tool/eval_helpers.h:100-177).

The host-side representation is a plain numpy struct-of-arrays
(:class:`PointCloud`); padding/bucketing for the TPU pipelines lives in
``parallel/batching.py``.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class PointCloud:
    """Host-side point cloud. xyz always present; normals/rgb/curvature
    optional (None when the file has no such fields)."""

    xyz: np.ndarray  # [N, 3] float32
    normals: Optional[np.ndarray] = None  # [N, 3] float32
    curvature: Optional[np.ndarray] = None  # [N] float32
    rgb: Optional[np.ndarray] = None  # [N, 3] float32 in [0, 1]

    def __len__(self) -> int:
        return int(self.xyz.shape[0])

    def has_normals(self) -> bool:
        """Reference heuristic: normals count as present when the first point's
        normal is finite and not all-zero (implicit_shape_model.cpp:374-384)."""
        if self.normals is None or len(self) == 0:
            return False
        n0 = self.normals[0]
        if not np.all(np.isfinite(n0)):
            return False
        if n0[0] == 0 and n0[1] == 0 and n0[2] == 0:
            return False
        if self.curvature is not None and not np.isfinite(self.curvature[0]):
            return False
        return True

    def remove_nan(self) -> "PointCloud":
        mask = np.all(np.isfinite(self.xyz), axis=1)
        return self.select(mask)

    def select(self, mask_or_idx) -> "PointCloud":
        return PointCloud(
            xyz=self.xyz[mask_or_idx],
            normals=None if self.normals is None else self.normals[mask_or_idx],
            curvature=None if self.curvature is None else self.curvature[mask_or_idx],
            rgb=None if self.rgb is None else self.rgb[mask_or_idx],
        )


# ---------------------------------------------------------------------------
# PCD
# ---------------------------------------------------------------------------

_PCD_DTYPES = {
    ("F", 4): "<f4", ("F", 8): "<f8",
    ("I", 1): "<i1", ("I", 2): "<i2", ("I", 4): "<i4",
    ("U", 1): "<u1", ("U", 2): "<u2", ("U", 4): "<u4",
}


def _unpack_rgb(rgb_raw: np.ndarray) -> np.ndarray:
    """PCL packs rgb as a float whose bits hold 0x00RRGGBB."""
    as_int = rgb_raw.astype(np.float32).view(np.uint32)
    r = (as_int >> 16) & 0xFF
    g = (as_int >> 8) & 0xFF
    b = as_int & 0xFF
    return (np.stack([r, g, b], axis=1).astype(np.float32)) / 255.0


def load_pcd(path: str) -> PointCloud:
    with open(path, "rb") as f:
        data = f.read()

    # parse header (ascii lines until DATA)
    lines = []
    offset = 0
    while True:
        end = data.index(b"\n", offset)
        line = data[offset:end].decode("ascii", errors="replace").strip()
        offset = end + 1
        if line.startswith("#") or not line:
            continue
        lines.append(line)
        if line.startswith("DATA"):
            break

    header: Dict[str, List[str]] = {}
    for line in lines:
        parts = line.split()
        header[parts[0]] = parts[1:]

    fields = header["FIELDS"]
    sizes = [int(s) for s in header["SIZE"]]
    types = header["TYPE"]
    counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
    n_points = int(header["POINTS"][0])
    data_mode = header["DATA"][0]

    np_fields = []
    for name, size, typ, count in zip(fields, sizes, types, counts):
        base = _PCD_DTYPES[(typ, size)]
        if count == 1:
            np_fields.append((name, base))
        else:
            np_fields.append((name, base, (count,)))
    dtype = np.dtype(np_fields)

    if data_mode == "ascii":
        flat_names = []
        for name, size, typ, count in zip(fields, sizes, types, counts):
            flat_names.extend([name] * count)
        from . import native
        n_vals = n_points * len(flat_names)
        raw = native.parse_floats(data[offset:], n_vals)
        if raw is not None and len(raw) == n_vals:
            raw = raw.astype(np.float64).reshape(n_points, len(flat_names))
        else:  # pure-python fallback
            text = data[offset:].decode("ascii", errors="replace")
            raw = np.array(text.split(), dtype=np.float64).reshape(
                n_points, len(flat_names))
        rec = np.zeros(n_points, dtype=dtype)
        col = 0
        for name, count in zip(fields, counts):
            if count == 1:
                rec[name] = raw[:, col]
            else:
                rec[name] = raw[:, col:col + count]
            col += count
    elif data_mode == "binary":
        rec = np.frombuffer(data, dtype=dtype, count=n_points, offset=offset)
    elif data_mode == "binary_compressed":
        comp_size, uncomp_size = struct.unpack_from("<II", data, offset)
        from . import native
        comp = data[offset + 8: offset + 8 + comp_size]
        body = native.lzf_decompress(comp, uncomp_size)
        if body is None:  # pure-python fallback
            body = _lzf_decompress(comp, uncomp_size)
        # binary_compressed stores fields contiguously (SoA)
        rec = np.zeros(n_points, dtype=dtype)
        pos = 0
        for name, size, typ, count in zip(fields, sizes, types, counts):
            base = np.dtype(_PCD_DTYPES[(typ, size)])
            nbytes = base.itemsize * count * n_points
            arr = np.frombuffer(body, dtype=base, count=count * n_points, offset=pos)
            if count == 1:
                rec[name] = arr
            else:
                rec[name] = arr.reshape(n_points, count)
            pos += nbytes
    else:
        raise ValueError(f"unsupported PCD DATA mode: {data_mode}")

    return _record_to_cloud(rec, fields)


def _record_to_cloud(rec: np.ndarray, fields: List[str]) -> PointCloud:
    xyz = np.stack(
        [rec["x"].astype(np.float32), rec["y"].astype(np.float32), rec["z"].astype(np.float32)],
        axis=1,
    )
    normals = None
    if all(f in fields for f in ("normal_x", "normal_y", "normal_z")):
        normals = np.stack(
            [rec["normal_x"], rec["normal_y"], rec["normal_z"]], axis=1
        ).astype(np.float32)
    curvature = rec["curvature"].astype(np.float32) if "curvature" in fields else None
    rgb = None
    if "rgb" in fields:
        rgb = _unpack_rgb(rec["rgb"])
    elif "rgba" in fields:
        rgb = _unpack_rgb(rec["rgba"])
    elif all(f in fields for f in ("r", "g", "b")):
        rgb = np.stack([rec["r"], rec["g"], rec["b"]], axis=1).astype(np.float32) / 255.0
    return PointCloud(xyz=xyz, normals=normals, curvature=curvature, rgb=rgb)


def _lzf_decompress(data: bytes, expected_size: int) -> bytes:
    """LZF decompression (format used by PCL binary_compressed PCDs; the
    reference vendors liblzf-3.6 for its CGF dump, third_party/liblzf-3.6)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            run = ctrl + 1
            out += data[i:i + run]
            i += run
        else:  # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = len(out) - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    if len(out) != expected_size:
        raise ValueError(f"lzf: expected {expected_size} bytes, got {len(out)}")
    return bytes(out)


def save_pcd(path: str, cloud: PointCloud, binary: bool = False) -> None:
    """Write a PCD (xyz [+ normals+curvature] [+ rgb]); ``binary=True``
    writes DATA binary like pcl::savePCDFileBinary (load_cloud reads both,
    plus binary_compressed)."""
    fields = ["x", "y", "z"]
    cols = [cloud.xyz]
    if cloud.normals is not None:
        fields += ["normal_x", "normal_y", "normal_z", "curvature"]
        curv = cloud.curvature if cloud.curvature is not None else np.zeros(len(cloud), np.float32)
        cols += [cloud.normals, curv[:, None]]
    if cloud.rgb is not None:
        rgb8 = (np.clip(cloud.rgb, 0, 1) * 255).astype(np.uint32)
        packed = (rgb8[:, 0] << 16) | (rgb8[:, 1] << 8) | rgb8[:, 2]
        fields += ["rgb"]
        cols += [packed.view(np.float32)[:, None]]
    mat = np.concatenate([np.asarray(c, np.float32).reshape(len(cloud), -1) for c in cols], axis=1)
    n = len(cloud)
    header = ("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
              + "FIELDS " + " ".join(fields) + "\n"
              + "SIZE " + " ".join(["4"] * len(fields)) + "\n"
              + "TYPE " + " ".join(["F"] * len(fields)) + "\n"
              + "COUNT " + " ".join(["1"] * len(fields)) + "\n"
              + f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n")
    if binary:
        with open(path, "wb") as f:
            f.write((header + "DATA binary\n").encode("ascii"))
            f.write(np.ascontiguousarray(mat, dtype="<f4").tobytes())
        return
    with open(path, "w") as f:
        f.write(header + "DATA ascii\n")
        for row in mat:
            f.write(" ".join(repr(float(v)) for v in row) + "\n")


# ---------------------------------------------------------------------------
# PLY
# ---------------------------------------------------------------------------

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "char": "<i1", "int8": "<i1", "uchar": "<u1", "uint8": "<u1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
}


def load_ply(path: str) -> PointCloud:
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    fmt = "ascii"
    elements: List[Tuple[str, int, List[Tuple[str, str]]]] = []
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property" and elements:
            if parts[1] == "list":
                elements[-1][2].append(("__list__" + parts[-1], parts[2] + ":" + parts[3]))
            else:
                elements[-1][2].append((parts[-1], parts[1]))

    vertex = next((e for e in elements if e[0] == "vertex"), None)
    if vertex is None:
        raise ValueError("no vertex element in PLY")
    _, n_points, props = vertex
    if any(p[0].startswith("__list__") for p in props):
        raise ValueError("list properties in vertex element are unsupported")

    names = [p[0] for p in props]
    if fmt == "ascii":
        text = data[end:].decode("ascii", errors="replace").splitlines()
        rows = [line.split() for line in text[:n_points]]
        raw = np.array(rows, dtype=np.float64)
        rec = {name: raw[:, i] for i, name in enumerate(names)}
    else:
        byteorder = "<" if "little" in fmt else ">"
        np_props = [(p[0], byteorder + _PLY_DTYPES[p[1]][1:]) for p in props]
        dtype = np.dtype(np_props)
        arr = np.frombuffer(data, dtype=dtype, count=n_points, offset=end)
        rec = {name: arr[name] for name in names}

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
    normals = None
    if all(k in rec for k in ("nx", "ny", "nz")):
        normals = np.stack([rec["nx"], rec["ny"], rec["nz"]], axis=1).astype(np.float32)
    rgb = None
    if all(k in rec for k in ("red", "green", "blue")):
        rgb = np.stack([rec["red"], rec["green"], rec["blue"]], axis=1).astype(np.float32) / 255.0
    return PointCloud(xyz=xyz, normals=normals, rgb=rgb)


def load_cloud(path: str) -> PointCloud:
    if path.endswith(".pcd"):
        return load_pcd(path)
    if path.endswith(".ply"):
        return load_ply(path)
    if path.endswith(".off"):
        # ModelNet meshes: sample on the fly (PCD_OFF_POINTS/PCD_OFF_SEED
        # env overrides); cli/modelnet.py pre-converts for repeat runs
        import os
        from .mesh import off_to_cloud
        return off_to_cloud(path,
                            n_points=int(os.environ.get("PCD_OFF_POINTS",
                                                        "2048")),
                            seed=int(os.environ.get("PCD_OFF_SEED", "0")))
    raise ValueError(f"unknown extension for {path}")


# ---------------------------------------------------------------------------
# file lists (reference: eval_tool/eval_helpers.h:100-177)
# ---------------------------------------------------------------------------

@dataclass
class FileList:
    mode: str  # "train" or "test"
    filenames: List[str] = field(default_factory=list)
    class_labels: List[int] = field(default_factory=list)
    instance_labels: List[int] = field(default_factory=list)
    using_instances: bool = False
    # label string <-> id maps, in first-seen order (convertLabel semantics)
    class_map: Dict[str, int] = field(default_factory=dict)
    instance_map: Dict[str, int] = field(default_factory=dict)
    instance_to_class: Dict[int, int] = field(default_factory=dict)


def parse_file_list(path: str, class_map: Optional[Dict[str, int]] = None,
                    instance_map: Optional[Dict[str, int]] = None) -> FileList:
    """Parse a `# train|test [inst]` file list.  Label strings are converted
    to ids in first-seen order; pass existing maps to keep train/test ids
    consistent (the reference shares global maps across both phases)."""
    class_map = dict(class_map or {})
    instance_map = dict(instance_map or {})

    with open(path) as f:
        tokens_per_line = [ln.split() for ln in f.read().splitlines()]

    lines = [t for t in tokens_per_line if t]
    if not lines or lines[0][0] != "#" or len(lines[0]) < 2:
        raise ValueError(f"{path}: missing '# train|test [inst]' header")
    header = lines[0]
    mode = header[1]
    if mode not in ("train", "test"):
        raise ValueError(f"{path}: mode must be train or test, got {mode}")
    using_instances = len(header) > 2 and header[2] == "inst"
    if len(header) > 2 and header[2] == "detection":
        raise ValueError("detection file list passed to classification parser")

    fl = FileList(mode=mode, using_instances=using_instances,
                  class_map=class_map, instance_map=instance_map)

    def convert(label: str, mapping: Dict[str, int]) -> int:
        if label not in mapping:
            mapping[label] = len(mapping)
        return mapping[label]

    for tok in lines[1:]:
        if tok[0].startswith("#"):
            continue
        fl.filenames.append(tok[0])
        cid = convert(tok[1], class_map)
        fl.class_labels.append(cid)
        if using_instances:
            iid = convert(tok[2], instance_map)
            fl.instance_labels.append(iid)
            fl.instance_to_class.setdefault(iid, cid)
        else:
            fl.instance_labels.append(cid)
            fl.instance_to_class.setdefault(cid, cid)
    return fl
