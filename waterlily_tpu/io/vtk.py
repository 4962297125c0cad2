"""ParaView-compatible VTK ImageData (.vti) + collection (.pvd) I/O.

Pure-python re-design of the reference's WriteVTK/ReadVTK extensions
(ext/WaterLilyWriteVTKExt.jl, ext/WaterLilyReadVTKExt.jl) with no external
dependency: XML ImageData with inline base64 binary arrays, a `.pvd`
collection keyed by (rounded) dimensionless time, and a reader that can
restart a simulation from the last snapshot.

Like the reference, the *whole* ghost-padded grid is written as point data
(WriteVTKExt.jl:57-66), vectors stored components-first — which is exactly
this package's memory layout.  2D fields are written as single-slice 3D
ImageData with 3-component vectors (ParaView convention).
"""
from __future__ import annotations

import base64
import os
import struct
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

__all__ = ["VTKWriter", "vtk_writer", "default_attrib", "write_vti",
           "read_vti", "restart_from_vtk"]


def _encode(data: np.ndarray) -> str:
    """VTK inline-binary encoding: base64(UInt64 byte count + raw bytes)."""
    raw = np.ascontiguousarray(data).tobytes()
    return base64.b64encode(struct.pack("<Q", len(raw)) + raw).decode()


def _decode(txt: str, dtype, ncomp: int) -> np.ndarray:
    raw = base64.b64decode(txt.strip())
    (nbytes,) = struct.unpack("<Q", raw[:8])
    arr = np.frombuffer(raw[8:8 + nbytes], dtype=dtype)
    return arr


_VTK_TYPES = {np.dtype(np.float32): "Float32", np.dtype(np.float64): "Float64",
              np.dtype(np.int32): "Int32"}
_NP_TYPES = {v: k for k, v in _VTK_TYPES.items()}


def write_vti(fname: str, fields: dict) -> None:
    """Write point-data ``fields`` (scalar: (*S); vector: (D,*S)) to a .vti.

    Arrays are written in VTK's x-fastest order; 2D data becomes a z=1
    slab and 2D vectors get a zero z-component.
    """
    first = np.asarray(next(iter(fields.values())))
    S = first.shape[1:] if _is_vector(first) else first.shape
    D = len(S)
    ext_shape = S if D == 3 else S + (1,)
    extent = f"0 {ext_shape[0]-1} 0 {ext_shape[1]-1} 0 {ext_shape[2]-1}"

    lines = ['<?xml version="1.0"?>',
             '<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
             'header_type="UInt64">',
             f'  <ImageData WholeExtent="{extent}" Origin="0 0 0" Spacing="1 1 1">',
             f'    <Piece Extent="{extent}">',
             '      <PointData>']
    for name, arr in fields.items():
        arr = np.asarray(arr)
        vtype = _VTK_TYPES[arr.dtype]
        if _is_vector(arr):
            comps = [arr[i] for i in range(arr.shape[0])]
            if D == 2:
                comps.append(np.zeros_like(comps[0]))
            # per-point interleaved components, x-fastest point order
            flat = np.stack([c.flatten(order="F") for c in comps], axis=-1)
            lines.append(f'        <DataArray type="{vtype}" Name="{name}" '
                         f'NumberOfComponents="3" format="binary">')
            lines.append("          " + _encode(flat))
        else:
            flat = arr.flatten(order="F")
            lines.append(f'        <DataArray type="{vtype}" Name="{name}" '
                         f'format="binary">')
            lines.append("          " + _encode(flat))
        lines.append("        </DataArray>")
    lines += ["      </PointData>", "      <CellData/>", "    </Piece>",
              "  </ImageData>", "</VTKFile>"]
    with open(fname, "w") as f:
        f.write("\n".join(lines))


def _is_vector(arr) -> bool:
    return arr.ndim in (3, 4) and arr.shape[0] == arr.ndim - 1


def read_vti(fname: str) -> dict:
    """Read point-data fields from a .vti written by `write_vti`.

    Returns ``{name: array}`` with vectors back in (D,*S) layout (2D grids
    detected from a unit z-extent; the padding z-component is dropped)."""
    root = ET.parse(fname).getroot()
    image = root.find("ImageData")
    ext = [int(v) for v in image.get("WholeExtent").split()]
    nx, ny, nz = ext[1] + 1, ext[3] + 1, ext[5] + 1
    two_d = nz == 1
    S = (nx, ny) if two_d else (nx, ny, nz)
    out = {}
    for da in image.find("Piece").find("PointData").findall("DataArray"):
        name = da.get("Name")
        dtype = _NP_TYPES[da.get("type")]
        ncomp = int(da.get("NumberOfComponents", "1"))
        flat = _decode(da.text, dtype, ncomp)
        if ncomp > 1:
            pts = flat.reshape(-1, ncomp)
            D = 2 if two_d else 3
            comps = [pts[:, i].reshape(S, order="F") for i in range(D)]
            out[name] = np.stack(comps, axis=0)
        else:
            out[name] = flat.reshape(S, order="F")
    return out


def default_attrib():
    """Default exported fields (reference WriteVTKExt.jl:48-50)."""
    return {"u": lambda sim: np.asarray(sim.flow.u),
            "p": lambda sim: np.asarray(sim.flow.p)}


class VTKWriter:
    """Snapshot writer managing a .pvd collection (WriteVTKExt.jl:27-72)."""

    def __init__(self, fname="WaterLily", attrib=None, dir="vtk_data", T=np.float32):
        self.fname = fname
        self.dir = dir
        self.attrib = attrib or default_attrib()
        self.T = T
        self.count = 0
        self.entries = []  # (time, relative path)
        os.makedirs(dir, exist_ok=True)

    def write(self, sim) -> None:
        """Append one snapshot keyed by rounded sim_time (WriteVTKExt.jl:57-66)."""
        vti = os.path.join(self.dir, f"{self.fname}_{self.count:06d}.vti")
        fields = {k: np.asarray(fn(sim)).astype(self.T) for k, fn in self.attrib.items()}
        write_vti(vti, fields)
        self.entries.append((round(sim.sim_time, 14), vti))
        self.count += 1
        self._flush()

    def _flush(self) -> None:
        lines = ['<?xml version="1.0"?>',
                 '<VTKFile type="Collection" version="1.0" byte_order="LittleEndian">',
                 '  <Collection>']
        for t, path in self.entries:
            lines.append(f'    <DataSet timestep="{t}" part="0" file="{path}"/>')
        lines += ["  </Collection>", "</VTKFile>"]
        with open(self.fname + ".pvd", "w") as f:
            f.write("\n".join(lines))

    def close(self) -> None:
        self._flush()


def vtk_writer(fname="WaterLily", attrib=None, dir="vtk_data", T=np.float32):
    return VTKWriter(fname, attrib, dir, T)


def restart_from_vtk(sim, fname: str):
    """Restart a simulation from the last snapshot of a .pvd collection
    (reference `restart_sim!`, ReadVTKExt.jl:28-45): restores p and u,
    resets the time from the file timestamp, re-measures the body, and
    returns a writer that appends to the same collection.

    Time-step semantics match the reference exactly: the absolute time
    comes from the file timestamp (the reference writes it into
    ``Δt[end]``; here it is ``flow.t`` directly) and the NEXT step size is
    recomputed as ``CFL(u)`` from the restored velocity — the reference
    does the same (``push!(Δt, CFL(flow))``, ReadVTKExt.jl:40), and an
    uninterrupted run's next dt is also ``CFL`` of this same ``u``
    (src/Flow.jl:168), so the first post-restart step reproduces the
    uninterrupted trajectory (asserted in tests/test_io.py)."""
    root = ET.parse(fname).getroot()
    datasets = root.find("Collection").findall("DataSet")
    last = datasets[-1]
    t_star = float(last.get("timestep"))
    fields = read_vti(last.get("file"))
    if tuple(fields["p"].shape) != sim.cfg.S:
        raise ValueError("restart grid dims do not match simulation")
    dtype = sim.cfg.dtype
    sim.flow = sim.flow._replace(
        u=jnp.asarray(fields["u"], dtype), p=jnp.asarray(fields["p"], dtype),
        t=jnp.asarray(t_star * sim.L / sim.U, dtype))
    sim.dts = [float(x) for x in sim.dts]  # keep history; time now from file
    sim.measure(t=t_star * sim.L / sim.U)
    from ..flow import cfl
    sim.flow = sim.flow._replace(dt=cfl(sim.flow.u, sim.cfg.nu))
    wr = VTKWriter(os.path.splitext(os.path.basename(fname))[0],
                   dir=os.path.dirname(datasets[0].get("file")) or "vtk_data")
    wr.entries = [(float(d.get("timestep")), d.get("file")) for d in datasets]
    wr.count = len(wr.entries)
    return wr
