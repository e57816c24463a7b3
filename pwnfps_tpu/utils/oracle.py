"""Python driver for the headless C parity oracle (tools/oracle).

Builds on demand (requires gcc + the read-only reference checkout) and
exposes frame/ray golden-data generation for the parity test-suite.
"""

from __future__ import annotations

import os
import struct
import subprocess

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
ORACLE_DIR = os.path.join(REPO, "tools", "oracle")
BUILD = os.path.join(ORACLE_DIR, "build")
REF = os.environ.get("PWNFPS_REF", "/root/reference")


def available() -> bool:
    return os.path.isdir(REF) and os.path.exists(
        os.path.join(REF, "trace.h"))


def build() -> None:
    subprocess.run(["make", "-s", f"REF={REF}"], cwd=ORACLE_DIR, check=True)


def _bin(name: str) -> str:
    p = os.path.join(BUILD, name)
    if not os.path.exists(p):
        build()
    return p


def extract_tables(dest: str | None = None) -> str:
    """Run `oracle tables`; returns the table path (and optionally copies)."""
    out = os.path.join(BUILD, "tables.bin")
    subprocess.run([_bin("oracle"), "tables", out], check=True,
                   capture_output=True)
    if dest:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(out, "rb") as f, open(dest, "wb") as g:
            g.write(f.read())
        return dest
    return out


def approx_pairs(x: np.ndarray, workdir: str | None = None):
    """Live `_mm_rsqrt_ps` / `_mm_rcp_ps` values for inputs x ([n] f32)."""
    workdir = workdir or BUILD
    inp = os.path.join(workdir, "approx_in.bin")
    out = os.path.join(workdir, "approx_out.bin")
    x = np.asarray(x, np.float32)
    with open(inp, "wb") as f:
        f.write(struct.pack("<I", x.size))
        f.write(x.tobytes())
    subprocess.run([_bin("oracle"), "approx", inp, out], check=True)
    raw = np.fromfile(out, np.float32).reshape(x.size, 2)
    return raw[:, 0], raw[:, 1]


def _pack_spheres(f, spheres: np.ndarray) -> None:
    """spheres: [n, 8] f32 rows (r, refl, px, py, pz, cb, cg, cr)."""
    spheres = np.asarray(spheres, np.float32).reshape(-1, 8)
    f.write(struct.pack("<I", spheres.shape[0]))
    f.write(spheres.tobytes())


def render_frames(level_path: str, frames: list[dict], w: int, h: int,
                  blur: bool = True, workdir: str | None = None,
                  pinned: bool = False):
    """Render golden frames.

    Each frame dict: {"sec": float, "cam": [4,4] f32 (rows x,y,z,pos),
    "spheres": [n,8] f32}.  Returns (sbuf [n,h,w] uint32 BGRA,
    zbuf [n,h,w] f32).
    """
    workdir = workdir or BUILD
    state = os.path.join(workdir, "state.bin")
    out = os.path.join(workdir, "frames.bin")
    with open(state, "wb") as f:
        f.write(struct.pack("<III", w, h, len(frames)))
        for fr in frames:
            f.write(struct.pack("<f", fr["sec"]))
            cam = np.asarray(fr["cam"], np.float32).reshape(4, 4)
            f.write(cam.tobytes())
            _pack_spheres(f, fr.get("spheres", np.zeros((0, 8), np.float32)))
    base = "oracle_pinned" if pinned else "oracle"
    exe = _bin(base if blur else base + "_noblur")
    subprocess.run([exe, "render", level_path, state, out], check=True)
    raw = np.fromfile(out, np.uint32)
    n = len(frames)
    per = w * h
    raw = raw.reshape(n, 2 * per)
    sbuf = raw[:, :per].reshape(n, h, w)
    zbuf = raw[:, per:].view(np.float32).reshape(n, h, w)
    return sbuf, zbuf


def trace_rays(level_path: str, rays: list[dict],
               workdir: str | None = None, pinned: bool = False):
    """Golden single-ray traces.

    Each ray dict: {"from": [4] f32, "dir": [4] f32, "seed": uint32,
    "sec": float, "spheres": [n,8] f32}.
    Returns (col [n,4] f32, dist [n] f32).
    """
    workdir = workdir or BUILD
    inp = os.path.join(workdir, "rays_in.bin")
    out = os.path.join(workdir, "rays_out.bin")
    with open(inp, "wb") as f:
        f.write(struct.pack("<I", len(rays)))
        for r in rays:
            f.write(np.asarray(r["from"], np.float32).tobytes())
            f.write(np.asarray(r["dir"], np.float32).tobytes())
            f.write(struct.pack("<If", int(r["seed"]) & 0xFFFFFFFF,
                                r["sec"]))
            _pack_spheres(f, r.get("spheres", np.zeros((0, 8), np.float32)))
    subprocess.run([_bin("oracle_pinned" if pinned else "oracle"),
                    "ray", level_path, inp, out], check=True)
    raw = np.fromfile(out, np.float32).reshape(len(rays), 5)
    return raw[:, :4], raw[:, 4]
