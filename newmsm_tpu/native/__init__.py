"""Native host-runtime bindings with pure-Python fallbacks.

The C++ extension (`_geometry`) provides mesh topology construction and an
exact BVH nearest-triangle search (the golden reference for the device
kernel). If it has not been built, the Python implementations in
core.icosphere / tests are used instead.
"""
from __future__ import annotations

def _try_build() -> bool:
    """One-shot in-place build of the extension (the .so is not committed).
    Disable with NEWMSM_NO_BUILD=1."""
    import os
    import pathlib
    import subprocess
    import sys
    if os.environ.get("NEWMSM_NO_BUILD"):
        return False
    root = pathlib.Path(__file__).resolve().parents[2]
    if not (root / "setup.py").exists():
        return False
    try:
        subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                       cwd=root, capture_output=True, timeout=300, check=True)
        return True
    except Exception:
        return False


try:
    from . import _geometry  # type: ignore
    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    if _try_build():
        try:
            from . import _geometry  # type: ignore
            HAVE_NATIVE = True
        except ImportError:
            _geometry = None
            HAVE_NATIVE = False
    else:
        _geometry = None
        HAVE_NATIVE = False


def adjacency(faces, nverts):
    if HAVE_NATIVE:
        return _geometry.adjacency(faces, int(nverts))
    from ..core.icosphere import build_adjacency as _py
    return _py(faces, nverts)


def ring2_faces(nbr_idx, tri_idx):
    if HAVE_NATIVE:
        return _geometry.ring2_faces(nbr_idx, tri_idx)
    from ..ops.nearest import _build_ring_faces
    return _build_ring_faces(nbr_idx, tri_idx)


def nearest_triangle_exact(coords, faces, queries):
    """Exact host-side nearest-triangle (reference octree semantics)."""
    if not HAVE_NATIVE:
        raise RuntimeError("native extension not built")
    import numpy as np
    return _geometry.nearest_triangle_bvh(
        np.ascontiguousarray(coords, np.float64),
        np.ascontiguousarray(faces, np.int32),
        np.ascontiguousarray(queries, np.float64))
