"""Synthetic registration fixtures: spheres with smooth feature maps and
known misalignments."""
import numpy as np

from newmsm_tpu.core.mesh import Mesh


def smooth_pattern(coords: np.ndarray, seed: int = 0, terms: int = 6) -> np.ndarray:
    """Smooth pseudo-random scalar field on the sphere (sum of a few random
    plane-wave sinusoids) — sulc-like."""
    rng = np.random.default_rng(seed)
    unit = coords / np.linalg.norm(coords, axis=1, keepdims=True)
    out = np.zeros(coords.shape[0])
    for _ in range(terms):
        k = rng.normal(size=3)
        k *= rng.uniform(1.5, 4.0) / np.linalg.norm(k)
        phase = rng.uniform(0, 2 * np.pi)
        out += rng.normal() * np.sin(unit @ k * np.pi + phase)
    return out / out.std()


def rotation_matrix(axis, degrees):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    a = np.radians(degrees)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def make_pair(res: int = 3, rot_degrees: float = 10.0, seed: int = 0):
    """Input/reference spheres with the same underlying pattern, input's
    features rotated by `rot_degrees` about a fixed axis. Registering input
    to reference should undo the rotation."""
    ref = Mesh.from_icosphere(res)
    ref_data = smooth_pattern(ref.coords, seed)[None, :]

    inp = Mesh.from_icosphere(res)
    R = rotation_matrix([0.3, 1.0, 0.2], rot_degrees)
    in_data = smooth_pattern(inp.coords @ R.T, seed)[None, :]
    return inp, in_data, ref, ref_data


def alignment_correlation(data_a: np.ndarray, data_b: np.ndarray) -> float:
    a = data_a.ravel()
    b = data_b.ravel()
    return float(np.corrcoef(a, b)[0, 1])
