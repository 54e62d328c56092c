"""ctypes binding for the native C++ oracle renderer (native/oracle.cpp).

Builds the shared library on first use (g++ is in the base image; no pip
deps). Falls back to the numpy oracle transparently if the toolchain is
unavailable — call `available()` to check, `render()` to render.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liboracle.so"))
_ABI_VERSION = 6  # must equal oracle.cpp's rrt_version()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "oracle.cpp"))
    stale = (
        not os.path.exists(_LIB_PATH)
        or (os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    )
    if stale:
        # Always (re)build when the source is newer: a stale binary (e.g.
        # built with -march=native on another CPU) must never silently
        # shadow oracle.cpp edits. The .so is gitignored, never committed.
        try:
            subprocess.run(
                ["make", "-s", "-B", "liboracle.so"],
                cwd=os.path.abspath(_NATIVE_DIR),
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    # ABI check: rrt_render's signature changed in v2 (checker_tau before
    # `out`) and v3 (13-wide material block + reflections param). A stale
    # .so that escaped the mtime heuristic (restored build
    # cache, mtime-preserving copy) would be called with v2 argtypes
    # against the v1 entry point — writing pixels through a garbage
    # pointer. Force one rebuild, then give up cleanly.
    if lib.rrt_version() != _ABI_VERSION:
        try:
            subprocess.run(
                ["make", "-s", "-B", "liboracle.so"],
                cwd=os.path.abspath(_NATIVE_DIR),
                check=True,
                capture_output=True,
            )
            lib = ctypes.CDLL(_LIB_PATH)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            _build_failed = True
            return None
        if lib.rrt_version() != _ABI_VERSION:
            _build_failed = True
            return None
    D = ctypes.POINTER(ctypes.c_double)
    lib.rrt_render.argtypes = (
        [D, D, D, ctypes.c_int] + [D, D, D, D, ctypes.c_int]
        + [D, D, ctypes.c_int] + [D, D, D]
        + [ctypes.c_int] * 4 + [ctypes.c_double, ctypes.c_int]
        + [D, ctypes.c_int] + [D, ctypes.c_int] + [D, ctypes.c_int] + [D]
    )
    lib.rrt_render.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _mat_block(mat) -> np.ndarray:
    """Pack Materials into the (K, 13) layout oracle.cpp expects (ABI v3)."""
    k = np.shape(mat.color)[0]
    out = np.empty((k, 13), np.float64)
    out[:, 0:3] = np.asarray(mat.color, np.float64)
    out[:, 3:6] = np.asarray(mat.color2, np.float64)
    out[:, 6] = np.asarray(mat.checker, np.float64)
    out[:, 7] = np.asarray(mat.checker_scale, np.float64)
    out[:, 8] = np.asarray(mat.ka, np.float64)
    out[:, 9] = np.asarray(mat.kd, np.float64)
    out[:, 10] = np.asarray(mat.ks, np.float64)
    out[:, 11] = np.asarray(mat.shininess, np.float64)
    out[:, 12] = np.asarray(mat.mirror, np.float64)
    return out


def render(scene, height: int, width: int, shadows: bool = True, clip: bool = True,
           checker_tau: float = 0.0, reflections: int = 0):
    """Drop-in for oracle.reference_np.render, ~2 orders of magnitude faster
    at config-5 scale. Raises RuntimeError if the native lib is unavailable.
    ``checker_tau``: soft-checker relaxation (RenderConfig.checker_tau).
    ``reflections``: mirror bounces (RenderConfig.reflections)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native oracle unavailable (build failed)")

    c = np.ascontiguousarray
    f64 = np.float64
    sp, rc = scene.spheres, scene.rects
    def _tex_block(t, what):
        t = np.asarray(t, f64)
        k = int(t.shape[1]) if t.size else 0
        if k and t.shape[1] != t.shape[2]:
            # The ABI carries a single K per group; indexing a non-square
            # grid with it would read out of bounds in the C++ sampler.
            raise ValueError(f"native oracle requires square {what} "
                             f"textures, got {tuple(t.shape)}")
        return (c(t) if k else np.zeros((1,), f64)), k

    rtex, tex_k = _tex_block(rc.texture, "rect")
    stex, sph_tex_k = _tex_block(sp.texture, "sphere")
    # Env map: (K, K, 3) — reuse the per-group block logic by lifting to
    # the (1, K, K, 3) layout it expects.
    env3 = np.asarray(scene.env, f64)
    envb, env_k = _tex_block(env3[None] if env3.size else env3.reshape(1, 0, 0, 3),
                             "environment")
    sc = c(np.asarray(sp.center, f64))
    sr = c(np.asarray(sp.radius, f64))
    smat = c(_mat_block(sp.material))
    ro = c(np.asarray(rc.origin, f64))
    ru = c(np.asarray(rc.edge_u, f64))
    rv = c(np.asarray(rc.edge_v, f64))
    rmat = c(_mat_block(rc.material))
    lp = c(np.asarray(scene.lights.position, f64))
    lc = c(np.asarray(scene.lights.color, f64))
    cam = c(np.concatenate([
        np.asarray(scene.camera.eye, f64),
        np.asarray(scene.camera.look_at, f64),
        np.asarray(scene.camera.up, f64),
        np.asarray(scene.camera.fov_deg, f64).reshape(1),
    ]))
    ambient = c(np.asarray(scene.ambient, f64))
    bg = c(np.asarray(scene.background, f64))
    out = np.empty((height, width, 3), f64)

    D = ctypes.POINTER(ctypes.c_double)
    p = lambda a: a.ctypes.data_as(D)
    lib.rrt_render(
        p(sc), p(sr), p(smat), sp.count,
        p(ro), p(ru), p(rv), p(rmat), rc.count,
        p(lp), p(lc), scene.lights.count,
        p(cam), p(ambient), p(bg),
        height, width, int(shadows), int(clip),
        ctypes.c_double(float(checker_tau)), int(reflections),
        p(rtex), tex_k, p(stex), sph_tex_k, p(envb), env_k, p(out),
    )
    return out
