"""Runtime build+cache of native C++ extensions.

Counterpart of the reference's torch_utils/custom_ops.py:60-159
(get_plugin): compile C++ sources with the system toolchain into a shared
library, cached by source hash, loaded via ctypes. The TPU compute path
never needs this (XLA/Pallas own it); it serves the host-side runtime —
mesh extraction over 512³ grids, IO — where Python/numpy is the
bottleneck.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig

CACHE_DIR = os.environ.get(
    "TGI_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tgi", "native"))

_loaded: dict[str, ctypes.CDLL] = {}


def get_plugin(name: str, sources: list[str], extra_cflags=()) -> ctypes.CDLL:
    """Compile ``sources`` (absolute paths) into ``lib{name}-{hash}.so``
    and load it; subsequent calls hit the disk cache."""
    if name in _loaded:
        return _loaded[name]
    digest = hashlib.md5()
    for src in sources:
        with open(src, "rb") as f:
            digest.update(f.read())
    digest.update(" ".join(extra_cflags).encode())
    tag = digest.hexdigest()[:12]
    os.makedirs(CACHE_DIR, exist_ok=True)
    lib_path = os.path.join(CACHE_DIR, f"lib{name}-{tag}.so")

    if not os.path.exists(lib_path):
        tmp = lib_path + ".build"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               *extra_cflags, *sources, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib_path)

    lib = ctypes.CDLL(lib_path)
    _loaded[name] = lib
    return lib


def available() -> bool:
    """Whether a C++ toolchain is present."""
    try:
        subprocess.run(["g++", "--version"], capture_output=True, check=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False
