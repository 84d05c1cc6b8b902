"""Shared helpers for the on-demand native builds (loader.py, sknn.py)."""
from __future__ import annotations

import platform
from functools import lru_cache
from pathlib import Path


@lru_cache(maxsize=1)
def host_arch_digest() -> bytes:
    """Identity of the CPU the compiler targets with -march=native.

    Cached .so files are keyed by this so a binary built on one host is
    never dlopen'd on a host with a different ISA (SIGILL on a shared/NFS
    checkout otherwise).  /proc/cpuinfo's flags line captures the ISA
    extensions; platform.machine() covers the base architecture.
    """
    parts = [platform.machine()]
    cpuinfo = Path("/proc/cpuinfo")
    if cpuinfo.exists():
        for line in cpuinfo.read_text().splitlines():
            if line.lower().startswith(("flags", "features")):
                parts.append(line)
                break
    return "|".join(parts).encode()
