"""Shared build-and-load helper for the self-compiled C kernels.

The escape-hatch pattern proven by operators/_jpeg_cext.py (round 7) and
hashkernels/_hash_cext.py (round 8): dependency-free C99 compiled on
first use with the host cc into a content-addressed .so under the temp
dir, loaded via ctypes; every fallible step (no compiler, compile error,
load failure) returns None and the caller keeps its pure-Python path —
behavior identical, only throughput changes."""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile


def find_cc() -> str | None:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if cc and shutil.which(cc):
            return cc
    return None


def compile_and_load(source: str, tag: str) -> "ctypes.CDLL | None":
    """Compile ``source`` (C99) into /tmp/mp_spark_<tag>_<digest>.so and
    load it; None on any failure. Concurrent compilers race safely via
    atomic os.replace; the digest keys the cache on the exact source."""
    cc = find_cc()
    if cc is None:
        return None
    digest = hashlib.md5(source.encode()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"mp_spark_{tag}_{digest}.so")
    if not os.path.exists(so_path):
        workdir = tempfile.mkdtemp(prefix=f"mp_{tag}_")
        src = os.path.join(workdir, f"{tag}.c")
        tmp_so = os.path.join(workdir, f"{tag}.so")
        with open(src, "w") as fh:
            fh.write(source)
        try:
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-std=c99", src, "-o", tmp_so],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp_so, so_path)
        except (OSError, subprocess.SubprocessError):
            return None
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        return None
