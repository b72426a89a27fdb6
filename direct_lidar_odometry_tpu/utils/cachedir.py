"""Machine-scoped persistent-compilation-cache directories.

The XLA persistent cache stores CPU AOT blobs compiled for the *exact*
feature set of the compiling host. Loading them on a host with different
CPU features logs ``cpu_aot_loader`` "machine feature mismatch ... could
lead to SIGILL" errors (observed when a cache written on the builder box
was read on the driver box). Scoping the cache directory by a signature of
the host's CPU feature flags makes each machine populate its own cache, so
wrong-machine code can never load.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_tag() -> str:
    """Short stable signature of this host's ISA-relevant identity."""
    sig = platform.machine() + ";" + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # first 'flags' + 'model name' lines identify the feature set
                if line.startswith(("flags", "model name")):
                    sig += ";" + line.strip()
                if sig.count(";") >= 3:
                    break
    except OSError:
        pass
    return hashlib.sha256(sig.encode()).hexdigest()[:10]


def machine_scoped(cache_dir: str) -> str:
    """``cache_dir`` with a per-machine suffix directory appended."""
    return os.path.join(cache_dir, machine_tag())
