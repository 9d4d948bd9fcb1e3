"""Large-allocation tuning for hosts with a slow first-touch fault path.

Measured on the r17 optimization-round host (Firecracker kernel
6.18.5-fc): glibc's default M_MMAP_THRESHOLD (128 KB, dynamic) services
every NumPy buffer larger than ~128 KB through a fresh mmap and returns
it with munmap on free, so each large temporary re-faults all of its
pages on every call — and this host's first-touch fault path costs
orders of magnitude more than normal (a one-shot 50 MB
``default_rng().random()`` measured 1-22 s vs 0.04 s when the buffer
comes from already-faulted arena memory; a plain ``np.zeros`` +
streaming fill of the same 50 MB costs 0.18 s).  The block-matrix
workloads allocate hundreds of such temporaries per query (seeded block
generation, GEMM outputs, ``tobytes`` copies, Arrow buffers), so the
fault path dominated entire stages: the la_svd_ts_ref gramian stage
spent ~5.7 s/task on a 0.3 s/task dgemm.

Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps freed large buffers
inside the malloc arena for reuse, paying first-touch once per worker
process instead of once per allocation.  On ordinary hosts the change
is benign (slightly higher steady-state RSS, standard practice for
numeric workloads).  Scale note: this is a per-process allocator knob —
it ships to real clusters unchanged via ``spark.executorEnv`` (set in
``session.get_spark``) and via this module running at import time in
every Python worker that deserializes one of our functions.

``tune_malloc`` is called from ``wukong_spark/__init__``:

- env vars (``MALLOC_MMAP_THRESHOLD_``/``MALLOC_TRIM_THRESHOLD_``) are
  set (if unset) so child processes — the driver JVM and the Python
  worker daemons it forks — inherit the thresholds at startup;
- ``mallopt`` applies them to the CURRENT process (the driver script
  doing driver-side numpy work, or a Python worker importing this
  package when it unpickles a task function).
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_THRESHOLD_BYTES = 1 << 30

_done = False


def tune_malloc() -> None:
    """Idempotently raise glibc's mmap/trim thresholds (see module doc)."""
    global _done
    if _done:
        return
    _done = True
    for key in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(key, str(_THRESHOLD_BYTES))
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, _THRESHOLD_BYTES)
        libc.mallopt(_M_TRIM_THRESHOLD, _THRESHOLD_BYTES)
    except Exception:
        pass  # non-glibc platform: the env vars still cover children
