"""Serialized on-demand build of the native shared libraries.

Build artifacts (`native/*.so`) are not tracked in git, so the first process
that needs one builds it. Loader worker processes can race here
(``num_workers>0`` forks several processes that all reach ``load_library``
at once), so the build is serialized with an exclusive ``flock`` on a lock
file, bounded by a timeout, and failures surface their stderr through
``warnings`` instead of being silently discarded — every caller has a
numpy/cv2 fallback, so a failed build degrades, never crashes.
"""

from __future__ import annotations

import os
import subprocess
import warnings

BUILD_TIMEOUT_S = 120


def build_native_target(native_dir: str, target: str) -> bool:
    """Run ``make -C native_dir target`` under an exclusive lock.

    Returns True when the target exists afterwards. A missing ``make``,
    a timeout, or a compile error warns (with the stderr tail) and
    returns False.
    """
    out_path = os.path.join(native_dir, target)
    if os.path.exists(out_path):
        return True
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        return False
    lock_path = os.path.join(native_dir, f".{target}.lock")
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    except OSError:
        lock_fd = None
    try:
        if lock_fd is not None:
            import fcntl

            fcntl.flock(lock_fd, fcntl.LOCK_EX)  # blocks while a peer builds
        if os.path.exists(out_path):  # a peer finished it while we waited
            return True
        try:
            proc = subprocess.run(
                ["make", "-C", native_dir, target],
                capture_output=True,
                timeout=BUILD_TIMEOUT_S,
            )
        except FileNotFoundError:
            return False  # no make on this host: fallback path, no noise
        except subprocess.TimeoutExpired:
            warnings.warn(
                f"native build of {target} timed out after {BUILD_TIMEOUT_S}s; "
                "using the python fallback"
            )
            return False
        except OSError as e:
            warnings.warn(f"native build of {target} failed to launch: {e}")
            return False
        if proc.returncode != 0:
            tail = proc.stderr.decode(errors="replace").strip().splitlines()[-8:]
            warnings.warn(
                f"native build of {target} failed (rc={proc.returncode}); "
                "using the python fallback. stderr tail:\n" + "\n".join(tail)
            )
        return os.path.exists(out_path)
    finally:
        if lock_fd is not None:
            os.close(lock_fd)
