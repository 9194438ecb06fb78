"""Locate and activate a host-installed pure-Python protobuf runtime.

Spark 4.x ``transformWithStateInPandas`` speaks protobuf between the
Python worker and the JVM state server: the generated
``pyspark/sql/streaming/proto/StateMessage_pb2.py`` needs a
``google.protobuf`` runtime at import time.  This container has no
``protobuf`` pip distribution, but publicly-distributed SDKs already on
the image bundle the pure-Python runtime (e.g. the Google Cloud SDK's
App Engine platform ships protobuf 6.32.0).  This module probes those
locations and, when one is found, activates it for BOTH sides of the
operator:

* **driver**: insert the runtime's parent dir on ``sys.path``;
* **workers**: prepend the dir to the worker ``PYTHONPATH`` via
  ``sc.environment`` (PySpark captures that dict into each Python
  function's worker env, and the interpreter adds PYTHONPATH entries to
  ``sys.path`` at startup — the pb2 imports inside
  ``stateful_processor_api_client.py`` are lazy, per-method, so the
  path is in place before the first one runs).

pyspark's gencode was emitted by protoc 6.33.0 and protobuf's policy
check refuses the 6.32.x runtime (one minor version older), but within
the same major version the wire format and generated-code ABI are
identical (protobuf cross-version guarantees), so the skew is waived
with protobuf's own escape hatch,
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``, set in both the
driver process env (inherited by local-mode workers) and the worker
env map.

If no runtime is found anywhere, callers fall back to the honest
environment gate (``transform_with_state_supported() -> False``), the
same pattern as the ffmpeg codec probe in ``ops/binary.py``.

100 TB note: this is a bootstrap concern only — on a real cluster the
``protobuf`` distribution is a normal requirement pinned in the image,
and this module reduces to the fast ``import google.protobuf`` path.
"""

from __future__ import annotations

import os
import sys
import tempfile

# Publicly-distributed SDK locations that bundle a modern pure-Python
# google.protobuf runtime. Overridable for other hosts.
_CANDIDATE_DIRS = [
    os.environ.get("CHYME_PROTOBUF_DIR") or "",
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_MIN_MAJOR = 5  # runtime_version module (and editions support) exist from 5.x

_DISABLE_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# Where the protobuf-only namespace shim lives (module-level so tests can
# redirect it; under the tmp dir so local-mode workers on the same host see
# it too). Per-uid name + 0o700 + ownership checks: a fixed world-readable
# /tmp path is pre-creatable by any local user, and the sticky bit stops us
# unlinking their planted dir — their code would ride into the driver and
# every worker's PYTHONPATH (r9 review finding #2).
_SHIM_ROOT = os.path.join(tempfile.gettempdir(), f"chyme_pbshim-{os.getuid()}")


def find_protobuf_runtime() -> str | None:
    """Return a dir whose ``google/protobuf`` subtree is a usable modern
    runtime, or None. A native ``import google.protobuf`` that already
    works returns the empty string (no path insertion needed)."""
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return ""
    except ImportError:
        pass
    for d in _CANDIDATE_DIRS:
        if not d:
            continue
        rv = os.path.join(d, "google", "protobuf", "runtime_version.py")
        if not os.path.isfile(rv):
            continue
        # cheap major-version sniff without importing (the file defines
        # OSS_MAJOR = <int> then MAJOR = OSS_MAJOR)
        try:
            text = open(rv).read()
        except OSError:
            continue
        for line in text.splitlines():
            if line.startswith(("OSS_MAJOR", "MAJOR")):
                try:
                    if int(line.split("=")[1].strip()) >= _MIN_MAJOR:
                        return d
                except ValueError:
                    pass
                break
    return None


def _shim_dir(runtime_dir: str) -> str:
    """Build (idempotently) a path entry exposing ONLY google/protobuf.

    Putting the whole SDK platform dir on sys.path would also shadow
    google.auth / google.oauth2 / google.appengine and a handful of
    top-level modules (api_server, wrapper_util, ...) with the bundle's
    ancient copies for the entire session — and would mask a later
    properly-installed protobuf (r9 review finding #2). The shim is a
    namespace-package portion containing one symlink, so import
    resolution merges it with any real ``google`` package and ONLY
    ``google.protobuf`` resolves here.

    Trust model: every node on the path must be owned by this uid.
    A shim root we don't own (pre-planted by another local user — we
    can't unlink it under /tmp's sticky bit) aborts to a fresh private
    mkdtemp; a ``protobuf`` entry that exists but is NOT our symlink
    (a planted real dir would silently bypass the stale-link healing)
    is likewise abandoned rather than imported."""
    shim = _SHIM_ROOT
    try:
        os.makedirs(shim, mode=0o700, exist_ok=True)
        if os.lstat(shim).st_uid != os.getuid() or os.path.islink(shim):
            raise OSError("shim root not owned by current uid")
    except OSError:
        shim = tempfile.mkdtemp(prefix="chyme_pbshim-")  # 0o700, always ours
    pkg = os.path.join(shim, "google")
    os.makedirs(pkg, exist_ok=True)
    link = os.path.join(pkg, "protobuf")
    target = os.path.join(runtime_dir, "google", "protobuf")
    if os.path.islink(link):
        if os.readlink(link) != target:
            os.unlink(link)
    elif os.path.exists(link):  # real dir/file where our symlink belongs
        import shutil

        # rmtree on a regular FILE raises (swallowed); handle both kinds
        shutil.rmtree(link, ignore_errors=True)
        if os.path.exists(link):
            try:
                os.unlink(link)
            except OSError:
                pass
    if not os.path.exists(link):
        os.symlink(target, link)
    if not os.path.islink(link):
        # the planted entry survived every removal attempt (e.g. owned
        # by another uid under a sticky-bit parent): ABANDON this root
        # for a fresh private one, as the docstring promises — returning
        # it would put a dead (or attacker-controlled) google/protobuf
        # on sys.path while enable() reports success (r10 review).
        fresh = tempfile.mkdtemp(prefix="chyme_pbshim-")
        os.makedirs(os.path.join(fresh, "google"), exist_ok=True)
        os.symlink(target, os.path.join(fresh, "google", "protobuf"))
        return fresh
    return shim


def enable(spark) -> bool:
    """Activate the protobuf runtime for the driver and for every Python
    worker subsequently created by ``spark``. Idempotent. Returns False
    (and changes nothing) when no runtime exists on this host."""
    runtime_dir = find_protobuf_runtime()
    if runtime_dir is None:
        return False
    shim = _shim_dir(runtime_dir) if runtime_dir else ""
    if shim and shim not in sys.path:
        sys.path.insert(0, shim)
    os.environ[_DISABLE_FLAG] = "true"

    env = spark.sparkContext.environment
    env[_DISABLE_FLAG] = "true"
    if shim:
        old = env.get("PYTHONPATH") or os.environ.get("PYTHONPATH") or ""
        parts = [shim] + ([old] if old else [])
        new_path = os.pathsep.join(parts)
        if shim not in old.split(os.pathsep):
            env["PYTHONPATH"] = new_path
    return True
